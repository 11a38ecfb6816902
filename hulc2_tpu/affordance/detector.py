"""Pixel affordance + depth detector: the high-level model of the hierarchy.

TPU-native counterpart of the reference PixelAffLangDetector +
AffDepthLangFusionPixel (reference: hulc2/affordance/pixel_aff_lang_detector.py:17,
hulc2/affordance/models/lang_fusion/aff_lang_depth_pixel.py:10):

- one flax module = affordance LingUNet stream + depth head, producing
  per-pixel logits over H*W and a depth distribution in a single fused graph
  (the BASELINE "single fused inference graph" requirement);
- loss = loss_weights.aff * CE(softmax over H*W pixels, one-hot target px)
       + loss_weights.depth * depth NLL  (default 0.1 / 0.9,
  conf/affordance/train_affordance.yaml:31-34);
- ``predict``: jitted argmax pixel + sampled depth + heatmap.

Language conditioning enters as a precomputed sentence embedding (CLIP/SBERT/
BERT towers — see hulc2_tpu.models.language); dim defaults to CLIP-RN50's
1024. Alternatively (``text_tower=True``) the detector nests its own small
CLIP-BPE text transformer and consumes raw token ids — the affordance-side
analogue of the policy's in-graph ``language_encoder`` group, trained jointly
from scratch, so the flagship pipeline needs no external (or stub) embedding
table anywhere (the reference's affordance lang encoders are frozen external
towers, hulc2/affordance/models/language_encoders/*.py).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hulc2_tpu.affordance.depth_heads import DEPTH_HEADS, DepthNorm
from hulc2_tpu.affordance.lingunet import LingUNet


class AffordanceOutput(NamedTuple):
    aff_logits: jnp.ndarray  # (B, H*W)
    depth_pred: Optional[tuple]  # head-specific params
    hw: Tuple[int, int]


class AffordanceDetector(nn.Module):
    encoder_name: str = "resnet18"
    decoder_channels: Tuple[int, ...] = (256, 128, 64, 32, 16)
    fusion_type: str = "mult"
    lang_embed_dim: int = 1024
    depth_dist: Optional[str] = "gaussian"  # gaussian | logistic | None
    normalize_depth: bool = True
    freeze_encoder: bool = True
    compute_dtype: Optional[str] = None  # "bfloat16" -> bf16 decoder compute
    # in-graph language tower: lang input is (B, L) int32 CLIP-BPE token ids,
    # embedded to lang_embed_dim by a small trainable text transformer
    text_tower: bool = False
    tower_width: int = 256
    tower_heads: int = 4
    tower_layers: int = 2

    @nn.compact
    def __call__(self, img: jnp.ndarray, lang: jnp.ndarray, train: bool = False) -> AffordanceOutput:
        b, h, w, _ = img.shape
        import jax.numpy as _jnp

        if self.text_tower:
            from hulc2_tpu.models.clip_text import ClipTextTransformer

            assert jnp.issubdtype(lang.dtype, jnp.integer), (
                f"text_tower detector expects int token ids, got {lang.dtype}"
            )
            lang = ClipTextTransformer(
                width=self.tower_width,
                heads=self.tower_heads,
                layers=self.tower_layers,
                output_dim=self.lang_embed_dim,
                frozen=False,
                name="lang_tower",
            )(lang)
        logits, bottleneck = LingUNet(
            self.encoder_name,
            self.decoder_channels,
            self.fusion_type,
            self.lang_embed_dim,
            freeze_encoder=self.freeze_encoder,
            compute_dtype=_jnp.dtype(self.compute_dtype) if self.compute_dtype else None,
            name="aff_stream",
        )(img, lang, train)
        assert logits.shape[1:3] == (h, w), (
            f"decoder output {logits.shape[1:3]} != input {(h, w)} — "
            "decoder_channels must have one more block than the encoder has "
            "skip levels (5 for resnet/clip encoders)"
        )
        depth_pred = None
        if self.depth_dist:
            head = DEPTH_HEADS[self.depth_dist](
                lang_dim=self.lang_embed_dim,
                name="depth_stream",
                **({"normalized": self.normalize_depth} if self.depth_dist == "logistic" else {}),
            )
            # pool the bottleneck so the head's fc size is input-res independent
            pooled = jnp.mean(bottleneck, axis=(1, 2))
            depth_pred = head(pooled, lang)
        return AffordanceOutput(logits.reshape(b, h * w), depth_pred, (h, w))

    # ------------------------------------------------------------------ #
    def compute_loss(
        self,
        out: AffordanceOutput,
        target_px: jnp.ndarray,  # (B, 2) row, col
        target_depth: Optional[jnp.ndarray],
        loss_weights: Dict[str, float] = {"aff": 0.1, "depth": 0.9},
    ):
        h, w = out.hw
        flat_idx = target_px[:, 0] * w + target_px[:, 1]
        logp = jax.nn.log_softmax(out.aff_logits, axis=-1)
        aff_loss = -jnp.mean(jnp.take_along_axis(logp, flat_idx[:, None], axis=-1))
        total = loss_weights["aff"] * aff_loss
        metrics = {"aff_loss": aff_loss}
        if out.depth_pred is not None and target_depth is not None:
            from hulc2_tpu.affordance.depth_heads import GaussianDepthHead, logistic_depth_loss

            d = target_depth.reshape(-1, 1)
            depth_loss = (
                GaussianDepthHead.loss(out.depth_pred, d)
                if self.depth_dist == "gaussian"
                else logistic_depth_loss(out.depth_pred, d, self.normalize_depth)
            )
            total = total + loss_weights["depth"] * depth_loss
            metrics["depth_loss"] = depth_loss
        metrics["total_loss"] = total
        return total, metrics

    def compute_mask_loss(
        self,
        out: AffordanceOutput,
        mask: jnp.ndarray,  # (B, H, W) binary interaction mask
        target_depth: Optional[jnp.ndarray] = None,
        loss_weights: Dict[str, float] = {"aff": 0.1, "depth": 0.9},
    ):
        """Mask-label variant (reference: one_stream_attention_lang_fusion_
        mask.py + datasets/mask_label.py): BCE+dice over the sigmoid mask,
        plus the depth term."""
        from hulc2_tpu.affordance.losses import mask_criterion

        aff_loss, metrics = mask_criterion(out.aff_logits, mask)
        total = loss_weights["aff"] * aff_loss
        if out.depth_pred is not None and target_depth is not None:
            from hulc2_tpu.affordance.depth_heads import GaussianDepthHead, logistic_depth_loss

            d = target_depth.reshape(-1, 1)
            depth_loss = (
                GaussianDepthHead.loss(out.depth_pred, d)
                if self.depth_dist == "gaussian"
                else logistic_depth_loss(out.depth_pred, d, self.normalize_depth)
            )
            total = total + loss_weights["depth"] * depth_loss
            metrics["depth_loss"] = depth_loss
        metrics["total_loss"] = total
        return total, metrics

    def predict_from_output(self, rng: jax.Array, out: AffordanceOutput, depth_norm: Optional[DepthNorm]):
        """argmax pixel + sampled depth + normalized heatmap (all on device)."""
        h, w = out.hw
        probs = jax.nn.softmax(out.aff_logits, axis=-1)
        flat = jnp.argmax(probs, axis=-1)
        px = jnp.stack([flat // w, flat % w], axis=-1)  # (B, 2) row, col
        depth = None
        if out.depth_pred is not None:
            if self.depth_dist == "gaussian":
                from hulc2_tpu.affordance.depth_heads import GaussianDepthHead

                depth = GaussianDepthHead.sample(rng, out.depth_pred, depth_norm if self.normalize_depth else None)
            else:
                from hulc2_tpu.affordance.depth_heads import logistic_depth_sample

                depth = logistic_depth_sample(rng, out.depth_pred, depth_norm if self.normalize_depth else None)
        return px, depth, probs.reshape(-1, h, w)


class AffordancePredictor:
    """Host-facing inference wrapper: uint8 image + precomputed lang embedding
    -> pixel/depth/heatmap via one jitted call (reference predict(),
    pixel_aff_lang_detector.py:172-215). Handles 224-resize + [0,1] scaling
    and maps the pixel back to the input resolution."""

    def __init__(self, model: AffordanceDetector, variables, depth_norm: Optional[DepthNorm] = None,
                 input_hw: Tuple[int, int] = (224, 224), seed: int = 0,
                 lang_table: Optional[Dict[str, np.ndarray]] = None):
        self.model = model
        self.variables = variables
        self.depth_norm = depth_norm or DepthNorm()
        self.input_hw = input_hw
        # caption -> embedding lookup so callers may pass instruction strings
        # (the reference embeds captions with the model's own lang encoder at
        # predict time, pixel_aff_lang_detector.py:172)
        self.lang_table = lang_table or {}
        self._key = jax.random.PRNGKey(seed)
        self._n = 0
        # token-tower models consume CLIP-BPE token ids instead of embeddings
        self.uses_tokens = bool(getattr(model, "text_tower", False))

        @jax.jit
        def _predict(variables, img, lang, key):
            out = model.apply(variables, img, lang, False)
            return model.predict_from_output(key, out, self.depth_norm)

        self._predict = _predict

    def _resolve_lang(self, lang_emb) -> np.ndarray:
        if isinstance(lang_emb, str):
            try:
                lang_emb = self.lang_table[lang_emb]
            except KeyError:
                raise KeyError(
                    f"no affordance language embedding for caption {lang_emb!r} — "
                    "provide a lang_table (caption -> embedding) to AffordancePredictor"
                ) from None
        lang_emb = np.asarray(lang_emb)
        # token-tower models consume int32 token ids; keep them integral
        return lang_emb if np.issubdtype(lang_emb.dtype, np.integer) else lang_emb.astype(np.float32)

    def predict(self, img_uint8: np.ndarray, lang_emb) -> Dict:
        return self.predict_batch([img_uint8], [lang_emb])[0]

    def predict_batch(self, imgs_uint8, lang_embs) -> list:
        """Batched inference: N (image, lang) pairs in ONE dispatch. The
        batch is padded to the next power of two so the jitted program
        compiles once per bucket, not once per request count (the batched
        evaluator's approach waves vary in size every round)."""
        from hulc2_tpu.ops.preprocess import resize

        n = len(imgs_uint8)
        if n == 0:
            return []
        cap = 1 << max(0, int(n - 1).bit_length())  # next pow2 >= n
        imgs_list = [np.asarray(im) for im in imgs_uint8]
        pre_resized = len({im.shape for im in imgs_list}) > 1
        if pre_resized:
            # mixed per-env camera resolutions: bring every item to input_hw
            # individually (one compile per distinct source shape) so the
            # stack below is rectangular
            imgs_list = [
                np.asarray(resize(jnp.asarray(im, jnp.float32)[None] / 255.0, *self.input_hw)[0])
                for im in imgs_list
            ]
        imgs = np.stack(imgs_list)
        langs = np.stack([self._resolve_lang(e) for e in lang_embs])
        if cap > n:  # pad with row 0 (discarded)
            imgs = np.concatenate([imgs, np.repeat(imgs[:1], cap - n, 0)])
            langs = np.concatenate([langs, np.repeat(langs[:1], cap - n, 0)])
        dev = jnp.asarray(imgs)
        dev_imgs = dev if pre_resized else resize(dev.astype(jnp.float32) / 255.0, *self.input_hw)
        self._n += 1
        px, depth, heat = self._predict(
            self.variables, dev_imgs, jnp.asarray(langs),
            jax.random.fold_in(self._key, self._n),
        )
        px = np.asarray(px)
        depth = None if depth is None else np.asarray(depth).reshape(cap, -1)[:, 0]
        heat = np.asarray(heat)
        outs = []
        for i in range(n):
            # map back to original resolution ((row, col) -> reference's (x, y))
            sy = imgs_uint8[i].shape[0] / self.input_hw[0]
            sx = imgs_uint8[i].shape[1] / self.input_hw[1]
            out = {"pixel": (int(px[i, 1] * sx), int(px[i, 0] * sy)),
                   "softmax": heat[i]}
            if depth is not None:
                out["depth"] = float(depth[i])
            outs.append(out)
        return outs
