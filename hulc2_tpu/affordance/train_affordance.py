"""Affordance model training entry point.

Public-entry equivalent of the reference's
``python -m hulc2.affordance.train_affordance``
(reference: hulc2/affordance/train_affordance.py:24-84): trains the pixel
affordance + depth detector with per-epoch checkpoints and pixel-distance /
depth validation errors.

    python -m hulc2_tpu.affordance.train_affordance \
        aff_detection.dataset.data_dir=/data/calvin_lang_MoCEndPt

The whole step (uint8 resize/scale, label-coherent random shift, LingUNet,
losses, Adam update) is one jitted program on TPU.
"""
from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path
from typing import Optional

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
logger = logging.getLogger(__name__)


def build_detector(aff_cfg: dict):
    from hulc2_tpu.affordance.detector import AffordanceDetector

    return AffordanceDetector(
        encoder_name=aff_cfg["encoder_name"],
        decoder_channels=tuple(aff_cfg["decoder_channels"]),
        fusion_type=aff_cfg["fusion_type"],
        lang_embed_dim=aff_cfg["lang_embed_dim"],
        depth_dist=aff_cfg.get("depth_dist") or None,
        normalize_depth=aff_cfg.get("normalize_depth", True),
        freeze_encoder=aff_cfg.get("freeze_encoder", True),
        compute_dtype=aff_cfg.get("compute_dtype") or None,
        text_tower=aff_cfg.get("text_tower", False),
        tower_width=aff_cfg.get("tower_width", 256),
        tower_heads=aff_cfg.get("tower_heads", 4),
        tower_layers=aff_cfg.get("tower_layers", 2),
    )


def make_aff_train_step(model, tx, loss_weights, img_hw: int, shift_pad: int,
                        label_type: str = "pixel"):
    import jax
    import jax.numpy as jnp

    from hulc2_tpu.affordance.dataset import jitter_label_and_image, jitter_mask_and_image
    from hulc2_tpu.ops.preprocess import resize

    def step(params, batch_stats, opt_state, batch, key):
        imgs = resize(batch["frame"].astype(jnp.float32) / 255.0, img_hw, img_hw)
        if label_type == "mask":
            imgs, mask, px = jitter_mask_and_image(key, imgs, batch["mask"], batch["px"], shift_pad)
        else:
            imgs, px = jitter_label_and_image(key, imgs, batch["px"], shift_pad)
        target_depth = batch.get("normalized_depth", batch.get("depth"))

        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                imgs, batch["lang"], True,
                mutable=["batch_stats"],
            )
            if label_type == "mask":
                total, metrics = model.compute_mask_loss(out, mask, target_depth, loss_weights)
            else:
                total, metrics = model.compute_loss(out, px, target_depth, loss_weights)
            return total, (metrics, updates["batch_stats"])

        (_, (metrics, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, new_opt = tx.update(grads, opt_state, params)
        new_params = jax.tree_util.tree_map(lambda a, b: a + b, params, upd)
        return new_params, new_stats, new_opt, metrics

    return jax.jit(step, donate_argnums=(0, 2))


def make_aff_val_step(model, depth_norm, img_hw: int, loss_weights=None,
                      label_type: str = "pixel"):
    import jax
    import jax.numpy as jnp

    from hulc2_tpu.ops.preprocess import resize

    def step(params, batch_stats, batch, key):
        imgs = resize(batch["frame"].astype(jnp.float32) / 255.0, img_hw, img_hw)
        out = model.apply({"params": params, "batch_stats": batch_stats}, imgs, batch["lang"], False)
        target_depth = batch.get("normalized_depth", batch.get("depth"))
        if label_type == "mask":
            total, metrics = model.compute_mask_loss(
                out, batch["mask"], target_depth,
                **({"loss_weights": loss_weights} if loss_weights else {}),
            )
        else:
            total, metrics = model.compute_loss(
                out, batch["px"], target_depth,
                **({"loss_weights": loss_weights} if loss_weights else {}),
            )
        px_pred, depth, _ = model.predict_from_output(key, out, depth_norm)
        metrics["px_dist_err"] = jnp.mean(
            jnp.linalg.norm((px_pred - batch["px"]).astype(jnp.float32), axis=-1)
        )
        if depth is not None and "depth" in batch:
            metrics["depth_err"] = jnp.mean(jnp.abs(depth.squeeze() - batch["depth"]))
        return metrics

    return jax.jit(step)


def train(overrides=(), max_epochs: Optional[int] = None, max_steps: Optional[int] = None,
          synthetic: bool = False, run_dir=None, n_synthetic: int = 64):
    import jax
    import jax.numpy as jnp

    import hulc2_tpu.configs  # noqa: F401
    import hulc2_tpu.configs.affordance  # noqa: F401
    from hulc2_tpu.affordance.dataset import AffordanceDataset
    from hulc2_tpu.affordance.depth_heads import DepthNorm
    from hulc2_tpu.core import config as cfg_lib
    from hulc2_tpu.core.checkpoint import CheckpointManager, save_run_config
    from hulc2_tpu.core.metrics import MetricsLogger
    from hulc2_tpu.data.loader import BatchLoader
    from hulc2_tpu.train import optim

    cfg = cfg_lib.compose("train_affordance", list(overrides))
    aff_cfg = cfg["aff_detection"]
    run_dir = Path(run_dir or f"{cfg['log_dir']}/{time.strftime('%Y-%m-%d_%H-%M-%S')}")
    img_hw = aff_cfg["dataset"]["img_resize"][aff_cfg["dataset"]["cam"]]

    label_type = aff_cfg["dataset"].get("label_type", "pixel")
    if synthetic:
        datasets = {
            s: SyntheticAffordanceDataset(n_synthetic if s == "training" else 8, img_hw,
                                          aff_cfg["lang_embed_dim"], seed=i,
                                          label_type=label_type,
                                          lang_tokens=aff_cfg.get("text_tower", False))
            for i, s in enumerate(("training", "validation"))
        }
        depth_norm = DepthNorm()
    else:
        # mined frames store annotation STRINGS; the training batch needs a
        # fixed-size "lang" value.
        if aff_cfg.get("text_tower"):
            # in-graph token tower (detector.py): tokenize to CLIP-BPE ids,
            # the tower embeds them INSIDE the jitted step and trains jointly
            # — no external or stub embedding table anywhere
            from hulc2_tpu.utils.clip_tokenizer import tokenize

            embedder = lambda s: tokenize([s])[0]  # noqa: E731
        else:
            # Without an external language tower in this environment the
            # deterministic hash embedding is the (gated) stand-in — the same
            # table the policy-side annotator used, so train-time and
            # eval-time vectors for a sentence agree.
            from hulc2_tpu.tools.auto_lang_annotator import (
                hash_embed,
                require_stub_embeddings_ok,
            )

            require_stub_embeddings_ok("train_affordance")
            dim = aff_cfg["lang_embed_dim"]
            embedder = lambda s: hash_embed([s], dim)[0]  # noqa: E731
        datasets = {
            s: AffordanceDataset(
                aff_cfg["dataset"]["data_dir"], s, aff_cfg["dataset"]["cam"], img_hw,
                aff_cfg["dataset"].get("data_percent", 1.0),
                label_type=label_type,
                lang_embedder=embedder,
            )
            for s in ("training", "validation")
        }
        depth_norm = datasets["training"].depth_norm

    # persist the depth normalization stats so evaluation can rebuild the
    # predictor from the run dir alone (the reference embeds norm_values in
    # the checkpoint hyperparameters, pixel_aff_lang_detector.py:17)
    cfg["depth_norm"] = {"mean": float(depth_norm.mean), "std": float(depth_norm.std)}
    save_run_config_compat(cfg, run_dir)

    model = build_detector(aff_cfg)
    tx = optim.make_optimizer(aff_cfg["optimizer"])
    sample = _collate_device([datasets["training"][0]])
    variables = jax.jit(lambda r, i, l: model.init(r, i, l, False))(
        jax.random.PRNGKey(cfg["seed"]),
        jnp.zeros((1, img_hw, img_hw, 3), jnp.float32), sample["lang"])
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    opt_state = tx.init(params)

    train_step = make_aff_train_step(model, tx, aff_cfg["loss_weights"], img_hw,
                                     cfg["rand_shift_pad"], label_type)
    val_step = make_aff_val_step(model, depth_norm, img_hw, aff_cfg["loss_weights"], label_type)
    ckpt = CheckpointManager(run_dir)
    mlog = MetricsLogger(run_dir)
    key = jax.random.PRNGKey(cfg["seed"])

    step_count = 0
    log_every = int(cfg.get("trainer", {}).get("log_every_n_steps", 20))
    for epoch in range(max_epochs if max_epochs is not None else cfg["max_epochs"]):
        loader = BatchLoader(datasets["training"], cfg["batch_size"], shuffle=True,
                             seed=cfg["seed"] + epoch, num_threads=cfg["num_workers"])
        for raw in loader:
            batch = _collate_device(None, raw)
            key, sub = jax.random.split(key)
            params, batch_stats, opt_state, metrics = train_step(params, batch_stats, opt_state, batch, sub)
            step_count += 1
            if step_count % log_every == 0:
                mlog.log({k: float(v) for k, v in metrics.items()}, step_count, "train/")
            if max_steps and step_count >= max_steps:
                break
        # validation (tolerate an empty split — tiny mined datasets)
        vloader = (
            BatchLoader(datasets["validation"],
                        min(cfg["batch_size"], len(datasets["validation"])),
                        shuffle=False, drop_last=True, num_threads=1)
            if len(datasets["validation"]) else ()
        )
        sums, n = {}, 0
        for raw in vloader:
            key, sub = jax.random.split(key)
            m = val_step(params, batch_stats, _collate_device(None, raw), sub)
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        val_metrics = {k: v / max(n, 1) for k, v in sums.items()}
        mlog.log(val_metrics, step_count, "val/")
        logger.info("epoch %d: %s", epoch, {k: round(v, 4) for k, v in val_metrics.items()})
        ckpt.save(step_count, {"params": params, "batch_stats": batch_stats}, val_metrics)
        if max_steps and step_count >= max_steps:
            break
    ckpt.wait()
    mlog.close()
    return params, batch_stats, val_metrics


def save_run_config_compat(cfg, run_dir):
    from hulc2_tpu.core.checkpoint import save_run_config

    save_run_config(run_dir, cfg)


def _collate_device(samples, collated=None):
    import jax.numpy as jnp
    import numpy as np

    if collated is None:
        collated = {k: np.stack([s[k] for s in samples]) for k in samples[0] if k != "lang_ann"}
    return {k: jnp.asarray(v) for k, v in collated.items() if k != "lang_ann"}


class SyntheticAffordanceDataset:
    """Shape-correct random affordance frames (smoke/bench)."""

    def __init__(self, n: int, hw: int, lang_dim: int, seed: int = 0,
                 label_type: str = "pixel", lang_tokens: bool = False):
        self.n, self.hw, self.lang_dim, self.seed = n, hw, lang_dim, seed
        self.label_type = label_type
        self.lang_tokens = lang_tokens

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng((self.seed, i))
        px = rng.integers(0, self.hw, 2).astype(np.int32)
        lang = (
            rng.integers(1, 1000, 77).astype(np.int32)  # token-tower smoke ids
            if self.lang_tokens
            else rng.standard_normal(self.lang_dim).astype(np.float32)
        )
        out = {
            "frame": rng.integers(0, 256, (self.hw, self.hw, 3), np.uint8),
            "px": px,
            "depth": np.float32(rng.uniform(1.3, 4.5)),
            "normalized_depth": np.float32(rng.standard_normal()),
            "lang": lang,
            "idx": np.int64(i),
        }
        if self.label_type == "mask":
            yy, xx = np.ogrid[: self.hw, : self.hw]
            out["mask"] = (((yy - px[0]) ** 2 + (xx - px[1]) ** 2)
                           <= (self.hw // 10) ** 2).astype(np.float32)
        return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--run-dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)
    train(args.overrides, args.max_epochs, args.max_steps, args.synthetic, args.run_dir)


if __name__ == "__main__":
    main(sys.argv[1:])
