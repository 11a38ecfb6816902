"""Frozen language towers with the uniform ``encode_text`` interface.

Counterparts of the reference's language encoders
(reference: hulc2/models/encoders/language_network.py:13 SBert,
hulc2/models/encoders/clip_lang_encoder.py:9 LangClip,
hulc2/affordance/models/language_encoders/{sbert,bert,distilbert,clip}_lang_
encoder.py). All return ``(sentence_emb (B, E), token_embs (B, T, E) | None,
mask (B, T) | None)``.

Backbones are HuggingFace *Flax* models (FlaxBertModel / FlaxCLIPTextModel /
FlaxDistilBertModel) loaded from a local checkpoint directory — this image
has no network egress, so weights must be on disk (``from_pt=True`` converts
torch checkpoints transparently). When no weights are available,
``PrecomputedLangEmbeddings`` serves the reference's ``load_lang_embeddings``
path (npz lookup of offline-computed sentence embeddings,
reference: npz_dataset.py:178-181, evaluation/utils.py:88-96).
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class PrecomputedLangEmbeddings:
    """Sentence -> embedding lookup built from embeddings.npy / auto_lang_ann."""

    def __init__(self, table: Dict[str, np.ndarray]):
        self.table = {k: np.asarray(v, np.float32).squeeze() for k, v in table.items()}
        self.dim = next(iter(self.table.values())).shape[-1] if table else 0

    @classmethod
    def from_embeddings_npy(cls, path) -> "PrecomputedLangEmbeddings":
        data = np.load(path, allow_pickle=True).item()
        return cls({v["ann"][0]: v["emb"] for v in data.values()})

    def encode_text(self, sentences: Sequence[str]):
        emb = np.stack([self.table[s] for s in sentences])
        return emb, None, None

    def __call__(self, sentences):
        return self.encode_text(sentences)[0]


class SBertEncoder:
    """sentence-transformers MiniLM (384-d): BERT backbone + attention-masked
    mean pooling (the sentence-transformers pooling head)."""

    def __init__(self, model_path: str, freeze_backbone: bool = True):
        from transformers import AutoTokenizer, FlaxAutoModel

        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.model = FlaxAutoModel.from_pretrained(model_path, from_pt=not _has_flax_weights(model_path))
        self.freeze_backbone = freeze_backbone

    def encode_text(self, sentences: Sequence[str]):
        import jax.numpy as jnp

        toks = self.tokenizer(list(sentences), padding=True, truncation=True, return_tensors="np")
        out = self.model(**toks)
        hidden = out.last_hidden_state  # (B, T, E)
        mask = jnp.asarray(toks["attention_mask"])[..., None]
        pooled = jnp.sum(hidden * mask, axis=1) / jnp.maximum(jnp.sum(mask, axis=1), 1e-9)
        return pooled, hidden, jnp.asarray(toks["attention_mask"]).astype(bool)

    def __call__(self, sentences):
        return self.encode_text(sentences)[0]


class ClipTextEncoder:
    """CLIP text tower (projected embedding; 1024-d for RN50 checkpoints,
    512-d for ViT-B/32)."""

    def __init__(self, model_path: str, freeze_backbone: bool = True):
        from transformers import AutoTokenizer, FlaxCLIPTextModelWithProjection

        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.model = FlaxCLIPTextModelWithProjection.from_pretrained(
            model_path, from_pt=not _has_flax_weights(model_path)
        )

    def encode_text(self, sentences: Sequence[str]):
        import jax.numpy as jnp

        toks = self.tokenizer(list(sentences), padding=True, truncation=True, return_tensors="np")
        out = self.model(**toks)
        return (
            out.text_embeds,
            out.last_hidden_state,
            jnp.asarray(toks["attention_mask"]).astype(bool),
        )

    def __call__(self, sentences):
        return self.encode_text(sentences)[0]


class BertEncoder:
    """BERT / DistilBERT sentence encoder (CLS pooling), used by affordance
    rn18_bert / distilbert variants."""

    def __init__(self, model_path: str, distil: bool = False):
        from transformers import AutoTokenizer, FlaxAutoModel

        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.model = FlaxAutoModel.from_pretrained(model_path, from_pt=not _has_flax_weights(model_path))

    def encode_text(self, sentences: Sequence[str]):
        import jax.numpy as jnp

        toks = self.tokenizer(list(sentences), padding=True, truncation=True, return_tensors="np")
        out = self.model(**toks)
        hidden = out.last_hidden_state
        return hidden[:, 0], hidden, jnp.asarray(toks["attention_mask"]).astype(bool)

    def __call__(self, sentences):
        return self.encode_text(sentences)[0]


def _has_flax_weights(model_path) -> bool:
    p = Path(model_path)
    return p.is_dir() and any((p / n).exists() for n in ("flax_model.msgpack",))


class OfflineClipTextEncoder:
    """Self-contained CLIP text encoder: the in-repo BPE tokenizer
    (``utils.clip_tokenizer``, vendored OpenAI vocab asset) + the flax text
    transformer (``models.clip_text``), loading weights from an OpenAI CLIP
    checkpoint file (``state_dict`` .pt) — no HuggingFace assets required.
    Without a checkpoint the tower runs randomly initialized (shape/smoke
    use only)."""

    def __init__(self, ckpt_path: Optional[str] = None, **tower_kwargs):
        import jax

        from hulc2_tpu.models.clip_text import ClipTextTransformer, convert_clip_text
        from hulc2_tpu.utils.clip_tokenizer import default_tokenizer

        self.tokenizer = default_tokenizer()
        if ckpt_path is not None:
            import torch

            sd = torch.load(ckpt_path, map_location="cpu")
            sd = sd.get("state_dict", sd)
            params, kwargs = convert_clip_text(
                {k: v for k, v in sd.items() if not k.startswith("visual.")}
            )
            self.model = ClipTextTransformer(**{**kwargs, **tower_kwargs})
            self.params = {"params": params}
        else:
            self.model = ClipTextTransformer(**tower_kwargs)
            import numpy as _np

            dummy = _np.zeros((1, self.model.context_length), _np.int32)
            self.params = self.model.init(jax.random.PRNGKey(0), dummy)

    def encode_text(self, sentences: Sequence[str]):
        toks = self.tokenizer(list(sentences), self.model.context_length)
        emb = self.model.apply(self.params, toks)
        return np.asarray(emb), None, None

    def __call__(self, sentences):
        return self.encode_text(sentences)[0]


def build_lang_encoder(kind: str, model_path: Optional[str] = None, embeddings_path=None):
    """Factory over the reference's language_encoder zoo."""
    if kind == "precomputed":
        return PrecomputedLangEmbeddings.from_embeddings_npy(embeddings_path)
    if kind == "sbert":
        return SBertEncoder(model_path or "sentence-transformers/paraphrase-MiniLM-L3-v2")
    if kind == "clip":
        return ClipTextEncoder(model_path or "openai/clip-vit-base-patch32")
    if kind == "clip_offline":
        return OfflineClipTextEncoder(model_path)
    if kind in ("bert", "distilbert"):
        return BertEncoder(model_path or ("distilbert-base-uncased" if kind == "distilbert" else "bert-base-uncased"))
    raise ValueError(kind)
