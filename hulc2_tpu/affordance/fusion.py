"""Vision-language fusion library.

Flax counterparts of the reference's 15-module fusion zoo
(reference: hulc2/affordance/models/core/fusion.py:7-321) with the uniform
interface ``fuse(x_visual NHWC, x_lang (B, E), lang_proj=None)``. The
per-scale language projection lives in the caller (the U-Net decoder block),
matching the reference's ``x2_proj`` convention.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hulc2_tpu.models.layers import Dense


def _tile(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """(B, E) -> broadcast over the spatial dims of x1 (B, H, W, C)."""
    return jnp.broadcast_to(x2[:, None, None, :], (*x1.shape[:3], x2.shape[-1]))


class FusionBase(nn.Module):
    def project(self, x2, lang_proj):
        return lang_proj(x2) if lang_proj is not None else x2


class FusionAdd(FusionBase):
    @nn.compact
    def __call__(self, x1, x2, lang_proj=None):
        return x1 + _tile(x1, self.project(x2, lang_proj))


class FusionMult(FusionBase):
    @nn.compact
    def __call__(self, x1, x2, lang_proj=None):
        return x1 * _tile(x1, self.project(x2, lang_proj))


class FusionMax(FusionBase):
    @nn.compact
    def __call__(self, x1, x2, lang_proj=None):
        return jnp.maximum(x1, _tile(x1, self.project(x2, lang_proj)))


class FusionConcat(FusionBase):
    @nn.compact
    def __call__(self, x1, x2, lang_proj=None):
        return jnp.concatenate([x1, _tile(x1, self.project(x2, lang_proj))], axis=-1)


class FusionConv(FusionBase):
    """concat -> 1x1 conv back to x1 channels."""

    @nn.compact
    def __call__(self, x1, x2, lang_proj=None):
        cat = jnp.concatenate([x1, _tile(x1, self.project(x2, lang_proj))], axis=-1)
        return nn.Conv(x1.shape[-1], (1, 1), use_bias=False, name="conv")(jax.nn.relu(cat))


class FusionConvLat(FusionBase):
    """concat -> 3x3 conv (lateral) back to x1 channels."""

    @nn.compact
    def __call__(self, x1, x2, lang_proj=None):
        cat = jnp.concatenate([x1, _tile(x1, self.project(x2, lang_proj))], axis=-1)
        return nn.Conv(x1.shape[-1], (3, 3), padding=1, use_bias=False, name="conv")(jax.nn.relu(cat))


class FusionFiLM(FusionBase):
    """Feature-wise affine modulation: gamma(l) * x + beta(l)."""

    @nn.compact
    def __call__(self, x1, x2, lang_proj=None):
        e = self.project(x2, lang_proj)
        gamma = Dense(x1.shape[-1], name="gamma")(e)
        beta = Dense(x1.shape[-1], name="beta")(e)
        return x1 * (1.0 + gamma[:, None, None, :]) + beta[:, None, None, :]


class FusionDeepConv(FusionBase):
    """concat -> two 3x3 convs."""

    @nn.compact
    def __call__(self, x1, x2, lang_proj=None):
        cat = jnp.concatenate([x1, _tile(x1, self.project(x2, lang_proj))], axis=-1)
        y = jax.nn.relu(nn.Conv(x1.shape[-1], (3, 3), padding=1, name="conv0")(cat))
        return nn.Conv(x1.shape[-1], (3, 3), padding=1, name="conv1")(y)


class FusionWordAttention(FusionBase):
    """Dot-attention of per-word embeddings against pooled visual features,
    then multiplicative fusion (reference: fusion.py:187-213). ``x2`` here is
    (B, T, E) word embeddings."""

    scaled: bool = False

    @nn.compact
    def __call__(self, x1, x2, lang_proj=None, mask=None):
        words = self.project(x2, lang_proj)  # (B, T, C)
        query = jnp.mean(x1, axis=(1, 2))  # (B, C)
        score = jnp.einsum("btc,bc->bt", words, query)
        if self.scaled:
            score = score / jnp.sqrt(words.shape[-1])
        if mask is not None:
            score = jnp.where(mask, score, -1e9)
        attn = jax.nn.softmax(score, axis=-1)
        sentence = jnp.einsum("bt,btc->bc", attn, words)
        return x1 * _tile(x1, sentence)


class CrossModalAttention2d(FusionBase):
    """Spatial cross-attention: each pixel attends to the sentence embedding
    (reference: fusion.py:236-298, simplified single-head form)."""

    heads: int = 1

    @nn.compact
    def __call__(self, x1, x2, lang_proj=None):
        e = self.project(x2, lang_proj)  # (B, C)
        b, h, w, c = x1.shape
        q = Dense(c, name="q")(x1.reshape(b, h * w, c))
        k = Dense(c, name="k")(e)[:, None, :]
        v = Dense(c, name="v")(e)[:, None, :]
        attn = jax.nn.sigmoid(jnp.einsum("bpc,bkc->bpk", q, k) / jnp.sqrt(c))
        out = x1.reshape(b, h * w, c) + attn * v
        return out.reshape(b, h, w, c)


FUSERS = {
    "add": FusionAdd,
    "mult": FusionMult,
    "max": FusionMax,
    "concat": FusionConcat,
    "conv": FusionConv,
    "conv_lat": FusionConvLat,
    "film": FusionFiLM,
    "deep_conv": FusionDeepConv,
    "word_attention": FusionWordAttention,
    "cross_modal_2d": CrossModalAttention2d,
}


class FusionMultWord(FusionBase):
    """Multiply by the mask-averaged word embeddings
    (reference: fusion.py:167-185 — the per-word loop reduces to a masked
    mean, vectorized here). ``x2`` is (B, T, E) word embeddings."""

    @nn.compact
    def __call__(self, x1, x2, lang_proj=None, mask=None):
        words = self.project(x2, lang_proj)  # (B, T, C)
        if mask is None:
            mean = jnp.mean(words, axis=1)
        else:
            m = mask.astype(words.dtype)[..., None]
            mean = jnp.sum(words * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        return x1 * _tile(x1, mean)


class FusionSentenceAttention(FusionBase):
    """Pixels attend to the sentence embedding: per-pixel scaled-dot scores
    softmaxed over the spatial map reweight the features
    (reference: fusion.py:214-233)."""

    @nn.compact
    def __call__(self, x1, x2, lang_proj=None):
        e = self.project(x2, lang_proj)  # (B, C)
        b, h, w, c = x1.shape
        flat = x1.reshape(b, h * w, c)
        score = jnp.einsum("bpc,bc->bp", flat, e) / jnp.sqrt(c)
        attn = jax.nn.softmax(score, axis=-1)[..., None]
        return (flat * attn).reshape(b, h, w, c)


class FusionMultiHeadedWordAttention(FusionBase):
    """Cross-modal attention applied per decoder scale. The reference keeps
    three fixed CrossModalAttention2d blocks keyed by channel width
    (reference: fusion.py:299-318); here the block is shape-polymorphic, so
    one submodule per distinct channel width is created lazily by flax and
    selected statically at trace time.

    ``x2`` is (B, T, E) word embeddings; pixels attend over words."""

    heads: int = 1

    @nn.compact
    def __call__(self, x1, x2, lang_proj=None, mask=None):
        words = self.project(x2, lang_proj)  # (B, T, C)
        b, h, w, c = x1.shape
        q = Dense(c, name=f"q{c}")(x1.reshape(b, h * w, c))
        k = Dense(c, name=f"k{c}")(words)
        v = Dense(c, name=f"v{c}")(words)
        score = jnp.einsum("bpc,btc->bpt", q, k) / jnp.sqrt(c)
        if mask is not None:
            score = jnp.where(mask[:, None, :], score, -1e9)
        attn = jax.nn.softmax(score, axis=-1)
        out = x1.reshape(b, h * w, c) + jnp.einsum("bpt,btc->bpc", attn, v)
        return out.reshape(b, h, w, c)


FUSERS["mult_word"] = FusionMultWord
FUSERS["sentence_attention"] = FusionSentenceAttention
FUSERS["sent_attn"] = FusionSentenceAttention  # reference registry key
FUSERS["multi_headed_word_attn"] = FusionMultiHeadedWordAttention
