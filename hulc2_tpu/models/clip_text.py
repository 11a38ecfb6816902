"""CLIP text transformer, TPU-native flax — the in-graph language tower.

Counterpart of the reference's vendored CLIP text side
(reference: hulc2/models/perceptual_encoders/clip.py:411-424 encode_text,
:227-263 ResidualAttentionBlock/Transformer): token + positional embeddings,
pre-LN causal transformer with QuickGELU MLPs, final LayerNorm, EOT-token
pooling and the text projection.

Unlike the host-side HuggingFace wrappers in ``models/language.py`` this is
a linen module, so it NESTS inside the policy and trains (or freezes) inside
the jitted train step — the reference's ``model/language_encoder`` group
with gradients flowing through the tower (BASELINE config #3). Weights
convert from OpenAI CLIP checkpoints via ``convert_clip_text``.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class TextSelfAttention(nn.Module):
    """Multi-head self-attention with an additive mask (torch
    nn.MultiheadAttention semantics; q/k/v/out projections all biased)."""

    num_heads: int

    @nn.compact
    def __call__(self, x, attn_mask):
        b, l, c = x.shape
        hd = c // self.num_heads
        q = nn.Dense(c, name="q_proj")(x).reshape(b, l, self.num_heads, hd)
        k = nn.Dense(c, name="k_proj")(x).reshape(b, l, self.num_heads, hd)
        v = nn.Dense(c, name="v_proj")(x).reshape(b, l, self.num_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
        logits = logits + attn_mask[None, None]
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, l, c)
        return nn.Dense(c, name="out_proj")(out)


class TextResBlock(nn.Module):
    num_heads: int

    @nn.compact
    def __call__(self, x, attn_mask):
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        x = x + TextSelfAttention(self.num_heads, name="attn")(y, attn_mask)
        y = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        y = nn.Dense(4 * x.shape[-1], name="c_fc")(y)
        y = nn.Dense(x.shape[-1], name="c_proj")(quick_gelu(y))
        return x + y


class ClipTextTransformer(nn.Module):
    """tokens (B, L) int32 -> sentence embedding (B, output_dim).

    ``frozen=True`` stops gradients at the output (the reference's frozen
    LangClip); False backpropagates into the whole tower (config #3).
    """

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    output_dim: int = 1024  # CLIP RN50 embed dim
    frozen: bool = True

    @nn.compact
    def __call__(self, tokens, deterministic: bool = True):
        l = tokens.shape[1]
        x = nn.Embed(self.vocab_size, self.width, name="token_embedding")(tokens)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = x + pos[None, :l]
        causal = jnp.triu(jnp.full((l, l), -jnp.inf, x.dtype), k=1)
        for i in range(self.layers):
            x = TextResBlock(self.heads, name=f"resblock_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # pool at the EOT token (highest id in each row, clip.py:423)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(self.width**-0.5),
            (self.width, self.output_dim),
        )
        out = pooled @ proj
        return jax.lax.stop_gradient(out) if self.frozen else out


# --------------------------------------------------------------------------- #
# OpenAI CLIP checkpoint conversion (text keys)                                #
# --------------------------------------------------------------------------- #
def _t(w) -> np.ndarray:
    return np.asarray(w, np.float32).T


def _ln(sd, k) -> Dict[str, np.ndarray]:
    return {"scale": np.asarray(sd[f"{k}.weight"], np.float32),
            "bias": np.asarray(sd[f"{k}.bias"], np.float32)}


def convert_clip_text(sd: Dict[str, Any], layers: Optional[int] = None,
                      heads: Optional[int] = None) -> Tuple[Dict, Dict]:
    """OpenAI CLIP state_dict (text keys at top level) -> (flax params,
    module kwargs). torch nn.MultiheadAttention packs q/k/v into
    ``in_proj_weight`` (3C, C); split into the three Dense kernels."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)) for k, v in sd.items()}
    width = sd["ln_final.weight"].shape[0]
    if layers is None:
        layers = 1 + max(
            int(k.split(".")[2]) for k in sd if k.startswith("transformer.resblocks.")
        )
    params: Dict[str, Any] = {
        "token_embedding": {"embedding": np.asarray(sd["token_embedding.weight"], np.float32)},
        "positional_embedding": np.asarray(sd["positional_embedding"], np.float32),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": np.asarray(sd["text_projection"], np.float32),
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        w_in = np.asarray(sd[f"{p}.attn.in_proj_weight"], np.float32)
        b_in = np.asarray(sd[f"{p}.attn.in_proj_bias"], np.float32)
        qw, kw, vw = np.split(w_in, 3, axis=0)
        qb, kb, vb = np.split(b_in, 3, axis=0)
        params[f"resblock_{i}"] = {
            "ln_1": _ln(sd, f"{p}.ln_1"),
            "ln_2": _ln(sd, f"{p}.ln_2"),
            "attn": {
                "q_proj": {"kernel": _t(qw), "bias": qb},
                "k_proj": {"kernel": _t(kw), "bias": kb},
                "v_proj": {"kernel": _t(vw), "bias": vb},
                "out_proj": {"kernel": _t(sd[f"{p}.attn.out_proj.weight"]),
                             "bias": np.asarray(sd[f"{p}.attn.out_proj.bias"], np.float32)},
            },
            "c_fc": {"kernel": _t(sd[f"{p}.mlp.c_fc.weight"]),
                     "bias": np.asarray(sd[f"{p}.mlp.c_fc.bias"], np.float32)},
            "c_proj": {"kernel": _t(sd[f"{p}.mlp.c_proj.weight"]),
                       "bias": np.asarray(sd[f"{p}.mlp.c_proj.bias"], np.float32)},
        }
    kwargs = dict(
        vocab_size=sd["token_embedding.weight"].shape[0],
        context_length=sd["positional_embedding"].shape[0],
        width=width,
        heads=heads if heads is not None else max(1, width // 64),
        layers=layers,
        output_dim=sd["text_projection"].shape[1],
    )
    return params, kwargs
