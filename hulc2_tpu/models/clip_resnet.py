"""CLIP ModifiedResNet image tower in flax (NHWC) + OpenAI-checkpoint converter.

Counterpart of the reference's vendored CLIP visual encoder
(reference: hulc2/models/perceptual_encoders/clip.py:310-573 and its duplicate
hulc2/affordance/models/core/clip.py), including the ``prepool_im`` hook that
exposes the per-stage feature maps consumed by the CLIP-LingUNet affordance
stream (reference: hulc2/affordance/models/visual_lang_encoders/
rn50_clip_lingunet.py:36).

Architecture (OpenAI CLIP "RN50"): 3-conv stem with BN + avgpool, four stages
of anti-aliased Bottlenecks (stride-2 via avgpool), and an AttentionPool2d
head (learned positional embedding, mean-token query, standard MHA with an
output projection to the joint embedding dim).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hulc2_tpu.models.resnet import TorchBatchNorm


def _avg_pool(x, k):
    return nn.avg_pool(x, (k, k), (k, k))


class ClipBottleneck(nn.Module):
    features: int  # bottleneck width; output 4x
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out_ch = 4 * self.features
        identity = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(TorchBatchNorm(self.features, name="bn1")(y))
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = nn.relu(TorchBatchNorm(self.features, name="bn2")(y))
        if self.stride > 1:  # anti-aliased downsample: avgpool then 1x1
            y = _avg_pool(y, self.stride)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = TorchBatchNorm(out_ch, name="bn3")(y)
        if self.stride > 1 or x.shape[-1] != out_ch:
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = nn.Conv(out_ch, (1, 1), use_bias=False, name="ds_conv")(identity)
            identity = TorchBatchNorm(out_ch, name="ds_bn")(identity)
        return nn.relu(y + identity)


class AttentionPool2d(nn.Module):
    num_heads: int
    output_dim: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens = jnp.concatenate([jnp.mean(tokens, axis=1, keepdims=True), tokens], axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(1.0), (h * w + 1, c))
        tokens = tokens + pos[None]
        q = nn.Dense(c, name="q_proj")(tokens[:, :1])
        k = nn.Dense(c, name="k_proj")(tokens)
        v = nn.Dense(c, name="v_proj")(tokens)
        hd = c // self.num_heads
        q = q.reshape(b, 1, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3).reshape(b, 1, c)
        return nn.Dense(self.output_dim, name="c_proj")(out[:, 0])


class ClipModifiedResNet(nn.Module):
    """Returns (embedding (B, output_dim), prepool feature pyramid
    [stem, layer1..4]) — the pyramid is what CLIP-LingUNet consumes."""

    layers: Tuple[int, ...] = (3, 4, 6, 3)  # RN50
    width: int = 64
    output_dim: int = 1024
    heads: int = 32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        w = self.width
        y = nn.Conv(w // 2, (3, 3), (2, 2), padding=1, use_bias=False, name="conv1")(x)
        y = nn.relu(TorchBatchNorm(w // 2, name="bn1")(y))
        y = nn.Conv(w // 2, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = nn.relu(TorchBatchNorm(w // 2, name="bn2")(y))
        y = nn.Conv(w, (3, 3), padding=1, use_bias=False, name="conv3")(y)
        y = nn.relu(TorchBatchNorm(w, name="bn3")(y))
        y = _avg_pool(y, 2)
        feats = [y]
        for stage, n_blocks in enumerate(self.layers):
            width = w * (2**stage)
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                y = ClipBottleneck(width, stride, name=f"layer{stage+1}_{b}")(y)
            feats.append(y)
        emb = AttentionPool2d(self.heads, self.output_dim, name="attnpool")(y)
        return emb, feats


# --------------------------------------------------------------------------- #
# OpenAI CLIP checkpoint conversion (keys under "visual.")                     #
# --------------------------------------------------------------------------- #
def _conv(sd, k):
    return {"kernel": np.asarray(sd[f"{k}.weight"], np.float32).transpose(2, 3, 1, 0)}


def _bn(sd, k):
    return (
        {"scale": np.asarray(sd[f"{k}.weight"], np.float32), "bias": np.asarray(sd[f"{k}.bias"], np.float32)},
        {"mean": np.asarray(sd[f"{k}.running_mean"], np.float32), "var": np.asarray(sd[f"{k}.running_var"], np.float32)},
    )


def _dense(sd, k):
    return {"kernel": np.asarray(sd[f"{k}.weight"], np.float32).T, "bias": np.asarray(sd[f"{k}.bias"], np.float32)}


def convert_clip_visual(sd: Dict[str, Any], layers=(3, 4, 6, 3), prefix: str = "visual."):
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    p: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in (1, 2, 3):
        p[f"conv{i}"] = _conv(sd, f"conv{i}")
        p[f"bn{i}"], stats[f"bn{i}"] = _bn(sd, f"bn{i}")
    for stage, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            tk, fk = f"layer{stage+1}.{b}", f"layer{stage+1}_{b}"
            blk, blk_stats = {}, {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = _conv(sd, f"{tk}.conv{ci}")
                blk[f"bn{ci}"], blk_stats[f"bn{ci}"] = _bn(sd, f"{tk}.bn{ci}")
            if f"{tk}.downsample.0.weight" in sd:
                # CLIP names the block OrderedDict([("-1", avgpool), ("0", conv),
                # ("1", bn)]) -> checkpoint keys downsample.0 (conv) / .1 (bn)
                blk["ds_conv"] = _conv(sd, f"{tk}.downsample.0")
                blk["ds_bn"], blk_stats["ds_bn"] = _bn(sd, f"{tk}.downsample.1")
            p[fk], stats[fk] = blk, blk_stats
    p["attnpool"] = {
        "positional_embedding": np.asarray(sd["attnpool.positional_embedding"], np.float32),
        "q_proj": _dense(sd, "attnpool.q_proj"),
        "k_proj": _dense(sd, "attnpool.k_proj"),
        "v_proj": _dense(sd, "attnpool.v_proj"),
        "c_proj": _dense(sd, "attnpool.c_proj"),
    }
    return {"params": p, "batch_stats": stats}
