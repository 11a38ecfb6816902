"""torchvision-compatible ResNet in flax (NHWC) + weight converter.

Backbone for: the affordance LingUNet encoder (reference:
hulc2/affordance/models/visual_lang_encoders/rn_lingunet.py:9 uses
smp.Unet(resnet18)), the tactile encoder (hulc2/models/perceptual_encoders/
tactile_encoder.py:7), R3M's ResNet18 trunk (vision_r3m.py:8), and the
ResNet vision encoders (vision_resnet.py). Layout and BatchNorm semantics
match torchvision exactly so ImageNet / R3M torch weights convert losslessly.

Returns the per-stage feature pyramid (stem, layer1..4) so U-Net style
decoders can consume skip connections.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class TorchBatchNorm(nn.Module):
    """Inference-style BatchNorm using stored running stats (frozen backbones;
    matches torch eval() semantics, eps 1e-5)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((self.features,)))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((self.features,)))
        inv = scale * jnp.reciprocal(jnp.sqrt(var.value + 1e-5))
        return x * inv + (bias - mean.value * inv)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides), padding=1, use_bias=False, name="conv1")(x)
        y = TorchBatchNorm(self.features, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = TorchBatchNorm(self.features, name="bn2")(y)
        if self.downsample:
            identity = nn.Conv(self.features, (1, 1), (self.strides, self.strides), use_bias=False, name="ds_conv")(x)
            identity = TorchBatchNorm(self.features, name="ds_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(TorchBatchNorm(self.features, name="bn1")(y))
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides), padding=1, use_bias=False, name="conv2")(y)
        y = nn.relu(TorchBatchNorm(self.features, name="bn2")(y))
        y = nn.Conv(4 * self.features, (1, 1), use_bias=False, name="conv3")(y)
        y = TorchBatchNorm(4 * self.features, name="bn3")(y)
        if self.downsample:
            identity = nn.Conv(4 * self.features, (1, 1), (self.strides, self.strides), use_bias=False, name="ds_conv")(x)
            identity = TorchBatchNorm(4 * self.features, name="ds_bn")(identity)
        return nn.relu(y + identity)


_CONFIGS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2), 1),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 1),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 4),
}


class ResNet(nn.Module):
    """Returns [input, stem(relu after bn1), layer1..layer4] feature maps —
    the smp-Unet encoder contract (first entry same resolution as input).

    ``frozen_stages`` freezes the first N of [stem, layer1..layer4] by
    stop-gradient on their outputs — gradients still reach the params of any
    later (unfrozen) stage, matching per-layer ``requires_grad=False``
    semantics (the reference's R3M stream trains only layer4,
    hulc2/affordance/models/visual_lang_encoders/r3m_rn18.py:38-43)."""

    arch: str = "resnet18"
    frozen_stages: int = 0  # 0..5

    @property
    def out_channels(self) -> Tuple[int, ...]:
        _, _, exp = _CONFIGS[self.arch]
        return (3, 64, 64 * exp, 128 * exp, 256 * exp, 512 * exp)

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        block, layers, _ = _CONFIGS[self.arch]
        import jax

        feats = [x]
        y = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False, name="conv1")(x)
        y = nn.relu(TorchBatchNorm(64, name="bn1")(y))
        if self.frozen_stages >= 1:
            y = jax.lax.stop_gradient(y)
        feats.append(y)  # stride 2
        # torch max_pool with padding=1
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        y = nn.max_pool(y, (3, 3), (2, 2), padding="VALID")
        for stage, (width, n_blocks) in enumerate(zip((64, 128, 256, 512), layers)):
            for b in range(n_blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                first_in = y.shape[-1]
                need_ds = b == 0 and (strides != 1 or first_in != width * _CONFIGS[self.arch][2])
                y = block(width, strides, need_ds, name=f"layer{stage+1}_{b}")(y)
            if self.frozen_stages >= stage + 2:
                y = jax.lax.stop_gradient(y)
            feats.append(y)
        return feats

    def global_pool(self, feats: List[jnp.ndarray]) -> jnp.ndarray:
        return jnp.mean(feats[-1], axis=(1, 2))


# --------------------------------------------------------------------------- #
# torchvision state_dict -> flax                                               #
# --------------------------------------------------------------------------- #
def _conv(sd, k):
    return {"kernel": np.asarray(sd[f"{k}.weight"]).transpose(2, 3, 1, 0)}


def _bn(sd, k):
    return {
        "params": {"scale": np.asarray(sd[f"{k}.weight"]), "bias": np.asarray(sd[f"{k}.bias"])},
        "stats": {"mean": np.asarray(sd[f"{k}.running_mean"]), "var": np.asarray(sd[f"{k}.running_var"])},
    }


def convert_torchvision_resnet(sd: Dict[str, Any], arch: str = "resnet18", prefix: str = ""):
    """-> {"params": ..., "batch_stats": ...} for ResNet."""
    block, layers, _ = _CONFIGS[arch]
    p: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(name: str, conv_params=None, bn=None):
        if conv_params is not None:
            p[name] = conv_params
        if bn is not None:
            p[name] = bn["params"]
            stats[name] = bn["stats"]

    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    put("conv1", _conv(sd, "conv1"))
    put("bn1", bn=_bn(sd, "bn1"))
    n_convs = 2 if block is BasicBlock else 3
    for stage, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            tk = f"layer{stage+1}.{b}"
            fk = f"layer{stage+1}_{b}"
            blk: Dict[str, Any] = {}
            blk_stats: Dict[str, Any] = {}
            for ci in range(1, n_convs + 1):
                blk[f"conv{ci}"] = _conv(sd, f"{tk}.conv{ci}")
                bn = _bn(sd, f"{tk}.bn{ci}")
                blk[f"bn{ci}"] = bn["params"]
                blk_stats[f"bn{ci}"] = bn["stats"]
            if f"{tk}.downsample.0.weight" in sd:
                blk["ds_conv"] = _conv(sd, f"{tk}.downsample.0")
                bn = _bn(sd, f"{tk}.downsample.1")
                blk["ds_bn"] = bn["params"]
                blk_stats["ds_bn"] = bn["stats"]
            p[fk] = blk
            stats[fk] = blk_stats
    return {"params": p, "batch_stats": stats}
