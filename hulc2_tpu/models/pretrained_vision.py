"""Frozen pretrained vision encoders: R3M, CLIP image tower, tactile ResNet.

Counterparts of (reference): hulc2/models/perceptual_encoders/vision_r3m.py:8,
vision_clip.py:10, tactile_encoder.py:7, vision_resnet.py. All are flax
modules over the torchvision-parity ResNet in ``hulc2_tpu.models.resnet``
(R3M's convnet is a standard ResNet18 trunk) or the HF Flax CLIP vision
tower, each followed by the small trainable FC head the reference uses.

Weight loading: ``convert_r3m_checkpoint`` maps an R3M torch checkpoint's
``convnet.*`` tree through the torchvision converter; CLIP weights come via
FlaxCLIPVisionModelWithProjection(from_pt=True) from a local checkpoint dir.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hulc2_tpu.models.layers import Dense
from hulc2_tpu.models.resnet import ResNet, convert_torchvision_resnet


class VisionR3M(nn.Module):
    """Frozen R3M ResNet18 -> global pool (512) -> relu(fc1 256) -> fc2."""

    visual_features: int = 64
    resnet_model: str = "resnet18"
    freeze_backbone: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        backbone = ResNet(self.resnet_model, name="r3m")
        feats = backbone(x)
        pooled = jnp.mean(feats[-1], axis=(1, 2))
        if self.freeze_backbone:
            pooled = jax.lax.stop_gradient(pooled)
        h = jax.nn.relu(Dense(256, dtype=self.dtype, name="fc1")(pooled))
        return Dense(self.visual_features, dtype=self.dtype, name="fc2")(h)


class VisionClip(nn.Module):
    """CLIP image tower (RN50 ModifiedResNet or ViT-B/32, in-graph) + FC
    head (reference: vision_clip.py:10-32, which builds both towers via the
    vendored clip.py:467 build_model). The tower is frozen by default
    (stop_gradient, like the reference's requires_grad=False); the head
    picks 512 hidden for the 1024-d RN50 embedding, 256 for ViT's 512-d,
    matching the reference exactly. Weights load through
    ``clip_resnet.convert_clip_visual`` / ``clip_vit.convert_clip_vit``.
    """

    visual_features: int = 64
    model_name: str = "RN50"  # RN50 | ViT-B/32
    freeze_backbone: bool = True
    tower_kwargs: Optional[dict] = None  # size overrides (tests / RN50x variants)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        kw = dict(self.tower_kwargs or {})
        if "RN50" in self.model_name:
            from hulc2_tpu.models.clip_resnet import ClipModifiedResNet

            emb, _ = ClipModifiedResNet(name="clip", **kw)(x)
        elif "ViT" in self.model_name:
            from hulc2_tpu.models.clip_vit import ClipVisionTransformer

            kw.setdefault("input_resolution", x.shape[1])
            emb = ClipVisionTransformer(name="clip", **kw)(x)
        else:
            raise ValueError(f"unknown CLIP backbone {self.model_name!r}")
        if self.freeze_backbone:
            emb = jax.lax.stop_gradient(emb)
        hidden = 512 if emb.shape[-1] == 1024 else 256
        h = jax.nn.relu(Dense(hidden, dtype=self.dtype, name="fc1")(emb))
        return Dense(self.visual_features, dtype=self.dtype, name="fc2")(h)


class TactileEncoder(nn.Module):
    """Two frozen ResNet18 streams over the stereo tactile image's 3+3
    channels, concatenated -> relu(fc1 512) -> fc2
    (reference: tactile_encoder.py:7-28, shared trunk weights)."""

    visual_features: int = 64
    freeze_backbone: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        backbone = ResNet("resnet18", name="trunk")
        left = jnp.mean(backbone(x[..., :3])[-1], axis=(1, 2))
        right = jnp.mean(backbone(x[..., 3:])[-1], axis=(1, 2))
        feat = jnp.concatenate([left, right], axis=-1)
        if self.freeze_backbone:
            feat = jax.lax.stop_gradient(feat)
        h = jax.nn.relu(Dense(512, dtype=self.dtype, name="fc1")(feat))
        return Dense(self.visual_features, dtype=self.dtype, name="fc2")(h)


class VisionResNet(nn.Module):
    """Trainable/frozen plain ResNet18 encoder + FC head
    (reference: vision_resnet.py:1-31)."""

    visual_features: int = 64
    freeze_backbone: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        pooled = jnp.mean(ResNet("resnet18", name="resnet")(x)[-1], axis=(1, 2))
        if self.freeze_backbone:
            pooled = jax.lax.stop_gradient(pooled)
        h = jax.nn.relu(Dense(256, dtype=self.dtype, name="fc1")(pooled))
        return Dense(self.visual_features, dtype=self.dtype, name="fc2")(h)


class VisionResNetAff(nn.Module):
    """Truncated ImageNet ResNet18 trunk + flattened 3-layer FC head
    (reference: vision_resnet_aff.py:10-40 — smp ``get_encoder(depth=3)``
    stops after layer2, flattens the stride-8 map and runs
    relu(fc1 512) -> relu(fc2 256) -> fc3).

    The trunk is always frozen: the reference sets requires_grad=False on
    every encoder param, and its ``freeze_backbone`` branch re-enables only
    ``layer4`` — a stage a depth-3 encoder never runs — so no trunk gradient
    flows there either. Stages past ``depth`` are dead code under XLA (their
    outputs are unused and DCE'd); their init-time params are harmless and
    simply ignored by checkpoint converters.
    """

    visual_features: int = 64
    depth: int = 3  # smp contract: feature index == last built stage
    freeze_backbone: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        feats = ResNet("resnet18", name="resnet")(x)
        y = jax.lax.stop_gradient(feats[self.depth])  # trunk frozen (see doc)
        h = y.reshape((y.shape[0], -1))
        h = jax.nn.relu(Dense(512, dtype=self.dtype, name="fc1")(h))
        h = jax.nn.relu(Dense(256, dtype=self.dtype, name="fc2")(h))
        return Dense(self.visual_features, dtype=self.dtype, name="fc3")(h)


# --------------------------------------------------------------------------- #
def convert_r3m_checkpoint(state_dict: Dict[str, Any], arch: str = "resnet18"):
    """R3M torch checkpoint (keys like ``module.convnet.conv1.weight`` or
    ``convnet.conv1.weight``) -> flax variables for the R3M backbone."""
    prefix = None
    for cand in ("module.convnet.", "convnet.", "r3m.convnet."):
        if any(k.startswith(cand) for k in state_dict):
            prefix = cand
            break
    if prefix is None:
        raise KeyError("no convnet.* keys found in R3M checkpoint")
    return convert_torchvision_resnet(state_dict, arch, prefix=prefix)
