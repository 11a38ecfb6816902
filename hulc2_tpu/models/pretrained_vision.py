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
    """Frozen CLIP image tower (embeds provided by an outer host call or an
    HF Flax vision model passed as ``clip_apply``) + FC head. For jit-purity
    the CLIP forward runs inside this module when ``clip_module`` is bound.
    """

    visual_features: int = 64
    clip_embed_dim: int = 1024  # RN50: 1024, ViT-B/32: 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, clip_image_embeds, deterministic: bool = True):
        hidden = 512 if self.clip_embed_dim == 1024 else 256
        h = jax.nn.relu(Dense(hidden, dtype=self.dtype, name="fc1")(clip_image_embeds))
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
