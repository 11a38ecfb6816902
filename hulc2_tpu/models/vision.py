"""Perceptual CNN encoders (NHWC, MXU-friendly).

TPU-native counterparts of the reference's per-camera vision nets:

- ``VisionNetwork``      — 3-conv + SpatialSoftmax static-cam encoder
  (reference: hulc2/models/perceptual_encoders/vision_network.py:11)
- ``VisionNetworkGripper`` — nature_cnn / cnn_3_layers / cnn_4_layers variants
  (reference: hulc2/models/perceptual_encoders/vision_network_gripper.py:11-57)
- ``VisionConv``         — generic conv encoder
  (reference: hulc2/models/perceptual_encoders/vision_network_conv.py)
- ``TactileEncoder`` / ResNet encoders live in ``resnet.py``

All take (N, H, W, C) float images (already normalized on device by
``hulc2_tpu.ops.preprocess``) and return (N, visual_features).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hulc2_tpu.models.layers import Conv, Dense, get_activation
from hulc2_tpu.ops.space_to_depth import space_to_depth
from hulc2_tpu.ops.spatial import spatial_softmax


def _stem_conv(x, features: int, dtype, name: str):
    """8x8-stride-4 stem conv, reparametrized as space-to-depth + 2x2 conv
    when the input is 4-divisible (exactly equivalent; ~10x better MXU
    utilization on 3-channel images — see ops/space_to_depth.py)."""
    if x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
        return Conv(features, (2, 2), (1, 1), dtype=dtype, name=name)(space_to_depth(x, 4))
    return Conv(features, (8, 8), (4, 4), dtype=dtype, name=name)(x)


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class VisionNetwork(nn.Module):
    """Static-cam encoder: conv(8/4) conv(4/2) conv(3/1) + SpatialSoftmax
    keypoints + 2 FC + LayerNorm -> visual_features."""

    visual_features: int = 64
    activation_function: str = "ReLU"
    dropout_vis_fc: float = 0.0
    l2_normalize_output: bool = False
    use_sinusoid: bool = False
    spatial_softmax_temp: Optional[float] = 1.0  # None => learnable
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_activation(self.activation_function)
        x = act(_stem_conv(x, 32, self.dtype, "conv0"))
        x = act(Conv(64, (4, 4), (2, 2), dtype=self.dtype, name="conv1")(x))
        x = act(Conv(64, (3, 3), (1, 1), dtype=self.dtype, name="conv2")(x))
        if self.spatial_softmax_temp is None:
            temp = self.param("temperature", nn.initializers.ones, (1,))
        else:
            temp = jnp.asarray(self.spatial_softmax_temp, jnp.float32)
        x = spatial_softmax(x.astype(jnp.float32), temp)
        if self.use_sinusoid:
            x = jnp.concatenate([x, jnp.sin(x), jnp.cos(x)], axis=-1)
        x = act(Dense(512, dtype=self.dtype, name="fc1")(x))
        x = nn.Dropout(self.dropout_vis_fc)(x, deterministic=deterministic)
        x = Dense(self.visual_features, dtype=self.dtype, name="fc2")(x)
        if self.l2_normalize_output:
            x = _l2_normalize(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")(x)


class NatureCNN(nn.Module):
    """Nature-DQN trunk -> 128-d (reference: vision_network_gripper.py:11-26)."""

    activation_function: str = "ReLU"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation_function)
        x = act(_stem_conv(x, 32, self.dtype, "conv0"))
        x = act(Conv(64, (4, 4), (2, 2), dtype=self.dtype, name="conv1")(x))
        x = act(Conv(64, (3, 3), (1, 1), dtype=self.dtype, name="conv2")(x))
        # torch flattens NCHW (C,H,W); transpose so converted weights line up
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        return act(Dense(128, dtype=self.dtype, name="fc")(x))


class Cnn3Layers(nn.Module):
    """(reference: vision_network_gripper.py:29-39)"""

    activation_function: str = "ReLU"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation_function)
        for i in range(3):
            x = act(Conv(32, (3, 3), (2, 2), dtype=self.dtype, name=f"conv{i}")(x))
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        return Dense(128, dtype=self.dtype, name="fc")(x)


class Cnn4Layers(nn.Module):
    """(reference: vision_network_gripper.py:42-54)"""

    activation_function: str = "ReLU"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation_function)
        for i in range(3):
            x = act(Conv(32, (3, 3), (2, 2), dtype=self.dtype, name=f"conv{i}")(x))
        x = act(Conv(32, (3, 3), (1, 1), dtype=self.dtype, name="conv3")(x))
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        return Dense(128, dtype=self.dtype, name="fc")(x)


_GRIPPER_TRUNKS = {"nature_cnn": NatureCNN, "cnn_3_layers": Cnn3Layers, "cnn_4_layers": Cnn4Layers}


class VisionNetworkGripper(nn.Module):
    """Gripper-cam encoder: selectable conv trunk + 2 FC + LayerNorm
    (reference: vision_network_gripper.py:57-89)."""

    visual_features: int = 64
    conv_encoder: str = "nature_cnn"
    activation_function: str = "ReLU"
    dropout_vis_fc: float = 0.0
    l2_normalize_output: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_activation(self.activation_function)
        trunk = _GRIPPER_TRUNKS[self.conv_encoder](
            self.activation_function, dtype=self.dtype, name="trunk"
        )
        x = trunk(x)
        x = act(Dense(512, dtype=self.dtype, name="fc1")(x))
        x = nn.Dropout(self.dropout_vis_fc)(x, deterministic=deterministic)
        x = Dense(self.visual_features, dtype=self.dtype, name="fc2")(x)
        if self.l2_normalize_output:
            x = _l2_normalize(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")(x)


class VisionConv(nn.Module):
    """Generic conv encoder (reference: vision_network_conv.py): nature trunk
    + FC head without LayerNorm, used for depth streams."""

    visual_features: int = 64
    activation_function: str = "ReLU"
    dropout_vis_fc: float = 0.0
    l2_normalize_output: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_activation(self.activation_function)
        x = NatureCNN(self.activation_function, dtype=self.dtype, name="trunk")(x)
        x = act(Dense(512, dtype=self.dtype, name="fc1")(x))
        x = nn.Dropout(self.dropout_vis_fc)(x, deterministic=deterministic)
        x = Dense(self.visual_features, dtype=self.dtype, name="fc2")(x)
        if self.l2_normalize_output:
            x = _l2_normalize(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")(x)
