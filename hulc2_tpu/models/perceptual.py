"""Multi-camera perceptual encoder composition.

TPU-native counterpart of the reference ConcatEncoders
(reference: hulc2/models/perceptual_encoders/concat_encoders.py:10): flattens
(B, S, H, W, C) -> (B*S, ...) so per-camera CNNs see one large batch on the
MXU, encodes each configured modality, concatenates in the fixed order
rgb_static ++ depth_static ++ rgb_gripper ++ depth_gripper ++ tactile ++
proprio, and reshapes back to (B, S, latent).

Encoders are sub-module configs instantiated from the model config's
``perceptual_encoder`` group; each is any flax module mapping (N, H, W, C) ->
(N, features).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp


class ConcatEncoders(nn.Module):
    rgb_static: nn.Module
    rgb_gripper: Optional[nn.Module] = None
    depth_static: Optional[nn.Module] = None
    depth_gripper: Optional[nn.Module] = None
    tactile: Optional[nn.Module] = None
    proprio_dim: int = 0  # identity proprio encoder width (0 = none)

    def _encode(self, enc, imgs, deterministic):
        b, s = imgs.shape[:2]
        flat = imgs.reshape(b * s, *imgs.shape[2:])
        if flat.ndim == 3:  # depth maps (N, H, W) -> (N, H, W, 1)
            flat = flat[..., None]
        out = enc(flat, deterministic=deterministic)
        return out.reshape(b, s, -1)

    @nn.compact
    def __call__(
        self,
        rgb_obs: Dict[str, jnp.ndarray],
        depth_obs: Dict[str, jnp.ndarray],
        robot_obs: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        feats = [self._encode(self.rgb_static, rgb_obs["rgb_static"], deterministic)]
        if self.depth_static is not None:
            feats.append(self._encode(self.depth_static, depth_obs["depth_static"], deterministic))
        if self.rgb_gripper is not None:
            feats.append(self._encode(self.rgb_gripper, rgb_obs["rgb_gripper"], deterministic))
            if self.depth_gripper is not None:
                feats.append(self._encode(self.depth_gripper, depth_obs["depth_gripper"], deterministic))
        if self.tactile is not None:
            feats.append(self._encode(self.tactile, rgb_obs["rgb_tactile"], deterministic))
        if self.proprio_dim > 0:
            feats.append(robot_obs[..., : self.proprio_dim])
        return jnp.concatenate(feats, axis=-1)
