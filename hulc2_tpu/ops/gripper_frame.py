"""World <-> TCP (tool-center-point) frame conversion of relative actions.

Pure-JAX, fp32, jittable equivalent of the reference's pytorch3d-based
``world_to_tcp_frame`` / ``tcp_to_world_frame``
(reference: hulc2/models/decoders/utils/gripper_control.py:16,39).

Actions are 7-d: [rel_pos(3), rel_orn_euler(3) * 100 (pseudo-infinitesimal
scaling), gripper(1)]. ``robot_obs`` carries the unnormalized proprioceptive
state whose dims 3:6 are the TCP orientation in world frame (XYZ euler).

Rotation-matrix inverses are taken as transposes (exact for rotations; the
reference calls ``torch.inverse``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from hulc2_tpu.ops.rotations import euler_angles_to_matrix, matrix_to_euler_angles, wrap_angle

_ORN_SCALE = 0.01  # downscale euler actions to pseudo-infinitesimal rotations


def _mT(m):
    return jnp.swapaxes(m, -1, -2)


def _matmul(a, b):
    """3x3 batched matmul at HIGHEST precision — rotation chains are
    numerically sensitive and negligible FLOPs, so never let them drop to the
    MXU's default reduced precision."""
    return jnp.einsum("...ij,...jk->...ik", a, b, precision=jax.lax.Precision.HIGHEST)


def world_to_tcp_frame(action: jnp.ndarray, robot_obs: jnp.ndarray) -> jnp.ndarray:
    """Convert relative world-frame actions (..., 7) to the TCP frame."""
    action = action.astype(jnp.float32)
    orn_world = robot_obs[..., 3:6].astype(jnp.float32)
    world_T_tcp = euler_angles_to_matrix(orn_world)
    tcp_T_world = _mT(world_T_tcp)
    pos_tcp_rel = (_matmul(tcp_T_world, action[..., :3][..., None]))[..., 0]

    orn_w_rel = action[..., 3:6] * _ORN_SCALE
    world_T_tcp_new = euler_angles_to_matrix(orn_world + orn_w_rel)
    tcp_new_T_tcp_old = _matmul(_mT(world_T_tcp_new), world_T_tcp)
    orn_tcp_rel = wrap_angle(matrix_to_euler_angles(tcp_new_T_tcp_old)) / _ORN_SCALE
    return jnp.concatenate([pos_tcp_rel, orn_tcp_rel, action[..., -1:]], axis=-1)


def tcp_to_world_frame(action: jnp.ndarray, robot_obs: jnp.ndarray) -> jnp.ndarray:
    """Convert relative TCP-frame actions (..., 7) back to the world frame."""
    action = action.astype(jnp.float32)
    orn_world = robot_obs[..., 3:6].astype(jnp.float32)
    world_T_tcp = euler_angles_to_matrix(orn_world)
    pos_w_rel = (_matmul(world_T_tcp, action[..., :3][..., None]))[..., 0]

    orn_tcp_rel = action[..., 3:6] * _ORN_SCALE
    tcp_new_T_tcp_old = euler_angles_to_matrix(orn_tcp_rel)
    world_T_tcp_new = _matmul(world_T_tcp, _mT(tcp_new_T_tcp_old))
    orn_w_new = matrix_to_euler_angles(world_T_tcp_new)
    orn_w_rel = wrap_angle(orn_w_new - orn_world) / _ORN_SCALE
    return jnp.concatenate([pos_w_rel, orn_w_rel, action[..., -1:]], axis=-1)
