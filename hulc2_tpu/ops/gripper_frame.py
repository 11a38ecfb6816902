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
import numpy as np

from hulc2_tpu.ops.rotations import euler_angles_to_matrix, matrix_to_euler_angles, wrap_angle

_ORN_SCALE = 0.01  # downscale euler actions to pseudo-infinitesimal rotations

# Numeric sanitizer (reference: gripper_control.py:35,62 NaN asserts +
# quaternion fallback :51-55). The fallback is unnecessary here — the
# asin argument is clamped in ops.rotations, which is branch-free and
# strictly more robust — but bad (non-finite) *inputs* should still fail
# loudly. Enabled by the trainer's --debug-nans flag; off by default so the
# hot path carries zero overhead (trace-time branch).
_CHECK_FINITE = False


def enable_finite_checks(on: bool = True) -> None:
    """Insert host-side finite assertions into the TCP-frame math (works
    under jit via jax.debug.callback). Call before tracing."""
    global _CHECK_FINITE
    _CHECK_FINITE = on


def _maybe_check_finite(x: jnp.ndarray, name: str) -> None:
    if not _CHECK_FINITE:
        return

    def _assert(v, _name=name):
        if not np.isfinite(v).all():
            raise FloatingPointError(
                f"non-finite values in {_name} (TCP frame math) — bad euler/"
                "proprio inputs; see reference gripper_control.py:35"
            )

    jax.debug.callback(_assert, x)


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
    _maybe_check_finite(action, "world_to_tcp_frame action")
    _maybe_check_finite(orn_world, "world_to_tcp_frame robot_obs orientation")
    world_T_tcp = euler_angles_to_matrix(orn_world)
    tcp_T_world = _mT(world_T_tcp)
    pos_tcp_rel = (_matmul(tcp_T_world, action[..., :3][..., None]))[..., 0]

    orn_w_rel = action[..., 3:6] * _ORN_SCALE
    world_T_tcp_new = euler_angles_to_matrix(orn_world + orn_w_rel)
    tcp_new_T_tcp_old = _matmul(_mT(world_T_tcp_new), world_T_tcp)
    orn_tcp_rel = wrap_angle(matrix_to_euler_angles(tcp_new_T_tcp_old)) / _ORN_SCALE
    out = jnp.concatenate([pos_tcp_rel, orn_tcp_rel, action[..., -1:]], axis=-1)
    _maybe_check_finite(out, "world_to_tcp_frame output")
    return out


def tcp_to_world_frame(action: jnp.ndarray, robot_obs: jnp.ndarray) -> jnp.ndarray:
    """Convert relative TCP-frame actions (..., 7) back to the world frame."""
    action = action.astype(jnp.float32)
    orn_world = robot_obs[..., 3:6].astype(jnp.float32)
    _maybe_check_finite(action, "tcp_to_world_frame action")
    _maybe_check_finite(orn_world, "tcp_to_world_frame robot_obs orientation")
    world_T_tcp = euler_angles_to_matrix(orn_world)
    pos_w_rel = (_matmul(world_T_tcp, action[..., :3][..., None]))[..., 0]

    orn_tcp_rel = action[..., 3:6] * _ORN_SCALE
    tcp_new_T_tcp_old = euler_angles_to_matrix(orn_tcp_rel)
    world_T_tcp_new = _matmul(world_T_tcp, _mT(tcp_new_T_tcp_old))
    orn_w_new = matrix_to_euler_angles(world_T_tcp_new)
    orn_w_rel = wrap_angle(orn_w_new - orn_world) / _ORN_SCALE
    out = jnp.concatenate([pos_w_rel, orn_w_rel, action[..., -1:]], axis=-1)
    _maybe_check_finite(out, "tcp_to_world_frame output")
    return out
