"""Batched rotation math in pure JAX (jittable, fp32).

Replaces the reference's pytorch3d CUDA dependency
(reference: hulc2/models/decoders/utils/gripper_control.py:4) with ~80 lines of
XLA-friendly math. Conventions match pytorch3d:

- ``euler_angles_to_matrix(e, "XYZ")`` returns ``Rx(e0) @ Ry(e1) @ Rz(e2)``.
- ``matrix_to_euler_angles(R, "XYZ")`` inverts it.

Where pytorch3d can produce NaNs at gimbal-lock boundaries (reference works
around this with a quaternion round-trip, gripper_control.py:51-55), we clamp
the ``asin`` argument instead — strictly more robust and branch-free, which
matters under ``jit``.
"""
from __future__ import annotations

import jax.numpy as jnp


def _rx(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([o, z, z], axis=-1),
            jnp.stack([z, c, -s], axis=-1),
            jnp.stack([z, s, c], axis=-1),
        ],
        axis=-2,
    )


def _ry(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, z, s], axis=-1),
            jnp.stack([z, o, z], axis=-1),
            jnp.stack([-s, z, c], axis=-1),
        ],
        axis=-2,
    )


def _rz(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def euler_angles_to_matrix(euler: jnp.ndarray) -> jnp.ndarray:
    """XYZ (Tait-Bryan) euler angles (..., 3) -> rotation matrices (..., 3, 3).

    Closed form of Rx(a) @ Ry(b) @ Rz(c) — elementwise VPU math only, so fp32
    accuracy is independent of MXU default matmul precision.
    """
    euler = euler.astype(jnp.float32)
    a, b, c = euler[..., 0], euler[..., 1], euler[..., 2]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    row0 = jnp.stack([cb * cc, -cb * sc, sb], axis=-1)
    row1 = jnp.stack([ca * sc + sa * sb * cc, ca * cc - sa * sb * sc, -sa * cb], axis=-1)
    row2 = jnp.stack([sa * sc - ca * sb * cc, sa * cc + ca * sb * sc, ca * cb], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_euler_angles(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> XYZ euler angles (..., 3).

    For R = Rx(a) Ry(b) Rz(c):
        R[0,2] = sin(b); R[1,2] = -sin(a)cos(b); R[2,2] = cos(a)cos(b)
        R[0,1] = -cos(b)sin(c); R[0,0] = cos(b)cos(c)
    """
    m = matrix.astype(jnp.float32)
    b = jnp.arcsin(jnp.clip(m[..., 0, 2], -1.0, 1.0))
    a = jnp.arctan2(-m[..., 1, 2], m[..., 2, 2])
    c = jnp.arctan2(-m[..., 0, 1], m[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> unit quaternions (..., 4) (w, x, y, z).

    Shepperd's method, branch-free: compute all four candidate expressions and
    select the numerically best one (largest denominator) with where-selects.
    """
    m = matrix.astype(jnp.float32)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # candidate 0: w-dominant
    q0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    # candidate 1: x-dominant
    q1 = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    # candidate 2: y-dominant
    q2 = jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21], axis=-1)
    # candidate 3: z-dominant
    q3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11], axis=-1)

    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    mags = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11],
        axis=-1,
    )
    best = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return jnp.where(q[..., :1] < 0, -q, q)


def quaternion_to_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternions (..., 4) (w, x, y, z) -> rotation matrices (..., 3, 3)."""
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def wrap_angle(x: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles to (-pi, pi] the way the reference does with two selects
    (gripper_control.py:30-31): one correction step in each direction."""
    x = jnp.where(x < -jnp.pi, x + 2 * jnp.pi, x)
    return jnp.where(x > jnp.pi, x - 2 * jnp.pi, x)
