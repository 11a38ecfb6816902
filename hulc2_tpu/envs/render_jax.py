"""In-graph (JAX) scene renderer: observations as a pure XLA function of state.

TPU-first re-design of the eval observation path. The host NumPy renderer
(``envs/render.py``) is the measured hot loop of the 1000-chain protocol —
~8 ms of every ~8.4 ms env step on the 1-core harness (r4 run: 3 h 05 m at
44 env-steps/s, render-bound; VERDICT r4 next #2). But the fake env's frames
are a *pure function* of ``(scene_obs, robot_obs)`` — 39 floats — so instead
of rendering K envs' images on one host core and shipping ~K·30 KiB to the
device every step, the evaluator ships K·39 floats and renders ALL K envs
inside the same jitted program that runs the policy step: one dispatch does
render → preprocess → policy. The host keeps only the symbolic dynamics
(~0.4 ms/env) and the oracle checks.

The math mirrors ``render.py`` op-for-op in float32 (same ray grid with
+0.5 pixel centers, same slab test with the 1e-12 guard, the same
first-hit-wins tie-break via first-occurrence argmin, same Lambert shading
and uint8 quantization), so rendered frames match the NumPy renderer — which
produced the policy's *training* frames — to the uint8 LSB on ~all pixels
(equivalence-tested with measured mismatch bounds in
tests/test_render_jax.py; bit-exactness is impossible in-graph because the
host path rounds some intermediates through float64).

The box list construction replicates ``render.scene_boxes`` exactly,
including list order (ties resolve identically). The one data-dependent
*count* — the drawer cavity floor appears only when the drawer is open —
becomes a branchless hidden box (teleported far below the floor when closed)
so the program keeps static shapes.

Reference counterpart: calvin_env's PyBullet/EGL renderer, consumed at
hulc2/wrappers/hulc2_wrapper.py:47 — a host/GPU renderer next to the policy;
here the renderer IS part of the policy's XLA program.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hulc2_tpu.envs import scene_layout as L
from hulc2_tpu.envs.render import _LIGHT, _ray_grid
from hulc2_tpu.evaluation.tasks import COLORS

# box-list layout (must mirror render.scene_boxes order):
#   0 table, 1 shelf, 2 wall, 3 button base, 4 led, 5 lever track, 6 bulb,
#   7 door, 8 door handle, 9 drawer panel, 10 drawer handle, 11 cavity floor
#   (hidden when closed), 12 lever, 13..15 blocks, 16 finger-, 17 finger+,
#   18 wrist
N_BOXES = 13 + len(COLORS) + 3
_HIDDEN_Z = -10.0  # parked far below the floor: the slab test can never hit


class CameraSpec(NamedTuple):
    """Static per-camera data for the in-graph raycast. ``dirs`` are world-
    frame ray directions with camera-z component 1 (depth == hit parameter),
    computed by the SAME host code as the NumPy renderer (same f32 grid)."""

    dirs: np.ndarray        # (H, W, 3) float32
    t0: np.ndarray          # (3,) float32 — origin; gripper cam adds the TCP


def camera_spec(camera) -> CameraSpec:
    T = camera.T_world_cam.astype(np.float32)
    dirs = _ray_grid(camera) @ T[:3, :3].T.astype(np.float32)
    return CameraSpec(dirs=np.asarray(dirs, np.float32),
                      t0=np.asarray(T[:3, 3], np.float32))


def build_boxes(scene_obs: jnp.ndarray, robot_obs: jnp.ndarray):
    """(24,), (15,) -> (centers (N,3), halves (N,3), colors (N,3), yaws (N,)).

    Literal translation of ``render.scene_boxes`` (same order, same
    constants); state-independent entries become XLA constants after jit.
    """
    s = scene_obs.astype(jnp.float32)
    r = robot_obs.astype(jnp.float32)
    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731

    centers, halves, colors, yaws = [], [], [], []

    def add(c, h, col, yaw=0.0):
        centers.append(jnp.asarray(c, jnp.float32))
        halves.append(f32(h))
        colors.append(jnp.asarray(col, jnp.float32))
        yaws.append(jnp.asarray(yaw, jnp.float32))

    # ---- static fixtures (indices 0-6) ---------------------------------- #
    add([0.0, (L.TABLE_Y[0] + L.TABLE_Y[1]) / 2, L.TABLE_Z - 0.015],
        [L.TABLE_X_HALF, (L.TABLE_Y[1] - L.TABLE_Y[0]) / 2, 0.015], L.COLOR_TABLE)
    add([0.0, (L.SHELF_Y_MIN + L.TABLE_Y[1]) / 2, L.SHELF_Z - 0.012],
        [L.TABLE_X_HALF, (L.TABLE_Y[1] - L.SHELF_Y_MIN) / 2, 0.012], L.COLOR_SHELF)
    add([0.0, L.TABLE_Y[1] - 0.01, 0.55], [L.TABLE_X_HALF, 0.01, 0.10],
        L.COLOR_SHELF * 0.8)
    add(L.BUTTON_POS - [0, 0, L.BUTTON_HALF[2]], L.BUTTON_HALF, L.COLOR_BUTTON)
    led = jnp.where(s[5] >= 0.5, f32(L.COLOR_LED_ON), f32(L.COLOR_LED_OFF))
    add(f32(L.BUTTON_POS + [0, 0, L.LED_HALF[2] - 0.002]), L.LED_HALF, led)
    add([L.SWITCH_X, L.SWITCH_Y + 0.01, (L.SWITCH_Z0 + 0.60) / 2],
        [0.006, 0.006, 0.07], L.COLOR_SWITCH * 1.5)
    bulb = jnp.where(s[4] >= 0.5, f32(L.COLOR_BULB_ON), f32(L.COLOR_BULB_OFF))
    add(L.LIGHTBULB_POS, L.LIGHTBULB_HALF, bulb)

    # ---- per-frame geometry (indices 7-18) ------------------------------ #
    door_x = L.DOOR_X0 + s[0]
    add(jnp.stack([door_x, f32(L.DOOR_Y), f32(L.DOOR_Z)]), L.DOOR_HALF, L.COLOR_DOOR)
    add(jnp.stack([door_x + L.HANDLE_OFFSET_X, f32(L.DOOR_Y), f32(L.HANDLE_Z)]),
        L.HANDLE_HALF, L.COLOR_HANDLE)

    fy = L.DRAWER_FRONT_Y0 - s[1]
    add(jnp.stack([f32(L.DRAWER_X), fy, f32(L.DRAWER_PANEL_Z)]),
        L.DRAWER_PANEL_HALF, L.COLOR_DRAWER)
    add(jnp.stack([f32(L.DRAWER_X), fy - 0.02, f32(L.DRAWER_HANDLE_Z)]),
        L.DRAWER_HANDLE_HALF, L.COLOR_HANDLE)
    # cavity floor: geometry exists only when open — branchless hidden box
    cav_z = jnp.where(s[1] > 0.02, f32(L.DRAWER_FLOOR_Z - 0.005), f32(_HIDDEN_Z))
    add(jnp.stack([f32(L.DRAWER_X), fy + L.DRAWER_DEPTH / 2, cav_z]),
        [L.DRAWER_X_HALF - 0.01, L.DRAWER_DEPTH / 2, 0.005], L.COLOR_DRAWER * 0.7)

    add(jnp.stack([f32(L.SWITCH_X), f32(L.SWITCH_Y), L.SWITCH_Z0 + s[3]]),
        L.SWITCH_HALF, L.COLOR_SWITCH)

    for i, c in enumerate(COLORS):
        b = s[6 + 6 * i: 12 + 6 * i]
        add(jnp.stack([b[0], b[1], b[2] + 0.012]), L.BLOCK_HALF,
            L.BLOCK_COLORS[c], yaw=b[5])

    ee = r[:3]
    gap = jnp.where(r[14] < 0, f32(L.EE_FINGER_GAP_CLOSED), f32(L.EE_FINGER_GAP_OPEN))
    yaw = r[5]
    fx, fy_ = jnp.cos(yaw) * gap / 2, jnp.sin(yaw) * gap / 2
    fz = L.EE_FINGER_HALF[2] - 0.01
    add(jnp.stack([ee[0] - fx, ee[1] - fy_, ee[2] + fz]), L.EE_FINGER_HALF,
        L.COLOR_EE, yaw=yaw)
    add(jnp.stack([ee[0] + fx, ee[1] + fy_, ee[2] + fz]), L.EE_FINGER_HALF,
        L.COLOR_EE, yaw=yaw)
    add(jnp.stack([ee[0], ee[1], ee[2] + L.EE_WRIST_LIFT]), L.EE_WRIST_HALF,
        L.COLOR_EE * 1.8)

    return (jnp.stack(centers), jnp.stack(halves), jnp.stack(colors),
            jnp.stack(yaws))


_LIGHT32 = _LIGHT.astype(np.float32)
_BG32 = L.COLOR_BG.astype(np.float32)


def raycast(dirs: jnp.ndarray, t0: jnp.ndarray, centers, halves, colors,
            yaws) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab-test every pixel ray against every box; Lambert-shade the nearest
    hit. dirs (H, W, 3) f32 world rays (camera-z component 1), t0 (3,) f32
    origin -> (rgb uint8 (H, W, 3), depth f32 (H, W))."""
    o = t0[None, :] - centers                                   # (N, 3)
    cy, sy = jnp.cos(-yaws), jnp.sin(-yaws)                     # (N,)
    o_r = jnp.stack([cy * o[:, 0] - sy * o[:, 1],
                     sy * o[:, 0] + cy * o[:, 1], o[:, 2]], -1)  # (N, 3)
    d = dirs[None]                                              # (1, H, W, 3)
    cyb, syb = cy[:, None, None], sy[:, None, None]
    d_r = jnp.stack([cyb * d[..., 0] - syb * d[..., 1],
                     syb * d[..., 0] + cyb * d[..., 1],
                     jnp.broadcast_to(d[..., 2], (centers.shape[0],) + dirs.shape[:2])],
                    -1)                                          # (N, H, W, 3)
    safe = jnp.where(jnp.abs(d_r) < 1e-12, jnp.float32(1e-12), d_r)
    orr = o_r[:, None, None, :]
    hf = halves[:, None, None, :]
    ta = (-hf - orr) / safe
    tb = (hf - orr) / safe
    lo = jnp.minimum(ta, tb)
    hi = jnp.maximum(ta, tb)
    tmin = lo.max(-1)                                            # (N, H, W)
    tmax = hi.min(-1)
    valid = (tmax >= tmin) & (tmin > 1e-6)
    t = jnp.where(valid, tmin, jnp.inf)
    # first-occurrence argmin == the NumPy loop's strict '<' update order
    best = jnp.argmin(t, 0)                                      # (H, W)
    hit = jnp.take_along_axis(valid, best[None], 0)[0]
    bt = jnp.take_along_axis(t, best[None], 0)[0]
    lo_b = jnp.take_along_axis(lo, best[None, ..., None], 0)[0]  # (H, W, 3)
    axis = lo_b.argmax(-1)                                       # (H, W)
    d_b = jnp.take_along_axis(d_r, best[None, ..., None], 0)[0]  # (H, W, 3)
    d_ax = jnp.take_along_axis(d_b, axis[..., None], -1)[..., 0]
    sign = jnp.where(d_ax > 0, -1.0, 1.0).astype(jnp.float32)

    # normal along the hit slab axis, rotated to world by the box yaw
    nb = jax.nn.one_hot(axis, 3, dtype=jnp.float32) * sign[..., None]
    yb = yaws[best]
    cb, sb = jnp.cos(yb), jnp.sin(yb)
    nx = cb * nb[..., 0] - sb * nb[..., 1]
    ny = sb * nb[..., 0] + cb * nb[..., 1]
    lam = jnp.clip(nx * _LIGHT32[0] + ny * _LIGHT32[1] + nb[..., 2] * _LIGHT32[2],
                   0, 1)
    shade = (0.55 + 0.45 * lam).astype(jnp.float32)

    rgb = jnp.where(hit[..., None], colors[best] * shade[..., None],
                    jnp.asarray(_BG32))
    depth = jnp.where(hit, bt, 0.0).astype(jnp.float32)
    rgb8 = jnp.clip(rgb * 255.0, 0, 255).astype(jnp.uint8)
    return rgb8, depth


def make_render_obs_fn(static_hw: int, gripper_hw: int, with_depth: bool = True):
    """Batched in-graph observation renderer.

    fn(scene_obs (K, 24), robot_obs (K, 15)) ->
        {"rgb_static": (K, H, W, 3) u8, "rgb_gripper": (K, h, w, 3) u8
         [, "depth_static": (K, H, W) f32]}

    Camera models are taken from ``FakeCalvinEnv`` at the given resolutions
    (the wrist box is excluded from the gripper view, like the host path).
    """
    from hulc2_tpu.envs.fake_env import FakeCalvinEnv

    env = FakeCalvinEnv(static_hw=static_hw, gripper_hw=gripper_hw)
    static = camera_spec(env.cameras[0])
    grip_cam = env._gripper_camera()
    grip = camera_spec(grip_cam)  # t0 here is robot-dependent; use offset only
    grip_offset = np.asarray([0.0, 0.0, 0.16], np.float32)

    static_dirs = jnp.asarray(static.dirs)
    static_t0 = jnp.asarray(static.t0)
    grip_dirs = jnp.asarray(grip.dirs)

    def one_env(scene_obs, robot_obs):
        c, h, col, y = build_boxes(scene_obs, robot_obs)
        rgb_s, depth_s = raycast(static_dirs, static_t0, c, h, col, y)
        t0g = robot_obs[:3].astype(jnp.float32) + grip_offset
        rgb_g, _ = raycast(grip_dirs, t0g, c[:-1], h[:-1], col[:-1], y[:-1])
        out = {"rgb_static": rgb_s, "rgb_gripper": rgb_g}
        if with_depth:
            out["depth_static"] = depth_s
        return out

    def batched(scene_obs: jnp.ndarray, robot_obs: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return jax.vmap(one_env)(jnp.asarray(scene_obs), jnp.asarray(robot_obs))

    return batched
