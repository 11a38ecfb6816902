"""The optimized renderer must be BYTE-IDENTICAL to the straightforward form.

The r4 expert datasets were rendered by the pre-optimization renderer; the
policy's eval observations must stay in that exact distribution, so the
static-prefix raycast cache and the subset-argmax slab bookkeeping
(envs/render.py) are only admissible if they change nothing at all.

``_ref_render`` / ``_ref_scene_boxes`` below are a frozen copy of the
renderer as committed before the optimization (git 2ab685b), including its
original box ordering — the test therefore also proves the static-first
reordering of ``scene_boxes`` flips no exact-tie pixel on any sampled state.
"""
import numpy as np
import pytest

from hulc2_tpu.envs import scene_layout as L
from hulc2_tpu.envs.fake_env import FakeCalvinEnv
from hulc2_tpu.evaluation.tasks import COLORS

_LIGHT = np.array([0.35, -0.45, 0.82])
_LIGHT = _LIGHT / np.linalg.norm(_LIGHT)

_CORNER_SIGNS = np.array([[sx, sy_, sz] for sx in (-1, 1) for sy_ in (-1, 1)
                          for sz in (-1, 1)], np.float32)


class _RefBox:
    __slots__ = ("center", "half", "color", "yaw")

    def __init__(self, center, half, color, yaw: float = 0.0):
        self.center = np.asarray(center, np.float64)
        self.half = np.asarray(half, np.float64)
        self.color = np.asarray(color, np.float64)
        self.yaw = float(yaw)


def _ref_scene_boxes(scene_obs, robot_obs):
    """Frozen copy: pre-optimization box list (original ordering)."""
    s = np.asarray(scene_obs, np.float64)
    r = np.asarray(robot_obs, np.float64)
    boxes = []
    boxes.append(_RefBox([0.0, (L.TABLE_Y[0] + L.TABLE_Y[1]) / 2, L.TABLE_Z - 0.015],
                         [L.TABLE_X_HALF, (L.TABLE_Y[1] - L.TABLE_Y[0]) / 2, 0.015],
                         L.COLOR_TABLE))
    boxes.append(_RefBox([0.0, (L.SHELF_Y_MIN + L.TABLE_Y[1]) / 2, L.SHELF_Z - 0.012],
                         [L.TABLE_X_HALF, (L.TABLE_Y[1] - L.SHELF_Y_MIN) / 2, 0.012],
                         L.COLOR_SHELF))
    boxes.append(_RefBox([0.0, L.TABLE_Y[1] - 0.01, 0.55],
                         [L.TABLE_X_HALF, 0.01, 0.10], L.COLOR_SHELF * 0.8))
    door_x = L.slider_door_x(s[0])
    boxes.append(_RefBox([door_x, L.DOOR_Y, L.DOOR_Z], L.DOOR_HALF, L.COLOR_DOOR))
    boxes.append(_RefBox(L.slider_handle_pos(s[0]), L.HANDLE_HALF, L.COLOR_HANDLE))
    fy = L.drawer_front_y(s[1])
    boxes.append(_RefBox([L.DRAWER_X, fy, L.DRAWER_PANEL_Z], L.DRAWER_PANEL_HALF,
                         L.COLOR_DRAWER))
    boxes.append(_RefBox(L.drawer_handle_pos(s[1]), L.DRAWER_HANDLE_HALF,
                         L.COLOR_HANDLE))
    if s[1] > 0.02:
        boxes.append(_RefBox([L.DRAWER_X, fy + L.DRAWER_DEPTH / 2,
                              L.DRAWER_FLOOR_Z - 0.005],
                             [L.DRAWER_X_HALF - 0.01, L.DRAWER_DEPTH / 2, 0.005],
                             L.COLOR_DRAWER * 0.7))
    boxes.append(_RefBox(L.BUTTON_POS - [0, 0, L.BUTTON_HALF[2]], L.BUTTON_HALF,
                         L.COLOR_BUTTON))
    led = L.COLOR_LED_ON if s[5] >= 0.5 else L.COLOR_LED_OFF
    boxes.append(_RefBox(L.BUTTON_POS + [0, 0, L.LED_HALF[2] - 0.002], L.LED_HALF, led))
    boxes.append(_RefBox(L.switch_lever_pos(s[3]), L.SWITCH_HALF, L.COLOR_SWITCH))
    boxes.append(_RefBox([L.SWITCH_X, L.SWITCH_Y + 0.01, (L.SWITCH_Z0 + 0.60) / 2],
                         [0.006, 0.006, 0.07], L.COLOR_SWITCH * 1.5))
    bulb = L.COLOR_BULB_ON if s[4] >= 0.5 else L.COLOR_BULB_OFF
    boxes.append(_RefBox(L.LIGHTBULB_POS, L.LIGHTBULB_HALF, bulb))
    for i, c in enumerate(COLORS):
        b = s[6 + 6 * i : 12 + 6 * i]
        boxes.append(_RefBox([b[0], b[1], b[2] + 0.012], L.BLOCK_HALF,
                             L.BLOCK_COLORS[c], yaw=b[5]))
    ee = r[:3]
    gap = L.EE_FINGER_GAP_CLOSED if r[14] < 0 else L.EE_FINGER_GAP_OPEN
    yaw = r[5]
    fx, fy_ = np.cos(yaw) * gap / 2, np.sin(yaw) * gap / 2
    fz = L.EE_FINGER_HALF[2] - 0.01
    boxes.append(_RefBox([ee[0] - fx, ee[1] - fy_, ee[2] + fz], L.EE_FINGER_HALF,
                         L.COLOR_EE, yaw=yaw))
    boxes.append(_RefBox([ee[0] + fx, ee[1] + fy_, ee[2] + fz], L.EE_FINGER_HALF,
                         L.COLOR_EE, yaw=yaw))
    boxes.append(_RefBox([ee[0], ee[1], ee[2] + L.EE_WRIST_LIFT], L.EE_WRIST_HALF,
                         L.COLOR_EE * 1.8))
    return boxes


def _ref_ray_grid(camera):
    K = camera.K
    u = ((np.arange(camera.width) + 0.5 - K[0, 2]) / K[0, 0]).astype(np.float32)
    v = ((np.arange(camera.height) + 0.5 - K[1, 2]) / K[1, 1]).astype(np.float32)
    uu, vv = np.meshgrid(u, v)
    return np.stack([uu, vv, np.ones_like(uu)], -1)


def _ref_render(camera, boxes):
    """Frozen copy of the pre-optimization render loop (no cache, full-rect
    argmax + take_along_axis)."""
    H, W = camera.height, camera.width
    K = camera.K.astype(np.float32)
    T = camera.T_world_cam.astype(np.float32)
    Tcw = camera.T_cam_world.astype(np.float32)
    R, t0 = T[:3, :3], T[:3, 3]
    dirs = _ref_ray_grid(camera) @ R.T

    best_t = np.full((H, W), np.inf, np.float32)
    best_i = np.full((H, W), -1, np.int16)
    best_axis = np.zeros((H, W), np.int8)
    best_sign = np.zeros((H, W), np.int8)

    for i, b in enumerate(boxes):
        if b.yaw:
            cyw, syw = np.cos(b.yaw), np.sin(b.yaw)
            Rz = np.array([[cyw, -syw, 0], [syw, cyw, 0], [0, 0, 1]], np.float32)
            corners = b.center.astype(np.float32) + (_CORNER_SIGNS * b.half.astype(np.float32)) @ Rz.T
        else:
            corners = b.center.astype(np.float32) + _CORNER_SIGNS * b.half.astype(np.float32)
        pc = corners @ Tcw[:3, :3].T + Tcw[:3, 3]
        if np.any(pc[:, 2] <= 1e-4):
            u0, u1, v0, v1 = 0, W, 0, H
        else:
            uv = (pc[:, :2] * np.array([K[0, 0], K[1, 1]])) / pc[:, 2:3] + K[:2, 2]
            u0 = max(int(np.floor(uv[:, 0].min())), 0)
            u1 = min(int(np.ceil(uv[:, 0].max())) + 1, W)
            v0 = max(int(np.floor(uv[:, 1].min())), 0)
            v1 = min(int(np.ceil(uv[:, 1].max())) + 1, H)
            if u0 >= u1 or v0 >= v1:
                continue
        o = (t0 - b.center).astype(np.float32)
        d = dirs[v0:v1, u0:u1]
        if b.yaw:
            cy, sy = np.float32(np.cos(-b.yaw)), np.float32(np.sin(-b.yaw))
            o = np.array([cy * o[0] - sy * o[1], sy * o[0] + cy * o[1], o[2]], np.float32)
            d = np.stack([cy * d[..., 0] - sy * d[..., 1],
                          sy * d[..., 0] + cy * d[..., 1], d[..., 2]], -1)
        half = b.half.astype(np.float32)
        safe = np.where(np.abs(d) < 1e-12, np.float32(1e-12), d)
        ta = (-half - o) / safe
        tb = (half - o) / safe
        lo = np.minimum(ta, tb)
        hi = np.maximum(ta, tb)
        ax = lo.argmax(-1)
        tmin = np.take_along_axis(lo, ax[..., None], -1)[..., 0]
        tmax = hi.min(-1)
        sub_t = best_t[v0:v1, u0:u1]
        upd = (tmax >= tmin) & (tmin > 1e-6) & (tmin < sub_t)
        if not upd.any():
            continue
        sub_t[upd] = tmin[upd]
        best_i[v0:v1, u0:u1][upd] = i
        best_axis[v0:v1, u0:u1][upd] = ax[upd]
        d_ax = np.take_along_axis(d, ax[..., None], -1)[..., 0]
        best_sign[v0:v1, u0:u1][upd] = np.where(d_ax[upd] > 0, -1, 1)

    hit = best_i >= 0
    colors = np.stack([b.color for b in boxes]).astype(np.float32)
    yaws = np.array([b.yaw for b in boxes], np.float32)
    idx = np.where(hit, best_i, 0)
    nb = np.zeros((H, W, 3), np.float32)
    np.put_along_axis(nb, best_axis[..., None].astype(np.int64),
                      best_sign[..., None].astype(np.float32), -1)
    yb = yaws[idx]
    cb, sb = np.cos(yb), np.sin(yb)
    nx = cb * nb[..., 0] - sb * nb[..., 1]
    ny = sb * nb[..., 0] + cb * nb[..., 1]
    lam = np.clip(nx * _LIGHT[0] + ny * _LIGHT[1] + nb[..., 2] * _LIGHT[2], 0, 1)
    shade = (0.55 + 0.45 * lam).astype(np.float32)
    rgb = np.where(hit[..., None], colors[idx] * shade[..., None],
                   L.COLOR_BG.astype(np.float32))
    depth = np.where(hit, best_t, 0.0).astype(np.float32)
    rgb8 = np.clip(rgb * 255.0, 0, 255).astype(np.uint8)
    return rgb8, depth


def _random_state(rng):
    env = FakeCalvinEnv(seed=int(rng.integers(1 << 30)))
    env.reset()
    s = env.scene_obs
    s[0] = rng.uniform(0, L.SLIDER_RANGE if hasattr(L, "SLIDER_RANGE") else 0.28)
    s[1] = rng.uniform(0, 0.16)          # incl. >0.02: cavity floor present
    s[3] = rng.uniform(0, 0.09)
    s[4] = float(rng.integers(2))
    s[5] = float(rng.integers(2))
    for i in range(len(COLORS)):
        base = 6 + 6 * i
        s[base + 0] = rng.uniform(-0.3, 0.3)
        s[base + 1] = rng.uniform(-0.2, 0.1)
        s[base + 2] = rng.uniform(0.46, 0.58)
        s[base + 5] = rng.uniform(-np.pi, np.pi)
    r = env.robot_obs
    r[0] = rng.uniform(-0.3, 0.3)
    r[1] = rng.uniform(-0.2, 0.1)
    r[2] = rng.uniform(0.48, 0.7)
    r[5] = rng.uniform(-np.pi, np.pi)
    r[14] = 1.0 if rng.integers(2) else -1.0
    return env


@pytest.mark.parametrize("seed", [0, 1])
def test_optimized_render_byte_identical(seed):
    rng = np.random.default_rng(seed)
    for trial in range(12):
        env = _random_state(rng)
        obs = env.get_obs()                    # optimized path (cache warm on
        obs2 = env.get_obs()                   # the 2nd call — must not drift)
        ref_boxes = _ref_scene_boxes(env.scene_obs, env.robot_obs)
        ref_rgb_s, ref_d_s = _ref_render(env.cameras[0], ref_boxes)
        ref_rgb_g, _ = _ref_render(env._gripper_camera(), ref_boxes[:-1])
        for o in (obs, obs2):
            np.testing.assert_array_equal(o["rgb_obs"]["rgb_static"], ref_rgb_s)
            np.testing.assert_array_equal(o["depth_obs"]["depth_static"], ref_d_s)
            np.testing.assert_array_equal(o["rgb_obs"]["rgb_gripper"], ref_rgb_g)


def test_static_cache_respects_led_and_bulb_colors():
    """LED/bulb geometry is in the cached prefix but their COLORS are per
    frame — toggling them must change the pixels even on a cache hit."""
    env = FakeCalvinEnv(seed=3)
    env.reset()
    env.scene_obs[5] = 0.0
    off = env.get_obs()["rgb_obs"]["rgb_static"]
    env.scene_obs[5] = 1.0
    on = env.get_obs()["rgb_obs"]["rgb_static"]
    assert (off != on).any()
    ref_boxes = _ref_scene_boxes(env.scene_obs, env.robot_obs)
    ref_on, _ = _ref_render(env.cameras[0], ref_boxes)
    np.testing.assert_array_equal(on, ref_on)
