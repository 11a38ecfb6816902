"""Symbolic fake CALVIN env: scene_obs-level dynamics without PyBullet.

Role: the integration-test backend (SURVEY.md §4's "fake/synthetic backend"
gap, extending the reference's RandomDataset idea to the *environment* side).
It maintains a real 24-d scene_obs vector whose geometry is consistent with
``hulc2_tpu.envs.task_oracle.SceneObsTaskOracle``, exposes the calvin_env
wrapper interface (reset / step / get_info / get_obs), and can *execute a
task symbolically* so harness/oracle/agent plumbing is testable end-to-end
without a simulator.
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

from hulc2_tpu.envs import task_oracle as oz
from hulc2_tpu.evaluation.initial_states import (
    BLOCK_SLIDER_LEFT,
    BLOCK_SLIDER_RIGHT,
    BLOCK_TABLE_SLOTS,
    DRAWER_OPEN,
    NEUTRAL_ROBOT_OBS,
    SLIDER_OPEN_LEFT,
)
from hulc2_tpu.evaluation.tasks import COLORS

_DRAWER_POS = np.array([0.15, -0.40, 0.38])


class FakeCalvinEnv:
    def __init__(self, static_hw: int = 200, gripper_hw: int = 84, seed: int = 0,
                 step_delay_s: float = 0.0):
        self.static_hw = static_hw
        self.gripper_hw = gripper_hw
        self.rng = np.random.default_rng(seed)
        self.robot_obs = NEUTRAL_ROBOT_OBS.copy()
        self.scene_obs = np.zeros(24)
        self._held: Optional[str] = None
        # emulated per-step simulator cost (benchmarking farm/pipelining
        # schedules against a PyBullet-like ~10-20 ms step without PyBullet)
        self.step_delay_s = step_delay_s

    @property
    def cameras(self):
        """Synthetic overhead static camera (role of calvin_env's camera
        objects, consumed at reference lmp_agent.py:174-194): looks straight
        down at the playtable so pixel<->world project/deproject round-trips
        are geometrically consistent for the hierarchical agent tests."""
        from hulc2_tpu.envs.camera import PinholeCamera

        hw = self.static_hw
        T = np.eye(4)
        T[:3, :3] = np.diag([1.0, -1.0, -1.0])  # cam +z points world-down
        T[:3, 3] = [0.1, -0.4, 1.6]
        return [PinholeCamera.from_params(hw, hw, fx=hw, fy=hw, cx=hw / 2, cy=hw / 2,
                                          T_world_cam=T, name="static")]

    def get_camera_params(self) -> Dict:
        """Picklable static-camera description (works across RemoteEnv RPC)."""
        return self.cameras[0].to_params()

    # ---- calvin_env-compatible surface --------------------------------- #
    def reset(self, robot_obs=None, scene_obs=None):
        if robot_obs is not None:
            self.robot_obs = np.asarray(robot_obs, np.float64).copy()
        if scene_obs is not None:
            self.scene_obs = np.asarray(scene_obs, np.float64).copy()
        self._held = None
        return self.get_obs()

    def step(self, action):
        if self.step_delay_s:
            time.sleep(self.step_delay_s)
        # physics-free EE integration. Accepts both calvin_env action formats:
        # flat 7-d relative [dpos, dorn, gripper], or the (pos, orn, gripper)
        # absolute tuple emitted by the motion-primitive agents.
        if isinstance(action, (tuple, list)) and len(action) == 3 and np.ndim(action[0]) >= 1:
            pos, orn, grip = action
            self.robot_obs[:3] = np.asarray(pos, np.float64)[:3]
            self.robot_obs[3:6] = np.asarray(orn, np.float64)[:3]
            self.robot_obs[14] = 1.0 if float(np.ravel(grip)[0]) > 0 else -1.0
        else:
            a = np.asarray(action, np.float64).reshape(-1)
            self.robot_obs[:3] += a[:3] * 0.02
            self.robot_obs[3:6] += a[3:6] * 0.05
            self.robot_obs[14] = 1.0 if a[-1] > 0 else -1.0
        return self.get_obs(), 0.0, False, self.get_info()

    def get_info(self) -> Dict:
        return {"scene_obs": self.scene_obs.copy(), "robot_obs": self.robot_obs.copy()}

    def get_obs(self) -> Dict:
        return {
            "rgb_obs": {
                "rgb_static": self.rng.integers(0, 256, (self.static_hw, self.static_hw, 3), np.uint8),
                "rgb_gripper": self.rng.integers(0, 256, (self.gripper_hw, self.gripper_hw, 3), np.uint8),
            },
            "depth_obs": {},
            "robot_obs": self.robot_obs.copy(),
            "scene_obs": self.scene_obs.copy(),
        }

    # ---- symbolic task execution (test oracle-consistent) --------------- #
    def _bslice(self, color: str) -> slice:
        return slice(6 + 6 * COLORS.index(color), 12 + 6 * COLORS.index(color))

    def perform(self, task: str) -> None:
        """Mutate scene_obs as if the robot had completed ``task``."""
        s = self.scene_obs
        parts = task.split("_")
        if task == "move_slider_left":
            s[0] = SLIDER_OPEN_LEFT
        elif task == "move_slider_right":
            s[0] = 0.0
        elif task == "open_drawer":
            s[1] = DRAWER_OPEN
        elif task == "close_drawer":
            s[1] = 0.0
        elif task in ("turn_on_lightbulb", "turn_off_lightbulb"):
            s[4] = 1.0 if task == "turn_on_lightbulb" else 0.0
            s[3] = 0.088 if s[4] else 0.0
        elif task in ("turn_on_led", "turn_off_led"):
            s[5] = 1.0 if task == "turn_on_led" else 0.0
        elif parts[0] == "rotate":
            sl = self._bslice(parts[1])
            s[sl.start + 5] += np.pi / 8 if parts[-1] == "left" else -np.pi / 8
        elif parts[0] == "push" and task != "push_into_drawer":
            sl = self._bslice(parts[1])
            s[sl.start] += 0.05 if parts[-1] == "right" else -0.05
        elif parts[0] == "lift":
            sl = self._bslice(parts[1])
            s[sl.start + 2] += 0.10
            self._held = parts[1]
        elif task == "place_in_slider":
            assert self._held
            sl = self._bslice(self._held)
            target = BLOCK_SLIDER_LEFT if self.scene_obs[0] > SLIDER_OPEN_LEFT / 2 else BLOCK_SLIDER_RIGHT
            s[sl.start : sl.start + 3] = target
            self._held = None
        elif task == "place_in_drawer":
            assert self._held
            sl = self._bslice(self._held)
            s[sl.start : sl.start + 3] = _DRAWER_POS
            self._held = None
        elif task == "push_into_drawer":
            # push the (unique) table block into the open drawer
            for c in COLORS:
                sl = self._bslice(c)
                if oz._on_table(s[sl.start : sl.start + 3]):
                    s[sl.start : sl.start + 3] = _DRAWER_POS
                    break
            else:
                raise RuntimeError("no block on the table")
        elif task == "stack_block":
            assert self._held
            top = self._bslice(self._held)
            for c in COLORS:
                if c == self._held:
                    continue
                bot = self._bslice(c)
                if abs(s[bot.start + 2] - oz.TABLE_Z) < 0.02:
                    s[top.start : top.start + 3] = s[bot.start : bot.start + 3] + np.array([0, 0, 0.05])
                    self._held = None
                    return
            raise RuntimeError("no table block to stack onto")
        elif task == "unstack_block":
            for t in COLORS:
                for b in COLORS:
                    if t == b:
                        continue
                    ts, bs = self._bslice(t), self._bslice(b)
                    if oz._stacked_on(s[ts.start : ts.start + 3], s[bs.start : bs.start + 3]):
                        s[ts.start : ts.start + 3] = BLOCK_TABLE_SLOTS[0] + np.array([0.05, 0.02, 0])
                        return
            raise RuntimeError("nothing stacked")
        else:
            raise KeyError(task)
