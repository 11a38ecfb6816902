"""Real-robot (Franka Panda / robot_io) env wrapper.

Counterpart of the reference's PandaLfpWrapper / aff_lfp_real_world_wrapper
(reference: hulc2/wrappers/panda_lfp_wrapper.py,
hulc2/env_wrappers/aff_lfp_real_world_wrapper.py): adapts a robot_io
PandaEnv to the same observation/action surface the agents and harness
consume, with workspace clipping and relative-action scaling matched to the
TACO preprocessing (hulc2_tpu.tools.preprocess_real_data MAX_REL_*).

robot_io is an optional host dependency — import is deferred so the module is
always importable.
"""
from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence

import numpy as np

from hulc2_tpu.envs.camera import PinholeCamera
from hulc2_tpu.tools.preprocess_real_data import MAX_REL_ORN, MAX_REL_POS

logger = logging.getLogger(__name__)

DEFAULT_WORKSPACE = {
    "low": np.array([0.2, -0.45, 0.02]),
    "high": np.array([0.75, 0.45, 0.7]),
}


class PandaLfpWrapper:
    def __init__(
        self,
        robot=None,
        env=None,
        cameras: Optional[Sequence[PinholeCamera]] = None,
        workspace: Optional[Dict] = None,
        relative_actions: bool = True,
        freq_hz: int = 15,
    ):
        if env is None:
            try:
                from robot_io.envs.robot_env import RobotEnv  # type: ignore

                env = RobotEnv(robot=robot, freq=freq_hz)
            except ImportError as e:
                raise ImportError("robot_io is not installed on this host") from e
        self.env = env
        self.cameras = list(cameras or [])
        self.workspace = workspace or DEFAULT_WORKSPACE
        self.relative_actions = relative_actions

    # ------------------------------------------------------------------ #
    def reset(self, **kwargs):
        return self._obs(self.env.reset(**kwargs))

    def step(self, action):
        if isinstance(action, np.ndarray) and self.relative_actions:
            a = np.asarray(action, np.float64)
            target = {
                "motion": (
                    a[:3] * MAX_REL_POS,
                    a[3:6] * MAX_REL_ORN,
                    1 if a[-1] > 0 else -1,
                ),
                "ref": "rel",
            }
        else:
            pos, orn, grip = action
            pos = np.clip(pos, self.workspace["low"], self.workspace["high"])
            target = {"motion": (pos, orn, grip), "ref": "abs"}
        obs, reward, done, info = self.env.step(target)
        return self._obs(obs), reward, done, info

    def get_obs(self):
        return self._obs(self.env._get_obs())

    def get_info(self) -> Dict:
        obs = self.env._get_obs()
        return {"robot_obs": self._robot_obs(obs), "scene_obs": np.zeros(24)}

    # ------------------------------------------------------------------ #
    def _robot_obs(self, obs) -> np.ndarray:
        rs = obs["robot_state"]
        from hulc2_tpu.tools.preprocess_real_data import build_robot_obs, quat_to_euler_xyz

        orn = np.asarray(rs["tcp_orn"])
        if orn.shape[-1] == 4:
            orn = quat_to_euler_xyz(orn)
        return build_robot_obs(
            np.asarray(rs["tcp_pos"]), orn, rs["gripper_opening_width"],
            np.asarray(rs["joint_positions"]), rs.get("gripper_action", 1.0),
        )

    def _obs(self, obs) -> Dict:
        return {
            "rgb_obs": {k: v for k, v in obs.items() if k.startswith("rgb_")},
            "depth_obs": {k: v for k, v in obs.items() if k.startswith("depth_")},
            "robot_obs": self._robot_obs(obs),
            "scene_obs": np.zeros(24),
        }
