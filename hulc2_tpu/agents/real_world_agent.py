"""Real-world hierarchical agent.

Counterpart of the reference AffHULCAgent
(reference: hulc2/agents/real_world_agent.py:19): the Hulc2Agent with a
calibrated static camera (``T_world_cam`` extrinsics) for affordance
deprojection and a clipped workspace for the model-based approach phase.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from hulc2_tpu.agents.hulc2_agent import Hulc2Agent
from hulc2_tpu.envs.camera import PinholeCamera
from hulc2_tpu.envs.panda_wrapper import DEFAULT_WORKSPACE


class RealWorldAgent(Hulc2Agent):
    def __init__(self, *args, static_camera: Optional[PinholeCamera] = None,
                 workspace: Optional[Dict] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.static_camera = static_camera
        self.workspace = workspace or DEFAULT_WORKSPACE

    def _host_camera(self):
        """Every camera use (threshold projection in ``reset`` included) goes
        through the calibrated static camera when one was supplied — the real
        PandaLfpWrapper has no ``get_camera_params()``."""
        if self.static_camera is not None:
            return self.static_camera
        return super()._host_camera()

    def get_aff_pred(self, caption: str):
        """Deproject with the calibrated camera instead of the sim camera."""
        obs = self.env.get_obs()
        pred = self.affordance.predict(obs["rgb_obs"]["rgb_static"], caption)
        cam = self._host_camera()
        if "depth" in pred:
            target = cam.deproject_single_depth(pred["pixel"], pred["depth"])
        else:
            target = cam.deproject(pred["pixel"], obs["depth_obs"]["depth_static"])
        target = np.clip(target, self.workspace["low"], self.workspace["high"])
        return np.asarray(target), np.asarray(pred["pixel"])

    def move_to(self, target_pos, target_orn=None, gripper_action=None):
        target_pos = np.clip(np.asarray(target_pos), self.workspace["low"], self.workspace["high"])
        return super().move_to(target_pos, target_orn, gripper_action)
