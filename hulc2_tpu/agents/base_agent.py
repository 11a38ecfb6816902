"""Model-based motion primitive: staged PD drive to a 3D target.

Host-side counterpart of the reference BaseAgent
(reference: hulc2/agents/base_agent.py:106-180,226-258): approach a target in
stages (lift z, retract y, translate xy, descend) where each stage is a PD
position loop (kp=0.08, kd=0.05, <=200 steps, stop when converged or stalled).
This runs against the CPU simulator between policy segments, so it stays pure
NumPy/host code by design. The staged-PD state machine itself lives in
``hulc2_tpu.agents.approach.ApproachController`` so the batched evaluator can
run the same controller one lockstep round at a time.
"""
from __future__ import annotations

import logging
from typing import Optional, Sequence

import numpy as np

from hulc2_tpu.agents.approach import (
    ApproachController,
    CONVERGED_DIST,
    DEFAULT_TARGET_ORN,
    KD,
    KP,
    MAX_STAGE_STEPS,
    STALLED_DIST,
    Z_CEILING,
)

logger = logging.getLogger(__name__)

__all__ = [
    "BaseAgent",
    "ApproachController",
    "KP", "KD", "MAX_STAGE_STEPS", "CONVERGED_DIST", "STALLED_DIST",
    "Z_CEILING", "DEFAULT_TARGET_ORN",
]


class BaseAgent:
    def __init__(self, env, target_orn: Optional[Sequence[float]] = None, offset=(0.0, 0.0, 0.1)):
        self.env = env
        self.target_orn = np.asarray(target_orn if target_orn is not None else DEFAULT_TARGET_ORN)
        self.offset = np.asarray(offset)

    # ------------------------------------------------------------------ #
    def _robot_state(self):
        info = self.env.get_info()
        r = info.get("robot_info", {})
        tcp_pos = np.asarray(r.get("tcp_pos", info["robot_obs"][:3]))
        tcp_orn = np.asarray(r.get("tcp_orn", info["robot_obs"][3:6]))
        gripper = float(r.get("gripper_action", info["robot_obs"][-1]))
        return tcp_pos, tcp_orn, gripper

    def move_to(self, target_pos, target_orn=None, gripper_action=None):
        """Blocking staged approach (reference: base_agent.py:106-147):
        drive the incremental controller until it reports done."""
        tcp_pos, tcp_orn, curr_grip = self._robot_state()
        controller = ApproachController(
            tcp_pos,
            target_pos,
            target_orn if target_orn is not None else self.target_orn.copy(),
            curr_grip if gripper_action is None else gripper_action,
        )
        transition = (self.env.get_obs(), 0.0, False, self.env.get_info())
        while True:
            action = controller.action(tcp_pos, tcp_orn)
            if action is None:
                return transition
            transition = self.env.step(action)
            tcp_pos, tcp_orn, _ = self._robot_state()

    def move_to_pos(self, target_pos, target_orn, gripper_action):
        """One PD position loop (reference: base_agent.py:180-224)."""
        tcp_pos, tcp_orn, _ = self._robot_state()
        controller = ApproachController.single_stage(tcp_pos, target_pos, target_orn, gripper_action)
        transition = (self.env.get_obs(), 0.0, False, self.env.get_info())
        while True:
            action = controller.action(tcp_pos, tcp_orn)
            if action is None:
                return transition
            transition = self.env.step(action)
            tcp_pos, tcp_orn, _ = self._robot_state()
