"""Model-based motion primitive: staged PD drive to a 3D target.

Host-side counterpart of the reference BaseAgent
(reference: hulc2/agents/base_agent.py:106-180,226-258): approach a target in
stages (lift z, retract y, translate xy, descend) where each stage is a PD
position loop (kp=0.08, kd=0.05, <=200 steps, stop when converged or stalled).
This runs against the CPU simulator between policy segments, so it stays pure
NumPy/host code by design.
"""
from __future__ import annotations

import logging
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

KP, KD = 0.08, 0.05
MAX_STAGE_STEPS = 200
CONVERGED_DIST = 0.01
STALLED_DIST = 0.0005
Z_CEILING = 0.7

# neutral downward-pointing gripper orientation used when none is given
DEFAULT_TARGET_ORN = np.array([3.14, 0.0, 1.5])


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
        """Staged approach (reference: base_agent.py:106-147)."""
        tcp_pos, _, curr_grip = self._robot_state()
        target_orn = np.asarray(target_orn) if target_orn is not None else self.target_orn.copy()
        gripper_action = curr_grip if gripper_action is None else gripper_action
        target_pos = np.asarray(target_pos, np.float64)

        lift_z = min(max(tcp_pos[2] + 0.07, target_pos[2]), Z_CEILING)
        stages = [
            np.array([tcp_pos[0], tcp_pos[1], tcp_pos[2] + 0.03]),  # small lift
            np.array([tcp_pos[0], tcp_pos[1] - 0.03, lift_z]),  # retract + rise
            None,  # xy translate at height (filled below)
            target_pos,  # descend to target
        ]
        transition = None
        for i, stage in enumerate(stages):
            if stage is None:
                cur, _, _ = self._robot_state()
                stage = np.array([target_pos[0], target_pos[1], cur[2]])
            transition = self.move_to_pos(stage, target_orn, gripper_action)
        return transition

    def move_to_pos(self, target_pos, target_orn, gripper_action):
        """One PD position loop (reference: base_agent.py:180-224)."""
        curr_pos, curr_orn, _ = self._robot_state()
        last_pos = np.asarray(target_pos, np.float64).copy()
        derivative = np.zeros(3)
        error = target_pos - curr_pos
        transition = (self.env.get_obs(), 0.0, False, self.env.get_info())
        for _ in range(MAX_STAGE_STEPS):
            angle_diff = np.arctan2(np.sin(curr_orn - target_orn), np.cos(curr_orn - target_orn))
            moving = np.linalg.norm(curr_pos - last_pos) > STALLED_DIST
            if np.linalg.norm(error) <= CONVERGED_DIST or not (moving or (angle_diff > 0.01).any()):
                break
            last_pos = curr_pos
            rel = error * KP + derivative * KD
            derivative = error
            transition = self.env.step([curr_pos + rel, target_orn, gripper_action])
            curr_pos, curr_orn, _ = self._robot_state()
            error = target_pos - curr_pos
        return transition
