"""Mock of calvin_env.envs.tasks.Tasks — the upstream task oracle contract.

Upstream shape (as consumed by the reference):
- constructed by hydra from conf/callbacks/rollout/tasks/new_playtable_tasks.yaml
  as ``Tasks(tasks)`` where ``tasks`` maps task name -> [method, *args]
  (reference: evaluation/evaluation.py:152-153, evaluate_policy_singlestep.py:18-19)
- ``get_task_info_for_set(start_info, end_info, task_filter)`` -> set of
  completed task names (reference: manager_aff_lmp.py:68, rollout.py:351)
- ``get_task_info(start_info, end_info)`` -> all completed tasks
  (reference: automatic_lang_annotator_mp.py:287-300)
- info dicts are ``env.get_info()`` outputs carrying ``scene_info`` with
  ``doors`` (current_state), ``lights`` (logical_state) and
  ``movable_objects`` (current_pos / current_orn).

The completion predicates here are simplified kinematic checks; the upstream
versions additionally verify contacts. Signatures and dict shapes are the pin.
"""
from __future__ import annotations

import numpy as np


def _yaw(quat_xyzw) -> float:
    x, y, z, w = quat_xyzw
    return float(np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z)))


class Tasks:
    def __init__(self, tasks):
        self.tasks = dict(tasks)
        self.task_to_id = {name: i for i, name in enumerate(self.tasks)}
        self.id_to_task = {i: name for name, i in self.task_to_id.items()}

    @property
    def num_tasks(self) -> int:
        return len(self.tasks)

    # ------------------------------------------------------------------ #
    def get_task_info(self, start_info, end_info):
        return {t for t in self.tasks if self._check(t, start_info, end_info)}

    def get_task_info_for_set(self, start_info, end_info, task_filter):
        return {
            t for t in task_filter
            if t in self.tasks and self._check(t, start_info, end_info)
        }

    # ------------------------------------------------------------------ #
    def _check(self, name, start_info, end_info) -> bool:
        method, *args = self.tasks[name]
        s, e = start_info["scene_info"], end_info["scene_info"]
        if method == "move_door_rel":
            joint, threshold = args[0], float(args[1])
            delta = e["doors"][joint]["current_state"] - s["doors"][joint]["current_state"]
            return delta >= threshold if threshold > 0 else delta <= threshold
        if method == "toggle_light":
            light, initial, final = args[0], int(args[1]), int(args[2])
            return (s["lights"][light]["logical_state"] == initial
                    and e["lights"][light]["logical_state"] == final)
        if method == "lift_object":
            obj, z_diff = args[0], float(args[1])
            dz = (e["movable_objects"][obj]["current_pos"][2]
                  - s["movable_objects"][obj]["current_pos"][2])
            return dz >= z_diff
        if method == "push_object":
            obj, dx = args[0], float(args[1])
            moved = (e["movable_objects"][obj]["current_pos"][0]
                     - s["movable_objects"][obj]["current_pos"][0])
            return moved >= dx if dx > 0 else moved <= dx
        if method == "rotate_object":
            obj, degrees = args[0], float(args[1])
            dyaw = np.degrees(_yaw(e["movable_objects"][obj]["current_orn"])
                              - _yaw(s["movable_objects"][obj]["current_orn"]))
            dyaw = (dyaw + 180) % 360 - 180
            return dyaw >= degrees if degrees > 0 else dyaw <= degrees
        return False
