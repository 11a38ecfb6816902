"""Mock of calvin_env.envs.play_table_env — PlayTableSimEnv + get_env contract.

Upstream shape (as consumed by the reference and by hulc2_tpu's real branch):
- ``get_env(dataset_path, obs_space=None, show_gui=True, scene=None,
  camera_conf=None, **kwargs)`` builds the env from the dataset's recorded
  ``.hydra/merged_config.yaml`` render config
  (reference: hulc2/evaluation/utils.py:218-240; import path used at
  hulc2/wrappers/hulc2_wrapper.py:9).
- ``env.reset(robot_obs=None, scene_obs=None)`` restores a recorded state
  (reference: rollout usage via hulc2_tpu CalvinEnvWrapper.reset).
- ``env.step(action)`` takes ``{"action": vec, "type": "cartesian_rel" |
  "cartesian_abs"}`` and returns (obs, reward, done, info).
- ``env.get_obs()`` returns {"rgb_obs": {"rgb_static", "rgb_gripper"},
  "depth_obs": {"depth_static"}, "robot_obs": (15,), "scene_obs": (24,)}.
- ``env.get_info()`` returns {"scene_info": {...}, "robot_info": {...}} (the
  oracle's input; shapes in envs/tasks.py here).
- ``env.cameras`` is a list whose entries carry ``width``, ``height``,
  ``projectionMatrix``, ``viewMatrix`` (OpenGL column-major 16-lists, as
  pybullet produces) and ``name``.

Dynamics are a kinematic toy (relative cartesian actions integrate the TCP,
scene state only changes through reset); the API surface is the contract.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

_OBJECTS = ("block_red", "block_blue", "block_pink")


def _euler_z_to_quat(yaw: float):
    return [0.0, 0.0, float(np.sin(yaw / 2)), float(np.cos(yaw / 2))]


class MockCamera:
    """Static pinhole camera exposing pybullet-style GL matrices."""

    def __init__(self, name="static", width=200, height=200, fov_deg=75.0):
        self.name = name
        self.width, self.height = width, height
        f = 1.0 / np.tan(np.radians(fov_deg) / 2)
        near, far = 0.01, 10.0
        P = np.array([
            [f, 0, 0, 0],
            [0, f, 0, 0],
            [0, 0, (far + near) / (near - far), 2 * far * near / (near - far)],
            [0, 0, -1, 0],
        ])
        # camera 1.2m above the table origin, looking straight down -z
        V = np.eye(4)
        V[2, 3] = -1.2
        # pybullet convention: column-major flattened float lists
        self.projectionMatrix = P.flatten(order="F").tolist()
        self.viewMatrix = V.flatten(order="F").tolist()

    def render(self):
        rgb = np.zeros((self.height, self.width, 3), np.uint8)
        depth = np.full((self.height, self.width), 1.2, np.float32)
        return rgb, depth


class PlayTableSimEnv:
    def __init__(self, cameras=None, show_gui=False, use_vr=False, use_scene_info=True):
        self.show_gui = show_gui
        self.use_scene_info = use_scene_info
        self.cameras = cameras or [MockCamera("static"), MockCamera("gripper", 84, 84)]
        self._robot_obs = np.zeros(15)
        self._scene_obs = np.zeros(24)
        self._t = 0

    # -- state ---------------------------------------------------------- #
    def reset(self, robot_obs=None, scene_obs=None):
        if robot_obs is not None:
            self._robot_obs = np.asarray(robot_obs, np.float64).copy()
        if scene_obs is not None:
            self._scene_obs = np.asarray(scene_obs, np.float64).copy()
        self._t = 0
        return self.get_obs()

    def step(self, action):
        if not (isinstance(action, dict) and {"action", "type"} <= set(action)):
            raise TypeError(f"calvin_env action contract violated: {action!r}")
        vec = np.asarray(action["action"], np.float64)
        if action["type"] == "cartesian_rel":
            self._robot_obs[:6] += 0.02 * vec[:6]
            self._robot_obs[6] = 1.0 if vec[-1] > 0 else -1.0
        elif action["type"] == "cartesian_abs":
            self._robot_obs[:3] = vec[:3]
            self._robot_obs[3:6] = vec[3:6]
            self._robot_obs[6] = 1.0 if vec[-1] > 0 else -1.0
        else:
            raise ValueError(f"unknown action type {action['type']}")
        self._t += 1
        return self.get_obs(), 0.0, False, self.get_info()

    # -- observation/info ------------------------------------------------ #
    def get_obs(self):
        cams = {c.name: c.render() for c in self.cameras}
        rgb = {f"rgb_{n}": im for n, (im, _) in cams.items()}
        depth = {f"depth_{n}": d for n, (_, d) in cams.items()}
        return {
            "rgb_obs": rgb,
            "depth_obs": depth,
            "robot_obs": self._robot_obs.copy(),
            "scene_obs": self._scene_obs.copy(),
        }

    def get_info(self):
        s = self._scene_obs
        scene_info = {
            "doors": {
                "base__slide": {"current_state": float(s[0])},
                "base__drawer": {"current_state": float(s[1])},
            },
            "buttons": {"base__button": {"joint_state": float(s[2])}},
            "switches": {"base__switch": {"joint_state": float(s[3])}},
            "lights": {
                "lightbulb": {"logical_state": int(s[4] > 0.5)},
                "led": {"logical_state": int(s[5] > 0.5)},
            },
            "movable_objects": {
                name: {
                    "current_pos": s[6 + 6 * i: 9 + 6 * i].tolist(),
                    "current_orn": _euler_z_to_quat(s[11 + 6 * i]),
                    "contacts": [],
                }
                for i, name in enumerate(_OBJECTS)
            },
        }
        robot_info = {
            "tcp_pos": self._robot_obs[:3].tolist(),
            "tcp_orn": self._robot_obs[3:6].tolist(),
            "gripper_opening_width": float(self._robot_obs[6]),
        }
        return {"scene_info": scene_info, "robot_info": robot_info}


def get_env(dataset_path, obs_space=None, show_gui=True, scene=None,
            camera_conf=None, **kwargs):
    """Upstream builds the env by hydra-instantiating the dataset's recorded
    render config; the mock pins the argument list and the merged_config.yaml
    requirement (reference: evaluation/utils.py:218-240)."""
    render_conf = Path(dataset_path) / ".hydra" / "merged_config.yaml"
    if not render_conf.is_file():
        raise FileNotFoundError(
            f"dataset render config missing: {render_conf} "
            "(calvin datasets record it at recording time)"
        )
    return PlayTableSimEnv(show_gui=show_gui, use_scene_info=True)
