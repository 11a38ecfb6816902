"""CALVIN PyBullet env wrapper (host CPU) + batched env farm.

Counterparts of the reference's wrappers
(reference: hulc2/wrappers/hulc2_wrapper.py:16-101,
 hulc2/env_wrappers/play_lmp_wrapper.py:13):

- ``CalvinEnvWrapper`` adapts a calvin_env PlayTableSimEnv: raw dict obs
  (uint8 HWC images + 15-d proprio + 24-d scene), relative-action passthrough
  with gripper binarization, reset from recorded ``state_info``. The
  reference's per-GPU EGL-device selection (hulc2_wrapper.py:30-45) has no
  TPU analogue — rendering stays on host CPU (egl on hosts with GPUs,
  tinyrenderer otherwise).
- ``EnvFarm`` steps N independent env instances in lockstep and stacks their
  observations so ONE jitted policy step serves all of them — the batched-
  inference design that amortizes TPU dispatch latency across environments
  (the <1h/1000-chain eval lever, BASELINE.md).

calvin_env is an optional host dependency; everything degrades to
``FakeCalvinEnv`` for tests.
"""
from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def make_calvin_env(dataset_path=None, show_gui: bool = False, **kwargs):
    """Build a calvin_env PlayTableSimEnv from the dataset's recorded
    rendering config (reference: evaluation/utils.py:218-240)."""
    try:
        from calvin_env.envs.play_table_env import get_env  # type: ignore
    except ImportError as e:
        raise ImportError(
            "calvin_env is not installed on this host — use FakeCalvinEnv for "
            "tests or install the CALVIN simulator for benchmark rollouts"
        ) from e
    return get_env(dataset_path, show_gui=show_gui, **kwargs)


def make_wrapped_calvin_env(dataset_path=None, show_gui: bool = False, **kwargs):
    """Picklable factory: build + wrap a calvin env (for ProcessEnvFarm
    workers, which construct the simulator inside the worker process)."""
    return CalvinEnvWrapper(make_calvin_env(dataset_path, show_gui=show_gui, **kwargs))


class CalvinEnvWrapper:
    """Thin adapter exposing the interface the agents/harness expect."""

    def __init__(self, env, relative_actions: bool = True):
        self.env = env
        self.relative_actions = relative_actions

    @property
    def cameras(self):
        return self.env.cameras

    def get_camera_params(self) -> Dict:
        """Picklable static-camera description for host-side deprojection
        (usable across ProcessEnvFarm workers, unlike the pybullet-handle-
        holding calvin_env camera objects)."""
        from hulc2_tpu.envs.camera import PinholeCamera

        cam = self.env.cameras[0]
        if isinstance(cam, PinholeCamera):
            return cam.to_params()
        return PinholeCamera.from_gl_matrices(
            cam.width, cam.height, cam.projectionMatrix, cam.viewMatrix,
            getattr(cam, "name", "static"),
        ).to_params()

    def reset(self, robot_obs=None, scene_obs=None, state_info: Optional[Dict] = None):
        if state_info is not None:  # reset from a recorded dataset frame
            robot_obs = np.asarray(state_info["robot_obs"])
            scene_obs = np.asarray(state_info["scene_obs"])
        obs = self.env.reset(robot_obs=robot_obs, scene_obs=scene_obs)
        return self._obs(obs)

    def step(self, action):
        if isinstance(action, np.ndarray) and self.relative_actions:
            a = action.astype(np.float64).copy()
            a[-1] = 1.0 if a[-1] > 0 else -1.0
            env_action = {"action": a, "type": "cartesian_rel"}
        elif isinstance(action, (list, tuple)):
            # absolute [pos, orn, gripper] from the PD controller
            env_action = {
                "action": np.concatenate([np.asarray(p).reshape(-1) for p in action]),
                "type": "cartesian_abs",
            }
        else:
            env_action = action
        obs, reward, done, info = self.env.step(env_action)
        return self._obs(obs), reward, done, info

    def get_obs(self):
        return self._obs(self.env.get_obs())

    def get_info(self):
        return self.env.get_info()

    @staticmethod
    def _obs(obs: Dict) -> Dict:
        return {
            "rgb_obs": dict(obs.get("rgb_obs", {})),
            "depth_obs": dict(obs.get("depth_obs", {})),
            "robot_obs": np.asarray(obs["robot_obs"]),
            "scene_obs": np.asarray(obs.get("scene_obs", np.zeros(24))),
        }


class EnvFarm:
    """N lockstep envs -> stacked observations for batched TPU inference."""

    def __init__(self, envs: Sequence):
        self.envs = list(envs)

    def __len__(self):
        return len(self.envs)

    def reset(self, robot_obs=None, scene_obs=None):
        obs = [
            e.reset(
                robot_obs=None if robot_obs is None else robot_obs[i],
                scene_obs=None if scene_obs is None else scene_obs[i],
            )
            for i, e in enumerate(self.envs)
        ]
        return self.stack_obs(obs)

    def step(self, actions: np.ndarray):
        results = [e.step(actions[i]) for i, e in enumerate(self.envs)]
        obs, rewards, dones, infos = zip(*results)
        return self.stack_obs(obs), np.asarray(rewards), np.asarray(dones), list(infos)

    def step_all(self, actions: np.ndarray):
        """Step every env; returns (obs_list, infos). Serial here — the
        multiprocess ``ProcessEnvFarm`` overlaps these on worker processes."""
        results = [e.step(actions[i]) for i, e in enumerate(self.envs)]
        obs, _, _, infos = zip(*results)
        return list(obs), list(infos)

    def get_obs(self):
        return self.stack_obs([e.get_obs() for e in self.envs])

    def get_infos(self) -> List[Dict]:
        return [e.get_info() for e in self.envs]

    @staticmethod
    def stack_obs(obs_list: Sequence[Dict]) -> Dict:
        # image groups are absent in state-only obs (render_obs=False envs —
        # the device-render eval path renders frames in-graph instead)
        out: Dict = {"rgb_obs": {}, "depth_obs": {}}
        for cam in obs_list[0].get("rgb_obs", {}):
            out["rgb_obs"][cam] = np.stack([o["rgb_obs"][cam] for o in obs_list])
        for cam in obs_list[0].get("depth_obs", {}):
            out["depth_obs"][cam] = np.stack([o["depth_obs"][cam] for o in obs_list])
        out["robot_obs"] = np.stack([o["robot_obs"] for o in obs_list])
        out["scene_obs"] = np.stack([o["scene_obs"] for o in obs_list])
        return out
