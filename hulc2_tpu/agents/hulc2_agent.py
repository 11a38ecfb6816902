"""Hierarchical HULC2 agent: affordance-guided approach + jitted policy.

Counterpart of the reference PlayLMPAgent / AffHULCAgent
(reference: hulc2/agents/lmp_agent.py:26-288, real_world_agent.py:19):

- ``reset(caption)``: optionally query the visuo-lingual affordance model for
  a target pixel + depth, deproject to 3D, and PD-drive near it when the
  predicted pixel is > 15 px from the TCP (lmp_agent.py:195-235); then reset
  the policy carry.
- ``step(obs, goal)``: transform raw env obs on device and run ONE jitted
  policy step (per-env replan cadence handled inside the jit via a
  branchless masked select) — the
  reference's tensor round-trips (lmp_agent.py:253-288) collapse into a
  single dispatch. Works for a batch of N lockstep envs as-is.

The agent is model-state-free on the Python side: policy state lives in a
device-resident PolicyCarry.
"""
from __future__ import annotations

import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hulc2_tpu.agents.base_agent import BaseAgent
from hulc2_tpu.data.device_transforms import make_batch_transform
from hulc2_tpu.data.statistics import DatasetStatistics
from hulc2_tpu.models.hulc2 import Hulc2, PolicyCarry
from hulc2_tpu.train.steps import make_fused_policy_step

logger = logging.getLogger(__name__)

MOVE_THRESHOLD_PX = 15  # approach only when prediction is far (lmp_agent.py:222)


class Hulc2Agent(BaseAgent):
    def __init__(
        self,
        env,
        model: Hulc2,
        params,
        dm_cfg: dict,
        stats: Optional[DatasetStatistics] = None,
        affordance=None,  # optional affordance detector with .predict()
        seed: int = 0,
        n_envs: int = 1,
        fused_step=None,
        target_orn=None,
        offset=(0.0, 0.0, 0.1),
        device_render: Optional[dict] = None,
    ):
        super().__init__(env, target_orn=target_orn, offset=offset)
        self.model = model
        self.params = params
        self.affordance = affordance
        self.n_envs = n_envs
        self._transform = make_batch_transform(
            dm_cfg["observation_space"],
            dm_cfg["proprioception_dims"],
            stats or DatasetStatistics(),
            dm_cfg.get("transforms", "rand_shift"),
            train=False,
        )
        # only the modalities the policy consumes cross host->device — envs
        # also emit e.g. depth_static (the largest tensor, f32) for the
        # host-side affordance deprojection, which must not ride every
        # policy dispatch over a tunneled link
        self._rgb_keys = set(dm_cfg["observation_space"]["rgb_obs"])
        self._depth_keys = set(dm_cfg["observation_space"]["depth_obs"])
        # one jitted program per env step (transform + policy + binarize);
        # shareable across cohort agents so the program compiles once.
        # device_render={"static_hw": H, "gripper_hw": h}: the fake env's
        # frames are rendered INSIDE the program from (scene_obs, robot_obs)
        # — the host ships 39 floats/env instead of rendering + shipping
        # ~30 KiB/env (envs/render_jax.py; the r4 protocol run's measured
        # host floor)
        self.device_render = device_render
        if fused_step is not None:
            self._fused_step = fused_step
        elif device_render:
            from hulc2_tpu.envs.render_jax import make_render_obs_fn
            from hulc2_tpu.train.steps import make_fused_render_policy_step

            render_fn = make_render_obs_fn(
                int(device_render["static_hw"]), int(device_render["gripper_hw"]),
                with_depth="depth_static" in self._depth_keys,
            )
            self._fused_step = make_fused_render_policy_step(
                model, self._transform, render_fn, sorted(self._rgb_keys),
                sorted(self._depth_keys))
        else:
            self._fused_step = make_fused_policy_step(model, self._transform)
        self._key = jax.random.PRNGKey(seed)
        self._step_idx = 0
        self._cam = None  # lazy host-side pinhole camera for the aff path
        self.carry: PolicyCarry = model.init_carry(n_envs)

    def _host_camera(self):
        if self._cam is None:
            from hulc2_tpu.envs.camera import PinholeCamera

            self._cam = PinholeCamera(**self.env.get_camera_params())
        return self._cam

    def reset_env_slot(self, i: int) -> None:
        """Reset one env's slice of the batched carry (fresh plan + hidden;
        step counter 0 so the next step replans). Used by the batched
        evaluator when env i starts a new subtask."""
        c = self.carry
        self.carry = PolicyCarry(
            plan=c.plan.at[i].set(0.0),
            latent_goal=c.latent_goal.at[i].set(0.0),
            hidden=jax.tree_util.tree_map(lambda h: h.at[:, i].set(0.0), c.hidden),
            step=c.step.at[i].set(0),
        )

    # ------------------------------------------------------------------ #
    def reset(self, caption: Optional[str] = None) -> None:
        """New subtask: optionally approach the affordance target, then clear
        the policy carry (plan + decoder hidden state)."""
        if caption is not None and self.affordance is not None:
            target_pos, pred_px = self.get_aff_pred(caption)
            tcp_pos, _, _ = self._robot_state()
            tcp_px = self._host_camera().project(np.array([*tcp_pos, 1.0]))
            if np.linalg.norm(np.asarray(pred_px) - np.asarray(tcp_px)) > MOVE_THRESHOLD_PX:
                self.move_to(target_pos + self.offset, gripper_action=1)
        self.carry = self.model.init_carry(self.n_envs)

    def get_aff_pred(self, caption: str):
        """Affordance target: predicted pixel + depth deprojected to 3D
        (reference: lmp_agent.py:145-194)."""
        obs = self.env.get_obs()
        pred = self.affordance.predict(obs["rgb_obs"]["rgb_static"], caption)
        pixel = pred["pixel"]
        cam = self._host_camera()
        if "depth" in pred:
            target = cam.deproject_single_depth(pixel, pred["depth"])
        else:
            target = cam.deproject(pixel, obs["depth_obs"]["depth_static"])
        return np.asarray(target), np.asarray(pixel)

    # ------------------------------------------------------------------ #
    def _obs_to_device(self, obs: Dict) -> Dict:
        """Raw env obs (single env or a stacked EnvFarm batch) -> (B, 1, ...)
        arrays. ``base_ndim`` is the rank of one env's array — a leading env
        axis is added only when absent."""

        def batch(x, base_ndim):
            a = np.asarray(x)
            if a.ndim == base_ndim:  # unbatched single-env obs
                a = a[None]
            assert a.shape[0] == self.n_envs, (a.shape, self.n_envs)
            return jnp.asarray(a[:, None])  # (B, 1, ...)

        raw = {cam: batch(v, 3) for cam, v in obs["rgb_obs"].items()
               if cam in self._rgb_keys}
        raw.update({cam: batch(v, 2) for cam, v in obs.get("depth_obs", {}).items()
                    if cam in self._depth_keys})
        raw["robot_obs_raw"] = batch(obs["robot_obs"], 1).astype(jnp.float32)
        raw["actions"] = jnp.zeros((self.n_envs, 1, 7), jnp.float32)  # unused by transform consumers
        return raw

    def make_visual_goal(self, goal_obs: Dict) -> Dict:
        """Raw env-style goal observation -> transformed visual-goal dict for
        ``policy_step``'s visual branch (the reference's vis-modality
        rollouts use the goal image of a validation episode,
        rollout.py:318-340). Run once per subtask; the returned dict is
        device-resident and reused every step."""
        raw = self._obs_to_device(goal_obs)
        # validation transform pipeline: deterministic (resize + normalize),
        # the key is consumed only by augmentation ops absent from val presets
        tfd = self._transform(jax.random.PRNGKey(0), raw)
        return {"rgb_obs": tfd["rgb_obs"], "depth_obs": tfd["depth_obs"],
                "robot_obs": tfd["robot_obs"]}

    def step_async(self, obs: Dict, goal: Dict) -> jnp.ndarray:
        """Submit ONE jitted policy dispatch for the current observation(s)
        and return the (async) device action array without blocking. Used by
        the pipelined evaluator to keep several cohorts' dispatches in flight
        while host simulators step."""
        if self.device_render:
            raw = {
                "robot_obs": jnp.asarray(np.asarray(obs["robot_obs"], np.float32)
                                         .reshape(self.n_envs, -1)),
                "scene_obs": jnp.asarray(np.asarray(obs["scene_obs"], np.float32)
                                         .reshape(self.n_envs, -1)),
            }
        else:
            raw = self._obs_to_device(obs)
        if "lang" in goal:
            lang = np.asarray(goal["lang"])  # embeddings (f32) or BPE token ids (int)
            if lang.dtype.kind == "f":
                lang = lang.astype(np.float32)
            if lang.ndim == 1:
                lang = np.broadcast_to(lang[None], (self.n_envs, lang.shape[-1]))
            dev_goal = {"lang": jnp.asarray(lang)}
        else:
            dev_goal = goal
        action, self.carry = self._fused_step(
            self.params, raw, dev_goal, self.carry, self._key, self._step_idx
        )
        self._step_idx += 1
        return action

    def step(self, obs: Dict, goal: Dict) -> np.ndarray:
        """One policy action for the current observation(s). ``goal`` is
        {"lang": embedding (E,) or (B, E)} or a visual goal obs dict."""
        act = np.asarray(self.step_async(obs, goal))  # blocks on the dispatch
        return act[0] if self.n_envs == 1 else act
