"""In-graph (JAX) renderer equivalence vs the host NumPy renderer.

The device-render eval path (evaluate_policy --device-render) replaces the
host raycast — which produced the policy's TRAINING frames — with
envs/render_jax.py inside the policy's jitted program, so frames must match
the NumPy renderer: uint8-identical RGB on (at least) ~all pixels and depth
within float32 noise. Reference counterpart of the surface: calvin_env's
renderer consumed at hulc2/wrappers/hulc2_wrapper.py:47.
"""
import jax
import numpy as np
import pytest

from hulc2_tpu.envs.fake_env import FakeCalvinEnv
from hulc2_tpu.envs.render_jax import make_render_obs_fn


def random_states(n, seed=0, static_hw=96, gripper_hw=64):
    rng = np.random.default_rng(seed)
    env = FakeCalvinEnv(static_hw=static_hw, gripper_hw=gripper_hw, seed=0)
    scenes, robots, refs = [], [], []
    for _ in range(n):
        env.reset()
        env.scene_obs[0] = rng.uniform(0, 0.28)
        env.scene_obs[1] = rng.uniform(0, 0.22)
        env.scene_obs[3] = rng.uniform(0, 0.09)
        env.scene_obs[4] = rng.integers(2)
        env.scene_obs[5] = rng.integers(2)
        for i in range(3):
            env.scene_obs[6 + 6 * i: 9 + 6 * i] = [
                rng.uniform(-0.3, 0.3), rng.uniform(-0.25, 0.2),
                rng.uniform(0.37, 0.55)]
            env.scene_obs[11 + 6 * i] = rng.uniform(-3, 3)
        env.robot_obs[:3] = [rng.uniform(-0.3, 0.3), rng.uniform(-0.4, 0.1),
                             rng.uniform(0.45, 0.7)]
        env.robot_obs[5] = rng.uniform(-2, 2)
        env.robot_obs[14] = rng.choice([-1.0, 1.0])
        scenes.append(env.scene_obs.copy())
        robots.append(env.robot_obs.copy())
        refs.append(env.get_obs())
    return (np.stack(scenes).astype(np.float32),
            np.stack(robots).astype(np.float32), refs)


class TestRenderJaxEquivalence:
    @pytest.mark.parametrize("hw", [(96, 64), (64, 48)])
    def test_rgb_matches_numpy_renderer(self, hw):
        scenes, robots, refs = random_states(6, seed=1, static_hw=hw[0],
                                             gripper_hw=hw[1])
        fn = jax.jit(make_render_obs_fn(*hw))
        out = jax.tree_util.tree_map(np.asarray, fn(scenes, robots))
        for key in ("rgb_static", "rgb_gripper"):
            ref = np.stack([r["rgb_obs"][key] for r in refs])
            diff = np.abs(ref.astype(int) - out[key].astype(int))
            # f32-graph vs host f64-intermediate rounding: allow a tiny
            # fraction of 1-LSB flips (measured 0 on the CPU backend)
            assert (diff > 1).mean() == 0.0, key
            assert (diff != 0).mean() < 1e-4, (key, (diff != 0).mean())

    def test_depth_matches(self):
        scenes, robots, refs = random_states(6, seed=2)
        fn = jax.jit(make_render_obs_fn(96, 64))
        out = jax.tree_util.tree_map(np.asarray, fn(scenes, robots))
        ref = np.stack([r["depth_obs"]["depth_static"] for r in refs])
        assert np.abs(ref - out["depth_static"]).max() < 1e-5

    def test_drawer_cavity_toggles(self):
        """The conditional cavity-floor box must appear exactly when the host
        renderer draws it (s[1] > 0.02) despite the static box count."""
        env = FakeCalvinEnv(static_hw=96, gripper_hw=64, seed=0)
        fn = jax.jit(make_render_obs_fn(96, 64))
        for s1 in (0.0, 0.01, 0.05, 0.22):
            env.reset()
            env.scene_obs[1] = s1
            ref = env.get_obs()["rgb_obs"]["rgb_static"]
            out = np.asarray(fn(env.scene_obs[None].astype(np.float32),
                                env.robot_obs[None].astype(np.float32))["rgb_static"][0])
            diff = np.abs(ref.astype(int) - out.astype(int))
            assert (diff > 1).mean() == 0.0 and (diff != 0).mean() < 1e-4, s1

    def test_no_depth_variant(self):
        scenes, robots, _ = random_states(2, seed=3)
        out = make_render_obs_fn(96, 64, with_depth=False)(scenes, robots)
        assert "depth_static" not in out


class TestStateOnlyObs:
    def test_render_obs_false_returns_state_only(self):
        env = FakeCalvinEnv(static_hw=96, gripper_hw=64, render_obs=False)
        obs = env.reset()
        assert "rgb_obs" not in obs and "depth_obs" not in obs
        assert obs["robot_obs"].shape == (15,) and obs["scene_obs"].shape == (24,)
        obs2, _, _, info = env.step(np.zeros(7))
        assert "rgb_obs" not in obs2 and "scene_obs" in info

    def test_stack_obs_tolerates_state_only(self):
        from hulc2_tpu.envs.calvin_wrapper import EnvFarm

        envs = [FakeCalvinEnv(static_hw=96, gripper_hw=64, render_obs=False, seed=i)
                for i in range(3)]
        farm = EnvFarm(envs)
        stacked = farm.reset()
        assert stacked["robot_obs"].shape == (3, 15)
        assert stacked["rgb_obs"] == {} and stacked["depth_obs"] == {}
