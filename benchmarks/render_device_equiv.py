"""Measure in-graph renderer fidelity ON THE REAL BACKEND vs the host NumPy
renderer.

tests/test_render_jax.py proves byte-identical RGB on the CPU XLA client;
the TPU's float32 transcendentals (cos/sin of block/EE yaw) and fused
mul-adds can differ by ulps from host NumPy, so the device-render eval path
(evaluate_policy --device-render) is qualified by THIS measurement on the
chip: fraction of differing uint8 pixels and the max LSB delta over random
scenes. Prints one JSON line.

    python benchmarks/render_device_equiv.py          # default backend (TPU)
"""
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), "runs", "jax_cache"))

import jax
import numpy as np

from hulc2_tpu.envs.fake_env import FakeCalvinEnv
from hulc2_tpu.envs.render_jax import make_render_obs_fn


def main(n: int = 24, static_hw: int = 96, gripper_hw: int = 64, seed: int = 0):
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

    fn = jax.jit(make_render_obs_fn(static_hw, gripper_hw))
    out = jax.tree_util.tree_map(
        np.asarray, fn(np.stack(scenes).astype(np.float32),
                       np.stack(robots).astype(np.float32)))
    result = {"backend": jax.devices()[0].platform, "n_scenes": n}
    for key in ("rgb_static", "rgb_gripper"):
        ref = np.stack([r["rgb_obs"][key] for r in refs])
        diff = np.abs(ref.astype(int) - out[key].astype(int))
        result[f"{key}_mismatch_frac"] = float((diff != 0).mean())
        result[f"{key}_max_lsb"] = int(diff.max())
    dref = np.stack([r["depth_obs"]["depth_static"] for r in refs])
    result["depth_max_abs"] = float(np.abs(dref - out["depth_static"]).max())
    print(json.dumps(result))


if __name__ == "__main__":
    main()
