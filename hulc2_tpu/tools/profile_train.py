"""Training-step profiler: capture an XLA/TPU trace for TensorBoard.

First-class tracing (SURVEY.md §5 — the reference only has a timeit
decorator, hulc2/utils/utils.py:21): runs warmup + N profiled train steps on
synthetic data under ``jax.profiler.trace`` and reports per-step wall time.

    python -m hulc2_tpu.tools.profile_train --steps 10 --trace-dir /tmp/trace
    tensorboard --logdir /tmp/trace   # -> Profile tab
"""
from __future__ import annotations

import argparse
import logging
import time

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--trace-dir", default="/tmp/hulc2_trace")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    import hulc2_tpu.configs  # noqa: F401
    from hulc2_tpu.core import config as cfg_lib
    from hulc2_tpu.data.device_transforms import make_batch_transform
    from hulc2_tpu.data.statistics import DatasetStatistics
    from hulc2_tpu.models.build import build_policy
    from hulc2_tpu.train import optim
    from hulc2_tpu.train.state import create_train_state
    from hulc2_tpu.train.steps import make_train_step

    cfg = cfg_lib.compose("cfg_low_level", args.overrides)
    dm_cfg = cfg["datamodule"]
    model = build_policy(cfg["model"])
    b, s = args.batch, dm_cfg["max_window_size"]
    rng = np.random.RandomState(0)

    def raw_mod(with_lang):
        d = {
            "rgb_static": rng.randint(0, 256, (b, s, 200, 200, 3)).astype(np.uint8),
            "rgb_gripper": rng.randint(0, 256, (b, s, 84, 84, 3)).astype(np.uint8),
            "robot_obs_raw": rng.randn(b, s, 15).astype(np.float32),
            "actions": np.concatenate(
                [np.clip(rng.randn(b, s, 6) * 0.3, -1, 1), np.sign(rng.randn(b, s, 1))], -1
            ).astype(np.float32),
        }
        if with_lang:
            d["lang"] = rng.randn(b, 384).astype(np.float32)
            d["use_for_aux_lang_loss"] = rng.rand(b) > 0.3
        return d

    # host-prefused [vis; lang] batch like the production prefetch path —
    # profiling the modality-dict path adds an in-jit u8 concat + relayout
    # (~1.2 ms/step of 'data formatting') that production never pays
    from hulc2_tpu.data.loader import fuse_batch_host

    raw = jax.tree_util.tree_map(
        jnp.asarray, fuse_batch_host({"vis": raw_mod(False), "lang": raw_mod(True)})
    )
    tf = make_batch_transform(dm_cfg["observation_space"], dm_cfg["proprioception_dims"],
                              DatasetStatistics(), dm_cfg.get("transforms", "rand_shift"), True)
    tx = optim.make_optimizer(cfg["model"]["optimizer"], None, 100_000)

    def init_fn():
        key = jax.random.PRNGKey(0)
        # pre-fused flat batch -> the model's fused calling convention
        # (transform handles flat dicts; n_vis recovers the [vis; lang] split)
        return model.init(
            {"params": key, "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
            tf(key, raw), 0.01, False, b,
        )

    state = create_train_state(init_fn, tx)
    step = make_train_step(model, tx, {"vis": tf, "lang": tf}, cfg["loss"]["clip_auxiliary_loss_beta"])
    key = jax.random.PRNGKey(0)
    klb = jnp.asarray(0.01)
    for _ in range(args.warmup):
        state, m = step(state, raw, key, klb)
    float(m["loss"])

    logger.info("tracing %d steps -> %s", args.steps, args.trace_dir)
    with jax.profiler.trace(args.trace_dir):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, raw, key, klb)
        float(m["loss"])
        dt = time.perf_counter() - t0
    logger.info("%.1f ms/step over %d profiled steps", dt / args.steps * 1000, args.steps)
    logger.info("open with: tensorboard --logdir %s", args.trace_dir)


if __name__ == "__main__":
    main()
