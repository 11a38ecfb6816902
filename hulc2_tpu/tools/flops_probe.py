"""Exact FLOPs/step for the flagship train step via XLA's own cost analysis.

``jax.stages.Lowered.cost_analysis()`` returns ``None`` on both the axon IFRT
backend and the CPU client in this JAX build — only the *compiled* module
exposes ``cost_analysis()['flops']``. Compiling a second copy of the train
step on the TPU backend would cost a multi-minute AOT compile that the jit
cache does not cover (bench.py:180), so this probe compiles the SAME
computation on the CPU backend instead: FLOPs are a property of the program
and its shapes, not of the backend, and the CPU compile of the full-size
step measures ~47 s on this 1-core host. Tracing uses abstract
``ShapeDtypeStruct`` args throughout — no parameters are materialised.

bench.py invokes this in a subprocess (the main process owns the TPU client)
and combines the FLOPs count with the measured device step time into
achieved TFLOP/s and %-of-v5e-peak (VERDICT r2 #5).

Reference role: the upstream repo never reports FLOPs or MFU (BASELINE.md:
"publishes no benchmark numbers"); this is rebuild-only instrumentation.

Usage::

    python -m hulc2_tpu.tools.flops_probe [--batch 32] [--platform cpu]

Prints one JSON line: {"flops": F, "bytes_accessed": B, "compile_s": T,
"batch": b, "window": s}.
"""

from __future__ import annotations

import argparse
import json
import time


def abstract_flagship_args(batch_size: int):
    """(train_step, abstract_args) for the bench configuration.

    Mirrors bench.py's construction exactly — cfg_low_level composite,
    rand_shift transforms, fused {vis,lang} batch layout — but with
    ShapeDtypeStruct leaves so nothing is allocated or initialised.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    import hulc2_tpu.configs  # noqa: F401  (registers config groups)
    from hulc2_tpu.core import config as cfg_lib
    from hulc2_tpu.data.device_transforms import make_batch_transform
    from hulc2_tpu.data.loader import fuse_batch_host
    from hulc2_tpu.data.statistics import DatasetStatistics
    from hulc2_tpu.models.build import build_policy
    from hulc2_tpu.train import optim
    from hulc2_tpu.train.state import create_train_state
    from hulc2_tpu.train.steps import make_train_step

    cfg = cfg_lib.compose("cfg_low_level")
    dm_cfg = cfg["datamodule"]
    model = build_policy(cfg["model"])
    b, s = batch_size, dm_cfg["max_window_size"]

    def mod_np(with_lang):
        d = {
            "rgb_static": np.zeros((b, s, 200, 200, 3), np.uint8),
            "rgb_gripper": np.zeros((b, s, 84, 84, 3), np.uint8),
            "robot_obs_raw": np.zeros((b, s, 15), np.float32),
            "actions": np.zeros((b, s, 7), np.float32),
        }
        if with_lang:
            d["lang"] = np.zeros((b, 384), np.float32)
            d["use_for_aux_lang_loss"] = np.zeros((b,), bool)
        return d

    # fuse_batch_host is a host/numpy function, so run it on real zeros once
    # to learn the fused key layout, then keep only the shapes
    fused = fuse_batch_host({"vis": mod_np(False), "lang": mod_np(True)})
    batch_abs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), fused
    )

    stats = DatasetStatistics()  # identity norm — shapes only
    tf = make_batch_transform(
        dm_cfg["observation_space"], dm_cfg["proprioception_dims"], stats,
        "rand_shift", True,
    )
    tx = optim.make_optimizer(
        cfg["model"]["optimizer"], cfg["model"].get("lr_scheduler"), 100_000
    )

    def init_fn():
        key = jax.random.PRNGKey(0)
        tfd = tf(key, jax.tree_util.tree_map(jnp.asarray, fused))
        return model.init(
            {"params": key, "sample": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            tfd, 0.01, False, b,
        )

    state_abs = jax.eval_shape(lambda: create_train_state(init_fn, tx))
    train_step = make_train_step(
        model, tx, {"vis": tf, "lang": tf},
        cfg["loss"]["clip_auxiliary_loss_beta"],
    )
    key_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)
    kl_abs = jax.ShapeDtypeStruct((), jnp.float32)
    return train_step, (state_abs, batch_abs, key_abs, kl_abs), {"batch": b, "window": s}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--batch", type=int, default=32,
                   help="per-modality batch size (bench uses batch_size_vis)")
    p.add_argument("--platform", default="cpu",
                   help="backend to compile on (cpu: fast, backend-neutral FLOPs)")
    args = p.parse_args(argv)

    import jax

    # the axon plugin ignores the JAX_PLATFORMS env var (skills/verify), so
    # the platform must be forced through jax.config before first backend use
    jax.config.update("jax_platforms", args.platform)

    train_step, abs_args, meta = abstract_flagship_args(args.batch)
    t0 = time.time()
    ca = train_step.lower(*abs_args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    print(json.dumps({
        "flops": float(ca.get("flops", 0.0)),
        "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
        "compile_s": round(time.time() - t0, 1),
        **meta,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
