"""Shared setup for the 2-process sharded train-step equivalence test
(tests/test_multihost.py) — imported by BOTH the pytest process (single-
process reference on the virtual 8-device mesh) and the spawned distributed
workers, so every topology builds the identical model, optimizer, transform
and GLOBAL batch from fixed seeds."""
from __future__ import annotations

import numpy as np

TINY = [
    "model.plan_proposal.hidden_size=32",
    "model.plan_recognition.encoder_hidden_size=32",
    "model.plan_recognition.fc_hidden_size=32",
    "model.action_decoder.hidden_size=32",
    "model.visual_goal.hidden_size=32",
    "model.language_goal.hidden_size=32",
    "model.compute_dtype=float32",
    "datamodule.max_window_size=8",
    "datamodule.min_window_size=8",
]

GLOBAL_VIS = 8  # global batch rows per modality (divisible by 8- and 4-device meshes)
GLOBAL_LANG = 8
S = 8
HW = 32


def build_setup():
    import hulc2_tpu.configs  # noqa: F401
    from hulc2_tpu.core import config as cfg_lib
    from hulc2_tpu.data.device_transforms import make_batch_transform
    from hulc2_tpu.data.statistics import DatasetStatistics
    from hulc2_tpu.models.build import build_policy
    from hulc2_tpu.train import optim

    cfg = cfg_lib.compose("cfg_low_level", TINY)
    model = build_policy(cfg["model"])
    tf = make_batch_transform(
        cfg["datamodule"]["observation_space"], cfg["datamodule"]["proprioception_dims"],
        DatasetStatistics(), "rand_shift", True,
    )
    tx = optim.make_optimizer(cfg["model"]["optimizer"], None, 100)

    rng = np.random.RandomState(0)

    def mod(b, with_lang):
        d = {
            "rgb_static": rng.randint(0, 256, (b, S, HW, HW, 3)).astype(np.uint8),
            "rgb_gripper": rng.randint(0, 256, (b, S, HW, HW, 3)).astype(np.uint8),
            "robot_obs_raw": rng.randn(b, S, 15).astype(np.float32),
            "actions": np.clip(rng.randn(b, S, 7), -1, 1).astype(np.float32),
        }
        if with_lang:
            d["lang"] = rng.randn(b, 384).astype(np.float32)
            d["use_for_aux_lang_loss"] = rng.rand(b) > 0.3
        return d

    global_batch = {"vis": mod(GLOBAL_VIS, False), "lang": mod(GLOBAL_LANG, True)}
    return cfg, model, tf, tx, global_batch


def run_one_step(mesh, pid: int, n_proc: int):
    """Build everything, feed this process's shard of the global batch
    through the production prefetch path, run ONE jitted sharded train step.
    Returns (loss, grad_norm) — identical across topologies up to float
    reduction order."""
    import jax
    import jax.numpy as jnp

    from hulc2_tpu.data.loader import DevicePrefetcher, fuse_batch_host
    from hulc2_tpu.parallel import mesh as mesh_lib
    from hulc2_tpu.train.state import create_sharded_train_state
    from hulc2_tpu.train.steps import make_train_step

    cfg, model, tf, tx, global_batch = build_setup()

    def shard_rows(d):
        return {k: v[pid * v.shape[0] // n_proc: (pid + 1) * v.shape[0] // n_proc]
                for k, v in d.items()}

    local = {m: shard_rows(d) for m, d in global_batch.items()}
    pf = DevicePrefetcher(iter([fuse_batch_host(local)]), mesh_lib.batch_sharding(mesh))
    batch = next(iter(pf))

    # params init from the GLOBAL fused shapes + fixed keys -> identical
    # values in every topology
    init_sample = jax.tree_util.tree_map(jnp.asarray, fuse_batch_host(global_batch))

    def init_fn():
        tfd = tf(jax.random.PRNGKey(0), init_sample)
        rngs = {"params": jax.random.PRNGKey(42), "sample": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}
        return model.init(rngs, tfd, 0.01, False, GLOBAL_VIS)

    with mesh:
        state = create_sharded_train_state(init_fn, tx, mesh)
        train_step = make_train_step(
            model, tx, {"vis": tf, "lang": tf}, cfg["loss"]["clip_auxiliary_loss_beta"],
            donate=False,
        )
        state, metrics = train_step(state, batch, jax.random.PRNGKey(7), jnp.asarray(0.01))
    return float(metrics["loss"]), float(metrics["grad_norm"])
