"""The trainer loop: epochs, validation, checkpoints, auto-resume, callbacks.

Replaces the Lightning Trainer + DDPStrategy + callback zoo
(reference: hulc2/training.py:31-82): an explicit loop around the jitted
steps, with

- auto-resume from the newest checkpoint in the run dir (training.py:41-49)
- KL-beta annealing fed as a traced scalar per epoch (kl_callbacks.py)
- preemption-signal checkpointing (the slurm-timeout-resubmit contract,
  sbatch_lfp.sh:20-27): SIGTERM/SIGUSR1 triggers a save at the next step edge
- per-epoch orbax checkpoints (save_top_k: -1 semantics)
- callback hooks (on_epoch_end) for rollout eval / t-SNE / custom logic
"""
from __future__ import annotations

import logging
import signal
import time
from pathlib import Path
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hulc2_tpu.core import prng
from hulc2_tpu.core.checkpoint import CheckpointManager, save_run_config
from hulc2_tpu.core.metrics import MetricsLogger, get_git_commit_hash, print_system_env_info
from hulc2_tpu.data import device_transforms as dt
from hulc2_tpu.models.build import build_policy
from hulc2_tpu.parallel import mesh as mesh_lib
from hulc2_tpu.train import optim
from hulc2_tpu.train.kl_schedule import make_kl_schedule
from hulc2_tpu.train.state import TrainState, create_sharded_train_state
from hulc2_tpu.train.steps import make_train_step, make_val_step

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(self, cfg: dict, datamodule, run_dir, callbacks: Optional[List] = None):
        self.cfg = cfg
        self.dm = datamodule
        self.run_dir = Path(run_dir)
        self.callbacks = callbacks or []
        self.mesh = mesh_lib.make_mesh()
        self.model = build_policy(cfg["model"])
        self.kl_schedule = make_kl_schedule(cfg.get("callbacks", {}).get("kl_schedule") or {"kind": "constant", "kl_beta": cfg["loss"]["kl_beta"]})
        self._stop = False
        self._preempted = False

    # ------------------------------------------------------------------ #
    def _build_transforms(self, train: bool):
        dm_cfg = self.cfg["datamodule"]
        stats = self.dm.stats["training" if train else "validation"]
        name = dm_cfg.get("transforms", "rand_shift")
        tf = dt.make_batch_transform(
            dm_cfg["observation_space"], dm_cfg["proprioception_dims"], stats, name, train
        )
        return {"vis": tf, "lang": tf}

    def _init_state(self, steps_per_epoch: int) -> tuple:
        cfg = self.cfg
        self._estimated_total = steps_per_epoch * cfg["training"]["max_epochs"]
        tx = optim.make_optimizer(
            cfg["model"]["optimizer"],
            cfg["model"].get("lr_scheduler"),
            estimated_total=self._estimated_total,
        )
        sample_batch = self._sample_device_batch()

        def init_fn():
            rngs = {
                "params": jax.random.PRNGKey(cfg["training"].get("seed", 42)),
                "sample": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1),
            }
            return self.model.init(rngs, sample_batch)

        state = create_sharded_train_state(init_fn, tx, self.mesh)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))
        logger.info("model parameters: %.2fM", n_params / 1e6)
        return state, tx

    def _sample_device_batch(self):
        """One tiny transformed batch for shape-complete initialization."""
        raw = next(iter(self.dm.train_iter()))
        tfs = self._build_transforms(train=True)
        key = jax.random.PRNGKey(0)
        return {
            m: tfs[m](key, jax.tree_util.tree_map(jnp.asarray, raw[m])) for m in raw
        }

    # ------------------------------------------------------------------ #
    def _install_signal_handlers(self):
        def handler(signum, frame):
            logger.warning("received signal %s — checkpoint at next step edge", signum)
            self._preempted = True

        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                signal.signal(sig, handler)
            except (ValueError, OSError):
                pass  # not main thread

    # ------------------------------------------------------------------ #
    def fit(self, max_epochs: Optional[int] = None, max_steps: Optional[int] = None) -> TrainState:
        cfg = self.cfg
        is_main = mesh_lib.process_index() == 0
        save_run_config(self.run_dir, cfg)
        mlog = MetricsLogger(self.run_dir, use_wandb=cfg.get("logger") == "wandb",
                             use_tb=cfg.get("logger") == "tb", is_main=is_main)
        logger.info("git commit: %s", get_git_commit_hash(Path(__file__).parent))
        print_system_env_info()
        self._install_signal_handlers()

        steps_per_epoch = self.dm.steps_per_epoch()
        state, tx = self._init_state(steps_per_epoch)
        ckpt = CheckpointManager(self.run_dir, save_top_k=cfg.get("callbacks", {}).get("checkpoint", {}).get("save_top_k", -1))

        # ---- auto-resume ----
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
            logger.info("auto-resumed from step %d", int(state.step))

        transforms = self._build_transforms(train=True)
        train_step = make_train_step(
            self.model, tx, transforms, cfg["loss"]["clip_auxiliary_loss_beta"],
            aux_betas={
                "proprio_loss": cfg["loss"].get("state_recon_beta", 0.5),
                "lang_pred_loss": cfg["loss"].get("bc_z_auxiliary_loss_beta", 1.0),
                "lang_contrastive_loss": cfg["loss"].get("mia_auxiliary_loss_beta", 1.0),
                "lang_task_loss": cfg["loss"].get("lang_task_auxiliary_loss_beta", 1.0),
            },
        )
        val_step = make_val_step(self.model, self._build_transforms(train=False))
        root_key = prng.root_key(cfg["training"].get("seed", 42))

        max_epochs = max_epochs if max_epochs is not None else cfg["training"]["max_epochs"]
        start_epoch = int(state.step) // max(steps_per_epoch, 1)
        total_steps = 0
        batch_sharding = mesh_lib.batch_sharding(self.mesh)

        for epoch in range(start_epoch, max_epochs):
            kl_beta = jnp.asarray(self.kl_schedule(epoch), jnp.float32)
            logger.info("epoch %d (kl_beta=%.5f)", epoch, float(kl_beta))
            t_epoch = time.time()
            n_samples = 0
            from hulc2_tpu.data.loader import DevicePrefetcher, fuse_modalities_host

            # fuse [vis; lang] on the host inside the prefetch thread — the
            # device-side uint8 concat (~2 ms/step) disappears from the jit.
            # Datamodules with the single-pass fused assembler (one host copy
            # per byte instead of three) use it directly.
            if hasattr(self.dm, "fused_train_iter"):
                stream = self.dm.fused_train_iter()
            else:
                stream = fuse_modalities_host(self.dm.train_iter())
            it = DevicePrefetcher(stream, batch_sharding)
            last_metrics = {}
            limit_train = cfg.get("trainer", {}).get("limit_train_batches")
            epoch_batches = 0
            for raw_batch in it:
                if limit_train and epoch_batches >= limit_train:
                    it.close()
                    break
                epoch_batches += 1
                state, metrics = train_step(state, raw_batch, root_key, kl_beta)
                total_steps += 1
                n_samples += (
                    raw_batch["actions"].shape[0]
                    if "actions" in raw_batch
                    else sum(raw_batch[m]["actions"].shape[0] for m in raw_batch)
                )
                if total_steps % cfg.get("trainer", {}).get("log_every_n_steps", 50) == 0:
                    last_metrics = {k: float(v) for k, v in metrics.items()}
                    last_metrics["lr"] = optim.schedule_value(
                        cfg["model"]["optimizer"], cfg["model"].get("lr_scheduler"),
                        int(state.step), self._estimated_total)
                    mlog.log(last_metrics, int(state.step), prefix="train/")
                if self._preempted or (max_steps and total_steps >= max_steps):
                    it.close()
                    break
            dt_epoch = time.time() - t_epoch
            mlog.log(
                {"samples_per_sec": n_samples / dt_epoch, "epoch_time_s": dt_epoch},
                int(state.step), prefix="perf/",
            )

            # ---- validation (skipped after a preemption signal: the
            # timeout-resubmit contract wants the checkpoint NOW) ----
            val_metrics = {} if self._preempted else self.validate(
                state.params, val_step, root_key,
                max_batches=cfg.get("trainer", {}).get("limit_val_batches"))
            if val_metrics:
                mlog.log(val_metrics, int(state.step), prefix="val/")

            # plan-space diagnostics for t-SNE callbacks
            recorders = [cb for cb in self.callbacks if hasattr(cb, "record")]
            if recorders and self.model.use_plan and not self._preempted:
                from hulc2_tpu.train.steps import make_plan_sampler

                if not hasattr(self, "_plan_sampler"):
                    self._plan_sampler = make_plan_sampler(self.model, self._build_transforms(False))
                raw = jax.tree_util.tree_map(jnp.asarray, next(iter(self.dm.val_iter())))
                plans, labels = self._plan_sampler(state.params, raw, root_key)
                for cb in recorders:
                    cb.record(np.asarray(plans), np.asarray(labels))

            # ---- callbacks, then checkpoint ----
            # Callbacks append their metrics (eval_lh/*, tasks/*, tasks_vis/*)
            # into val_metrics; they must run BEFORE the checkpoint save so
            # monitor-based retention (callbacks/checkpoint=task_sr / lh_sr)
            # sees them, and their additions must be logged separately (they
            # carry their own prefixes, unlike the val/ scalars above).
            # A crashing callback must never cost the epoch's checkpoint, and
            # after a preemption signal every second counts — skip rollouts
            # and save immediately.
            if not self._preempted:
                pre_cb_keys = set(val_metrics)
                for cb in self.callbacks:
                    try:
                        cb(self, epoch=epoch, state=state, val_metrics=val_metrics)
                    except Exception:
                        logger.exception("callback %r failed — continuing (checkpoint preserved)", cb)
                cb_metrics = {k: v for k, v in val_metrics.items() if k not in pre_cb_keys}
                if cb_metrics:
                    mlog.log(cb_metrics, int(state.step))
            if is_main or mesh_lib.process_count() > 1:
                ckpt.save(int(state.step), state, {**val_metrics})
            if self._preempted or (max_steps and total_steps >= max_steps):
                logger.warning("stopping early (preempted=%s)", self._preempted)
                break

        ckpt.wait()
        mlog.close()
        return state

    # ------------------------------------------------------------------ #
    def validate(self, params, val_step, root_key, max_batches: Optional[int] = None) -> Dict[str, float]:
        sums: Dict[str, float] = {}
        count = 0
        for i, raw_batch in enumerate(self.dm.val_iter()):
            raw_batch = jax.tree_util.tree_map(jnp.asarray, raw_batch)
            m = val_step(params, raw_batch, root_key, jnp.asarray(i, jnp.int32))
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            count += 1
            if max_batches and i + 1 >= max_batches:
                break
        return {k: v / max(count, 1) for k, v in sums.items()}
