"""Training-time evaluation callbacks.

Counterparts of the reference's Lightning callbacks:
- ``RolloutCallback`` — per-task success-rate rollouts during validation
  (reference: hulc2/rollout/rollout.py:61-425): on the first eval epoch it
  builds a task -> validation-sequence map by replaying recorded start/end
  states through the task oracle (rollout.py:230-276), then rolls out
  ``rollouts_per_task`` episodes per task per modality with ep_len=120.
- ``RolloutLongHorizonCallback`` — 128 5-task chains per validation epoch
  (reference: hulc2/rollout/rollout_long_horizon.py:71-234), sharded over
  processes; counters merged with multihost allgather instead of NCCL
  all_gather_object.
- ``TSNEPlotCallback`` — plan-space t-SNE diagnostics
  (reference: hulc2/visualization/tsne_plot.py:30), sklearn-based.

Callbacks implement ``__call__(trainer, epoch, state, val_metrics)`` and are
free to append to ``val_metrics``.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Callable, Dict, List, Optional

import numpy as np

from hulc2_tpu.evaluation import harness
from hulc2_tpu.evaluation.sequences import get_sequences

logger = logging.getLogger(__name__)


def shard_for_process(items: List, process_index: int, process_count: int) -> List:
    """Contiguous per-process shard (reference: rollout_long_horizon.py:29-51
    sequences_for_rank)."""
    splits = np.array_split(np.arange(len(items)), process_count)
    return [items[i] for i in splits[process_index]]


def allgather_counts(local: np.ndarray) -> np.ndarray:
    """Sum counters across processes (psum over hosts; identity single-host)."""
    import jax

    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    return np.sum(multihost_utils.process_allgather(local), axis=0)


class _RecordingEnv:
    """Env proxy streaming each observation's rgb_static into a RolloutVideo
    (role of the reference's frame accumulation inside the rollout loop,
    rollout/rollout_long_horizon.py + rollout_video.py:38)."""

    def __init__(self, env, video):
        self._env = env
        self._video = video

    def __getattr__(self, name):
        return getattr(self._env, name)

    def _grab(self, obs):
        try:
            self._video.update(obs["rgb_obs"]["rgb_static"])
        except (KeyError, TypeError):
            pass
        return obs

    def reset(self, *a, **kw):
        return self._grab(self._env.reset(*a, **kw))

    def step(self, action):
        obs, r, d, info = self._env.step(action)
        return self._grab(obs), r, d, info


class RolloutLongHorizonCallback:
    """128-chain long-horizon eval each validation epoch."""

    def __init__(
        self,
        env_factory: Callable,
        rollout_fn_factory: Callable,  # (trainer, state) -> rollout_fn(env, subtask)->bool
        num_sequences: int = 128,
        every_n_epochs: int = 1,
        start_epoch: int = 1,
        video_dir=None,
        num_videos: int = 1,  # record the first N chains as annotated videos
    ):
        self.env_factory = env_factory
        self.rollout_fn_factory = rollout_fn_factory
        self.num_sequences = num_sequences
        self.every_n_epochs = every_n_epochs
        self.start_epoch = start_epoch
        self.video_dir = video_dir
        self.num_videos = num_videos
        self._sequences = None

    def _record_videos(self, rollout_fn, epoch: int):
        """Annotated per-subtask videos for the first chains (success/fail
        border + instruction caption), written under video_dir."""
        from hulc2_tpu.evaluation.initial_states import get_env_state_for_initial_condition
        from hulc2_tpu.train.rollout_video import RolloutVideo

        video = RolloutVideo(self.video_dir, tag_prefix="rollout_lh")
        env = _RecordingEnv(self.env_factory(), video)
        for c, (initial_state, chain) in enumerate(self._sequences[: self.num_videos]):
            robot_obs, scene_obs = get_env_state_for_initial_condition(dict(initial_state))
            env.reset(robot_obs=robot_obs, scene_obs=scene_obs)
            for subtask in chain:
                video.new_video()
                ok = rollout_fn(env, subtask)
                video.draw_outcome(ok)
                video.add_language_instruction(subtask)
                video.finish_video(f"chain{c}_{subtask}")
                if not ok:
                    break
        video.write(step=epoch)

    def __call__(self, trainer, epoch: int, state, val_metrics: Dict, **kw):
        if epoch < self.start_epoch or (epoch - self.start_epoch) % self.every_n_epochs:
            return
        import jax

        if self._sequences is None:
            self._sequences = get_sequences(self.num_sequences)
        local = shard_for_process(self._sequences, jax.process_index(), jax.process_count())
        env = self.env_factory()
        rollout_fn = self.rollout_fn_factory(trainer, state)
        if self.video_dir is not None and jax.process_index() == 0:
            try:
                self._record_videos(rollout_fn, epoch)
            except Exception:  # noqa: BLE001 — diagnostics must not kill training
                logger.exception("rollout video recording failed")
        results = harness.evaluate_policy(rollout_fn, env, sequences=local, progress=False)

        # merge: histogram of completed-counts across processes
        hist = np.bincount(results, minlength=6).astype(np.int64)
        hist = allgather_counts(hist)
        total = hist.sum()
        for i in range(1, 6):
            val_metrics[f"eval_lh/sr_chain_{i}"] = float(hist[i:].sum() / total)
        val_metrics["eval_lh/avg_seq_len"] = float(np.dot(np.arange(6), hist) / total)
        logger.info(
            "long-horizon eval epoch %d: avg_seq_len=%.3f", epoch, val_metrics["eval_lh/avg_seq_len"]
        )


class RolloutCallback:
    """Per-task success rollouts (ep_len 120, N per task per modality)."""

    def __init__(
        self,
        env_factory: Callable,
        rollout_fn_factory: Callable,
        tasks: Optional[List[str]] = None,
        rollouts_per_task: int = 10,
        every_n_epochs: int = 5,
        start_epoch: int = 1,
        ep_len: int = 120,
        metric_prefix: str = "tasks",
        rollout_resets_env: bool = False,
    ):
        from hulc2_tpu.evaluation.tasks import TASK_NAMES

        self.env_factory = env_factory
        self.rollout_fn_factory = rollout_fn_factory
        self.tasks = list(tasks or TASK_NAMES)
        self.rollouts_per_task = rollouts_per_task
        self.every_n_epochs = every_n_epochs
        self.start_epoch = start_epoch
        self.ep_len = ep_len
        self.metric_prefix = metric_prefix
        # vis-modality rollouts reset the env themselves (from recorded
        # dataset states) — skip the symbolic initial-state reset then
        self.rollout_resets_env = rollout_resets_env

    def __call__(self, trainer, epoch: int, state, val_metrics: Dict, **kw):
        if epoch < self.start_epoch or (epoch - self.start_epoch) % self.every_n_epochs:
            return
        import jax

        from hulc2_tpu.evaluation.initial_states import get_env_state_for_initial_condition
        from hulc2_tpu.evaluation.sequences import enumerate_initial_states
        from hulc2_tpu.evaluation.tasks import successor_states

        env = self.env_factory()
        rollout_fn = self.rollout_fn_factory(trainer, state)
        states = enumerate_initial_states()
        my_tasks = shard_for_process(self.tasks, jax.process_index(), jax.process_count())
        succ = np.zeros(len(self.tasks), np.int64)
        attempts = np.zeros(len(self.tasks), np.int64)
        for t_idx, task in enumerate(self.tasks):
            if task not in my_tasks:
                continue
            if self.rollout_resets_env:
                for _ in range(self.rollouts_per_task):
                    r = rollout_fn(env, task)
                    if r is None:  # no goal material for this task — skip
                        break
                    attempts[t_idx] += 1
                    succ[t_idx] += int(bool(r))
                continue
            # initial states where the task is unambiguously executable
            valid = [s for s in states if len(successor_states(s, task)) == 1]
            for k in range(min(self.rollouts_per_task, len(valid))):
                robot_obs, scene_obs = get_env_state_for_initial_condition(valid[k % len(valid)])
                env.reset(robot_obs=robot_obs, scene_obs=scene_obs)
                attempts[t_idx] += 1
                if rollout_fn(env, task):
                    succ[t_idx] += 1
        succ = allgather_counts(succ)
        attempts = allgather_counts(attempts)
        for t_idx, task in enumerate(self.tasks):
            if attempts[t_idx]:
                val_metrics[f"{self.metric_prefix}/{task}_sr"] = float(succ[t_idx] / attempts[t_idx])
        total = attempts.sum()
        val_metrics[f"{self.metric_prefix}/average_sr"] = float(succ.sum() / total) if total else 0.0


class TSNEPlotCallback:
    """Plan-space t-SNE figure from validation plan samples."""

    def __init__(self, out_dir, every_n_epochs: int = 10, max_points: int = 1000):
        self.out_dir = Path(out_dir)
        self.every_n_epochs = every_n_epochs
        self.max_points = max_points
        self.plans: List[np.ndarray] = []
        self.labels: List[int] = []

    def record(self, plans: np.ndarray, labels) -> None:
        self.plans.append(np.asarray(plans))
        self.labels.extend(np.asarray(labels).tolist())

    def __call__(self, trainer, epoch: int, state, val_metrics: Dict, **kw):
        if epoch % self.every_n_epochs or not self.plans:
            return
        from sklearn.manifold import TSNE
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plans = np.concatenate(self.plans)[: self.max_points]
        labels = np.asarray(self.labels)[: self.max_points]
        emb = TSNE(n_components=2, init="pca", perplexity=min(30, len(plans) - 1)).fit_transform(plans)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        fig, ax = plt.subplots(figsize=(6, 6))
        sc = ax.scatter(emb[:, 0], emb[:, 1], c=labels, cmap="tab20", s=4)
        fig.colorbar(sc)
        fig.savefig(self.out_dir / f"tsne_epoch{epoch}.png", dpi=120)
        plt.close(fig)
        self.plans.clear()
        self.labels.clear()
