"""Config -> trainer callbacks wiring.

The reference instantiates its callback zoo from Hydra groups
(reference: hulc2/training.py:59-62, conf/callbacks/*). Here
``build_callbacks(cfg, dm)`` assembles the equivalents:

- rollout / rollout_lh: training-time env rollouts. The env comes from an
  ``env`` spec: "calvin" (requires calvin_env + dataset rendering config) or
  "fake" (symbolic smoke env). The rollout_fn builds a Hulc2Agent around the
  trainer's live model/params each invocation.
- tsne_plot: plan-space diagnostics.
- kl_schedule is handled natively by the Trainer.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Callable, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def make_env_factory(env_spec: str, dataset_path=None) -> Callable:
    if env_spec == "fake":
        from hulc2_tpu.envs.fake_env import FakeCalvinEnv

        return lambda: FakeCalvinEnv()
    if env_spec == "calvin":
        from hulc2_tpu.envs.calvin_wrapper import CalvinEnvWrapper, make_calvin_env

        return lambda: CalvinEnvWrapper(make_calvin_env(dataset_path, show_gui=False))
    raise ValueError(env_spec)


def _cached_agent(rollout_fn, env, trainer, state, cfg):
    """One Hulc2Agent per env instance, cached on the rollout_fn."""
    from hulc2_tpu.agents.hulc2_agent import Hulc2Agent

    agent = getattr(rollout_fn, "_agent", None)
    if agent is None or agent.env is not env:
        agent = Hulc2Agent(env, trainer.model, state.params, cfg["datamodule"])
        rollout_fn._agent = agent
    return agent


def _drive_policy(agent, env, goal, subtask: str, oracle, ep_len: int) -> bool:
    """Shared rollout loop: clear the agent carry, step the policy up to
    ep_len env steps, oracle-check after every step (both modalities)."""
    agent.reset()
    start = env.get_info()
    obs = env.get_obs()
    for _ in range(ep_len):
        action = agent.step(obs, goal)
        obs, _, _, _ = env.step(action)
        if subtask in oracle.get_task_info_for_set(start, env.get_info(), [subtask]):
            return True
    return False


def make_policy_rollout_fn_factory(cfg: dict, ep_len: int, lang_embeddings=None,
                                   env_spec: str = "calvin") -> Callable:
    """(trainer, state) -> rollout_fn(env, subtask) -> bool."""

    def factory(trainer, state):
        from hulc2_tpu.envs.task_oracle import make_oracle
        from hulc2_tpu.tools.annotations import ANNOTATION_BANK
        from hulc2_tpu.tools.auto_lang_annotator import hash_embed, require_stub_embeddings_ok

        # native calvin_env oracle for real-simulator rollouts (VERDICT r1
        # item 2), heuristic for the fake env
        oracle = make_oracle(real_env=(env_spec == "calvin"))
        table = lang_embeddings or {}

        def rollout_fn(env, subtask: str) -> bool:
            agent = _cached_agent(rollout_fn, env, trainer, state, cfg)
            caption = ANNOTATION_BANK[subtask][0]
            emb = table.get(caption)
            if emb is None:
                # rollout SR computed from stub embeddings is noise — refuse
                # unless explicitly allowed (HULC2_ALLOW_STUB_EMBEDDINGS=1)
                require_stub_embeddings_ok("rollout callback")
                emb = hash_embed([caption])[0]
            goal = {"lang": np.asarray(emb, np.float32)}
            return _drive_policy(agent, env, goal, subtask, oracle, ep_len)

        return rollout_fn

    return factory


def make_vis_rollout_fn_factory(cfg: dict, ep_len: int, dataset_path,
                                env_spec: str = "calvin") -> Optional[Callable]:
    """Vision-modality rollouts (the reference Rollout callback's "vis" half,
    rollout.py:277-340): for each task, find validation windows where the
    scene-obs oracle detects the task, reset the env to the window's first
    frame state, and roll out toward the window's LAST frame as a visual
    goal. Returns None when the validation split has no usable windows."""
    from hulc2_tpu.data.episode_index import load_ep_start_end_ids
    from hulc2_tpu.data.frame_store import NpzFrameStore
    from hulc2_tpu.tools.auto_lang_annotator import detect_task_windows

    val_dir = Path(dataset_path) / "validation"
    rgb_keys = list(cfg["datamodule"]["observation_space"]["rgb_obs"])
    depth_keys = list(cfg["datamodule"]["observation_space"]["depth_obs"])
    keys = rgb_keys + depth_keys + ["robot_obs", "scene_obs"]
    try:
        ep_ids = load_ep_start_end_ids(val_dir, "validation")
        # detection probes only scene_obs — don't decompress full frames for
        # every stride; the full-key store serves the 2 goal frames/rollout
        hits = detect_task_windows(NpzFrameStore(val_dir, ["scene_obs"]), ep_ids)
        store = NpzFrameStore(val_dir, keys)
    except (FileNotFoundError, OSError) as e:
        logger.warning("vis rollouts disabled: %s", e)
        return None
    by_task: dict = {}
    for h in hits:
        by_task.setdefault(h["task"], []).append(h["indx"])
    if not by_task:
        logger.warning("vis rollouts disabled: no oracle-detected windows in %s", val_dir)
        return None
    logger.info("vis rollouts: %d tasks with goal windows", len(by_task))

    def env_obs(frame: dict) -> dict:
        return {
            "rgb_obs": {k: frame[k] for k in rgb_keys if k in frame},
            "depth_obs": {k: frame[k] for k in depth_keys if k in frame},
            "robot_obs": frame["robot_obs"],
        }

    def factory(trainer, state):
        from hulc2_tpu.envs.task_oracle import make_oracle

        oracle = make_oracle(real_env=(env_spec == "calvin"))
        counters: dict = {}

        def rollout_fn(env, subtask: str):
            windows = by_task.get(subtask)
            if not windows:
                return None  # task absent from the val split — not attempted
            agent = _cached_agent(rollout_fn, env, trainer, state, cfg)
            k = counters.get(subtask, 0)
            counters[subtask] = k + 1
            s, e = windows[k % len(windows)]
            first, last = store.load_frame(s), store.load_frame(e)
            env.reset(robot_obs=first["robot_obs"], scene_obs=first["scene_obs"])
            goal = agent.make_visual_goal(env_obs(last))
            return _drive_policy(agent, env, goal, subtask, oracle, ep_len)

        return rollout_fn

    return factory


def build_callbacks(cfg: dict, run_dir, lang_embeddings=None) -> List:
    from hulc2_tpu.train.callbacks import (
        RolloutCallback,
        RolloutLongHorizonCallback,
        TSNEPlotCallback,
    )

    cbs: List = []
    cb_cfg = cfg.get("callbacks") or {}
    lh = cb_cfg.get("rollout_lh")
    if lh:
        env_factory = make_env_factory(lh.get("env", "calvin"), lh.get("dataset_path"))
        video_dir = lh.get("video_dir")
        if video_dir == "auto":  # reference logs 16 videos per eval epoch
            video_dir = str(Path(run_dir) / "videos")
        cbs.append(
            RolloutLongHorizonCallback(
                env_factory=env_factory,
                rollout_fn_factory=make_policy_rollout_fn_factory(
                    cfg, lh.get("ep_len", 360), lang_embeddings,
                    env_spec=lh.get("env", "calvin"),
                ),
                num_sequences=lh.get("num_sequences", 128),
                every_n_epochs=lh.get("every_n_epochs", 1),
                start_epoch=lh.get("start_epoch", 1),
                video_dir=video_dir,
                num_videos=lh.get("num_videos", 1),
            )
        )
    ro = cb_cfg.get("rollout")
    if ro:
        env_factory = make_env_factory(ro.get("env", "calvin"), ro.get("dataset_path"))
        cbs.append(
            RolloutCallback(
                env_factory=env_factory,
                rollout_fn_factory=make_policy_rollout_fn_factory(
                    cfg, ro.get("ep_len", 120), lang_embeddings,
                    env_spec=ro.get("env", "calvin"),
                ),
                rollouts_per_task=ro.get("rollouts_per_task", 10),
                every_n_epochs=ro.get("every_n_epochs", 5),
                start_epoch=ro.get("start_epoch", 1),
            )
        )
        # vision-modality rollouts (reference rollout.py:277 rolls out BOTH
        # modalities): goal image from an oracle-detected validation window
        vis_ds = ro.get("dataset_path") or cfg.get("datamodule", {}).get("root_data_dir")
        if ro.get("vis", True) and vis_ds:
            vis_factory = make_vis_rollout_fn_factory(
                cfg, ro.get("ep_len", 120), vis_ds, env_spec=ro.get("env", "calvin")
            )
            if vis_factory is not None:
                cbs.append(
                    RolloutCallback(
                        env_factory=env_factory,
                        rollout_fn_factory=vis_factory,
                        rollouts_per_task=ro.get("rollouts_per_task", 10),
                        every_n_epochs=ro.get("every_n_epochs", 5),
                        start_epoch=ro.get("start_epoch", 1),
                        metric_prefix="tasks_vis",
                        rollout_resets_env=True,
                    )
                )
    if cb_cfg.get("tsne_plot"):
        cbs.append(TSNEPlotCallback(run_dir, every_n_epochs=cb_cfg["tsne_plot"].get("every_n_epochs", 10)))
    return cbs
