"""Batched CALVIN evaluation: K env instances driven by ONE jitted policy.

The reference evaluates 1000 chains strictly sequentially — each env step is
a GPU round trip (reference: evaluation/evaluation.py:150-214,
manager_aff_lmp.py:26-79). On TPU, dispatch latency dominates single-env
stepping, so this evaluator runs K simulator instances in lockstep
(``envs.calvin_wrapper.EnvFarm``): observations are stacked, the policy step
is one TPU dispatch for all K envs (the policy carry is batched and
per-env-resettable), and the task oracle is checked per env on the host.

Scheduling: each env works through its own queue of (initial_state, chain)
jobs; when env i finishes (or fails) its chain, it immediately resets to its
next job — envs never idle waiting for the slowest chain.
"""
from __future__ import annotations

import logging
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from hulc2_tpu.envs.task_oracle import SceneObsTaskOracle
from hulc2_tpu.evaluation.initial_states import get_env_state_for_initial_condition
from hulc2_tpu.evaluation.sequences import get_sequences

logger = logging.getLogger(__name__)


class _EnvJob:
    """Per-env chain cursor."""

    __slots__ = ("chain", "subtask_idx", "steps_left", "start_info", "done", "result", "job_idx")

    def __init__(self, job_idx: int, chain: Sequence[str]):
        self.job_idx = job_idx
        self.chain = list(chain)
        self.subtask_idx = 0
        self.steps_left = 0
        self.start_info = None
        self.done = False
        self.result = 0


class BatchedEvaluator:
    def __init__(
        self,
        farm,
        agent,  # Hulc2Agent with n_envs == len(farm)
        lang_embeddings: Dict[str, np.ndarray],
        task_to_annotation: Optional[Dict[str, str]] = None,
        ep_len: int = 360,
        oracle: Optional[SceneObsTaskOracle] = None,
    ):
        self.farm = farm
        self.agent = agent
        self.k = len(farm)
        self.ep_len = ep_len
        self.oracle = oracle or SceneObsTaskOracle()
        self.lang = lang_embeddings
        self.task_to_ann = task_to_annotation or {}

    def _goal_for(self, subtask: str) -> np.ndarray:
        key = self.task_to_ann.get(subtask, subtask)
        return np.asarray(self.lang[key], np.float32)

    def _reset_env_to_job(self, i: int, job: _EnvJob, sequences):
        initial_state, _ = sequences[job.job_idx]
        robot_obs, scene_obs = get_env_state_for_initial_condition(dict(initial_state))
        self.farm.envs[i].reset(robot_obs=robot_obs, scene_obs=scene_obs)
        job.subtask_idx = 0
        self._begin_subtask(i, job)

    def _begin_subtask(self, i: int, job: _EnvJob):
        job.steps_left = self.ep_len
        job.start_info = self.farm.envs[i].get_info()
        self.agent.reset_env_slot(i)

    def evaluate(self, num_sequences: int = 1000, sequences=None, progress: bool = True) -> List[int]:
        sequences = sequences if sequences is not None else get_sequences(num_sequences)
        n_jobs = len(sequences)
        results = [0] * n_jobs
        next_job = 0
        jobs: List[Optional[_EnvJob]] = [None] * self.k

        # assign initial jobs
        for i in range(self.k):
            if next_job < n_jobs:
                jobs[i] = _EnvJob(next_job, sequences[next_job][1])
                self._reset_env_to_job(i, jobs[i], sequences)
                next_job += 1

        goals = np.stack([
            self._goal_for(jobs[i].chain[0]) if jobs[i] else np.zeros_like(next(iter(self.lang.values())))
            for i in range(self.k)
        ])
        t0 = time.time()
        n_steps = 0
        completed = 0
        while completed < n_jobs:
            obs = self.farm.get_obs()
            actions = self.agent.step(obs, {"lang": goals})
            if actions.ndim == 1:
                actions = actions[None]
            self.farm.step(actions)
            n_steps += 1
            infos = self.farm.get_infos()
            for i in range(self.k):
                job = jobs[i]
                if job is None or job.done:
                    continue
                job.steps_left -= 1
                subtask = job.chain[job.subtask_idx]
                hit = subtask in self.oracle.get_task_info_for_set(job.start_info, infos[i], [subtask])
                advance_chain = False
                if hit:
                    job.result += 1
                    job.subtask_idx += 1
                    if job.subtask_idx >= len(job.chain):
                        advance_chain = True
                    else:
                        self._begin_subtask(i, job)
                        goals[i] = self._goal_for(job.chain[job.subtask_idx])
                elif job.steps_left <= 0:
                    advance_chain = True
                if advance_chain:
                    results[job.job_idx] = job.result
                    job.done = True
                    completed += 1
                    if next_job < n_jobs:
                        jobs[i] = _EnvJob(next_job, sequences[next_job][1])
                        self._reset_env_to_job(i, jobs[i], sequences)
                        goals[i] = self._goal_for(jobs[i].chain[0])
                        next_job += 1
                    else:
                        jobs[i] = None
            if progress and n_steps % 500 == 0:
                rate = n_steps * self.k / max(time.time() - t0, 1e-9)
                logger.info("[%d/%d chains] %.0f env-steps/s (batched x%d)",
                            completed, n_jobs, rate, self.k)
        dt = time.time() - t0
        logger.info("batched eval: %d chains in %.1f s (%.0f env-steps/s)",
                    n_jobs, dt, n_steps * self.k / max(dt, 1e-9))
        return results
