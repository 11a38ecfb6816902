"""Batched + pipelined CALVIN evaluation: K env instances, ONE jitted policy.

The reference evaluates 1000 chains strictly sequentially — each env step is
a GPU round trip (reference: evaluation/evaluation.py:150-214,
manager_aff_lmp.py:26-79). On TPU, dispatch latency dominates single-env
stepping, so this evaluator runs K simulator instances in lockstep
(``envs.calvin_wrapper.EnvFarm``): observations are stacked, the policy step
is one TPU dispatch for all K envs (the policy carry is batched and
per-env-resettable), and the task oracle is checked per env on the host.

Two levels of latency hiding:

1. **Batching** (``BatchedEvaluator``): one dispatch serves K envs.
2. **Cohort pipelining** (``PipelinedEvaluator``): the K envs are split into
   C cohorts, each with its own agent carry; while cohort c's policy dispatch
   is in flight on the TPU, the other cohorts' host simulators step. With the
   round-robin schedule the wall-clock per K env steps approaches
   max(total host sim time, C · dispatch time) instead of their sum — on a
   tunneled chip (~60 ms/dispatch) this hides the round-trip behind sim work.

Scheduling: each env works through its own queue of (initial_state, chain)
jobs; when env i finishes (or fails) its chain, it immediately resets to its
next job — envs never idle waiting for the slowest chain.
"""
from __future__ import annotations

import logging
import time
from typing import Dict, List, Optional, Sequence, Tuple

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


class _Cohort:
    """One (farm, agent) pair working a shared job queue."""

    def __init__(self, farm, agent, evaluator: "PipelinedEvaluator"):
        assert agent.n_envs == len(farm), (agent.n_envs, len(farm))
        self.farm = farm
        self.agent = agent
        self.ev = evaluator
        self.k = len(farm)
        self.jobs: List[Optional[_EnvJob]] = [None] * self.k
        self.goals = np.zeros((self.k, evaluator.goal_dim), evaluator.goal_dtype)
        self.pending = None  # in-flight device action array
        # per-env latest observation, reused for the next dispatch so each
        # env renders exactly ONCE per step (env.step/reset already return
        # the frame; a second get_obs() would re-render in PyBullet)
        self.obs: List[Optional[Dict]] = [None] * self.k

    @property
    def active(self) -> bool:
        return any(j is not None for j in self.jobs)

    def assign(self, i: int) -> bool:
        """Pull the next job from the shared queue into env slot i."""
        job_idx = self.ev.take_job()
        if job_idx is None:
            self.jobs[i] = None
            return False
        job = _EnvJob(job_idx, self.ev.sequences[job_idx][1])
        self.jobs[i] = job
        initial_state, _ = self.ev.sequences[job_idx]
        robot_obs, scene_obs = get_env_state_for_initial_condition(dict(initial_state))
        self.obs[i] = self.farm.envs[i].reset(robot_obs=robot_obs, scene_obs=scene_obs)
        self.begin_subtask(i, job)
        self.goals[i] = self.ev.goal_for(job.chain[0])
        return True

    def begin_subtask(self, i: int, job: _EnvJob):
        job.steps_left = self.ev.ep_len
        job.start_info = self.farm.envs[i].get_info()
        self.agent.reset_env_slot(i)

    def dispatch(self):
        """Submit the next policy step for this cohort (non-blocking)."""
        if any(o is None for o in self.obs):
            self.obs = [o if o is not None else e.get_obs()
                        for o, e in zip(self.obs, self.farm.envs)]
        stacked = type(self.farm).stack_obs(self.obs)
        self.pending = self.agent.step_async(stacked, {"lang": self.goals})

    def settle(self):
        """Block on the in-flight dispatch, step the host sims, and advance
        the per-env job bookkeeping. Returns the number of env steps taken."""
        actions = np.asarray(self.pending)
        self.pending = None
        if actions.ndim == 1:
            actions = actions[None]
        # parallel across worker processes for ProcessEnvFarm, serial otherwise
        obs_list, infos = self.farm.step_all(actions)
        self.obs = list(obs_list)
        oracle = self.ev.oracle
        for i in range(self.k):
            job = self.jobs[i]
            if job is None or job.done:
                continue
            job.steps_left -= 1
            subtask = job.chain[job.subtask_idx]
            hit = subtask in oracle.get_task_info_for_set(job.start_info, infos[i], [subtask])
            advance_chain = False
            if hit:
                job.result += 1
                job.subtask_idx += 1
                if job.subtask_idx >= len(job.chain):
                    advance_chain = True
                else:
                    self.begin_subtask(i, job)
                    self.goals[i] = self.ev.goal_for(job.chain[job.subtask_idx])
            elif job.steps_left <= 0:
                advance_chain = True
            if advance_chain:
                self.ev.finish_job(job)
                self.assign(i)
        return self.k


class PipelinedEvaluator:
    """Evaluate a shared chain queue over C cohorts of lockstep envs.

    ``cohorts`` is a list of (farm, agent) pairs; agents should share one
    fused jitted policy step (pass ``fused_step=`` to ``Hulc2Agent``) so the
    program compiles once.
    """

    def __init__(
        self,
        cohorts: Sequence[Tuple[object, object]],
        lang_embeddings: Dict[str, np.ndarray],
        task_to_annotation: Optional[Dict[str, str]] = None,
        ep_len: int = 360,
        oracle: Optional[SceneObsTaskOracle] = None,
    ):
        self.ep_len = ep_len
        self.oracle = oracle or SceneObsTaskOracle()
        self.lang = lang_embeddings
        self.task_to_ann = task_to_annotation or {}
        sample_goal = np.asarray(next(iter(lang_embeddings.values())))
        self.goal_dim = int(sample_goal.shape[-1])
        # float32 sentence embeddings, or int32 BPE token ids for policies
        # with the in-graph language tower
        self.goal_dtype = sample_goal.dtype
        self.cohorts = [_Cohort(farm, agent, self) for farm, agent in cohorts]
        # shared job queue state (set per evaluate() call)
        self.sequences: Sequence = []
        self._next_job = 0
        self._results: List[int] = []
        self._completed = 0

    # ---- shared queue ------------------------------------------------- #
    def take_job(self) -> Optional[int]:
        if self._next_job >= len(self.sequences):
            return None
        idx = self._next_job
        self._next_job += 1
        return idx

    def finish_job(self, job: _EnvJob):
        self._results[job.job_idx] = job.result
        job.done = True
        self._completed += 1

    def goal_for(self, subtask: str) -> np.ndarray:
        key = self.task_to_ann.get(subtask, subtask)
        return np.asarray(self.lang[key], self.goal_dtype)

    # ---- main loop ----------------------------------------------------- #
    def evaluate(self, num_sequences: int = 1000, sequences=None, progress: bool = True) -> List[int]:
        self.sequences = sequences if sequences is not None else get_sequences(num_sequences)
        n_jobs = len(self.sequences)
        self._results = [0] * n_jobs
        self._next_job = 0
        self._completed = 0

        for c in self.cohorts:
            for i in range(c.k):
                c.assign(i)
            if c.active:
                c.dispatch()

        t0 = time.time()
        n_steps = 0
        last_log = 0
        while self._completed < n_jobs:
            for c in self.cohorts:
                if c.pending is None:
                    continue
                n_steps += c.settle()
                if c.active:
                    c.dispatch()
            if progress and n_steps - last_log >= 500 * sum(c.k for c in self.cohorts):
                last_log = n_steps
                rate = n_steps / max(time.time() - t0, 1e-9)
                logger.info("[%d/%d chains] %.0f env-steps/s (%d envs, %d cohorts)",
                            self._completed, n_jobs, rate, sum(c.k for c in self.cohorts),
                            len(self.cohorts))
        dt = time.time() - t0
        logger.info("batched eval: %d chains in %.1f s (%.0f env-steps/s)",
                    n_jobs, dt, n_steps / max(dt, 1e-9))
        return list(self._results)


class BatchedEvaluator(PipelinedEvaluator):
    """Single-cohort evaluator (original batched design): one farm + agent."""

    def __init__(
        self,
        farm,
        agent,  # Hulc2Agent with n_envs == len(farm)
        lang_embeddings: Dict[str, np.ndarray],
        task_to_annotation: Optional[Dict[str, str]] = None,
        ep_len: int = 360,
        oracle: Optional[SceneObsTaskOracle] = None,
    ):
        super().__init__([(farm, agent)], lang_embeddings, task_to_annotation, ep_len, oracle)
        self.farm = farm
        self.agent = agent
        self.k = len(farm)
