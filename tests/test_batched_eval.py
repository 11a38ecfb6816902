"""Batched evaluator: K fake envs in lockstep through one jitted policy."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import hulc2_tpu.configs  # noqa: F401
from hulc2_tpu.core import config as cfg_lib
from hulc2_tpu.agents.hulc2_agent import Hulc2Agent
from hulc2_tpu.envs.calvin_wrapper import EnvFarm
from hulc2_tpu.envs.fake_env import FakeCalvinEnv
from hulc2_tpu.evaluation.batched_eval import BatchedEvaluator, PipelinedEvaluator
from hulc2_tpu.evaluation.loading import init_params
from hulc2_tpu.evaluation.sequences import get_sequences
from hulc2_tpu.evaluation.tasks import TASK_NAMES
from hulc2_tpu.models.build import build_policy
from hulc2_tpu.tools.auto_lang_annotator import hash_embed

TINY = [
    "model.plan_proposal.hidden_size=32",
    "model.plan_recognition.encoder_hidden_size=32",
    "model.plan_recognition.fc_hidden_size=32",
    "model.action_decoder.hidden_size=32",
    "model.visual_goal.hidden_size=32",
    "model.language_goal.hidden_size=32",
    "model.compute_dtype=float32",
]


class TestPartialDump:
    def test_partial_results_snapshot(self, tmp_path):
        """Cutoff insurance: the evaluator can snapshot completed chains
        mid-run; the file carries an unbiased partial mean + SR curve."""
        import json

        ev = PipelinedEvaluator([], {"t": np.zeros(4, np.float32)})
        ev.partial_path = tmp_path / "partial_results.json"
        ev._results = [3, 0, 5, 1, 0, 0]
        ev._done_idx = [2, 0, 3]  # arbitrary completion order
        ev._dump_partial(n_jobs=6, elapsed_s=10.0, n_steps=4000)
        d = json.loads(ev.partial_path.read_text())
        assert d["completed_chains"] == 3 and d["total_chains"] == 6
        assert d["avg_seq_len_partial"] == 3.0  # mean of 5,3,1
        assert d["chain_sr_partial"][0] == 1.0  # all 3 completed >=1
        assert d["env_steps_per_s"] == 400.0


class TestBatchedEvaluator:
    @pytest.mark.slow
    def test_schedules_all_chains(self):
        k = 4
        cfg = cfg_lib.compose("cfg_low_level", TINY)
        model = build_policy(cfg["model"])
        params = init_params(model, cfg)
        farm = EnvFarm([FakeCalvinEnv(static_hw=64, gripper_hw=64, seed=i) for i in range(k)])
        agent = Hulc2Agent(farm, model, params, cfg["datamodule"], n_envs=k)
        lang = {t: hash_embed([t])[0] for t in TASK_NAMES}
        ev = BatchedEvaluator(farm, agent, lang, ep_len=2)
        sequences = get_sequences(10)
        results = ev.evaluate(sequences=sequences, progress=False)
        assert len(results) == 10
        # untrained policy on the symbolic env: chains end by step budget
        assert all(r == 0 for r in results)

    @pytest.mark.slow
    def test_pipelined_cohorts_schedule_all_chains(self):
        """Two cohorts with overlapping dispatches drain the shared queue and
        produce one result per chain (same scheduling semantics as the
        single-cohort evaluator)."""
        cfg = cfg_lib.compose("cfg_low_level", TINY)
        model = build_policy(cfg["model"])
        params = init_params(model, cfg)
        cohorts, shared = [], None
        for c in range(2):
            farm = EnvFarm([FakeCalvinEnv(static_hw=64, gripper_hw=64, seed=10 * c + i)
                            for i in range(2)])
            agent = Hulc2Agent(farm, model, params, cfg["datamodule"], n_envs=2,
                               fused_step=shared)
            shared = shared or agent._fused_step
            cohorts.append((farm, agent))
        lang = {t: hash_embed([t])[0] for t in TASK_NAMES}
        ev = PipelinedEvaluator(cohorts, lang, ep_len=2)
        sequences = get_sequences(9)
        results = ev.evaluate(sequences=sequences, progress=False)
        assert len(results) == 9
        assert all(r == 0 for r in results)

    def test_per_env_carry_reset(self):
        """reset_env_slot only clears the chosen env's carry slice."""
        cfg = cfg_lib.compose("cfg_low_level", TINY)
        model = build_policy(cfg["model"])
        params = init_params(model, cfg)
        farm = EnvFarm([FakeCalvinEnv(static_hw=64, gripper_hw=64, seed=i) for i in range(3)])
        agent = Hulc2Agent(farm, model, params, cfg["datamodule"], n_envs=3)
        agent.carry = agent.carry._replace(
            plan=jnp.ones_like(agent.carry.plan),
            step=jnp.asarray([5, 6, 7], jnp.int32),
        )
        agent.reset_env_slot(1)
        assert float(agent.carry.plan[0].sum()) > 0
        assert float(agent.carry.plan[1].sum()) == 0
        assert agent.carry.step.tolist() == [5, 0, 7]
