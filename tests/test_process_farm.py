"""Multiprocess env farm: parallel stepping, EnvFarm parity, evaluator stack."""
import time
from functools import partial

import numpy as np
import pytest

import hulc2_tpu.configs  # noqa: F401
from hulc2_tpu.core import config as cfg_lib
from hulc2_tpu.agents.hulc2_agent import Hulc2Agent
from hulc2_tpu.envs.calvin_wrapper import EnvFarm
from hulc2_tpu.envs.fake_env import FakeCalvinEnv
from hulc2_tpu.envs.process_farm import ProcessEnvFarm
from hulc2_tpu.evaluation.batched_eval import PipelinedEvaluator
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


@pytest.fixture(scope="module")
def farm3():
    farm = ProcessEnvFarm(
        [partial(FakeCalvinEnv, static_hw=32, gripper_hw=32, seed=i) for i in range(3)]
    )
    yield farm
    farm.close()


class TestProcessEnvFarm:
    def test_step_obs_shapes_and_determinism(self, farm3):
        """Remote envs step like local ones: same robot_obs integration."""
        local = EnvFarm([FakeCalvinEnv(static_hw=32, gripper_hw=32, seed=i) for i in range(3)])
        actions = np.tile(np.array([1, 0, 0, 0, 0, 0, 1.0]), (3, 1))
        obs_list, infos = farm3.step_all(actions)
        lobs_list, linfos = local.step_all(actions)
        assert len(obs_list) == 3 and len(infos) == 3
        for o, lo in zip(obs_list, lobs_list):
            assert o["rgb_obs"]["rgb_static"].shape == (32, 32, 3)
            np.testing.assert_allclose(o["robot_obs"], lo["robot_obs"])
        for inf, linf in zip(infos, linfos):
            np.testing.assert_allclose(inf["robot_obs"], linf["robot_obs"])

    def test_reset_and_infos(self, farm3):
        robot = np.tile(np.linspace(0, 1, 15), (3, 1))
        scene = np.tile(np.arange(24.0), (3, 1))
        obs = farm3.reset(robot_obs=robot, scene_obs=scene)
        np.testing.assert_allclose(obs["robot_obs"][1], robot[1])
        infos = farm3.get_infos()
        np.testing.assert_allclose(infos[2]["scene_obs"], scene[2])

    def test_remote_errors_surface(self, farm3):
        with pytest.raises(RuntimeError, match="env worker error"):
            farm3.envs[0].call("no_such_method")

    @pytest.mark.slow
    def test_steps_run_in_parallel(self):
        """4 envs with a 50 ms sim step must step together, not serially."""
        with ProcessEnvFarm(
            [partial(FakeCalvinEnv, static_hw=16, gripper_hw=16, step_delay_s=0.05)
             for _ in range(4)]
        ) as farm:
            actions = np.zeros((4, 7))
            farm.step_all(actions)  # warm caches
            t0 = time.perf_counter()
            farm.step_all(actions)
            dt = time.perf_counter() - t0
        assert dt < 0.15, f"parallel 4x50ms step took {dt:.3f}s (serial would be 0.2s)"

    @pytest.mark.slow
    def test_pipelined_evaluator_over_process_farms(self):
        """Full stack: cohorts of process-farm envs through the evaluator."""
        cfg = cfg_lib.compose("cfg_low_level", TINY)
        model = build_policy(cfg["model"])
        params = init_params(model, cfg)
        cohorts, shared = [], None
        farms = []
        for c in range(2):
            farm = ProcessEnvFarm(
                [partial(FakeCalvinEnv, static_hw=64, gripper_hw=64, seed=10 * c + i)
                 for i in range(2)]
            )
            farms.append(farm)
            agent = Hulc2Agent(farm, model, params, cfg["datamodule"], n_envs=2,
                               fused_step=shared)
            shared = shared or agent._fused_step
            cohorts.append((farm, agent))
        try:
            lang = {t: hash_embed([t])[0] for t in TASK_NAMES}
            ev = PipelinedEvaluator(cohorts, lang, ep_len=2)
            results = ev.evaluate(sequences=get_sequences(6), progress=False)
            assert len(results) == 6
            assert all(r == 0 for r in results)
        finally:
            for farm in farms:
                farm.close()
