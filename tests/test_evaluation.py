"""Evaluation layer tests: chain generation golden parity, initial-state
determinism, oracle + fake env + harness integration."""
import json
from pathlib import Path

import numpy as np
import pytest

from hulc2_tpu.envs.fake_env import FakeCalvinEnv
from hulc2_tpu.envs.task_oracle import SceneObsTaskOracle
from hulc2_tpu.evaluation import harness, tasks
from hulc2_tpu.evaluation.initial_states import get_env_state_for_initial_condition
from hulc2_tpu.evaluation.sequences import enumerate_initial_states, get_sequences

GOLDEN = json.loads((Path(__file__).parent / "golden_chains.json").read_text())


class TestTaskModel:
    def test_registry_size_and_names(self):
        assert len(tasks.TASK_NAMES) == 34
        # canonical ordering positions that the RNG stream depends on
        assert tasks.TASK_NAMES[0] == "rotate_red_block_right"
        assert tasks.TASK_NAMES[12] == "move_slider_left"
        assert tasks.TASK_NAMES[14] == "open_drawer"
        assert tasks.TASK_NAMES[25] == "place_in_slider"
        assert tasks.TASK_NAMES[27] == "stack_block"
        assert tasks.TASK_NAMES[29] == "turn_on_lightbulb"
        assert tasks.TASK_NAMES[33] == "push_into_drawer"

    def test_categories(self):
        assert tasks.TASK_CATEGORIES["rotate_red_block_right"] == 1
        assert tasks.TASK_CATEGORIES["push_into_drawer"] == 9
        assert tasks.TASK_CATEGORIES["lift_pink_block_slider"] == 5
        assert tasks.TASK_CATEGORIES["open_drawer"] == 3
        assert len(tasks.TASK_CATEGORIES) == 34

    def test_transition_semantics(self):
        state = dict(led=0, lightbulb=0, slider="right", drawer="closed",
                     red_block="table", blue_block="slider_left", pink_block="table", grasped=0)
        nxt = tasks.successor_states(state, "lift_blue_block_slider")
        assert len(nxt) == 1 and nxt[0]["blue_block"] == "grasped" and nxt[0]["grasped"] == 1
        # place_in_slider then requires a free slider side
        nxt2 = tasks.successor_states(nxt[0], "place_in_slider")
        assert len(nxt2) == 1 and nxt2[0]["blue_block"] == "slider_right"


class TestSequences:
    def test_192_initial_states(self):
        # 12 admissible block placements x 16 device-state combos
        assert len(enumerate_initial_states()) == 192

    @pytest.mark.slow
    def test_golden_chains_bit_identical(self):
        """First 8 of the 1000-chain benchmark, verified bit-identical against
        the reference generator (multistep_sequences.py) at fixture creation.
        Bypasses the disk cache: this test IS the recompute check."""
        from hulc2_tpu.evaluation.sequences import _compute_sequences

        seqs = _compute_sequences(1000)
        assert len(seqs) == 1000
        for expected, (state, chain) in zip(GOLDEN, seqs[: len(GOLDEN)]):
            assert dict(state) == expected["state"]
            assert list(chain) == expected["chain"]

    def test_sequence_disk_cache_roundtrips(self, tmp_path, monkeypatch):
        """The cached benchmark chains must equal a fresh computation."""
        from hulc2_tpu.evaluation import sequences as seq

        monkeypatch.setenv("HULC2_SEQUENCES_CACHE_DIR", str(tmp_path))
        seq.get_sequences.cache_clear()
        first = seq.get_sequences(12)
        assert seq._sequences_cache_path(12).is_file()
        seq.get_sequences.cache_clear()
        second = seq.get_sequences(12)  # served from disk
        assert first == second
        assert [(dict(s), tuple(c)) for s, c in seq._compute_sequences(12)] == second

    def test_all_chains_valid_and_category_distinct(self):
        for state, chain in get_sequences(200):
            assert tasks.is_chain_valid(dict(state), chain)


class TestInitialStates:
    def test_deterministic(self):
        state = enumerate_initial_states()[0]
        r1, s1 = get_env_state_for_initial_condition(state)
        r2, s2 = get_env_state_for_initial_condition(state)
        np.testing.assert_array_equal(s1, s2)
        np.testing.assert_array_equal(r1, r2)
        assert r1.shape == (15,) and s1.shape == (24,)

    def test_symbolic_placement(self):
        state = dict(led=1, lightbulb=1, slider="left", drawer="open",
                     red_block="slider_right", blue_block="table", pink_block="table", grasped=0)
        _, scene = get_env_state_for_initial_condition(state)
        assert scene[0] > 0  # slider left
        assert scene[1] > 0  # drawer open
        assert scene[4] == 1 and scene[5] == 1
        np.testing.assert_allclose(scene[6:9], [7.03416330e-02, 9.24044687e-02, 4.60990009e-01])


class TestOracleAndFakeEnv:
    def _env_for(self, state):
        env = FakeCalvinEnv(static_hw=32, gripper_hw=32)
        robot_obs, scene_obs = get_env_state_for_initial_condition(state)
        env.reset(robot_obs=robot_obs, scene_obs=scene_obs)
        return env

    def test_oracle_detects_symbolic_execution(self):
        oracle = SceneObsTaskOracle()
        n_checked = 0
        for state, chain in get_sequences(30):
            env = self._env_for(dict(state))
            for task in chain:
                start = env.get_info()
                env.perform(task)
                detected = oracle.get_task_info_for_set(start, env.get_info(), [task])
                assert task in detected, (task, chain)
                n_checked += 1
        assert n_checked == 150

    def test_harness_end_to_end(self, tmp_path):
        """Drive the full benchmark loop on the fake env with a scripted
        'policy' that succeeds at a fixed rate."""
        oracle = SceneObsTaskOracle()
        rng = np.random.default_rng(0)

        def rollout_fn(env, subtask):
            if rng.random() < 0.7:
                start = env.get_info()
                env.perform(subtask)
                return subtask in oracle.get_task_info_for_set(start, env.get_info(), [subtask])
            return False

        seqs = get_sequences(100)
        env = FakeCalvinEnv(static_hw=16, gripper_hw=16)
        results = harness.evaluate_policy(rollout_fn, env, sequences=seqs, progress=False)
        assert len(results) == 100
        srs = harness.count_success(results)
        assert 0.4 < srs[0] <= 1.0  # ~0.7
        assert srs[4] < srs[0]  # monotone decreasing

        merged = harness.print_and_save({"7": results}, tmp_path, sequences=seqs)
        assert "best" in merged and merged["best"]["epoch"] == "7"
        data = json.loads((tmp_path / "results.json").read_text())
        assert data["7"]["chain_sr"]["1"] == pytest.approx(srs[0])

    def test_single_step_protocol(self, tmp_path):
        """singlestep_sequences truncates chains to one subtask (reference
        evaluate_policy_singlestep.py role): overall SR == per-task totals ==
        num_sequences, and SR@2..5 are structurally zero."""
        from hulc2_tpu.envs.fake_env import FakeCalvinEnv
        from hulc2_tpu.envs.task_oracle import SceneObsTaskOracle
        from hulc2_tpu.evaluation import harness
        from hulc2_tpu.evaluation.sequences import get_sequences

        seqs = harness.singlestep_sequences(get_sequences(50))
        assert all(len(chain) == 1 for _, chain in seqs)
        oracle = SceneObsTaskOracle()
        rng = np.random.default_rng(1)

        def rollout_fn(env, subtask):
            if rng.random() < 0.6:
                start = env.get_info()
                env.perform(subtask)
                return subtask in oracle.get_task_info_for_set(start, env.get_info(), [subtask])
            return False

        env = FakeCalvinEnv(static_hw=16, gripper_hw=16)
        results = harness.evaluate_policy(rollout_fn, env, sequences=seqs, progress=False)
        srs = harness.count_success(results)
        assert 0.3 < srs[0] <= 1.0 and srs[1] == 0.0
        table = harness.per_task_breakdown(results, seqs)
        assert sum(v["total"] for v in table.values()) == 50
        assert sum(v["success"] for v in table.values()) == sum(results)
