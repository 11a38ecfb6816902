"""Oracle trust: heuristic-vs-native divergence harness (VERDICT r1 item 2).

The reference scores the benchmark with calvin_env's contact-aware oracle
(reference: hulc2/evaluation/manager_aff_lmp.py:58-74). This suite

1. checks ``make_oracle`` picks the native oracle for real-env scoring when
   calvin_env is importable, falling back (loudly) to the scene-obs heuristic,
2. exhaustively validates the heuristic over symbolic transitions covering
   every one of the 34 tasks, including reverse-task false-positive checks,
3. replays the SAME transitions through the native oracle side-by-side and
   reports any disagreement — runs wherever calvin_env is installed, skips
   here (the CALVIN simulator is not on this host).
"""
import numpy as np
import pytest

from hulc2_tpu.envs.fake_env import FakeCalvinEnv
from hulc2_tpu.envs.task_oracle import (
    CalvinTaskOracle,
    SceneObsTaskOracle,
    make_oracle,
    native_oracle_available,
)
from hulc2_tpu.evaluation.initial_states import get_env_state_for_initial_condition
from hulc2_tpu.evaluation.sequences import get_sequences
from hulc2_tpu.evaluation.tasks import TASK_NAMES

# opposite-effect pairs: performing one must never be detected as the other
REVERSE = {
    "open_drawer": "close_drawer",
    "close_drawer": "open_drawer",
    "move_slider_left": "move_slider_right",
    "move_slider_right": "move_slider_left",
    "turn_on_lightbulb": "turn_off_lightbulb",
    "turn_off_lightbulb": "turn_on_lightbulb",
    "turn_on_led": "turn_off_led",
    "turn_off_led": "turn_on_led",
    "stack_block": "unstack_block",
    "unstack_block": "stack_block",
}


def collect_transitions(n_chains=150):
    """(task, start_info, end_info) tuples from symbolic chain execution —
    the recorded-transition corpus both oracles are replayed over."""
    out = []
    for state, chain in get_sequences(n_chains):
        env = FakeCalvinEnv(static_hw=16, gripper_hw=16)
        robot_obs, scene_obs = get_env_state_for_initial_condition(dict(state))
        env.reset(robot_obs=robot_obs, scene_obs=scene_obs)
        for task in chain:
            start = env.get_info()
            env.perform(task)
            out.append((task, start, env.get_info()))
    return out


class TestOracleSelection:
    def test_fake_env_gets_heuristic(self):
        assert isinstance(make_oracle(real_env=False), SceneObsTaskOracle)

    def test_force_heuristic(self):
        assert isinstance(make_oracle(real_env=True, force_heuristic=True), SceneObsTaskOracle)

    def test_real_env_prefers_native(self):
        oracle = make_oracle(real_env=True)
        if native_oracle_available():
            assert isinstance(oracle, CalvinTaskOracle)
        else:  # loud fallback on simulator-free hosts
            assert isinstance(oracle, SceneObsTaskOracle)


class TestHeuristicOracleExhaustive:
    @pytest.fixture(scope="class")
    def transitions(self):
        return collect_transitions()

    def test_all_34_tasks_covered_and_detected(self, transitions):
        oracle = SceneObsTaskOracle()
        seen = set()
        for task, start, end in transitions:
            detected = oracle.get_task_info_for_set(start, end, TASK_NAMES)
            assert task in detected, (task, sorted(detected))
            seen.add(task)
        missing = set(TASK_NAMES) - seen
        assert not missing, f"chain corpus never exercised: {sorted(missing)}"

    def test_no_reverse_false_positives(self, transitions):
        oracle = SceneObsTaskOracle()
        for task, start, end in transitions:
            rev = REVERSE.get(task)
            if rev is None:
                continue
            detected = oracle.get_task_info_for_set(start, end, TASK_NAMES)
            assert rev not in detected, (task, rev, sorted(detected))

    def test_null_transition_detects_nothing(self):
        oracle = SceneObsTaskOracle()
        for state, _ in get_sequences(5):
            robot_obs, scene_obs = get_env_state_for_initial_condition(dict(state))
            info = {"scene_obs": scene_obs, "robot_obs": robot_obs}
            assert oracle.get_task_info_for_set(info, info, TASK_NAMES) == set()


@pytest.mark.skipif(not native_oracle_available(),
                    reason="calvin_env not installed on this host")
class TestNativeOracleDivergence:
    """Side-by-side replay: any disagreement between the heuristic and
    calvin_env's native oracle is a scoring-trust bug; the assertion message
    is the divergence report."""

    def test_heuristic_agrees_with_native(self):
        heuristic, native = SceneObsTaskOracle(), CalvinTaskOracle()
        divergence = []
        for task, start, end in collect_transitions(200):
            h = heuristic.get_task_info_for_set(start, end, [task])
            n = native.get_task_info_for_set(start, end, [task])
            if (task in h) != (task in n):
                divergence.append((task, "heuristic" if task in h else "native"))
        assert not divergence, f"oracle divergence on {len(divergence)}: {divergence[:20]}"
