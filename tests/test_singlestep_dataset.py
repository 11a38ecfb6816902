"""Dataset-derived single-step initial states (ADVICE r2: match the
reference's evaluate_policy_singlestep distribution, not truncated chains)."""
import numpy as np

from hulc2_tpu.evaluation.harness import dataset_singlestep_sequences
from hulc2_tpu.evaluation.initial_states import get_env_state_for_initial_condition
from hulc2_tpu.tools.make_synthetic_dataset import make_synthetic_calvin


class TestDatasetSinglestep:
    def test_jobs_from_validation_windows(self, tmp_path):
        root = make_synthetic_calvin(tmp_path / "ds", episodes=1, frames_per_episode=130,
                                     val_episodes=1, val_frames=130, static_hw=16,
                                     gripper_hw=16, n_lang=4)
        seqs = dataset_singlestep_sequences(root / "validation", max_per_task=2)
        assert len(seqs) > 0
        for state, chain in seqs:
            assert len(chain) == 1 and isinstance(chain[0], str)
            assert state["robot_obs"].shape == (15,)
            assert state["scene_obs"].shape == (24,)
            # explicit states pass straight through the reset path
            robot, scene = get_env_state_for_initial_condition(state)
            np.testing.assert_array_equal(robot, state["robot_obs"])
            np.testing.assert_array_equal(scene, state["scene_obs"])

    def test_max_per_task_cap(self, tmp_path):
        root = make_synthetic_calvin(tmp_path / "ds", episodes=1, frames_per_episode=130,
                                     val_episodes=2, val_frames=130, static_hw=16,
                                     gripper_hw=16, n_lang=4)
        seqs = dataset_singlestep_sequences(root / "validation", max_per_task=1)
        tasks = [chain[0] for _, chain in seqs]
        assert len(tasks) == len(set(tasks))  # at most one job per task
