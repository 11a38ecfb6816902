"""Contract tests for the real-simulator branch (VERDICT r2 item 3).

The upstream calvin_env package is not installable here, so these tests
drive CalvinTaskOracle, make_calvin_env, CalvinEnvWrapper, get_camera_params
and make_oracle through tests/mock_calvin_env — a package pinning calvin_env's
import paths, signatures, and info-dict shapes (see its docstrings for the
reference citations). If upstream drifts, the mock is where the recorded
contract lives; if our code drifts, these tests catch it before first contact
with the actual simulator.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

MOCK_DIR = str(Path(__file__).parent / "mock_calvin_env")


@pytest.fixture()
def mock_calvin(monkeypatch):
    """Make the mock calvin_env importable for one test, then forget it."""
    monkeypatch.syspath_prepend(MOCK_DIR)
    yield
    for mod in [m for m in sys.modules if m.split(".")[0] == "calvin_env"]:
        del sys.modules[mod]


@pytest.fixture()
def dataset_dir(tmp_path):
    """Minimal dataset root with the recorded render config get_env demands."""
    (tmp_path / ".hydra").mkdir()
    (tmp_path / ".hydra" / "merged_config.yaml").write_text("env: {}\ncameras: {}\n")
    return tmp_path


def _scene(slider=0.0, drawer=0.0, lightbulb=0.0, led=0.0,
           red=(0.0, 0.0, 0.46), red_yaw=0.0):
    s = np.zeros(24)
    s[0], s[1], s[4], s[5] = slider, drawer, lightbulb, led
    s[6:9] = red
    s[11] = red_yaw
    s[12:15] = (0.2, -0.1, 0.46)
    s[18:21] = (-0.2, -0.1, 0.46)
    return s


class TestMakeCalvinEnv:
    def test_importerror_without_package(self):
        from hulc2_tpu.envs.calvin_wrapper import make_calvin_env

        assert "calvin_env" not in sys.modules
        with pytest.raises(ImportError, match="calvin_env is not installed"):
            make_calvin_env("/nonexistent")

    def test_builds_from_dataset_render_config(self, mock_calvin, dataset_dir):
        from hulc2_tpu.envs.calvin_wrapper import make_calvin_env

        env = make_calvin_env(dataset_dir, show_gui=False)
        assert env.show_gui is False and len(env.cameras) == 2

    def test_missing_render_config_raises(self, mock_calvin, tmp_path):
        from hulc2_tpu.envs.calvin_wrapper import make_calvin_env

        with pytest.raises(FileNotFoundError, match="merged_config"):
            make_calvin_env(tmp_path)


class TestCalvinEnvWrapper:
    def test_reset_roundtrip_and_obs_shape(self, mock_calvin, dataset_dir):
        from hulc2_tpu.envs.calvin_wrapper import make_wrapped_calvin_env

        env = make_wrapped_calvin_env(dataset_dir)
        scene = _scene(drawer=0.2)
        robot = np.arange(15.0)
        obs = env.reset(robot_obs=robot, scene_obs=scene)
        assert set(obs) == {"rgb_obs", "depth_obs", "robot_obs", "scene_obs"}
        assert obs["rgb_obs"]["rgb_static"].shape == (200, 200, 3)
        np.testing.assert_array_equal(obs["scene_obs"], scene)
        np.testing.assert_array_equal(obs["robot_obs"], robot)
        # state_info path (reset from a recorded dataset frame)
        obs2 = env.reset(state_info={"robot_obs": robot * 0, "scene_obs": scene * 0})
        assert obs2["robot_obs"].sum() == 0

    def test_step_action_types(self, mock_calvin, dataset_dir):
        from hulc2_tpu.envs.calvin_wrapper import make_wrapped_calvin_env

        env = make_wrapped_calvin_env(dataset_dir)
        env.reset(robot_obs=np.zeros(15), scene_obs=_scene())
        # relative policy action: np array -> {"type": "cartesian_rel"}
        obs, _, _, info = env.step(np.array([1, 0, 0, 0, 0, 0, 1.0]))
        assert obs["robot_obs"][0] > 0 and obs["robot_obs"][6] == 1.0
        assert "scene_info" in info and "robot_info" in info
        # absolute PD action: (pos, orn, gripper) tuple -> cartesian_abs
        obs, _, _, _ = env.step(([0.5, 0.1, 0.6], [0.0, 0.0, 0.0], [-1.0]))
        np.testing.assert_allclose(obs["robot_obs"][:3], [0.5, 0.1, 0.6])
        assert obs["robot_obs"][6] == -1.0

    def test_camera_params_deproject(self, mock_calvin, dataset_dir):
        from hulc2_tpu.envs.calvin_wrapper import make_wrapped_calvin_env
        from hulc2_tpu.envs.camera import PinholeCamera

        env = make_wrapped_calvin_env(dataset_dir)
        params = env.get_camera_params()
        assert params["width"] == 200 and params["K"].shape == (3, 3)
        cam = PinholeCamera.from_params(
            params["width"], params["height"],
            params["K"][0, 0], params["K"][1, 1], params["K"][0, 2], params["K"][1, 2],
            params["T_world_cam"], params["name"],
        )
        # the mock camera sits 1.2m above the origin looking down: the image
        # center deprojected at depth 1.2 lands at the world origin
        pt = cam.deproject_single_depth((100, 100), 1.2)
        np.testing.assert_allclose(pt, [0, 0, 0], atol=1e-6)


class TestCalvinTaskOracle:
    def _infos(self, env_wrapper, scene_a, scene_b):
        env_wrapper.reset(robot_obs=np.zeros(15), scene_obs=scene_a)
        start = env_wrapper.get_info()
        env_wrapper.reset(robot_obs=np.zeros(15), scene_obs=scene_b)
        return start, env_wrapper.get_info()

    def test_packaged_config_discovery(self, mock_calvin):
        from hulc2_tpu.envs.task_oracle import CalvinTaskOracle

        path = CalvinTaskOracle._find_tasks_config()
        assert path is not None and path.name == "new_playtable_tasks.yaml"
        oracle = CalvinTaskOracle()
        assert oracle._oracle.num_tasks >= 10

    def test_scores_env_infos(self, mock_calvin, dataset_dir):
        from hulc2_tpu.envs.calvin_wrapper import make_wrapped_calvin_env
        from hulc2_tpu.envs.task_oracle import CalvinTaskOracle

        env = make_wrapped_calvin_env(dataset_dir)
        oracle = CalvinTaskOracle()
        start, end = self._infos(env, _scene(drawer=0.0, led=0.0),
                                 _scene(drawer=0.2, led=1.0))
        tasks = ["open_drawer", "close_drawer", "turn_on_led", "turn_off_lightbulb"]
        assert oracle.get_task_info_for_set(start, end, tasks) == {
            "open_drawer", "turn_on_led"}

    def test_block_tasks(self, mock_calvin, dataset_dir):
        from hulc2_tpu.envs.calvin_wrapper import make_wrapped_calvin_env
        from hulc2_tpu.envs.task_oracle import CalvinTaskOracle

        env = make_wrapped_calvin_env(dataset_dir)
        oracle = CalvinTaskOracle()
        start, end = self._infos(
            env,
            _scene(red=(0.0, 0.0, 0.46), red_yaw=0.0),
            _scene(red=(0.15, 0.0, 0.53), red_yaw=np.radians(70)),
        )
        got = oracle.get_task_info_for_set(
            start, end,
            ["lift_red_block_table", "push_red_block_right",
             "rotate_red_block_left", "rotate_red_block_right"],
        )
        assert got == {"lift_red_block_table", "push_red_block_right",
                       "rotate_red_block_left"}


class TestMakeOracle:
    def test_prefers_native_when_real_env(self, mock_calvin):
        from hulc2_tpu.envs import task_oracle

        assert task_oracle.native_oracle_available()
        oracle = task_oracle.make_oracle(real_env=True)
        assert type(oracle).__name__ == "CalvinTaskOracle"

    def test_heuristic_fallback_without_package(self):
        from hulc2_tpu.envs import task_oracle

        assert not task_oracle.native_oracle_available()
        oracle = task_oracle.make_oracle(real_env=True)
        assert type(oracle).__name__ == "SceneObsTaskOracle"

    def test_force_heuristic(self, mock_calvin):
        from hulc2_tpu.envs import task_oracle

        oracle = task_oracle.make_oracle(real_env=True, force_heuristic=True)
        assert type(oracle).__name__ == "SceneObsTaskOracle"
