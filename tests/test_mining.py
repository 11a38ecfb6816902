"""Camera model + affordance label mining tests."""
import json
from pathlib import Path

import numpy as np
import pytest

from hulc2_tpu.affordance.dataset import AffordanceDataset
from hulc2_tpu.affordance.dataset_creation import (
    create_split_file,
    detect_interactions,
    mine_labels,
)
from hulc2_tpu.envs.camera import PinholeCamera


class TestCamera:
    def _cam(self):
        # camera 1.5m above the workspace looking straight down
        # (cam +z -> world -z): R = rot_x(pi)
        T = np.eye(4)
        T[:3, :3] = np.diag([1.0, -1.0, -1.0])
        T[:3, 3] = [0.0, 0.0, 1.5]
        return PinholeCamera.from_params(200, 200, 180.0, 180.0, 100.0, 100.0, T)

    def test_project_deproject_roundtrip(self):
        cam = self._cam()
        pts = np.array([[0.1, -0.2, 0.5], [0.0, 0.0, 0.4], [-0.3, -0.5, 0.6]])
        for p in pts:
            assert (self._cam().T_cam_world @ np.append(p, 1.0))[2] > 0  # in front
        for p in pts:
            uv = cam.project(p)
            cam_pt = cam.T_cam_world @ np.append(p, 1.0)
            back = cam.deproject_single_depth(uv, cam_pt[2])
            np.testing.assert_allclose(back, p, atol=1e-9)

    def test_deproject_uses_depth_map(self):
        cam = self._cam()
        p = np.array([0.05, -0.3, 0.5])
        uv = cam.project(p)
        depth_map = np.zeros((200, 200))
        d = (cam.T_cam_world @ np.append(p, 1.0))[2]
        depth_map[int(uv[1]), int(uv[0])] = d
        back = cam.deproject(uv, depth_map)
        np.testing.assert_allclose(back, p, atol=1e-6)


class TestInteractionDetection:
    def test_open_to_close_transitions(self):
        g = np.array([1, 1, -1, -1, 1, -1, -1, 1])
        assert detect_interactions(g) == [2, 5]

    def test_no_transition(self):
        assert detect_interactions(np.ones(10)) == []


class TestMining:
    @pytest.fixture(scope="class")
    def play_dir(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("play") / "training"
        root.mkdir(parents=True)
        rng = np.random.default_rng(0)
        n = 60
        np.save(root / "ep_start_end_ids.npy", np.asarray([[0, n - 1]]))
        scene = np.zeros(24)
        for i in range(n):
            # gripper closes at frame 30 while the drawer opens (task event)
            grip = -1.0 if 30 <= i <= 40 else 1.0
            if i == 32:
                scene = scene.copy()
                scene[1] = 0.22  # open_drawer completes
            robot_obs = np.zeros(15)
            robot_obs[:3] = [0.1, -0.2, 0.5]  # TCP in front of the camera
            robot_obs[-1] = grip
            np.savez(
                root / f"episode_{i:07d}.npz",
                rgb_static=rng.integers(0, 256, (64, 64, 3), np.uint8),
                depth_static=rng.random((64, 64), np.float32),
                robot_obs=robot_obs.astype(np.float32),
                scene_obs=scene.astype(np.float32),
                rel_actions=np.zeros(7, np.float32),
                actions=np.zeros(7, np.float32),
            )
        return root

    def test_mine_and_load(self, play_dir, tmp_path):
        T = np.eye(4)
        T[:3, :3] = np.diag([1.0, -1.0, -1.0])
        T[:3, 3] = [0.0, 0.0, 1.5]
        cam = PinholeCamera.from_params(64, 64, 60.0, 60.0, 32.0, 32.0, T)
        out = tmp_path / "aff_data"
        mined = mine_labels(play_dir, out, cam, "training", hist_frames=4)
        assert sum(len(v) for v in mined["episodes"].values()) > 0
        info = create_split_file(out, {"training": mined})
        assert "norm_values" in info and info["training"] or info["validation"]

        # the produced dataset loads through the affordance reader
        split = "training" if info["training"] else "validation"
        ds = AffordanceDataset(out, split, img_resize=64,
                               lang_embedder=lambda s: np.zeros(8, np.float32))
        s = ds[0]
        assert s["frame"].shape == (64, 64, 3)
        assert 0 <= s["px"][0] < 64 and 0 <= s["px"][1] < 64
        assert s["depth"] > 0
