"""Tests for the round-3 minor data tools (percentage splits, episodes_split
format conversion, raw real-data splitting, best-model CLI, seq videos)."""
import json
from pathlib import Path

import numpy as np
import pytest

from hulc2_tpu.tools.dataset_tools import (
    create_percentage_splits,
    split_episodes_by_percentage,
    split_raw_real_dataset,
    transform_old_episodes_split,
)


def _aff_tree(tmp_path: Path) -> Path:
    """Affordance dataset skeleton: two training episodes of 100 frames each."""
    root = tmp_path / "aff"
    (root / "training").mkdir(parents=True)
    np.save(root / "training" / "ep_start_end_ids.npy",
            np.array([[0, 99], [100, 199]], dtype=np.int64))
    split = {
        "training": {
            "episode_0": {
                "static_cam": [f"frame_{i:07d}" for i in range(0, 200, 10)],
                "gripper_cam": [],
            },
        },
        "validation": {
            "episode_1": {"static_cam": ["frame_0000200"], "gripper_cam": []},
        },
    }
    (root / "episodes_split.json").write_text(json.dumps(split))
    return root


class TestPercentageSplits:
    def test_half_split_keeps_first_half_frames(self, tmp_path):
        root = _aff_tree(tmp_path)
        split = json.loads((root / "episodes_split.json").read_text())
        out = split_episodes_by_percentage(root, split, 0.5)
        kept = out["training"]["episode_0"]["static_cam"]
        # 50% of frames -> ep1 (ids 0..99) + ep2 trimmed to its first frame
        # (same end-inclusive trim as the reference's get_split_data)
        assert kept == [f"frame_{i:07d}" for i in range(0, 110, 10)]
        # validation untouched
        assert out["validation"] == split["validation"]
        # input not mutated
        assert len(split["training"]["episode_0"]["static_cam"]) == 20

    def test_create_files(self, tmp_path):
        root = _aff_tree(tmp_path)
        files = create_percentage_splits(root, percents=[0.5, 0.25])
        assert [f.name for f in files] == [
            "episodes_split_50.0.json", "episodes_split_25.0.json"]
        sub = json.loads(files[1].read_text())
        assert len(sub["training"]["episode_0"]["static_cam"]) == 5  # ids 0..40


class TestTransformOldFormat:
    def test_flat_to_nested(self, tmp_path):
        root = tmp_path
        old = {
            "training": {"ep0": ["static_cam/frame_0000001", "gripper_cam/frame_0000002"]},
            "validation": {"ep1": ["static_cam/frame_0000003"]},
        }
        (root / "episodes_split.json").write_text(json.dumps(old))
        out = json.loads(transform_old_episodes_split(root).read_text())
        assert out["training"]["ep0"] == {
            "gripper_cam": ["frame_0000002"], "static_cam": ["frame_0000001"]}
        assert out["validation"]["ep1"]["static_cam"] == ["frame_0000003"]


class TestRawRealSplit:
    def _raw_tree(self, tmp_path: Path, n_eps=4, ep_len=5) -> Path:
        root = tmp_path / "raw"
        root.mkdir()
        ids = []
        for e in range(n_eps):
            start = e * ep_len
            ids.append([start, start + ep_len - 1])
            for i in range(start, start + ep_len):
                np.savez(root / f"frame_{i:07d}.npz", x=np.zeros(1))
        np.savez(root / "camera_info.npz", k=np.eye(3))  # must be ignored
        np.save(root / "ep_start_end_ids.npy", np.array(ids, dtype=np.int64))
        return root

    def test_last_k(self, tmp_path):
        root = self._raw_tree(tmp_path)
        out = split_raw_real_dataset(root, last_k=1)
        assert len(out["validation"]) == 1 and len(out["training"]) == 3
        assert np.array_equal(out["validation"][0], [15, 19])
        # frames physically moved; calibration file left in place
        assert sorted(f.name for f in (root / "validation").glob("*.npz")) == [
            f"frame_{i:07d}.npz" for i in range(15, 20)]
        assert len(list((root / "training").glob("frame_*.npz"))) == 15
        assert (root / "camera_info.npz").is_file()
        assert np.load(root / "all_ep_start_end_ids.npy").shape == (4, 2)

    def test_random_split_is_seeded_10pct(self, tmp_path):
        root = self._raw_tree(tmp_path, n_eps=10)
        out = split_raw_real_dataset(root, last_k=0, seed=0)
        assert len(out["validation"]) == 1  # ceil(10 * 0.1)
        assert len(out["training"]) == 9

    def test_last_k_too_large(self, tmp_path):
        root = self._raw_tree(tmp_path)
        with pytest.raises(ValueError):
            split_raw_real_dataset(root, last_k=4)


class TestBestEvalModel:
    def test_picks_max_avg_seq_len(self, tmp_path, capsys):
        from hulc2_tpu.evaluation.harness import best_eval_model

        results = {
            "10": {"avg_seq_len": 1.5, "chain_sr": {"1": 0.6}},
            "20": {"avg_seq_len": 2.5, "chain_sr": {"1": 0.8}},
            "best": {"epoch": "20", "avg_seq_len": 2.5, "chain_sr": {"1": 0.8}},
        }
        f = tmp_path / "results.json"
        f.write_text(json.dumps(results))
        assert best_eval_model(f) == "20"
        out = capsys.readouterr().out.splitlines()
        assert out[0] == "20" and out[1] == "2.5"


class TestMakeSeqVideos:
    def test_compose_and_write(self, tmp_path):
        imageio = pytest.importorskip("imageio.v2")
        from hulc2_tpu.tools.make_seq_videos import make_sequence_video

        seq = tmp_path / "sequence_000"
        task = seq / "00_open_drawer" / "model_based"
        for cam in ("static_cam", "gripper_cam"):
            (task / cam).mkdir(parents=True)
            for i in range(3):
                imageio.imwrite(task / cam / f"{i:03d}.png",
                                np.full((64, 64, 3), 30 * i, np.uint8))
        imageio.imwrite(seq / "00_open_drawer" / "aff_pred_0.png",
                        np.full((32, 32, 3), 200, np.uint8))
        (seq / "sequence_tasks.txt").write_text("open the drawer\n")

        out = make_sequence_video(seq, fps=5)
        assert out.is_file() and out.suffix in (".mp4", ".gif")  # gif: no ffmpeg here
        frames = imageio.mimread(out)
        assert len(frames) == 3
        # montage: left column (aff+gripper) + static, plus 2 caption bars
        assert frames[0].shape[0] > 64 and frames[0].shape[1] > 64

    def test_missing_images_raises(self, tmp_path):
        from hulc2_tpu.tools.make_seq_videos import make_sequence_video

        seq = tmp_path / "sequence_001"
        (seq / "00_task").mkdir(parents=True)
        with pytest.raises(FileNotFoundError):
            make_sequence_video(seq)
