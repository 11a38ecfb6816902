"""Data tooling tests: split/statistics, auto annotation, real-data
preprocessing, merging, launchers."""
import json
from pathlib import Path

import numpy as np
import pytest

from hulc2_tpu.tools import dataset_tools, launch, split_dataset
from hulc2_tpu.tools.annotations import ANNOTATION_BANK
from hulc2_tpu.tools.auto_lang_annotator import annotate_dataset, hash_embed
from hulc2_tpu.tools.preprocess_real_data import (
    frame_from_raw,
    preprocess_recording,
    quat_to_euler_xyz,
    render_low_freq,
)


def write_play_dataset(root: Path, ranges, with_scene_task=None):
    """Per-frame npz dataset; optionally make scene_obs complete a task
    mid-episode so the annotator finds it."""
    rng = np.random.default_rng(0)
    root.mkdir(parents=True, exist_ok=True)
    np.save(root / "ep_start_end_ids.npy", np.asarray(ranges))
    for start, end in ranges:
        scene = np.zeros(24)
        for i in range(start, end + 1):
            if with_scene_task == "open_drawer" and i == start + 40:
                scene = scene.copy()
                scene[1] = 0.22  # drawer open
            np.savez(
                root / f"episode_{i:07d}.npz",
                robot_obs=rng.standard_normal(15).astype(np.float32),
                scene_obs=scene.astype(np.float32),
                actions=rng.uniform(-0.4, 0.4, 7).astype(np.float32),
                rel_actions=rng.uniform(-1, 1, 7).astype(np.float32),
            )


class TestSplitDataset:
    def test_split_and_statistics(self, tmp_path):
        write_play_dataset(tmp_path, [(0, 99), (200, 259), (300, 349)])
        split = split_dataset.split_dataset(tmp_path, val_percentage=0.25)
        data = json.loads((tmp_path / "split.json").read_text())
        total = sum(e - s + 1 for s, e in data["training"]) + sum(
            e - s + 1 for s, e in data["validation"]
        )
        assert total == 100 + 60 + 50
        val_len = sum(e - s + 1 for s, e in data["validation"])
        assert abs(val_len - 0.25 * total) < 15  # close to requested
        stats = (tmp_path / "statistics.yaml").read_text()
        assert "robot_obs" in stats and "act_min_bound" in stats
        from hulc2_tpu.data.statistics import load_statistics

        st = load_statistics(tmp_path)
        assert st.robot_obs_mean.shape == (15,)
        assert len(st.act_min_bound) == 7

    def test_per_episode_split(self, tmp_path):
        write_play_dataset(tmp_path, [(0, 99)])
        split_dataset.split_dataset(tmp_path, val_percentage=0.1, strategy="per_episode")
        data = json.loads((tmp_path / "split.json").read_text())
        assert data["validation"][0][1] == 99
        assert data["training"][0][0] == 0


class TestAnnotator:
    def test_bank_covers_all_tasks(self):
        assert len(ANNOTATION_BANK) == 34
        assert all(len(v) >= 2 for v in ANNOTATION_BANK.values())

    def test_annotation_roundtrip(self, tmp_path):
        d = tmp_path / "training"
        write_play_dataset(d, [(0, 127)], with_scene_task="open_drawer")
        lang = annotate_dataset(d, window=64, stride=8)
        assert len(lang["info"]["indx"]) > 0
        assert all(t == "open_drawer" for t in lang["language"]["task"])
        # files readable by the language index builder
        from hulc2_tpu.data.episode_index import build_lang_index

        idx = build_lang_index(d, "training", 20, 32, "lang_annotations")
        assert len(idx) > 0 and idx.lang_ann.shape[-1] == 384
        # embeddings.npy usable by the eval lookup
        emb = np.load(d / "lang_annotations" / "embeddings.npy", allow_pickle=True).item()
        assert set(emb) == set(ANNOTATION_BANK)

    def test_windows_end_at_completion(self, tmp_path):
        """Aligned annotation: the oracle event sits ``tail`` frames before
        the window END (the reference annotator's end-at-completion
        convention, automatic_lang_annotator_mp.py:78-97) — never mid-range,
        where sub-windows sampled after it would pair post-task retreat with
        the task's sentence (the r5 flagship push/stack failure mode)."""
        d = tmp_path / "training"
        write_play_dataset(d, [(0, 127)], with_scene_task="open_drawer")
        lang = annotate_dataset(d, window=64, stride=8)
        assert len(lang["info"]["indx"]) >= 1  # dedup: one event, ~one row
        for s, e in lang["info"]["indx"]:
            assert e == 40 + 8, (s, e)  # completion frame 40 + tail 8
            assert e - s + 1 >= 27

    def test_back_to_back_completions_shrink_not_drop(self, tmp_path):
        """Two tasks completing ~45 frames apart: a full 64-frame lookback
        from the second completion spans the first, so the window must
        SHRINK to stay unambiguous instead of being dropped."""
        d = tmp_path / "training"
        rng = np.random.default_rng(0)
        d.mkdir(parents=True, exist_ok=True)
        np.save(d / "ep_start_end_ids.npy", np.asarray([(0, 159)]))
        scene = np.zeros(24)
        for i in range(160):
            if i == 40:
                scene = scene.copy()
                scene[1] = 0.22  # open_drawer completes
            if i == 85:
                scene = scene.copy()
                scene[4] = 1.0  # turn_on_lightbulb completes
            np.savez(d / f"episode_{i:07d}.npz",
                     robot_obs=rng.standard_normal(15).astype(np.float32),
                     scene_obs=scene.astype(np.float32),
                     actions=rng.uniform(-0.4, 0.4, 7).astype(np.float32),
                     rel_actions=rng.uniform(-1, 1, 7).astype(np.float32))
        lang = annotate_dataset(d, window=64, stride=8)
        by_task = {t: ix for t, ix in
                   zip(lang["language"]["task"], lang["info"]["indx"])}
        assert set(by_task) == {"open_drawer", "turn_on_lightbulb"}
        s2, e2 = by_task["turn_on_lightbulb"]
        assert e2 == 85 + 8
        assert s2 > 40  # shrunk past the earlier completion

    def test_validation_split_uses_canonical_bank(self, tmp_path):
        """Validation windows get the single fixed phrasing per task
        (reference: annotations@val_instructions binding, conf/lang_ann.yaml:10)."""
        from hulc2_tpu.tools.annotations import VALIDATION_BANK

        assert set(VALIDATION_BANK) == set(ANNOTATION_BANK)
        d = tmp_path / "validation"
        write_play_dataset(d, [(0, 127)], with_scene_task="open_drawer")
        lang = annotate_dataset(d, window=64, stride=8)
        assert len(lang["language"]["ann"]) > 0
        assert all(a == VALIDATION_BANK["open_drawer"] for a in lang["language"]["ann"])

    def test_synthetic_dataset_is_oracle_consistent(self, tmp_path):
        """make_synthetic_calvin episodes evolve through REAL symbolic task
        transitions: every written language window is confirmed by the
        scene-obs oracle, so annotator/stats/vis-rollouts work on the
        fixture."""
        from hulc2_tpu.data.frame_store import NpzFrameStore
        from hulc2_tpu.envs.task_oracle import SceneObsTaskOracle
        from hulc2_tpu.tools.make_synthetic_dataset import make_synthetic_calvin

        root = make_synthetic_calvin(tmp_path / "ds", episodes=1, frames_per_episode=130,
                                     val_episodes=1, val_frames=90, static_hw=16,
                                     gripper_hw=16, n_lang=4)
        ann = np.load(root / "training" / "lang_annotations" / "auto_lang_ann.npy",
                      allow_pickle=True).item()
        assert len(ann["language"]["ann"]) > 0
        store = NpzFrameStore(root / "training", ["scene_obs"])
        oracle = SceneObsTaskOracle()
        for (s, e), task in zip(ann["info"]["indx"], ann["language"]["task"]):
            a, b = store.load_frame(s), store.load_frame(e)
            done = oracle.get_task_info_for_set(
                {"scene_obs": a["scene_obs"]}, {"scene_obs": b["scene_obs"]}, [task])
            assert task in done, (task, s, e)

    def test_relabel_and_stats(self, tmp_path):
        """relabel_dataset re-embeds existing annotations into a new folder
        (reference relabel_with_new_lang_model.py role); dataset_task_statistics
        counts task windows (reference dataset_task_statistics.py role)."""
        from hulc2_tpu.tools.auto_lang_annotator import (
            dataset_task_statistics, relabel_dataset)

        d = tmp_path / "training"
        write_play_dataset(d, [(0, 127)], with_scene_task="open_drawer")
        annotate_dataset(d, window=64, stride=8)
        relabeled = relabel_dataset(d, embed_fn=lambda anns: hash_embed(anns, dim=64))
        assert relabeled["language"]["emb"].shape[-1] == 64
        src = np.load(d / "lang_annotations" / "auto_lang_ann.npy", allow_pickle=True).item()
        assert relabeled["language"]["ann"] == src["language"]["ann"]  # no resample
        assert relabeled["info"]["indx"] == src["info"]["indx"]
        out = np.load(d / "lang_annotations_relabeled" / "auto_lang_ann.npy",
                      allow_pickle=True).item()
        assert out["language"]["emb"].shape[-1] == 64
        stats = dataset_task_statistics(d, window=64, stride=8)
        assert stats.get("open_drawer", 0) > 0

    def test_hash_embed_deterministic(self):
        a = hash_embed(["open the drawer", "close the drawer"])
        b = hash_embed(["open the drawer", "close the drawer"])
        np.testing.assert_array_equal(a, b)
        assert not np.allclose(a[0], a[1])

    def test_stub_embedding_fallback_refused_outside_tests(self, monkeypatch):
        """Silent hash-embedding fallbacks must raise unless explicitly
        allowed (VERDICT r1: stub SR metrics are noise that looks like
        signal)."""
        import pytest

        from hulc2_tpu.tools.auto_lang_annotator import require_stub_embeddings_ok

        monkeypatch.delenv("HULC2_ALLOW_STUB_EMBEDDINGS", raising=False)
        with pytest.raises(RuntimeError, match="stub"):
            require_stub_embeddings_ok("test context")
        monkeypatch.setenv("HULC2_ALLOW_STUB_EMBEDDINGS", "1")
        require_stub_embeddings_ok("test context")  # no raise


class TestPreprocessRealData:
    def _raw_frame(self, rng, t):
        return {
            "robot_state": {
                "tcp_pos": np.array([0.4 + 0.001 * t, 0.0, 0.5]),
                "tcp_orn": np.array([0.0, 0.0, np.sin(0.05), np.cos(0.05)]),  # quat
                "gripper_opening_width": 0.07,
                "joint_positions": rng.standard_normal(7),
            },
            "action": {"motion": np.array([0, 0, 0, 1.0])},
            "rgb_static": rng.integers(0, 255, (16, 16, 3), np.uint8),
        }

    def test_quat_euler_roundtrip_against_ops(self):
        from hulc2_tpu.ops.rotations import euler_angles_to_matrix
        import jax.numpy as jnp

        q = np.array([0.1, -0.2, 0.3, 0.9])
        q = q / np.linalg.norm(q)
        e = quat_to_euler_xyz(q)
        # reconstruct the matrix both ways
        m1 = np.asarray(euler_angles_to_matrix(jnp.asarray(e)))
        x, y, z, w = q
        m2 = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        np.testing.assert_allclose(m1, m2, atol=1e-6)

    def test_preprocess_recording(self, tmp_path):
        rng = np.random.default_rng(1)
        rec = tmp_path / "rec"
        rec.mkdir()
        for t in range(6):
            np.savez(rec / f"frame_{t:04d}.npz", **self._raw_frame(rng, t))
        out = tmp_path / "out"
        n = preprocess_recording(rec, out, 0)
        assert n == 5
        frame = np.load(out / "episode_0000000.npz")
        assert frame["robot_obs"].shape == (15,)
        assert frame["rel_actions"].shape == (7,)
        assert abs(float(frame["rel_actions"][0]) - 0.001 / 0.02) < 1e-5

    def test_render_low_freq_sums_motion(self):
        frames = [
            {"rel_actions": np.array([0.1, 0, 0, 0, 0, 0, 1.0], np.float32)} for _ in range(4)
        ]
        lf = render_low_freq(frames, 2)
        assert len(lf) == 2
        np.testing.assert_allclose(lf[0]["rel_actions"][0], 0.2)


class TestDatasetTools:
    def test_combine(self, tmp_path):
        a, b = tmp_path / "a", tmp_path / "b"
        write_play_dataset(a, [(0, 40)])
        write_play_dataset(b, [(0, 30)])
        out = tmp_path / "combined"
        ranges = dataset_tools.combine_datasets([a, b], out)
        assert ranges.tolist() == [[0, 40], [41, 71]]
        assert (out / "episode_0000071.npz").exists()

    def test_proprio_stats(self, tmp_path):
        write_play_dataset(tmp_path, [(0, 50)])
        stats = dataset_tools.compute_proprioception_statistics(tmp_path)
        assert len(stats["mean"]) == 15 and stats["n_frames"] == 51


class TestLaunch:
    def test_sbatch_generation(self, tmp_path):
        path = launch.generate_sbatch(tmp_path / "run", overrides=["training.lr=1e-4"])
        text = path.read_text()
        assert "sbatch $0" in text and "timeout" in text and "training.lr=1e-4" in text
        assert (tmp_path / "run" / "resume_training.sh").exists()

    def test_watchdog_restarts_then_succeeds(self, tmp_path):
        flag = tmp_path / "flag"
        script = tmp_path / "s.py"
        script.write_text(
            "import sys, pathlib\n"
            f"f = pathlib.Path({str(flag)!r})\n"
            "if f.exists():\n    sys.exit(0)\n"
            "f.touch()\nsys.exit(1)\n"
        )
        rc = launch.watchdog(["python", str(script)], max_restarts=3, backoff_s=0.01)
        assert rc == 0
