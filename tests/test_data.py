"""Data layer tests against a synthesized CALVIN-format dataset on disk."""
import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hulc2_tpu.data import episode_index as ei
from hulc2_tpu.data import device_transforms as dt
from hulc2_tpu.data.datamodule import Hulc2DataModule, RandomDataModule
from hulc2_tpu.data.frame_store import NpzFrameStore, RamFrameStore
from hulc2_tpu.data.loader import BatchLoader, collate, zip_modalities
from hulc2_tpu.data.statistics import load_statistics
from hulc2_tpu.data.window_dataset import WindowDataset

HW = 24  # tiny images for test speed
OBS_SPACE = {
    "rgb_obs": ["rgb_static", "rgb_gripper"],
    "depth_obs": [],
    "state_obs": ["robot_obs"],
    "actions": ["rel_actions"],
    "language": ["language"],
}
PROPRIO = {
    "n_state_obs": 8,
    "keep_indices": [[0, 7], [14, 15]],
    "robot_orientation_idx": [3, 6],
    "normalize": True,
    "normalize_robot_orientation": True,
}

STATS_YAML = """robot_obs:
  - _target_: calvin_agent.utils.transforms.NormalizeVector
    mean: [0.1, 0.2, 0.3, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.5]
    std: [1.0, 1.0, 1.0, 1.0, 1.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.0]
act_min_bound: [-0.43, -0.55, -0.49, -1.57, -0.57, -1.62, -1.0]
act_max_bound: [0.43, 0.27, 0.63, 1.57, 0.52, 1.63, 1.0]
"""


@pytest.fixture(scope="module")
def calvin_dir(tmp_path_factory):
    """Write a tiny dataset in the reference's on-disk format
    (per-frame episode_XXXXXXX.npz + ep_start_end_ids.npy + auto_lang_ann.npy
    + statistics.yaml)."""
    root = tmp_path_factory.mktemp("calvin")
    rng = np.random.default_rng(0)
    for split, ranges in (("training", [(0, 70), (100, 170)]), ("validation", [(200, 260)])):
        d = root / split
        d.mkdir()
        np.save(d / "ep_start_end_ids.npy", np.asarray(ranges))
        for start, end in ranges:
            for i in range(start, end + 1):
                np.savez(
                    d / f"episode_{i:07d}.npz",
                    rgb_static=rng.integers(0, 256, (HW, HW, 3), np.uint8),
                    rgb_gripper=rng.integers(0, 256, (HW, HW, 3), np.uint8),
                    robot_obs=rng.standard_normal(15).astype(np.float32),
                    scene_obs=rng.standard_normal(24).astype(np.float32),
                    rel_actions=np.clip(rng.standard_normal(7), -1, 1).astype(np.float32),
                    actions=np.clip(rng.standard_normal(7), -1, 1).astype(np.float32),
                )
        # language annotations: 2 windows per split
        n_ann = 2
        indx = [(r[0] + 2, r[0] + 40) for r in ranges[:1]] * n_ann
        ann = {
            "language": {
                "ann": ["push the button", "open the drawer"],
                "task": ["push_button", "open_drawer"],
                "emb": rng.standard_normal((n_ann, 1, 384)).astype(np.float32),
            },
            "info": {"indx": indx},
        }
        lf = d / "lang_annotations"
        lf.mkdir()
        np.save(lf / "auto_lang_ann.npy", ann, allow_pickle=True)
        (d / "statistics.yaml").write_text(STATS_YAML)
    return root


class TestEpisodeIndex:
    def test_vision_index_counts(self, calvin_dir):
        idx = ei.build_vision_index(calvin_dir / "training", "training", 20, 32)
        # each episode (len 71) contributes end+1-min_window-start = 51 starts
        assert len(idx) == 51 * 2
        assert idx.max_window(0) == 32
        # near the episode end the window shrinks; the reference's heuristic
        # (npz_dataset.py:71-81) is conservative by one frame — start 50 of a
        # 0..70 episode yields 20, and we reproduce that exactly for sampling
        # distribution parity
        assert idx.max_window(50) == 20
        assert idx.max_window(39) == 31

    def test_val_windows_deterministic(self, calvin_dir):
        idx = ei.build_vision_index(calvin_dir / "validation", "validation", 20, 32)
        rng = np.random.default_rng(0)
        sizes = [idx.window_size(i, rng) for i in range(20)]
        assert sizes == [idx.window_size(i, rng) for i in range(20)]
        assert all(20 <= s <= 32 for s in sizes)

    def test_data_percent_trims(self, calvin_dir):
        full = ei.build_vision_index(calvin_dir / "training", "training", 20, 32, 1.0)
        half = ei.build_vision_index(calvin_dir / "training", "training", 20, 32, 0.5)
        assert len(half) < len(full)

    def test_lang_index(self, calvin_dir):
        idx = ei.build_lang_index(calvin_dir / "training", "training", 20, 32, "lang_annotations")
        assert idx.with_lang
        assert idx.lang_ann.shape[-1] == 384
        # each annotated range (2..40) yields 40+1-20-2 = 19 starts, 2 anns
        assert len(idx) == 19 * 2
        # last windows of each annotation flagged for aux loss
        flags = [idx.use_for_aux_lang_loss(i) for i in range(len(idx))]
        assert flags[18] and flags[-1]
        assert not flags[0]


class TestStores:
    def test_npz_store_window(self, calvin_dir):
        store = NpzFrameStore(calvin_dir / "training", ["rgb_static", "robot_obs", "rel_actions"])
        w = store.load_window(5, 4)
        assert w["rgb_static"].shape == (4, HW, HW, 3)
        assert w["robot_obs"].shape == (4, 15)

    def test_ram_store_matches_npz(self, calvin_dir):
        keys = ["rgb_static", "rgb_gripper", "robot_obs", "rel_actions"]
        npz = NpzFrameStore(calvin_dir / "training", keys)
        ram = RamFrameStore(npz, np.asarray([(0, 70), (100, 170)]), keys, use_shm=False)
        for start, size in [(0, 8), (110, 32), (60, 11)]:
            a = npz.load_window(start, size)
            b = ram.load_window(start, size)
            for k in keys:
                np.testing.assert_array_equal(a[k], b[k])


class TestWindowDataset:
    def _ds(self, calvin_dir, split="training"):
        idx = ei.build_vision_index(calvin_dir / split, split, 20, 32)
        store = NpzFrameStore(
            calvin_dir / split, ["rgb_static", "rgb_gripper", "robot_obs", "scene_obs", "rel_actions"]
        )
        return WindowDataset(idx, store, OBS_SPACE, seed=1)

    def test_shapes_static(self, calvin_dir):
        ds = self._ds(calvin_dir)
        for i in [0, 17, 49]:
            s = ds[i]
            assert s["rgb_static"].shape == (32, HW, HW, 3)
            assert s["rgb_static"].dtype == np.uint8
            assert s["actions"].shape == (32, 7)
            assert s["robot_obs_raw"].shape == (32, 15)

    def test_rel_action_padding(self, calvin_dir):
        ds = self._ds(calvin_dir)
        # find a sample that gets padded (near episode end)
        s = ds[50]
        n = int(s["seq_len"])
        if n < 32:
            np.testing.assert_array_equal(s["actions"][n:, :-1], 0.0)  # zeros
            np.testing.assert_array_equal(s["actions"][n:, -1], s["actions"][n - 1, -1])
            np.testing.assert_array_equal(s["rgb_static"][n:], np.repeat(s["rgb_static"][n - 1: n], 32 - n, 0))

    def test_lang_dataset(self, calvin_dir):
        idx = ei.build_lang_index(calvin_dir / "training", "training", 20, 32, "lang_annotations")
        store = NpzFrameStore(
            calvin_dir / "training", ["rgb_static", "rgb_gripper", "robot_obs", "rel_actions"]
        )
        ds = WindowDataset(idx, store, OBS_SPACE, seed=1)
        s = ds[0]
        assert s["lang"].shape == (384,)
        assert "use_for_aux_lang_loss" in s


class TestLoaderAndTransforms:
    def test_end_to_end_batch(self, calvin_dir):
        dm = Hulc2DataModule(
            {
                "root_data_dir": str(calvin_dir),
                "min_window_size": 20,
                "max_window_size": 32,
                "batch_size_vis": 4,
                "batch_size_lang": 4,
                "lang_folder": "lang_annotations",
                "num_workers": 2,
                "observation_space": OBS_SPACE,
                "proprioception_dims": PROPRIO,
            },
            seed=0,
        )
        dm.setup()
        stats = dm.stats["training"]
        assert stats.robot_obs_mean is not None and stats.robot_obs_mean.shape == (15,)
        assert stats.act_min_bound[0] == -0.43

        batch = next(iter(dm.train_iter()))
        assert batch["vis"]["rgb_static"].shape == (4, 32, HW, HW, 3)
        assert batch["lang"]["lang"].shape == (4, 384)

        tf = dt.make_batch_transform(OBS_SPACE, PROPRIO, stats, "rand_shift", train=True)
        out = jax.jit(tf)(jax.random.PRNGKey(0), jax.tree_util.tree_map(jnp.asarray, batch["vis"]))
        # the rand_shift preset resizes static to 200 / gripper to 84
        assert out["rgb_obs"]["rgb_static"].shape == (4, 32, 200, 200, 3)
        assert out["rgb_obs"]["rgb_gripper"].shape == (4, 32, 84, 84, 3)
        assert out["rgb_obs"]["rgb_static"].dtype == jnp.float32
        assert float(out["rgb_obs"]["rgb_static"].max()) <= 1.0 + 1e-5
        assert out["robot_obs"].shape == (4, 32, 8)
        # zero-std dim (index 14) must not produce inf/nan
        assert np.all(np.isfinite(np.asarray(out["robot_obs"])))

    def _dm(self, calvin_dir, **over):
        cfg = {
            "root_data_dir": str(calvin_dir),
            "min_window_size": 20,
            "max_window_size": 32,
            "batch_size_vis": 4,
            "batch_size_lang": 4,
            "lang_folder": "lang_annotations",
            "num_workers": 2,
            "observation_space": OBS_SPACE,
            "proprioception_dims": PROPRIO,
        }
        cfg.update(over)
        dm = Hulc2DataModule(cfg, seed=0)
        dm.setup()
        return dm

    def test_fused_loader_matches_composable_path(self, calvin_dir):
        """FusedBatchLoader (single host pass) must produce the same fused
        batch CONTENT as BatchLoader -> collate -> zip -> fuse_batch_host for
        a deterministic configuration (fixed window size, no shuffle)."""
        from hulc2_tpu.data.loader import FusedBatchLoader, fuse_batch_host, zip_modalities

        dm = self._dm(calvin_dir, min_window_size=24, max_window_size=24)
        fused = next(iter(FusedBatchLoader(
            dm.datasets["vis_training"], dm.datasets["lang_training"],
            4, 4, shuffle=False, num_threads=2,
        )))
        ref = fuse_batch_host(next(iter(zip_modalities(
            ("vis", "lang"),
            BatchLoader(dm.datasets["vis_training"], 4, shuffle=False, num_threads=1),
            BatchLoader(dm.datasets["lang_training"], 4, shuffle=False, num_threads=1),
        ))))
        assert set(fused) == set(ref)
        for k in ref:
            np.testing.assert_array_equal(fused[k], np.asarray(ref[k]), err_msg=k)

    def test_fused_loader_shapes_and_padding(self, calvin_dir):
        """Random window sizes: padded regions must repeat observations and
        zero rel-actions (except the gripper dim), like the reference
        base_dataset.py:121-147 semantics."""
        from hulc2_tpu.data.loader import FusedBatchLoader

        dm = self._dm(calvin_dir)
        ldr = FusedBatchLoader(
            dm.datasets["vis_training"], dm.datasets["lang_training"],
            4, 4, shuffle=True, num_threads=2,
        )
        batch = next(iter(ldr))
        assert batch["rgb_static"].shape == (8, 32, HW, HW, 3)
        assert batch["lang"].shape == (4, 384)
        assert batch["use_for_aux_lang_loss"].shape == (4,)
        # find a padded row and check semantics (windows are 20..32)
        for row in range(8):
            acts = batch["actions"][row]
            rgb = batch["rgb_static"][row]
            tail_equal = np.array_equal(rgb[-1], rgb[-2])
            if tail_equal and not np.array_equal(acts[-1, :-1], acts[-2, :-1]):
                continue  # can't distinguish; skip
            if tail_equal:
                assert np.all(acts[-1, :-1] == 0.0) or np.array_equal(acts[-1], acts[-2])
        assert len(ldr) == min(len(dm.datasets["vis_training"]) // 4,
                               len(dm.datasets["lang_training"]) // 4)

    def test_proprio_slicing_matches_reference_semantics(self, calvin_dir):
        stats = load_statistics(calvin_dir / "training")
        raw = jnp.asarray(np.random.default_rng(3).standard_normal((2, 5, 15)), jnp.float32)
        out = dt.process_proprio(raw, stats, PROPRIO)
        # keep_indices [[0,7],[14,15]] -> 8 dims; dim 7 == raw idx 14 normalized
        expected_first = (np.asarray(raw[..., 0]) - 0.1) / 1.0
        np.testing.assert_allclose(np.asarray(out[..., 0]), expected_first, rtol=1e-5)
        # idx 5 has std 2.0
        expected5 = np.asarray(raw[..., 5]) / 2.0
        np.testing.assert_allclose(np.asarray(out[..., 5]), expected5, rtol=1e-5)

    def test_random_datamodule(self):
        dm = RandomDataModule(
            {"max_window_size": 8, "batch_size_vis": 2, "batch_size_lang": 2}, n_samples=8
        )
        dm.setup()
        batch = next(iter(dm.train_iter()))
        assert batch["vis"]["rgb_static"].shape[0] == 2
        assert batch["lang"]["lang"].shape == (2, 384)


class TestEpochShuffling:
    def test_fresh_shuffle_each_epoch(self):
        """Persistent loaders must produce a different batch order per epoch
        (regression: recreating loaders reset the epoch counter)."""
        ds = [{"idx": np.int64(i), "x": np.float32(i)} for i in range(32)]

        class ListDS:
            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                return ds[i]

        loader = BatchLoader(ListDS(), batch_size=8, shuffle=True, seed=0, num_threads=1)
        e0 = [tuple(b["idx"].tolist()) for b in loader]
        e1 = [tuple(b["idx"].tolist()) for b in loader]
        assert e0 != e1
        # and deterministic given (seed, epoch)
        loader2 = BatchLoader(ListDS(), batch_size=8, shuffle=True, seed=0, num_threads=1)
        assert [tuple(b["idx"].tolist()) for b in loader2] == e0

    def test_datamodule_persistent_train_loaders(self):
        dm = RandomDataModule(
            {"max_window_size": 4, "batch_size_vis": 4, "batch_size_lang": 4}, n_samples=16
        )
        dm.setup()
        b0 = [b["vis"]["idx"].tolist() for b in dm.train_iter()]
        b1 = [b["vis"]["idx"].tolist() for b in dm.train_iter()]
        assert b0 != b1


class TestNativeLoader:
    """Direct coverage of the C++ npz frame loader (native/frameloader.cpp)."""

    def test_native_matches_numpy(self, tmp_path):
        from hulc2_tpu.data import native_loader

        rng = np.random.default_rng(5)
        paths, want_rgb, want_act = [], [], []
        for i in range(6):
            rgb = rng.integers(0, 256, (16, 16, 3), np.uint8)
            act = rng.standard_normal(7).astype(np.float32)
            p = tmp_path / f"frame_{i:07d}.npz"
            # both stored and deflated entries exercise the inflate path
            if i % 2:
                np.savez_compressed(p, rgb_static=rgb, actions=act)
            else:
                np.savez(p, rgb_static=rgb, actions=act)
            paths.append(str(p))
            want_rgb.append(rgb)
            want_act.append(act)

        assert native_loader.probe_entry_bytes(paths[0], "rgb_static") == 16 * 16 * 3

        out = np.empty((6, 16, 16, 3), np.uint8)
        native_loader.load_frames_into(paths, "rgb_static", out, n_threads=4)
        np.testing.assert_array_equal(out, np.stack(want_rgb))

        acts = np.empty((6, 7), np.float32)
        native_loader.load_frames_into(paths, "actions", acts, n_threads=2)
        np.testing.assert_array_equal(acts, np.stack(want_act))

    def test_native_error_on_missing_key(self, tmp_path):
        from hulc2_tpu.data import native_loader

        if not native_loader.available():
            pytest.skip("native loader not built")
        p = tmp_path / "x.npz"
        np.savez(p, a=np.zeros(3, np.float32))
        out = np.empty((1, 3), np.float32)
        with pytest.raises(RuntimeError):
            native_loader.load_frames_into([str(p)], "missing", out)
