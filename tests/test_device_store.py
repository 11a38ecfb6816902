"""Device-resident frame store: gather-on-device batches must be bit-identical
to the host-assembled FusedBatchLoader (same RNG streams, same padding)."""
import numpy as np
import pytest

from hulc2_tpu.data.datamodule import Hulc2DataModule
from hulc2_tpu.data.loader import FusedBatchLoader

HW = 16


@pytest.fixture(scope="module")
def calvin_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("calvin_dev")
    rng = np.random.default_rng(3)
    for split, ranges in (("training", [(0, 60), (100, 155)]), ("validation", [(200, 250)])):
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
                    rel_actions=np.clip(rng.standard_normal(7), -1, 1).astype(np.float32),
                )
        ann = {
            "language": {
                "ann": ["push the button", "open the drawer"],
                "task": ["push_button", "open_drawer"],
                "emb": rng.standard_normal((2, 1, 32)).astype(np.float32),
            },
            "info": {"indx": [(r[0] + 1, r[0] + 38) for r in ranges[:1]] * 2},
        }
        lf = d / "lang_annotations"
        lf.mkdir()
        np.save(lf / "auto_lang_ann.npy", ann, allow_pickle=True)
        (d / "statistics.yaml").write_text("act_min_bound: [-1.0]\nact_max_bound: [1.0]\n")
    return root


def _dm_cfg(root, device_store):
    return {
        "root_data_dir": str(root),
        "batch_size_vis": 3,
        "batch_size_lang": 2,
        "min_window_size": 10,
        "max_window_size": 16,
        "skip_frames": 1,
        "frame_skip": None,
        "pad": True,
        "lang_folder": "lang_annotations",
        "aux_lang_loss_window": 8,
        "load_lang_embeddings": True,
        "num_workers": 2,
        "device_store": device_store,
        "observation_space": {
            "rgb_obs": ["rgb_static", "rgb_gripper"],
            "depth_obs": [],
            "state_obs": ["robot_obs"],
            "actions": ["rel_actions"],
            "language": ["language"],
        },
        "proprioception_dims": {"n_state_obs": 15, "keep_indices": [[0, 15]],
                                "robot_orientation_idx": [3, 6], "normalize": False,
                                "normalize_robot_orientation": False},
        "transforms": "rand_shift",
    }


def test_device_gather_matches_fused_loader(calvin_dir):
    dm = Hulc2DataModule(_dm_cfg(calvin_dir, True), seed=7)
    dm.setup()
    dev_loader = dm.fused_train_iter()
    # separate datamodule for the host reference: the device path frees the
    # RAM store's image arrays once they are resident in HBM
    dm_ref = Hulc2DataModule(_dm_cfg(calvin_dir, False), seed=7)
    dm_ref.setup()
    ref_loader = FusedBatchLoader(
        dm_ref.datasets["vis_training"], dm_ref.datasets["lang_training"],
        batch_size_vis=3, batch_size_lang=2, shuffle=True, seed=7, num_threads=1,
    )
    assert len(dev_loader) == len(ref_loader)
    for epoch in range(2):  # two epochs: the epoch counter must advance the RNG
        for got, want in zip(dev_loader, ref_loader):
            assert set(got) == set(want)
            for k in want:
                g = np.asarray(got[k])
                assert g.dtype == want[k].dtype, k
                np.testing.assert_array_equal(g, want[k], err_msg=k)


def test_device_gather_process_sharding(calvin_dir):
    """Multi-host sharding: each process must draw a DISJOINT strided slice
    of the same global permutation, exactly like FusedBatchLoader."""
    dms, shard_loaders = [], []
    for pi in range(2):
        dm = Hulc2DataModule(_dm_cfg(calvin_dir, True), seed=7,
                             process_index=pi, process_count=2)
        dm.setup()
        dms.append(dm)
        shard_loaders.append(dm.fused_train_iter())
    dm_ref = Hulc2DataModule(_dm_cfg(calvin_dir, False), seed=7)
    dm_ref.setup()
    refs = [
        FusedBatchLoader(
            dm_ref.datasets["vis_training"], dm_ref.datasets["lang_training"],
            batch_size_vis=3, batch_size_lang=2, shuffle=True, seed=7,
            num_threads=1, process_index=pi, process_count=2,
        )
        for pi in range(2)
    ]
    for got_loader, want_loader in zip(shard_loaders, refs):
        assert len(got_loader) == len(want_loader)
        for got, want in zip(got_loader, want_loader):
            for k in want:
                np.testing.assert_array_equal(np.asarray(got[k]), want[k], err_msg=k)


def test_process_loader_matches_fused_loader(calvin_dir):
    """Subprocess-assembled batches are the exact FusedBatchLoader stream
    (continuous across epochs — the child owns the epoch counter)."""
    cfg = _dm_cfg(calvin_dir, False)
    cfg["loader_isolation"] = "process"
    dm = Hulc2DataModule(cfg, seed=5)
    dm.setup()
    proc_loader = dm.fused_train_iter()
    ref_loader = FusedBatchLoader(
        dm.datasets["vis_training"], dm.datasets["lang_training"],
        batch_size_vis=3, batch_size_lang=2, shuffle=True, seed=5, num_threads=1,
    )
    try:
        assert len(proc_loader) == len(ref_loader)
        for epoch in range(2):
            for got, want in zip(proc_loader, ref_loader):
                assert set(got) == set(want)
                for k in want:
                    assert got[k].dtype == want[k].dtype, k
                    np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    finally:
        proc_loader.close()


def test_device_store_trains(calvin_dir, tmp_path):
    """End-to-end: two train steps through the device-store path."""
    import hulc2_tpu.configs  # noqa: F401
    from hulc2_tpu.core import config as cfg_lib
    from hulc2_tpu.train.trainer import Trainer

    cfg = cfg_lib.compose("cfg_low_level", [
        "datamodule.root_data_dir=" + str(calvin_dir),
        "datamodule.device_store=true",
        "datamodule.batch_size_vis=8", "datamodule.batch_size_lang=8",
        "datamodule.min_window_size=8", "datamodule.max_window_size=8",
        "model.plan_proposal.hidden_size=32",
        "model.plan_recognition.encoder_hidden_size=32",
        "model.plan_recognition.fc_hidden_size=32",
        "model.action_decoder.hidden_size=32",
        "model.visual_goal.hidden_size=32",
        "model.language_goal.hidden_size=32",
        "model.language_goal.in_features=32",
        "trainer.limit_val_batches=1",
        "trainer.log_every_n_steps=1",
    ])
    cfg["training"]["max_epochs"] = 1
    dm = Hulc2DataModule(cfg["datamodule"], seed=0)
    dm.setup()
    tr = Trainer(cfg, dm, tmp_path / "run")
    state = tr.fit(max_epochs=1, max_steps=2)
    assert int(state.step) == 2
    assert (tmp_path / "run" / "metrics.jsonl").exists()
