"""Within-window frame skipping (reference ShmDatasetSkip) semantics."""
import numpy as np
import pytest

from hulc2_tpu.data import episode_index as ei
from hulc2_tpu.data.frame_skip import FrameSkip, make_frame_skip
from hulc2_tpu.data.frame_store import NpzFrameStore
from hulc2_tpu.data.window_dataset import WindowDataset

MIN_WS, MAX_WS = 20, 32
EFF_MIN, EFF_MAX = 10, 16

OBS_SPACE = {
    "rgb_obs": ["rgb_static"],
    "depth_obs": [],
    "state_obs": ["robot_obs"],
    "actions": ["rel_actions"],
    "language": ["language"],
}


def _skip(strategy, **kw):
    return FrameSkip(strategy=strategy, effective_min_ws=EFF_MIN, effective_max_ws=EFF_MAX, **kw)


def _smooth_actions(ws, rng=None):
    """All frames skippable under 'diff': constant xyz direction, tiny euler
    deltas, constant gripper."""
    a = np.zeros((ws, 7), np.float32)
    a[:, :3] = [0.1, 0.2, 0.3]
    a[:, 6] = 1.0
    return a


class TestEffectiveSize:
    def test_linear_map_endpoints(self):
        fs = _skip("random")
        assert fs.effective_size(MIN_WS, MIN_WS, MAX_WS) == EFF_MIN
        assert fs.effective_size(MAX_WS, MIN_WS, MAX_WS) == EFF_MAX
        mid = fs.effective_size(26, MIN_WS, MAX_WS)
        assert EFF_MIN < mid < EFF_MAX

    def test_validates(self):
        with pytest.raises(ValueError):
            FrameSkip("bogus", EFF_MIN, EFF_MAX)
        with pytest.raises(ValueError):
            FrameSkip("random", EFF_MAX, EFF_MIN)
        with pytest.raises(ValueError):
            FrameSkip("random", EFF_MIN, EFF_MAX, min_skip_ratio=0.5, max_skip_ratio=0.1)


class TestRandomStrategy:
    def test_ids_sorted_unique_in_range(self):
        fs = _skip("random")
        rng = np.random.default_rng(0)
        for ws in (MIN_WS, 26, MAX_WS):
            for _ in range(50):
                ids = fs.keep_ids(_smooth_actions(ws), MIN_WS, MAX_WS, rng)
                assert len(ids) == fs.effective_size(ws, MIN_WS, MAX_WS)
                assert (np.diff(ids) > 0).all()
                assert ids[0] >= 0 and ids[-1] < ws

    def test_no_skip_when_effective_covers_window(self):
        fs = FrameSkip("random", 32, 32)
        ids = fs.keep_ids(_smooth_actions(MAX_WS), MIN_WS, MAX_WS, np.random.default_rng(0))
        np.testing.assert_array_equal(ids, np.arange(MAX_WS))


class TestDiffStrategy:
    def test_never_two_consecutive_skips(self):
        fs = _skip("diff", min_skip_ratio=1.0)  # always skip the max allowed
        rng = np.random.default_rng(0)
        for _ in range(50):
            ids = fs.keep_ids(_smooth_actions(MAX_WS), MIN_WS, MAX_WS, rng)
            # between consecutive kept frames at most ONE frame was dropped
            assert (np.diff(ids) <= 2).all()

    def test_gripper_toggle_protected(self):
        fs = _skip("diff", min_skip_ratio=1.0)
        rng = np.random.default_rng(0)
        a = _smooth_actions(MAX_WS)
        toggle = 15
        a[toggle:, 6] = -1.0  # gripper flips between frame 14 and 15
        for _ in range(50):
            ids = set(fs.keep_ids(a, MIN_WS, MAX_WS, rng).tolist())
            kept_protected = ids & set(range(toggle, toggle + 4))
            # protected frames may fall outside the final contiguous slice,
            # but they must never be among the *skipped* frames inside it
            lo, hi = min(ids), max(ids)
            for t in range(toggle, toggle + 4):
                if lo <= t <= hi:
                    assert t in ids, (sorted(ids), t)

    def test_large_motion_never_skipped(self):
        fs = _skip("diff", min_skip_ratio=1.0)
        rng = np.random.default_rng(1)
        a = _smooth_actions(MAX_WS)
        a[20, :3] = [-0.1, -0.2, -0.3]  # direction reversal at frame 20
        for _ in range(50):
            ids = fs.keep_ids(a, MIN_WS, MAX_WS, rng)
            lo, hi = ids[0], ids[-1]
            if lo <= 20 <= hi:
                assert 20 in ids

    def test_immobile_window_skips_down_to_effective(self):
        fs = _skip("diff", min_skip_ratio=1.0)
        ids = fs.keep_ids(_smooth_actions(MAX_WS), MIN_WS, MAX_WS, np.random.default_rng(2))
        assert len(ids) == EFF_MAX


class TestMakeFrameSkip:
    def test_none_passthrough(self):
        assert make_frame_skip(None) is None
        assert make_frame_skip({}) is None

    def test_from_cfg(self):
        fs = make_frame_skip({"strategy": "diff", "effective_min_ws": 10, "effective_max_ws": 16})
        assert fs.strategy == "diff"
        assert fs.pos_threshold == 0.99  # reference default


@pytest.fixture(scope="module")
def skip_calvin_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("calvin_skip")
    rng = np.random.default_rng(0)
    d = root / "training"
    d.mkdir()
    np.save(d / "ep_start_end_ids.npy", np.asarray([(0, 70)]))
    for i in range(71):
        np.savez(
            d / f"episode_{i:07d}.npz",
            rgb_static=rng.integers(0, 256, (8, 8, 3), np.uint8),
            robot_obs=rng.standard_normal(15).astype(np.float32),
            rel_actions=np.clip(rng.standard_normal(7) * 0.01, -1, 1).astype(np.float32),
        )
    return root


class TestWindowDatasetIntegration:
    def _ds(self, root, strategy):
        idx = ei.build_vision_index(root / "training", "training", MIN_WS, MAX_WS)
        store = NpzFrameStore(root / "training", ["rgb_static", "robot_obs", "rel_actions"])
        return WindowDataset(
            idx, store, OBS_SPACE, seed=1, frame_skip=_skip(strategy)
        )

    @pytest.mark.parametrize("strategy", ["random", "diff"])
    def test_padded_to_effective_max(self, skip_calvin_dir, strategy):
        ds = self._ds(skip_calvin_dir, strategy)
        for i in (0, 13, 40):
            s = ds[i]
            assert s["rgb_static"].shape == (EFF_MAX, 8, 8, 3)
            assert s["actions"].shape == (EFF_MAX, 7)
            assert EFF_MIN <= int(s["seq_len"]) <= EFF_MAX

    def test_fused_write_into_matches_specs(self, skip_calvin_dir):
        ds = self._ds(skip_calvin_dir, "random")
        specs = ds.out_specs(batch=3)
        assert specs["rgb_static"][0] == (3, EFF_MAX, 8, 8, 3)
        bufs = {k: np.zeros(shape, dt) for k, (shape, dt) in specs.items()}
        for row, idx in enumerate((0, 7, 21)):
            ds.write_into(idx, bufs, row, epoch=0)
        assert bufs["rgb_static"].any()
        # rel-action padding: zeros except the repeated gripper dim
        # (can't know seq_len per row here; just check dtype/shape survived)
        assert bufs["actions"].dtype == np.float32

    def test_diff_requires_rel_actions(self, skip_calvin_dir):
        idx = ei.build_vision_index(skip_calvin_dir / "training", "training", MIN_WS, MAX_WS)
        store = NpzFrameStore(skip_calvin_dir / "training", ["rgb_static", "robot_obs", "rel_actions"])
        abs_space = dict(OBS_SPACE, actions=["actions"])
        with pytest.raises(ValueError):
            WindowDataset(idx, store, abs_space, seed=1, frame_skip=_skip("diff"))
