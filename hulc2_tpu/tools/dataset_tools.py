"""Small dataset utilities: merging, proprio statistics, percentage subsets.

(reference roles: hulc2/utils/combine_dataset.py:49,
hulc2/utils/compute_proprioception_statistics.py:14,
hulc2/utils/data_utils.py get_split_data — the latter lives in
hulc2_tpu.data.episode_index.apply_data_percent.)
"""
from __future__ import annotations

import argparse
import json
import logging
import shutil
from pathlib import Path
from typing import List

import numpy as np

from hulc2_tpu.data.frame_store import NpzFrameStore

logger = logging.getLogger(__name__)


def combine_datasets(src_dirs: List, out_dir) -> np.ndarray:
    """Concatenate several frame datasets, renumbering frames and episode
    ranges (reference: combine_dataset.py:49)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    offset = 0
    all_ranges = []
    for src in src_dirs:
        src = Path(src)
        store = NpzFrameStore(src, [])
        ep_ids = np.load(src / "ep_start_end_ids.npy")
        for start, end in ep_ids:
            for i in range(int(start), int(end) + 1):
                shutil.copyfile(
                    store.frame_path(i),
                    out_dir / f"episode_{offset + i - int(start):07d}.npz",
                )
            all_ranges.append([offset, offset + int(end) - int(start)])
            offset += int(end) - int(start) + 1
    ranges = np.asarray(all_ranges)
    np.save(out_dir / "ep_start_end_ids.npy", ranges)
    logger.info("combined %d datasets -> %s (%d frames)", len(src_dirs), out_dir, offset)
    return ranges


def compute_proprioception_statistics(data_dir) -> dict:
    """Streaming mean/std/min/max of robot_obs over all frames
    (reference: compute_proprioception_statistics.py:14)."""
    data_dir = Path(data_dir)
    store = NpzFrameStore(data_dir, ["robot_obs"])
    ep_ids = np.load(data_dir / "ep_start_end_ids.npy")
    n, s, s2, mn, mx = 0, None, None, None, None
    for start, end in ep_ids:
        for i in range(int(start), int(end) + 1):
            ro = np.asarray(store.load_frame(i)["robot_obs"], np.float64)
            if s is None:
                s, s2 = np.zeros_like(ro), np.zeros_like(ro)
                mn, mx = ro.copy(), ro.copy()
            s += ro
            s2 += ro**2
            mn, mx = np.minimum(mn, ro), np.maximum(mx, ro)
            n += 1
    mean = s / n
    std = np.sqrt(np.maximum(s2 / n - mean**2, 0))
    stats = {
        "mean": mean.tolist(), "std": std.tolist(),
        "min": mn.tolist(), "max": mx.tolist(), "n_frames": n,
    }
    (data_dir / "proprioception_statistics.json").write_text(json.dumps(stats, indent=1))
    return stats


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("combine")
    c.add_argument("src_dirs", nargs="+")
    c.add_argument("--out-dir", required=True)
    s = sub.add_parser("proprio-stats")
    s.add_argument("data_dir")
    args = p.parse_args(argv)
    if args.cmd == "combine":
        combine_datasets(args.src_dirs, args.out_dir)
    else:
        compute_proprioception_statistics(args.data_dir)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
