"""Merge labeled affordance datasets into one training corpus.

Counterpart of the reference's dataset-merging script
(reference: hulc2/affordance/dataset_creation/merge_datasets.py): takes N
directories produced by ``dataset_creation.mine_labels`` (each with an
``episodes_split.json`` and per-episode ``data/<cam>_cam/*.npz``), and writes
a merged dataset directory that

- symlinks every source episode under a collision-free name
  (``<source-dir-name>_<episode>``),
- unions the training/validation splits, and
- pools the per-camera depth normalization statistics (frame-count-weighted
  mean; std via pooled variance), so ``AffordanceDataset`` consumes the merge
  exactly like a single mined dataset.

    python -m hulc2_tpu.affordance.merge_datasets out_dir src_a src_b ...
"""
from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
logger = logging.getLogger(__name__)


def merge_datasets(out_dir, src_dirs, copy: bool = False) -> dict:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    merged: dict = {"training": {}, "validation": {}}
    # per (cam, stat): list of (n_frames, mean, std)
    norm_acc: dict = {}

    for src in map(Path, src_dirs):
        info = json.loads((src / "episodes_split.json").read_text())
        n_frames = sum(
            len(files)
            for split in ("training", "validation")
            for content in info.get(split, {}).values()
            for files in content.values()
        )
        for split in ("training", "validation"):
            for ep, content in info.get(split, {}).items():
                new_ep = f"{src.name}_{ep}"
                merged[split][new_ep] = content
                link = out_dir / new_ep
                if not link.exists():
                    if copy:
                        import shutil

                        shutil.copytree(src / ep, link)
                    else:
                        link.symlink_to((src / ep).resolve())
        for cam, stats in info.get("norm_values", {}).get("depth", {}).items():
            norm_acc.setdefault(cam, []).append(
                (n_frames, float(stats["mean"]), float(stats["std"]))
            )

    merged["norm_values"] = {"depth": {}}
    for cam, entries in norm_acc.items():
        total = sum(n for n, _, _ in entries) or 1
        mean = sum(n * m for n, m, _ in entries) / total
        # pooled variance: E[var] + Var[means]
        var = sum(n * (s * s + (m - mean) ** 2) for n, m, s in entries) / total
        merged["norm_values"]["depth"][cam] = {"mean": mean, "std": var ** 0.5}

    (out_dir / "episodes_split.json").write_text(json.dumps(merged, indent=2))
    logger.info(
        "merged %d sources -> %s (%d training episodes)",
        len(src_dirs), out_dir, len(merged["training"]),
    )
    return merged


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("out_dir")
    p.add_argument("src_dirs", nargs="+")
    p.add_argument("--copy", action="store_true", help="copy episode dirs instead of symlinking")
    args = p.parse_args(argv)
    merge_datasets(args.out_dir, args.src_dirs, args.copy)


if __name__ == "__main__":
    main(sys.argv[1:])
