"""Dataset statistics (statistics.yaml) parsing.

The reference merges statistics.yaml entries into its Hydra transform configs
(reference: hulc2/datasets/utils/episode_utils.py:168-208). Here the relevant
numbers are extracted directly: robot_obs / scene_obs normalization vectors
and action bounds.
"""
from __future__ import annotations

import logging
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class DatasetStatistics:
    robot_obs_mean: Optional[np.ndarray] = None
    robot_obs_std: Optional[np.ndarray] = None
    scene_obs_mean: Optional[np.ndarray] = None
    scene_obs_std: Optional[np.ndarray] = None
    act_min_bound: Optional[List[float]] = None
    act_max_bound: Optional[List[float]] = None


def load_statistics(dataset_dir: Path) -> DatasetStatistics:
    """Parse statistics.yaml (NormalizeVector mean/std + action bounds)."""
    path = Path(dataset_dir) / "statistics.yaml"
    stats = DatasetStatistics()
    if not path.is_file():
        logger.warning("no statistics.yaml in %s — using identity normalization", dataset_dir)
        return stats
    try:
        import yaml

        raw = yaml.safe_load(path.read_text())
    except ImportError:  # minimal fallback parser for the known layout
        raw = _parse_simple_yaml(path.read_text())

    for key, mean_attr, std_attr in (
        ("robot_obs", "robot_obs_mean", "robot_obs_std"),
        ("scene_obs", "scene_obs_mean", "scene_obs_std"),
    ):
        entries = raw.get(key) or []
        for e in entries:
            if isinstance(e, dict) and "mean" in e and "std" in e:
                setattr(stats, mean_attr, np.asarray(e["mean"], np.float32))
                setattr(stats, std_attr, np.asarray(e["std"], np.float32))
    if "act_min_bound" in raw:
        stats.act_min_bound = [float(v) for v in raw["act_min_bound"]]
    if "act_max_bound" in raw:
        stats.act_max_bound = [float(v) for v in raw["act_max_bound"]]
    return stats


def _parse_simple_yaml(text: str) -> dict:
    """Tiny fallback for statistics.yaml's restricted structure."""
    import json

    out: dict = {}
    current_key = None
    current_entry = None
    for line in text.splitlines():
        if not line.strip() or line.strip().startswith("#"):
            continue
        m = re.match(r"^(\w+):\s*$", line)
        if m:
            current_key = m.group(1)
            out[current_key] = []
            continue
        m = re.match(r"^(\w+):\s*(\[.*\])\s*$", line)
        if m:
            out[m.group(1)] = json.loads(m.group(2))
            continue
        m = re.match(r"^\s*-\s*_target_:", line)
        if m and current_key:
            current_entry = {}
            out[current_key].append(current_entry)
            continue
        m = re.match(r"^\s*(\w+):\s*(\[.*\])\s*$", line)
        if m and current_entry is not None:
            current_entry[m.group(1)] = json.loads(m.group(2))
    return out
