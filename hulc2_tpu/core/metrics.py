"""Metrics / logging / observability.

(reference roles: WandB/TB loggers — conf/logger/*.yaml; sync_dist scalar
logging — hulc2/models/hulc2.py:405-441; git-hash + system banner —
hulc2/training.py:56-57, hulc2/utils/utils.py:48-143; timeit decorator —
utils/utils.py:21-33.)

Default sink is an append-only ``metrics.jsonl`` in the run dir (machine
readable, diff-able); wandb/tensorboard attach when available. On multi-host,
only process 0 writes.
"""
from __future__ import annotations

import json
import logging
import os
import platform
import subprocess
import time
from contextlib import contextmanager
from pathlib import Path
from typing import Dict, Optional

logger = logging.getLogger(__name__)


def get_git_commit_hash(repo_path: Path) -> str:
    """Current commit hash, warning on dirty tree (reference: utils.py:48-62)."""
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=repo_path, capture_output=True, text=True, check=True
        ).stdout.strip()
        dirty = subprocess.run(
            ["git", "status", "--porcelain"], cwd=repo_path, capture_output=True, text=True
        ).stdout.strip()
        if dirty:
            logger.warning("repository has uncommitted changes — run may not be reproducible")
        return rev
    except Exception:
        return "unknown"


def print_system_env_info() -> Dict[str, str]:
    """Package + device inventory banner (reference: utils.py:130-143)."""
    import jax

    info = {
        "python": platform.python_version(),
        "platform": platform.platform(),
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": str(jax.devices()),
        "process_index": str(jax.process_index()),
        "process_count": str(jax.process_count()),
    }
    for line in sorted(f"{k}: {v}" for k, v in info.items()):
        logger.info(line)
    return info


@contextmanager
def timeit(name: str, sink: Optional[dict] = None):
    """Wall-clock timer (reference: utils.py:21-33 decorator)."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[name] = dt
    logger.info("%s took %.4f s", name, dt)


class MetricsLogger:
    """JSONL + optional wandb/tensorboard fan-out."""

    def __init__(self, run_dir, use_wandb: bool = False, use_tb: bool = False, is_main: bool = True):
        self.run_dir = Path(run_dir)
        self.is_main = is_main
        self._fh = None
        self._wandb = None
        self._tb = None
        if not is_main:
            return
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.run_dir / "metrics.jsonl", "a", buffering=1)
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project="hulc2_tpu", dir=str(self.run_dir))
            except Exception as e:  # offline clusters
                logger.warning("wandb unavailable (%s); falling back to jsonl", e)
        if use_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(self.run_dir / "tb"))
            except Exception as e:
                logger.warning("tensorboard unavailable (%s)", e)

    def log(self, metrics: Dict, step: int, prefix: str = "") -> None:
        if not self.is_main:
            return
        flat = {f"{prefix}{k}": float(v) for k, v in metrics.items()}
        rec = {"step": int(step), "time": time.time(), **flat}
        self._fh.write(json.dumps(rec) + "\n")
        if self._wandb:
            self._wandb.log(flat, step=step)
        if self._tb:
            for k, v in flat.items():
                self._tb.add_scalar(k, v, step)

    def close(self):
        if self._fh:
            self._fh.close()
        if self._tb:
            self._tb.close()
        if self._wandb:
            self._wandb.finish()
