"""Checkpoint manager: orbax-backed save/restore with the reference's
retention semantics.

(reference: Lightning ModelCheckpoint with save_top_k -1 / best-metric
monitors — conf/callbacks/checkpoint/*.yaml; auto-resume from newest ckpt —
hulc2/training.py:41-49, hulc2/utils/utils.py:65-80; hyperparameters embedded
for reconstruction — hulc2/models/hulc2.py:106.)

Each run dir holds ``config.json`` (the serialized model spec, written once)
and numbered orbax step directories. ``latest_checkpoint``/``all_checkpoints``
mirror the reference's mtime-ordered lookup utilities.
"""
from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, List, Optional

import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, run_dir, save_top_k: int = -1, monitor: Optional[str] = None, mode: str = "min"):
        self.run_dir = Path(run_dir).resolve()
        self.ckpt_dir = self.run_dir / "saved_models"
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=None if save_top_k == -1 else save_top_k,
            best_fn=(lambda m: m.get(monitor, 0.0)) if monitor else None,
            best_mode=mode,
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(self.ckpt_dir, options=opts)

    def save(self, step: int, state, metrics: Optional[dict] = None) -> None:
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        self._mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics)

    def restore(self, state_like, step: Optional[int] = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self) -> List[int]:
        return sorted(self._mgr.all_steps())

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_run_config(run_dir, cfg: dict) -> None:
    p = Path(run_dir)
    p.mkdir(parents=True, exist_ok=True)
    (p / "config.json").write_text(json.dumps(cfg, indent=2, default=str))


def load_run_config(run_dir) -> dict:
    return json.loads((Path(run_dir) / "config.json").read_text())


def get_last_checkpoint(run_dir) -> Optional[int]:
    """Newest step in a run's saved_models (reference: utils/utils.py:65-80)."""
    d = Path(run_dir) / "saved_models"
    if not d.is_dir():
        return None
    steps = [int(p.name) for p in d.iterdir() if p.is_dir() and p.name.isdigit()]
    return max(steps) if steps else None
