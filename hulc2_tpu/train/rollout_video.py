"""Rollout video accumulation + annotated export.

Counterpart of the reference RolloutVideo
(reference: hulc2/rollout/rollout_video.py:38-266): collects frames per
rollout, draws a success/fail border and the language caption, optionally
appends a goal thumbnail, and writes mp4 files (imageio) or logs arrays to the
metrics sink. Host-side (numpy + cv2) by design.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)

GREEN = (0, 200, 0)
RED = (200, 0, 0)


def draw_border(frame: np.ndarray, success: bool, width: int = 4) -> np.ndarray:
    out = frame.copy()
    color = GREEN if success else RED
    out[:width], out[-width:], out[:, :width], out[:, -width:] = color, color, color, color
    return out


def draw_caption(frame: np.ndarray, text: str) -> np.ndarray:
    import cv2

    out = frame.copy()
    cv2.putText(out, text, (4, out.shape[0] - 8), cv2.FONT_HERSHEY_SIMPLEX,
                0.35 * out.shape[1] / 200, (255, 255, 255), 1, cv2.LINE_AA)
    return out


class RolloutVideo:
    def __init__(self, out_dir, fps: int = 15, tag_prefix: str = "rollout"):
        self.out_dir = Path(out_dir)
        self.fps = fps
        self.tag_prefix = tag_prefix
        self._frames: List[np.ndarray] = []
        self._videos: Dict[str, np.ndarray] = {}

    def new_video(self):
        self._frames = []

    def update(self, rgb_static: np.ndarray):
        self._frames.append(np.asarray(rgb_static, np.uint8))

    def add_goal_thumbnail(self, goal_img: np.ndarray):
        if not self._frames:
            return
        h, w = self._frames[-1].shape[:2]
        import cv2

        thumb = cv2.resize(np.asarray(goal_img, np.uint8), (w // 4, h // 4))
        for f in self._frames:
            f[: h // 4, -w // 4 :] = thumb

    def draw_outcome(self, success: bool):
        self._frames = [draw_border(f, success) for f in self._frames]

    def add_language_instruction(self, text: str):
        self._frames = [draw_caption(f, text) for f in self._frames]

    def finish_video(self, tag: str):
        if not self._frames:
            return
        self._videos[tag] = np.stack(self._frames)
        self._frames = []

    def write(self, step: int):
        """Write all accumulated videos as mp4 (gif fallback)."""
        self.out_dir.mkdir(parents=True, exist_ok=True)
        import imageio

        for tag, frames in self._videos.items():
            path = self.out_dir / f"{self.tag_prefix}_{tag}_step{step}.mp4"
            try:
                imageio.mimwrite(path, frames, fps=self.fps, macro_block_size=1)
            except Exception as e:  # e.g. no ffmpeg: fall back to gif
                path = path.with_suffix(".gif")
                imageio.mimwrite(path, frames, duration=1.0 / self.fps)
                logger.warning("mp4 writer unavailable (%s) — wrote %s", e, path.name)
        self._videos.clear()
