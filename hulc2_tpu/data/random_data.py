"""Synthetic random dataset — shape-correct fake backend for smoke tests and
benchmarking without CALVIN data on disk
(reference: hulc2/datasets/random.py:10 RandomDataset/RandomDataModule).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class RandomWindowDataset:
    """Emits windows with the same keys/shapes/dtypes as WindowDataset."""

    def __init__(
        self,
        n_samples: int = 1024,
        window_size: int = 32,
        static_hw: int = 200,
        gripper_hw: int = 84,
        action_dim: int = 7,
        lang_dim: int = 384,
        with_lang: bool = False,
        lang_tokens: bool = False,  # emit CLIP BPE-style token ids (in-loop tower)
        with_depth: bool = False,
        seed: int = 0,
    ):
        self.n = n_samples
        self.s = window_size
        self.static_hw = static_hw
        self.gripper_hw = gripper_hw
        self.action_dim = action_dim
        self.lang_dim = lang_dim
        self.with_lang = with_lang
        self.lang_tokens = lang_tokens
        self.with_depth = with_depth
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng((self.seed, idx))
        s = self.s
        out = {
            "rgb_static": rng.integers(0, 256, (s, self.static_hw, self.static_hw, 3), np.uint8),
            "rgb_gripper": rng.integers(0, 256, (s, self.gripper_hw, self.gripper_hw, 3), np.uint8),
            "robot_obs_raw": rng.standard_normal((s, 15)).astype(np.float32),
            "actions": np.clip(rng.standard_normal((s, self.action_dim)) * 0.3, -1, 1).astype(np.float32),
            "seq_len": np.int32(s),
            "idx": np.int64(idx),
        }
        out["actions"][:, -1] = np.sign(out["actions"][:, -1] + 1e-6)
        if self.with_depth:
            out["depth_static"] = rng.random((s, self.static_hw, self.static_hw), np.float32)
            out["depth_gripper"] = rng.random((s, self.gripper_hw, self.gripper_hw), np.float32)
        if self.with_lang:
            if self.lang_tokens:
                toks = np.zeros(77, np.int32)
                n = rng.integers(4, 12)
                toks[0], toks[n - 1] = 49406, 49407
                toks[1 : n - 1] = rng.integers(1, 49000, n - 2)
                out["lang"] = toks
            else:
                out["lang"] = rng.standard_normal(self.lang_dim).astype(np.float32)
            out["use_for_aux_lang_loss"] = np.bool_(rng.random() > 0.5)
        return out
