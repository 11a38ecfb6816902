"""DataModule: wires indices, stores, datasets and loaders for {vis, lang} x
{train, val}.

Role-equivalent to the reference's Hulc2SimdDataModule
(reference: hulc2/datasets/hulc2_sim_data_module.py:23-126): builds vision +
language datasets per split, optionally preloads everything into a RAM /
shared-memory cache, and yields per-step dicts of both modality batches.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Iterator, Optional

from hulc2_tpu.data import episode_index as ei
from hulc2_tpu.data.frame_skip import make_frame_skip
from hulc2_tpu.data.frame_store import NpzFrameStore, RamFrameStore
from hulc2_tpu.data.loader import BatchLoader, zip_modalities
from hulc2_tpu.data.random_data import RandomWindowDataset
from hulc2_tpu.data.statistics import DatasetStatistics, load_statistics
from hulc2_tpu.data.window_dataset import WindowDataset

logger = logging.getLogger(__name__)


class Hulc2DataModule:
    def __init__(self, dm_cfg: dict, seed: int = 42, use_shm_cache: bool = False,
                 process_index: int = 0, process_count: int = 1):
        self.cfg = dm_cfg
        self.seed = seed
        self.use_shm_cache = use_shm_cache
        self.process_index = process_index
        self.process_count = process_count
        self.root = Path(dm_cfg["root_data_dir"])
        # datamodule/datasets group (reference: conf/datamodule/datasets/
        # {vision_lang,vision_only,lang_only}[_shm].yaml): which modality
        # datasets to build. Default: both.
        ds = dm_cfg.get("datasets") or {}
        self.modalities = tuple(m for m in ("vis", "lang") if ds.get(m, True))
        assert self.modalities, "datamodule.datasets disabled every modality"
        self.stats: Dict[str, DatasetStatistics] = {}
        self._stores: Dict[str, object] = {}
        self.datasets: Dict[str, WindowDataset] = {}

    # ------------------------------------------------------------------ #
    def setup(self):
        obs = self.cfg["observation_space"]
        frame_keys = (
            list(obs["rgb_obs"]) + list(obs["depth_obs"]) + list(obs["state_obs"]) + list(obs["actions"])
        )
        if "robot_obs" not in frame_keys:
            frame_keys.append("robot_obs")
        device_store = bool(self.cfg.get("device_store", False))
        for split in ("training", "validation"):
            split_dir = self.root / split
            self.stats[split] = load_statistics(split_dir)
            npz = NpzFrameStore(split_dir, frame_keys)
            if self.use_shm_cache or (device_store and split == "training"):
                # the device-store gather plans small keys from the RAM
                # cache's flat arrays (data/device_store.py), so the training
                # split is RAM-cached even without --shm-cache
                ep_ids = ei.load_ep_start_end_ids(split_dir, split)
                store = RamFrameStore(npz, ep_ids, frame_keys, use_shm=self.use_shm_cache)
            else:
                store = npz
            self._stores[split] = store

            indices = {}
            if "vis" in self.modalities:
                indices["vis"] = ei.build_vision_index(
                    split_dir, split, self.cfg["min_window_size"], self.cfg["max_window_size"],
                    self.cfg.get("data_percent", 1.0),
                )
            if "lang" in self.modalities:
                indices["lang"] = ei.build_lang_index(
                    split_dir, split, self.cfg["min_window_size"], self.cfg["max_window_size"],
                    self.cfg["lang_folder"], self.cfg.get("skip_frames", 1),
                    self.cfg.get("data_percent", 1.0), self.cfg.get("aux_lang_loss_window", 8),
                    self.cfg.get("load_lang_embeddings", True),
                )
            # within-window temporal subsampling (reference ShmDatasetSkip);
            # applied to both splits so train/val window shapes stay identical
            fskip = make_frame_skip(self.cfg.get("frame_skip"))
            for key, index in indices.items():
                self.datasets[f"{key}_{split}"] = WindowDataset(
                    index, store, obs, pad=self.cfg.get("pad", True), seed=self.seed,
                    frame_skip=fskip,
                )
        logger.info(
            "datamodule: %s",
            {k: len(v) for k, v in self.datasets.items()},
        )

    # ------------------------------------------------------------------ #
    def _loader(self, key: str, split: str, shuffle: bool) -> BatchLoader:
        bs = self.cfg.get(f"batch_size_{key}", self.cfg.get("batch_size", 32))
        return BatchLoader(
            self.datasets[f"{key}_{split}"],
            batch_size=bs,
            shuffle=shuffle,
            seed=self.seed,
            num_threads=self.cfg.get("num_workers", 4),
            process_index=self.process_index,
            process_count=self.process_count,
        )

    def train_loaders(self):
        # persistent loaders: BatchLoader increments its epoch counter per
        # __iter__, so each epoch gets a fresh shuffle
        if not hasattr(self, "_train_loaders"):
            self._train_loaders = tuple(
                self._loader(m, "training", True) for m in self.modalities
            )
        return self._train_loaders

    def val_loaders(self):
        shuffle = self.cfg.get("shuffle_val", False)
        return tuple(self._loader(m, "validation", shuffle) for m in self.modalities)

    def train_iter(self) -> Iterator[Dict]:
        return zip_modalities(self.modalities, *self.train_loaders())

    def fused_train_iter(self):
        """Pre-fused [vis; lang] batches assembled in ONE host pass
        (loader.FusedBatchLoader) — the production hot path; ~3x less
        host memory traffic than train_iter + fuse_modalities_host."""
        from hulc2_tpu.data.loader import FusedBatchLoader

        if len(self.modalities) == 1:  # nothing to fuse: single-modality dicts
            if (self.cfg.get("loader_isolation", "none") != "none"
                    or self.cfg.get("device_store", False)):
                raise NotImplementedError(
                    "loader_isolation / device_store require the fused "
                    "two-modality path; single-modality configs would "
                    "silently fall back to host assembly"
                )
            return self.train_iter()
        if self.cfg.get("loader_isolation", "none") == "process":
            if not hasattr(self, "_process_loader"):
                from hulc2_tpu.data.process_loader import ProcessFusedLoader

                self._process_loader = ProcessFusedLoader(
                    self.cfg,
                    self.datasets["vis_training"],
                    self.datasets["lang_training"],
                    self.cfg.get("batch_size_vis", self.cfg.get("batch_size", 32)),
                    self.cfg.get("batch_size_lang", self.cfg.get("batch_size", 32)),
                    seed=self.seed,
                    use_shm_cache=self.use_shm_cache,
                    num_threads=self.cfg.get("num_workers", 4),
                    process_index=self.process_index,
                    process_count=self.process_count,
                )
            return self._process_loader
        if self.cfg.get("device_store", False):
            if not hasattr(self, "_device_loader"):
                from hulc2_tpu.data.device_store import (
                    DeviceFrameStore,
                    DeviceGatherFusedLoader,
                )

                obs = self.cfg["observation_space"]
                dev = DeviceFrameStore(
                    self._stores["training"],
                    list(obs["rgb_obs"]) + list(obs["depth_obs"]),
                )
                logger.info(
                    "device frame store: %.2f GiB resident", dev.nbytes / 2**30
                )
                # the host copy of the uploaded image arrays is dead weight
                # from here on (only the small keys are read per step) — free
                # it so the dataset isn't resident twice on a small-RAM host
                self._stores["training"].drop_arrays(dev.image_keys)
                self._device_loader = DeviceGatherFusedLoader(
                    self.datasets["vis_training"],
                    self.datasets["lang_training"],
                    dev,
                    self.cfg.get("batch_size_vis", self.cfg.get("batch_size", 32)),
                    self.cfg.get("batch_size_lang", self.cfg.get("batch_size", 32)),
                    shuffle=True,
                    seed=self.seed,
                    process_index=self.process_index,
                    process_count=self.process_count,
                )
            return self._device_loader
        if not hasattr(self, "_fused_loader"):
            self._fused_loader = FusedBatchLoader(
                self.datasets["vis_training"],
                self.datasets["lang_training"],
                self.cfg.get("batch_size_vis", self.cfg.get("batch_size", 32)),
                self.cfg.get("batch_size_lang", self.cfg.get("batch_size", 32)),
                shuffle=True,
                seed=self.seed,
                num_threads=self.cfg.get("num_workers", 4),
                process_index=self.process_index,
                process_count=self.process_count,
            )
        return self._fused_loader

    def val_iter(self) -> Iterator[Dict]:
        return zip_modalities(self.modalities, *self.val_loaders())

    def steps_per_epoch(self) -> int:
        return min(len(l) for l in self.train_loaders())


class RandomDataModule:
    """Synthetic stand-in with the DataModule interface (smoke/bench)."""

    def __init__(self, dm_cfg: dict, n_samples: int = 512, seed: int = 42, **_):
        self.cfg = dm_cfg
        self.seed = seed
        self.n = n_samples
        ds = dm_cfg.get("datasets") or {}
        self.modalities = tuple(m for m in ("vis", "lang") if ds.get(m, True))
        self.stats = {"training": DatasetStatistics(), "validation": DatasetStatistics()}
        self.datasets = {}

    def setup(self):
        s = self.cfg["max_window_size"]
        for split in ("training", "validation"):
            n = self.n if split == "training" else max(self.n // 8, 2)
            self.datasets[f"vis_{split}"] = RandomWindowDataset(n, s, with_lang=False, seed=self.seed)
            self.datasets[f"lang_{split}"] = RandomWindowDataset(
                n, s, with_lang=True, seed=self.seed + 1,
                lang_tokens=self.cfg.get("synthetic_lang_tokens", False))

    def _loader(self, key, split, shuffle):
        bs = self.cfg.get(f"batch_size_{key}", 32)
        return BatchLoader(self.datasets[f"{key}_{split}"], bs, shuffle, self.seed)

    def train_loaders(self):
        return tuple(self._loader(m, "training", True) for m in self.modalities)

    def val_loaders(self):
        return tuple(self._loader(m, "validation", False) for m in self.modalities)

    def train_iter(self):
        if not hasattr(self, "_train_loaders"):
            self._train_loaders = self.train_loaders()
        return zip_modalities(self.modalities, *self._train_loaders)

    def val_iter(self):
        return zip_modalities(self.modalities, *self.val_loaders())

    def steps_per_epoch(self):
        return min(len(l) for l in self.train_loaders())
