"""Frame storage backends: per-frame .npz files + RAM (shared-memory) cache.

The reference's SharedMemoryLoader forks 8 workers that copy every frame into
named POSIX SharedMemory blocks and builds (offset, step) lookups
(reference: hulc2/datasets/utils/shared_memory_loader.py:43-246,
 hulc2/datasets/shm_dataset.py:21). Here the same role is played by
``RamFrameStore``: one contiguous numpy array per modality indexed by absolute
frame id, optionally backed by ``multiprocessing.shared_memory`` so concurrent
trainer processes on one host share a single copy. Window reads are zero-copy
views; stale segments from crashed runs are detected and unlinked.
"""
from __future__ import annotations

import atexit
import logging
import os
import re
import signal
from concurrent.futures import ThreadPoolExecutor
from multiprocessing import shared_memory
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


class NpzFrameStore:
    """Direct per-frame .npz reading (the reference NpzDataset path,
    npz_dataset.py:53-115). Discovers the ``episode_{idx:07d}.npz`` naming
    pattern from the directory contents."""

    def __init__(self, data_dir: Path, keys: Sequence[str]):
        self.data_dir = Path(data_dir)
        self.keys = list(keys)
        self.prefix, self.suffix, self.n_digits = self._naming_pattern()

    def _naming_pattern(self):
        for entry in sorted(os.scandir(self.data_dir), key=lambda e: e.name):
            p = Path(entry.path)
            if p.suffix == ".npz" and "camera" not in p.stem:
                digits = re.findall(r"\d+", p.stem)
                stem_prefix = re.split(r"\d+", p.stem)[0]
                return str(p.parent / stem_prefix), p.suffix, len(digits[0])
        raise FileNotFoundError(f"no frame .npz files in {self.data_dir}")

    def frame_path(self, idx: int) -> str:
        return f"{self.prefix}{idx:0{self.n_digits}d}{self.suffix}"

    def load_frame(self, idx: int) -> Dict[str, np.ndarray]:
        with np.load(self.frame_path(idx)) as z:
            return {k: z[k] for k in self.keys if k in z.files}

    def _frame_specs(self):
        """(shape, dtype) per key, probed once from the first frame."""
        if not hasattr(self, "_specs"):
            # probe using the first existing frame of the directory
            first = next(
                int(p.stem.split("_")[-1])
                for p in sorted(Path(self.data_dir).glob(f"*{self.suffix}"))
                if "camera" not in p.stem
            )
            probe = self.load_frame(first)
            self._specs = {k: (v.shape, v.dtype) for k, v in probe.items() if k in self.keys}
        return self._specs

    def load_window(self, start: int, size: int) -> Dict[str, np.ndarray]:
        paths = [self.frame_path(start + i) for i in range(size)]
        from hulc2_tpu.data import native_loader

        if native_loader.available():
            out = {}
            for k, (shape, dtype) in self._frame_specs().items():
                buf = np.empty((size, *shape), dtype)
                import os as _os

                # 2 threads/core saturates; more just contend (measured on
                # a 1-CPU host: nt=2 22.9k frames/s, nt=8 17.7k)
                n_threads = min(size, 2 * (_os.cpu_count() or 4))
                native_loader.load_frames_into(paths, k, buf, n_threads=n_threads)
                out[k] = buf
            return out
        frames = [self.load_frame(start + i) for i in range(size)]
        return {k: np.stack([f[k] for f in frames]) for k in frames[0]}


class RamFrameStore:
    """Whole-dataset RAM cache with O(1) zero-copy window views.

    Frames are loaded once (parallel thread pool — np.load releases the GIL on
    IO) into one contiguous array per modality, indexed by ``frame_id -
    base``. With ``use_shm=True`` the arrays live in named SharedMemory
    segments keyed by dataset path, so other local processes attach instead of
    re-loading, mirroring the reference's /dev/shm cache semantics.
    """

    def __init__(
        self,
        npz_store: NpzFrameStore,
        ep_start_end_ids: np.ndarray,
        keys: Sequence[str],
        use_shm: bool = False,
        shm_tag: Optional[str] = None,
        num_workers: int = 8,
    ):
        self.keys = list(keys)
        self.ranges = [(int(s), int(e)) for s, e in ep_start_end_ids]
        frame_ids: List[int] = []
        for s, e in self.ranges:
            frame_ids.extend(range(s, e + 1))
        self.frame_ids = np.asarray(frame_ids, np.int64)
        self.id_to_row = {int(f): i for i, f in enumerate(frame_ids)}
        self.arrays: Dict[str, np.ndarray] = {}
        self._shms: List[shared_memory.SharedMemory] = []
        self._owner = False
        self._load(npz_store, use_shm, shm_tag, num_workers)
        if self._owner:
            atexit.register(self.cleanup)

    # ------------------------------------------------------------------ #
    def _load(self, store: NpzFrameStore, use_shm: bool, tag: Optional[str], num_workers: int):
        probe = store.load_frame(int(self.frame_ids[0]))
        n = len(self.frame_ids)
        specs = {k: ((n, *probe[k].shape), probe[k].dtype) for k in self.keys if k in probe}

        if use_shm:
            tag = tag or re.sub(r"\W+", "_", str(store.data_dir))[-48:]
            attached = self._try_attach(tag, specs)
            if attached:
                logger.info("attached to existing shm cache %s", tag)
                return
            self._owner = True
            for k, (shape, dtype) in specs.items():
                nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
                name = f"hulc2_{tag}_{k}"
                self._unlink_stale(name)
                shm = shared_memory.SharedMemory(name=name, create=True, size=nbytes)
                self._shms.append(shm)
                self.arrays[k] = np.ndarray(shape, dtype, buffer=shm.buf)
        else:
            for k, (shape, dtype) in specs.items():
                self.arrays[k] = np.empty(shape, dtype)

        def fill(row: int):
            frame = store.load_frame(int(self.frame_ids[row]))
            for k in self.arrays:
                self.arrays[k][row] = frame[k]

        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            list(pool.map(fill, range(n)))
        logger.info(
            "RAM cache: %d frames, %.2f GiB",
            n,
            sum(a.nbytes for a in self.arrays.values()) / 2**30,
        )

    def _try_attach(self, tag: str, specs) -> bool:
        try:
            for k, (shape, dtype) in specs.items():
                shm = shared_memory.SharedMemory(name=f"hulc2_{tag}_{k}")
                self._shms.append(shm)
                self.arrays[k] = np.ndarray(shape, dtype, buffer=shm.buf)
            return True
        except FileNotFoundError:
            for shm in self._shms:
                shm.close()
            self._shms.clear()
            self.arrays.clear()
            return False

    @staticmethod
    def _unlink_stale(name: str):
        try:
            stale = shared_memory.SharedMemory(name=name)
            stale.close()
            stale.unlink()
            logger.warning("unlinked stale shm segment %s", name)
        except FileNotFoundError:
            pass

    def cleanup(self):
        for shm in self._shms:
            try:
                shm.close()
                if self._owner:
                    shm.unlink()
            except FileNotFoundError:
                pass
        self._shms.clear()

    def drop_arrays(self, keys: Sequence[str]) -> None:
        """Free the host copies of ``keys`` (used after a device upload makes
        them dead weight). No-op for shm-backed stores: those segments are a
        shared cache other local processes may be attached to."""
        if self._shms:
            logger.debug("drop_arrays skipped: shm-backed store is shared")
            return
        for k in keys:
            self.arrays.pop(k, None)

    # ------------------------------------------------------------------ #
    def load_window(self, start: int, size: int) -> Dict[str, np.ndarray]:
        row = self.id_to_row[int(start)]
        return {k: a[row : row + size] for k, a in self.arrays.items()}  # views


def install_sigterm_cleanup(store: "RamFrameStore") -> None:
    """SIGTERM handler that unlinks shm segments (the reference's
    SignalCallback role, shared_memory_loader.py:249)."""

    def handler(signum, frame):
        store.cleanup()
        signal.default_int_handler(signum, frame)

    signal.signal(signal.SIGTERM, handler)
