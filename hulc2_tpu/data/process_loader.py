"""Process-isolated fused-batch assembly: workers in a subprocess, shm ring.

The r3 bench measured the single-pass FusedBatchLoader at ~116 ms/batch in a
clean CPU-only process but ~3050 ms when the SAME code runs in the process
that owns the axon TPU client — the client's background threads starve the
assembly threads on a 1-core host (GIL + scheduler thrash, not raw CPU). The
reference isolates loading in worker processes for exactly this reason
(reference: hulc2/datasets/utils/shared_memory_loader.py:57,121; torch
DataLoader workers). This module is the production equivalent:

- ONE child process (assembly is memcpy-bound; more workers just contend)
  rebuilds the datamodule from its config and runs the ordinary
  FusedBatchLoader epoch stream,
- batches are written straight into a ring of named SharedMemory slots
  (every byte still written exactly once, by the child),
- the trainer process only copies the slot out and device_puts — no window
  gather, no pad logic, no per-sample threads next to the TPU client.

When the parent datamodule holds a shm RAM cache (use_shm_cache=True) the
child ATTACHES to the same segments (RamFrameStore._try_attach) — no second
copy of the dataset. Epoch semantics: the child produces the exact
FusedBatchLoader stream (epoch 0, 1, ... with per-epoch reshuffles); the
parent consumes it as a continuous sequence, so an early-stopped epoch
resumes mid-stream instead of reshuffling — document-level difference only.

Enabled with ``datamodule.loader_isolation=process``.
"""
from __future__ import annotations

import atexit
import logging
import multiprocessing as mp
import os
import queue
from multiprocessing import shared_memory
from typing import Dict, Iterator, List, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def fused_specs(vis_dataset, lang_dataset, bv: int, bl: int) -> Dict[str, tuple]:
    """(shape, dtype) of the fused-batch buffers: shared keys hold both
    modalities (bv+bl rows), lang-only keys are lang-sized (mirrors
    FusedBatchLoader.__init__)."""
    vis_specs = vis_dataset.out_specs(bv + bl)
    lang_specs = lang_dataset.out_specs(bv + bl)
    specs = dict(vis_specs)
    for k in lang_specs:
        if k not in vis_specs:
            shape, dtype = lang_specs[k]
            specs[k] = ((bl, *shape[1:]), dtype)
    return specs


def _slot_name(tag: str, slot: int, key: str) -> str:
    return f"hulc2_pl_{tag}_{slot}_{key}"


def _attach_slots(tag: str, n_slots: int, specs, create: bool):
    slots: List[Dict[str, np.ndarray]] = []
    shms: List[shared_memory.SharedMemory] = []
    for s in range(n_slots):
        arrs = {}
        for k, (shape, dtype) in specs.items():
            name = _slot_name(tag, s, k)
            if create:
                nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
                try:  # stale segment from a crashed run
                    stale = shared_memory.SharedMemory(name=name)
                    stale.close()
                    stale.unlink()
                except FileNotFoundError:
                    pass
                shm = shared_memory.SharedMemory(name=name, create=True, size=nbytes)
            else:
                shm = shared_memory.SharedMemory(name=name)
            shms.append(shm)
            arrs[k] = np.ndarray(shape, dtype, buffer=shm.buf)
        slots.append(arrs)
    return slots, shms


def _child_main(spec: dict, free_q, ready_q):
    """Child entry (spawn-safe top-level): rebuild datasets, stream fused
    batches into shm slots forever. Never touches jax."""
    try:
        from hulc2_tpu.data.datamodule import Hulc2DataModule
        from hulc2_tpu.data.loader import FusedBatchLoader

        dm = Hulc2DataModule(spec["dm_cfg"], seed=spec["seed"],
                             use_shm_cache=spec["use_shm_cache"])
        dm.setup()
        loader = FusedBatchLoader(
            dm.datasets["vis_training"], dm.datasets["lang_training"],
            spec["bv"], spec["bl"], shuffle=True, seed=spec["seed"],
            num_threads=spec["num_threads"],
            process_index=spec["process_index"], process_count=spec["process_count"],
        )
        slots, shms = _attach_slots(spec["tag"], spec["n_slots"], spec["specs"],
                                    create=False)
        while True:
            for batch in loader:
                slot = free_q.get()
                if slot is None:  # shutdown
                    return
                out = slots[slot]
                for k, v in batch.items():
                    out[k][...] = v
                ready_q.put(slot)
    except Exception:  # propagate: parent sees the sentinel and raises
        import traceback

        ready_q.put(("error", traceback.format_exc()))


class ProcessFusedLoader:
    """FusedBatchLoader stream assembled in a subprocess (see module doc)."""

    def __init__(
        self,
        dm_cfg: dict,
        vis_dataset,
        lang_dataset,
        batch_size_vis: int,
        batch_size_lang: int,
        seed: int = 0,
        use_shm_cache: bool = False,
        num_slots: int = 3,
        num_threads: int = 2,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.bv, self.bl = batch_size_vis, batch_size_lang
        self._len = min(len(vis_dataset) // process_count // batch_size_vis,
                        len(lang_dataset) // process_count // batch_size_lang)
        self.specs = fused_specs(vis_dataset, lang_dataset, batch_size_vis, batch_size_lang)
        self.tag = f"{os.getpid()}_{id(self) & 0xFFFF:x}"
        self.n_slots = num_slots
        self._slots, self._shms = _attach_slots(self.tag, num_slots, self.specs, create=True)
        ctx = mp.get_context("spawn")  # never fork a live TPU client
        self._free_q = ctx.Queue()
        self._ready_q = ctx.Queue()
        for s in range(num_slots):
            self._free_q.put(s)
        # assembly in the child reads frames via the same dm_cfg: an existing
        # shm RAM cache is attached by name, otherwise npz files are read
        child_cfg = dict(dm_cfg)
        child_cfg["device_store"] = False  # child must stay jax-free
        spec = {
            "dm_cfg": child_cfg, "seed": seed, "use_shm_cache": use_shm_cache,
            "bv": batch_size_vis, "bl": batch_size_lang, "tag": self.tag,
            "n_slots": num_slots, "specs": self.specs, "num_threads": num_threads,
            "process_index": process_index, "process_count": process_count,
        }
        self._proc = ctx.Process(target=_child_main, args=(spec, self._free_q, self._ready_q),
                                 daemon=True)
        self._proc.start()
        self._closed = False
        atexit.register(self.close)
        logger.info("process loader: child pid %d, %d shm slots (%.0f MiB each)",
                    self._proc.pid, num_slots,
                    sum(int(np.prod(s)) * np.dtype(d).itemsize
                        for s, d in self.specs.values()) / 2**20)

    def __len__(self) -> int:
        return self._len

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for _ in range(self._len):
            while True:
                try:
                    item = self._ready_q.get(timeout=60.0)
                    break
                except queue.Empty:
                    # an abnormally dead child (OOM-kill, segfault) never
                    # reaches its own error branch — surface it instead of
                    # hanging the trainer mid-epoch forever
                    if not self._proc.is_alive():
                        raise RuntimeError(
                            f"loader child died (exitcode {self._proc.exitcode}) "
                            "without reporting an error — likely OOM-killed "
                            "while building its datamodule copy"
                        )
            if isinstance(item, tuple) and item[0] == "error":
                raise RuntimeError(f"loader child failed:\n{item[1]}")
            slot = self._slots[item]
            # one sequential memcpy out of the slot; the slot is recycled
            # immediately so the child never stalls on device-transfer time
            batch = {k: np.array(v) for k, v in slot.items()}
            self._free_q.put(item)
            yield batch

    def close(self):
        if self._closed:
            return
        self._closed = True
        try:
            self._free_q.put(None)
            self._proc.join(timeout=2)
            if self._proc.is_alive():
                self._proc.terminate()
        except Exception:
            pass
        for shm in self._shms:
            try:
                shm.close()
                shm.unlink()
            except FileNotFoundError:
                pass
