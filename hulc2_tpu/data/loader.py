"""Batch loader: threaded window assembly + double-buffered device prefetch.

Replaces the reference's torch DataLoader workers + Lightning's implicit
host->GPU copies (reference: hulc2/datasets/hulc2_sim_data_module.py:115-126).
A small thread pool assembles fixed-shape numpy batches (np slicing releases
the GIL); a prefetch queue keeps ``prefetch`` batches ahead, already
``device_put`` with the mesh's batch sharding, so the TPU never waits on the
host. Multi-host: each process samples only its shard of the index
(``process_index``-strided), preserving the global sampling distribution.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from hulc2_tpu.data.window_dataset import WindowDataset


def collate(samples) -> Dict[str, np.ndarray]:
    out = {}
    for k in samples[0]:
        out[k] = np.stack([s[k] for s in samples])
    return out


class BatchLoader:
    """Epoch-based shuffled batch iterator over a WindowDataset."""

    def __init__(
        self,
        dataset: WindowDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_threads: int = 4,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset) // self.process_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_order(self) -> np.ndarray:
        n = len(self.dataset)
        rng = np.random.default_rng((self.seed, self.epoch))
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        return order[self.process_index :: self.process_count]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._epoch_order()
        self.epoch += 1
        nb = len(order) // self.batch_size if self.drop_last else -(-len(order) // self.batch_size)

        if self.num_threads <= 1:
            for b in range(nb):
                idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
                yield collate([self.dataset[int(i)] for i in idxs])
            return

        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        def make(ix):
            return collate([self.dataset[int(i)] for i in ix])

        # sliding window of outstanding futures: bounded memory, and an
        # abandoned iterator (early stop) leaves at most `window` batches of
        # work behind instead of the whole epoch
        window = self.num_threads * 2
        pool = ThreadPoolExecutor(max_workers=self.num_threads)
        try:
            pending: deque = deque()
            for b in range(min(window, nb)):
                pending.append(pool.submit(make, order[b * self.batch_size : (b + 1) * self.batch_size]))
            b_next = min(window, nb)
            while pending:
                batch = pending.popleft().result()
                if b_next < nb:
                    pending.append(
                        pool.submit(make, order[b_next * self.batch_size : (b_next + 1) * self.batch_size])
                    )
                    b_next += 1
                yield batch
        finally:
            pool.shutdown(wait=False, cancel_futures=True)


class FusedBatchLoader:
    """Single-pass fused-batch assembly: [vis; lang] in ONE host copy.

    The composable path (BatchLoader -> collate -> zip -> fuse_batch_host)
    touches every byte of the ~280 MiB CALVIN batch three times (per-sample
    pad concat, collate stack, modality concat) — measured 2.1 s/batch on a
    1-core host, an order of magnitude slower than the 31 ms TPU step it
    feeds. This loader preallocates the final fused buffers per batch and
    has each worker thread write its sample's padded window straight into
    its row (``WindowDataset.write_into``): every byte is written exactly
    once, by the thread that loaded it.

    Emits the host-prefused batch dict the train step's fast path consumes
    (keys like ``fuse_batch_host``: shared arrays [vis; lang]-concatenated
    plus ``lang`` / ``use_for_aux_lang_loss``).
    """

    def __init__(
        self,
        vis_dataset: WindowDataset,
        lang_dataset: WindowDataset,
        batch_size_vis: int,
        batch_size_lang: int,
        shuffle: bool = True,
        seed: int = 0,
        num_threads: int = 4,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.vis = vis_dataset
        self.lang = lang_dataset
        self.bv = batch_size_vis
        self.bl = batch_size_lang
        self.shuffle = shuffle
        self.seed = seed
        import os as _os

        # copies are CPU-bound memcpy: threads beyond the core count only
        # thrash the scheduler (measured 16x collapse at 8 threads on a
        # 1-core host); batch-level overlap comes from the outer pool
        self.num_threads = max(1, min(num_threads, _os.cpu_count() or num_threads))
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0
        vis_specs = vis_dataset.out_specs(batch_size_vis + batch_size_lang)
        lang_specs = lang_dataset.out_specs(batch_size_vis + batch_size_lang)
        # shared keys hold both modalities; lang-only keys are lang-row-sized
        self._specs = dict(vis_specs)
        self._lang_only = [k for k in lang_specs if k not in vis_specs]
        for k in self._lang_only:
            shape, dtype = lang_specs[k]
            self._specs[k] = ((batch_size_lang, *shape[1:]), dtype)

    def __len__(self) -> int:
        nv = len(self.vis) // self.process_count // self.bv
        nl = len(self.lang) // self.process_count // self.bl
        return min(nv, nl)

    def _orders(self):
        rng_v = np.random.default_rng((self.seed, self.epoch, 0))
        rng_l = np.random.default_rng((self.seed, self.epoch, 1))
        ov = rng_v.permutation(len(self.vis)) if self.shuffle else np.arange(len(self.vis))
        ol = rng_l.permutation(len(self.lang)) if self.shuffle else np.arange(len(self.lang))
        return (ov[self.process_index :: self.process_count],
                ol[self.process_index :: self.process_count])

    def _assemble(self, pool, vis_idxs, lang_idxs, epoch):
        out = {k: np.empty(shape, dtype) for k, (shape, dtype) in self._specs.items()}
        # lang rows sit after the vis rows in shared keys; lang-only keys
        # (lang, use_for_aux_lang_loss) are indexed from 0
        lang_out = {k: (v if k in self._lang_only else v[self.bv:])
                    for k, v in out.items()}

        def fill_vis(args):
            row, idx = args
            self.vis.write_into(int(idx), out, row, epoch)

        def fill_lang(args):
            row, idx = args
            self.lang.write_into(int(idx), lang_out, row, epoch)

        if pool is None:
            for a in enumerate(vis_idxs):
                fill_vis(a)
            for a in enumerate(lang_idxs):
                fill_lang(a)
        else:
            list(pool.map(fill_vis, enumerate(vis_idxs)))
            list(pool.map(fill_lang, enumerate(lang_idxs)))
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        epoch = self.epoch
        self.epoch += 1
        ov, ol = self._orders()
        nb = len(self)
        if self.num_threads <= 1:
            for b in range(nb):
                yield self._assemble(None, ov[b * self.bv:(b + 1) * self.bv],
                                     ol[b * self.bl:(b + 1) * self.bl], epoch)
            return
        # inner pool fills one batch's samples in parallel; a small outer pool
        # overlaps successive batches. Look-ahead is bounded at 2 batches —
        # each is ~hundreds of MB.
        pool = ThreadPoolExecutor(max_workers=self.num_threads)
        outer = ThreadPoolExecutor(max_workers=2)

        def submit(b):
            return outer.submit(
                self._assemble, pool, ov[b * self.bv:(b + 1) * self.bv],
                ol[b * self.bl:(b + 1) * self.bl], epoch)

        try:
            pending: deque = deque(submit(b) for b in range(min(2, nb)))
            b_next = min(2, nb)
            while pending:
                batch = pending.popleft().result()
                if b_next < nb:
                    pending.append(submit(b_next))
                    b_next += 1
                yield batch
        finally:
            outer.shutdown(wait=False, cancel_futures=True)
            pool.shutdown(wait=False, cancel_futures=True)


class DevicePrefetcher:
    """Background thread that device_puts upcoming batches with a sharding.

    Double buffering: while the TPU executes step N, batch N+1 (and N+2) is
    already being transferred — the host->HBM copy overlaps compute.
    """

    def __init__(self, iterator, sharding=None, prefetch: int = 2):
        self.it = iter(iterator)
        self.sharding = sharding
        self.q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._done = object()
        self._stopped = False
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def close(self):
        """Stop the producer promptly (early epoch break): mark stopped and
        drain the queue so the worker unblocks and sees the flag."""
        self._stopped = True
        if hasattr(self.it, "close"):
            try:
                self.it.close()
            except Exception:
                pass
        while True:
            try:
                self.q.get_nowait()
            except queue.Empty:
                break

    def _put_device(self, batch):
        if self.sharding is None:
            return jax.device_put(batch)
        import jax.sharding as shd

        multi_process = jax.process_count() > 1

        def put(x):
            if hasattr(x, "ndim") and x.ndim >= 1:
                spec = shd.PartitionSpec(*self.sharding.spec[:1], *([None] * (x.ndim - 1)))
                ns = shd.NamedSharding(self.sharding.mesh, spec)
                if multi_process:
                    # each process loads its own shard of the global batch
                    # (BatchLoader samples per-process); device_put would
                    # demand identical global values on every host
                    global_shape = (x.shape[0] * jax.process_count(), *x.shape[1:])
                    return jax.make_array_from_process_local_data(
                        ns, np.asarray(x), global_shape=global_shape
                    )
                return jax.device_put(x, ns)
            return jax.device_put(x)

        return jax.tree_util.tree_map(put, batch)

    def _worker(self):
        # Multi-process: global-array formation MUST happen on the consumer
        # thread — every process has to issue device ops in the same order,
        # and a producer thread racing the main thread's jitted collectives
        # deadlocks Gloo/ICI (measured: 2-process CPU mesh hangs). The thread
        # still overlaps the expensive host-side loading; only the final
        # device transfer is deferred.
        defer = jax.process_count() > 1
        try:
            for batch in self.it:
                if self._stopped:
                    break
                self.q.put(batch if defer else self._put_device(batch))
        except BaseException as e:  # propagate to the consumer thread
            if not self._stopped:
                self.q.put(e)
        finally:
            # the end-of-epoch sentinel must not be dropped: a full queue here
            # (consumer still draining the last prefetched batches) would hang
            # the consumer forever. Block with a timeout so close() can still
            # interrupt.
            while not self._stopped:
                try:
                    self.q.put(self._done, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is self._done:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        if jax.process_count() > 1:
            return self._put_device(item)
        return item


def zip_modalities(modalities, *loaders) -> Iterator[Dict[str, Dict]]:
    """Zip per-modality loaders per step the way Lightning zips the dict of
    DataLoaders (reference: hulc2_sim_data_module.py:115-126) — the epoch
    ends with the shortest loader. ``modalities`` names each loader (e.g.
    ("vis", "lang"), or just ("vis",) for vision-only training)."""
    for batches in zip(*loaders):
        yield dict(zip(modalities, batches))


_FUSE_SKIP_KEYS = ("idx", "seq_len")


def fuse_batch_host(batch: Dict[str, Dict]) -> Dict[str, np.ndarray]:
    """{"vis": ..., "lang": ...} -> ONE [vis; lang] batch, concatenated on
    the host. The train step otherwise concatenates raw uint8 frames on
    device (~2 ms/step of concat + layout copy in the XLA trace at full
    CALVIN batch); done here it runs inside the prefetch thread, overlapped
    with TPU compute. Lang-only keys ride along; n_vis is recovered from
    shapes (actions rows - lang rows)."""
    vis, lang = batch["vis"], batch["lang"]
    fused = {
        k: np.concatenate([np.asarray(vis[k]), np.asarray(lang[k])])
        for k in vis
        if k in lang and k not in _FUSE_SKIP_KEYS
    }
    for k in ("lang", "use_for_aux_lang_loss", "lang_task_id"):
        if k in lang:
            fused[k] = np.asarray(lang[k])
    return fused


def fuse_modalities_host(batches: Iterator[Dict[str, Dict]]) -> Iterator[Dict[str, np.ndarray]]:
    """Map a {"vis","lang"} batch stream to pre-fused single batches (see
    ``fuse_batch_host``). Single-modality batches pass through unchanged."""
    for b in batches:
        if "vis" in b and "lang" in b:
            yield fuse_batch_host(b)
        else:
            yield b
