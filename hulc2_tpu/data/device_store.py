"""Device-resident frame store: the whole dataset's image frames live in HBM.

TPU-first answer to the host-assembly bottleneck (measured r3: a 1-core host
behind a ~20-38 MiB/s tunnel spends seconds per batch assembling + shipping
pixel windows, vs a ~31 ms device step). Windows overlap heavily (stride-1
sampling over play episodes), so streaming pixel batches re-sends every frame
~window_size times per epoch. Instead:

- upload each split's raw uint8 frame array ONCE (CALVIN-96 train split is
  ~1.5 GiB — 9% of a v5e's HBM; one-time ~1-2 min over the dev tunnel),
- per step, the host computes only the window *plan* (frame-row indices with
  pad-repeat semantics + the small float keys: actions, proprio, lang),
- the (B, S) gather and all augmentation run on device; per-step H2D drops
  from ~hundreds of MiB to ~300 KiB.

The reference has no analogue (its GPUs sit next to host RAM; it streams via
torch DataLoader workers — hulc2/datasets/hulc2_sim_data_module.py:115). This
is the idiomatic TPU shape of the same role: weak host + fast HBM -> make the
dataset device-resident and index it.

Sampling semantics are bit-identical to ``loader.FusedBatchLoader`` (same
epoch-order and per-sample window RNG streams, same padding rules:
observations repeat the last frame, relative actions zero-pad all but the
gripper dim — base_dataset.py:121-147), verified by equivalence tests
(tests/test_device_store.py).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hulc2_tpu.data.frame_store import RamFrameStore
from hulc2_tpu.data.window_dataset import WindowDataset


class DeviceFrameStore:
    """Per-modality flat frame arrays resident on device, indexed by row.

    Built from a ``RamFrameStore`` (whose ``arrays`` hold one contiguous
    (N, ...) array per key). Image keys are uploaded in their storage dtype
    (uint8 rgb / float16 depth) — conversion to float happens after the
    gather, inside the fused transform.
    """

    def __init__(self, ram_store: RamFrameStore, image_keys: Sequence[str],
                 sharding=None):
        self.id_to_row = ram_store.id_to_row
        self.image_keys = [k for k in image_keys if k in ram_store.arrays]
        put = (lambda a: jax.device_put(a, sharding)) if sharding is not None else jax.device_put
        # store each frame FLATTENED to (N, prod(frame_shape)): TPU tiled
        # layouts pad the two minor dims to (8, 128) sublanes x lanes, so a
        # (N, 96, 96, 3) u8 array pads 96 lanes -> 128 (1.33x HBM, 9.0 GiB vs
        # 6.8 GiB on the 263k-frame expert set — an OOM at full scale) AND
        # the first gather inserts a whole-array relayout copy. Flat rows of
        # 27,648 bytes are 128-divisible: zero padding, no relayout; the
        # (B, S) gather reshapes its 28 MiB output instead.
        self.frame_shapes = {k: ram_store.arrays[k].shape[1:] for k in self.image_keys}
        self.arrays: Dict[str, jax.Array] = {
            k: put(np.ascontiguousarray(ram_store.arrays[k]).reshape(
                ram_store.arrays[k].shape[0], -1))
            for k in self.image_keys
        }
        self.nbytes = sum(int(ram_store.arrays[k].nbytes) for k in self.image_keys)

    def gather(self, rows: np.ndarray) -> Dict[str, jax.Array]:
        """rows (B, S) int32 -> {key: (B, S, ...) device array}. The gather is
        jit-compiled (one XLA gather per key) and dispatched async."""
        shapes = tuple(sorted(self.frame_shapes.items()))
        return _jit_gather(self.arrays, jnp.asarray(rows), shapes)


@partial(jax.jit, static_argnums=2)
def _jit_gather(arrays: Dict[str, jax.Array], rows: jax.Array, shapes) -> Dict[str, jax.Array]:
    shapes = dict(shapes)
    return {k: a[rows].reshape(rows.shape + shapes[k]) for k, a in arrays.items()}


class DeviceGatherFusedLoader:
    """Fused [vis; lang] batches with images gathered on device.

    Drop-in for ``loader.FusedBatchLoader`` (same iteration protocol, same
    batch keys/shapes/dtypes, same RNG streams) — but each batch's image
    tensors are device arrays produced by indexing the resident frame store,
    and the host assembles only the small keys. ``DevicePrefetcher`` passes
    device arrays through unchanged.
    """

    def __init__(
        self,
        vis_dataset: WindowDataset,
        lang_dataset: WindowDataset,
        dev_store: DeviceFrameStore,
        batch_size_vis: int,
        batch_size_lang: int,
        shuffle: bool = True,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ):
        if vis_dataset.frame_skip is not None or lang_dataset.frame_skip is not None:
            raise NotImplementedError("device-store gather does not support frame_skip")
        assert vis_dataset.padded_size == lang_dataset.padded_size
        self.vis = vis_dataset
        self.lang = lang_dataset
        self.store = dev_store
        self.bv = batch_size_vis
        self.bl = batch_size_lang
        self.shuffle = shuffle
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0
        self.S = vis_dataset.padded_size
        self._act_dim = None  # probed lazily from the first plan

    def __len__(self) -> int:
        return min(len(self.vis) // self.process_count // self.bv,
                   len(self.lang) // self.process_count // self.bl)

    def _orders(self):
        # identical streams to FusedBatchLoader._orders, incl. the
        # process_index-strided shard (every process must draw a DISJOINT
        # slice of the same global permutation, or a multi-host run trains
        # on N identical copies of each batch)
        rng_v = np.random.default_rng((self.seed, self.epoch, 0))
        rng_l = np.random.default_rng((self.seed, self.epoch, 1))
        ov = rng_v.permutation(len(self.vis)) if self.shuffle else np.arange(len(self.vis))
        ol = rng_l.permutation(len(self.lang)) if self.shuffle else np.arange(len(self.lang))
        return (ov[self.process_index :: self.process_count],
                ol[self.process_index :: self.process_count])

    def _plan_rows(self, ds: WindowDataset, idxs, epoch: int, rows: np.ndarray,
                   row0: int, out: Dict[str, np.ndarray]) -> None:
        """Fill ``rows[row0 + j]`` with pad-repeat frame-row indices and the
        small float keys for each sample — the host half of write_into
        (window RNG stream identical: per-(seed, epoch, idx) Generator)."""
        index = ds.index
        ram = ds.store  # RamFrameStore: flat arrays + id_to_row
        arange = np.arange(self.S)
        for j, idx in enumerate(idxs):
            idx = int(idx)
            rng = np.random.default_rng((ds.seed, epoch, idx))
            ws = index.window_size(idx, rng)
            start = int(index.episode_lookup[idx])
            r0 = self.store.id_to_row[start]
            r = row0 + j
            rows[r] = r0 + np.minimum(arange, ws - 1)  # pad = repeat last frame
            robs = ram.arrays["robot_obs"][r0 : r0 + ws]
            dst = out["robot_obs_raw"][r]
            dst[:ws] = robs
            dst[ws:] = robs[-1]
            acts = ram.arrays[ds.action_key][r0 : r0 + ws]
            dst = out["actions"][r]
            dst[:ws] = acts
            if ds.relative_actions:  # zero-pad rel dims, repeat the gripper
                dst[ws:] = 0.0
                dst[ws:, -1] = acts[-1, -1]
            else:
                dst[ws:] = acts[-1]
            if index.with_lang:
                ann_row = int(index.lang_lookup[idx])
                out["lang"][r - self.bv] = ds._lang_value(ann_row)
                out["use_for_aux_lang_loss"][r - self.bv] = index.use_for_aux_lang_loss(idx)
                out["lang_task_id"][r - self.bv] = ds._lang_task_id(ann_row)

    def _assemble(self, vis_idxs, lang_idxs, epoch: int) -> Dict[str, object]:
        b = self.bv + self.bl
        if self._act_dim is None:
            ram = self.vis.store
            self._act_dim = ram.arrays[self.vis.action_key].shape[-1]
            self._rob_dim = ram.arrays["robot_obs"].shape[-1]
            self._lang_dim = self.lang._lang_value(0).shape[-1] if self.lang.index.with_lang else 0
            self._lang_dtype = self.lang._lang_value(0).dtype if self.lang.index.with_lang else np.float32
        rows = np.empty((b, self.S), np.int32)
        small: Dict[str, np.ndarray] = {
            "robot_obs_raw": np.empty((b, self.S, self._rob_dim), np.float32),
            "actions": np.empty((b, self.S, self._act_dim), np.float32),
        }
        if self.lang.index.with_lang:
            small["lang"] = np.empty((self.bl, self._lang_dim), self._lang_dtype)
            small["use_for_aux_lang_loss"] = np.empty((self.bl,), np.bool_)
            small["lang_task_id"] = np.empty((self.bl,), np.int32)
        self._plan_rows(self.vis, vis_idxs, epoch, rows, 0, small)
        self._plan_rows(self.lang, lang_idxs, epoch, rows, self.bv, small)
        batch: Dict[str, object] = dict(self.store.gather(rows))
        for k in self.vis.obs_space["depth_obs"]:
            if k in batch:  # stored float16 — models consume float32
                batch[k] = batch[k].astype(jnp.float32)
        batch.update(small)
        return batch

    def __iter__(self) -> Iterator[Dict[str, object]]:
        epoch = self.epoch
        self.epoch += 1
        ov, ol = self._orders()
        for b in range(len(self)):
            yield self._assemble(
                ov[b * self.bv : (b + 1) * self.bv],
                ol[b * self.bl : (b + 1) * self.bl],
                epoch,
            )
