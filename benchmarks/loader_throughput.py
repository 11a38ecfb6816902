"""Host-side input-pipeline throughput: composable vs single-pass assembly.

Measures, on the current host (CPU only — run with JAX_PLATFORMS=cpu to keep
the TPU out of it):

1. the composable path (BatchLoader -> collate -> zip_modalities ->
   fuse_batch_host): every byte of the fused batch is moved three times;
2. the production single-pass FusedBatchLoader (WindowDataset.write_into):
   every byte written exactly once.

The per-core samples/s is the extrapolation anchor for production hosts
(v5e: >100 cores). Generates/reuses the synthetic CALVIN-format dataset
under DATA_DIR (default /tmp/hulc2_bench_calvin).

    JAX_PLATFORMS=cpu python benchmarks/loader_throughput.py
"""
import os
import time

import jax

jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

import hulc2_tpu.configs  # noqa: F401,E402
from hulc2_tpu.core import config as cfg_lib  # noqa: E402
from hulc2_tpu.data.datamodule import Hulc2DataModule  # noqa: E402
from hulc2_tpu.data.loader import fuse_modalities_host  # noqa: E402
from hulc2_tpu.tools.make_synthetic_dataset import make_synthetic_calvin  # noqa: E402

ROOT = os.environ.get("DATA_DIR", "/tmp/hulc2_bench_calvin")
N = int(os.environ.get("BATCHES", "10"))


def measure(stream, n=N):
    it = iter(stream)
    b0 = next(it)
    flat = b0 if "actions" in b0 else {f"{m}/{k}": v for m, d in b0.items() for k, v in d.items()}
    nbytes = sum(v.nbytes for v in flat.values() if hasattr(v, "nbytes"))
    t0 = time.perf_counter()
    for _ in range(n):
        next(it)
    dt = (time.perf_counter() - t0) / n
    return dt, nbytes


def main():
    make_synthetic_calvin(ROOT, episodes=2, frames_per_episode=600,
                          val_episodes=1, val_frames=120, n_lang=1200)
    cfg = cfg_lib.compose("cfg_low_level")
    dm_cfg = dict(cfg["datamodule"])
    dm_cfg["root_data_dir"] = ROOT
    dm_cfg["num_workers"] = int(os.environ.get("THREADS", "8"))  # clamped to cores
    dm = Hulc2DataModule(dm_cfg, use_shm_cache=True)
    dm.setup()
    b = dm_cfg.get("batch_size_vis", 32) * 2

    dt, nbytes = measure(fuse_modalities_host(dm.train_iter()))
    print(f"composable (pad->stack->fuse): {dt*1000:.0f} ms/batch "
          f"({nbytes/dt/2**20:.0f} MiB/s, {b/dt:.0f} samples/s)")

    def fused_epochs():
        while True:
            yield from dm.fused_train_iter()

    dt, nbytes = measure(fused_epochs())
    print(f"single-pass FusedBatchLoader:  {dt*1000:.0f} ms/batch "
          f"({nbytes/dt/2**20:.0f} MiB/s, {b/dt:.0f} samples/s) "
          f"on {os.cpu_count()} host core(s)")


if __name__ == "__main__":
    main()
