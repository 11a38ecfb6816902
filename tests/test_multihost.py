"""True multi-process multi-host tests: two OS processes join a
jax.distributed coordinator on the CPU backend (2 local devices each -> a
4-device global mesh) and exercise the real cross-host seams:

- allgather_counts (eval counter reduction, reference rollout.py:186-257 role)
- shard_for_process (chain sharding, rollout_long_horizon.py:29-51 role)
- DevicePrefetcher's per-process local batch -> global sharded array path
- a jitted computation over the global mesh

This is the multi-host analogue of the single-process virtual mesh used by
the rest of the suite."""
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, port = int(sys.argv[1]), sys.argv[2]
    jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
    import numpy as np
    from hulc2_tpu.parallel import mesh as mesh_lib
    from hulc2_tpu.train.callbacks import allgather_counts, shard_for_process
    from hulc2_tpu.data.loader import DevicePrefetcher

    assert jax.process_count() == 2 and jax.device_count() == 4
    mesh = mesh_lib.make_mesh(dp=4, fsdp=1)

    total = allgather_counts(np.array([10 + pid, 100 * (pid + 1)], np.int64))
    assert total.tolist() == [21, 300], total

    items = shard_for_process(list(range(10)), jax.process_index(), jax.process_count())
    assert len(items) == 5

    # per-process local batches through the prefetcher -> global sharded arrays
    local_batches = [{"x": np.ones((4, 3), np.float32) * (pid + 1)} for _ in range(2)]
    pf = DevicePrefetcher(iter(local_batches), mesh_lib.batch_sharding(mesh))
    tot = 0.0
    for batch in pf:
        assert batch["x"].shape == (8, 3)  # global batch = 2 hosts x 4
        tot += float(jax.jit(lambda a: a.sum())(batch["x"]))
    assert tot == 2 * (4 * 3 * 1 + 4 * 3 * 2), tot
    print(f"MULTIHOST_OK pid={pid}")
    """
)


@pytest.mark.slow
def test_two_process_mesh_allgather_and_prefetch(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo = str(Path(__file__).resolve().parents[1])
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env={**__import__("os").environ, "PYTHONPATH": repo, "JAX_PLATFORMS": ""},
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK pid={i}" in out, out[-2000:]
