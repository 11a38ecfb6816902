"""Device mesh construction + sharding rules.

TPU-native replacement for the reference's Lightning ``DDPStrategy`` / NCCL
stack (reference: hulc2/training.py:72-75). Parallelism is expressed as a
``jax.sharding.Mesh`` with named axes:

- ``dp``   — data parallel: batches sharded, gradients reduced by XLA psum
             over ICI (the only strategy the reference uses; SURVEY.md §2.9)
- ``fsdp`` — optional parameter/optimizer sharding axis for the wide decoder
             and plan-net matrices (ZeRO-style; the models are ~50M params so
             this mostly matters for very large per-chip batch or many hosts)

Collectives are inserted by XLA from sharding annotations under ``jit`` —
there is no hand-written NCCL/MPI analogue to port.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    fsdp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (dp, fsdp) mesh over the available devices.

    With ``dp=None`` the dp axis absorbs all devices not used by fsdp.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % fsdp == 0, (n, fsdp)
        dp = n // fsdp
    assert dp * fsdp == n, f"mesh {dp}x{fsdp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, fsdp)
    return Mesh(arr, axis_names=("dp", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over dp; everything else replicated."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(batch, mesh: Mesh):
    """device_put a host pytree with the leading dim sharded over the mesh."""
    s = batch_sharding(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, NamedSharding(mesh, P(("dp", "fsdp"), *([None] * (x.ndim - 1)))))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(put, batch)


def param_sharding_rules(path_tuple, value, mesh: Mesh):
    """FSDP-style rule: shard the largest axis of big 2D kernels over 'fsdp';
    replicate small tensors. Used by train.state.create_sharded_state."""
    fsdp = mesh.shape["fsdp"]
    if fsdp == 1 or value.ndim < 2 or value.size < (1 << 20):
        return NamedSharding(mesh, P())
    # shard the first dim divisible by fsdp
    spec = [None] * value.ndim
    for i in np.argsort([-s for s in value.shape]):
        if value.shape[i] % fsdp == 0:
            spec[i] = "fsdp"
            break
    return NamedSharding(mesh, P(*spec))


def initialize_distributed() -> None:
    """Multi-host runtime init (no-op single-host). Mirrors the role of
    Lightning's NCCL process-group setup; on TPU pods the coordinator is
    discovered from the environment."""
    if os.environ.get("HULC2_TPU_DISTRIBUTED", "0") == "1" and jax.process_count() == 1:
        jax.distributed.initialize()


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()
