"""Train state + mesh-aware initialization.

The state is a plain pytree (params, opt_state, step) initialized directly
with the desired shardings via ``jax.jit(init, out_shardings=...)`` so large
parameters are born sharded (never materialized replicated on one chip).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hulc2_tpu.parallel import mesh as mesh_lib


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(init_fn: Callable[[], Any], tx: optax.GradientTransformation) -> TrainState:
    params = jax.jit(init_fn)()  # one cacheable program, not eager op-by-op
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def state_shardings(state_shape, mesh: Mesh):
    """Sharding pytree for a TrainState: params/opt_state by the fsdp rule,
    scalars replicated."""

    def rule(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return NamedSharding(mesh, P())
        return mesh_lib.param_sharding_rules((), x, mesh)

    return jax.tree_util.tree_map(rule, state_shape)


def create_sharded_train_state(
    init_fn: Callable[[], Any], tx: optax.GradientTransformation, mesh: Mesh
) -> TrainState:
    """Initialize the state already sharded over the mesh (SPMD-native)."""

    def build():
        return create_train_state(init_fn, tx)

    shapes = jax.eval_shape(build)
    shardings = state_shardings(shapes, mesh)
    with mesh:
        return jax.jit(build, out_shardings=shardings)()
