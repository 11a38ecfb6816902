"""PRNG discipline: one root key per run, deterministic named streams.

The reference relies on global ``seed_everything`` (training.py:39) and
implicit torch RNG state. Here every source of randomness is an explicit
``jax.random`` key derived by folding in stable stream names + step counters,
so runs are bit-reproducible and resumable at any step.
"""
from __future__ import annotations

from typing import Dict

import jax


def root_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def stream(key: jax.Array, name: str) -> jax.Array:
    """Derive a named substream key (stable across code reorderings)."""
    return jax.random.fold_in(key, _stable_hash(name))


def step_key(key: jax.Array, name: str, step) -> jax.Array:
    """Key for stream ``name`` at integer ``step`` (python int or traced)."""
    return jax.random.fold_in(stream(key, name), step)


def split_dict(key: jax.Array, names) -> Dict[str, jax.Array]:
    return {n: stream(key, n) for n in names}


def _stable_hash(name: str) -> int:
    # FNV-1a over the name — process-independent (python hash() is salted)
    h = 0x811C9DC5
    for b in name.encode():
        h ^= b
        h = (h * 0x01000193) & 0xFFFFFFFF
    return h & 0x7FFFFFFF
