"""Empirical HBM stream ceilings for the roofline analysis.

`tools/roofline.py` reports each formatting op's achieved GB/s against the
v5e spec sheet's 819 GB/s, but the *achievable* ceiling depends on dtype:
this microbench measures it with chained scaled copies of the exact tensor
the train step's big formatting ops move (bf16/u8 [2048,200,200,3] — the
fused 64x32-frame static-camera batch). Chaining N copies inside one jit
amortizes dispatch, so wall/N is device time even on the tunneled chip.

Measured (r4, v5e, docs/design.md roofline table):
    bf16  1.180 ms/copy  833 GB/s  (101.7% of the 819 GB/s spec)
    u8    1.164 ms/copy  422 GB/s  ( 51.6% — byte streams run at half rate)

The u8 result is the load-bearing one: it shows the step's u8 input relayout
(copy.830, 429 GB/s) is AT its dtype's floor, not 48% below it as the
spec-sheet roofline alone would suggest.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N = 24
SHAPE = (2048, 200, 200, 3)
V5E_HBM_GBPS = 819.0


@partial(jax.jit, static_argnums=1)
def _chain_bf16(x, n):
    for _ in range(n):
        x = x * jnp.bfloat16(1.0000305)  # not foldable; pure read+write stream
    return x


@partial(jax.jit, static_argnums=1)
def _chain_u8(x, n):
    for _ in range(n):
        x = x + jnp.uint8(1)
    return x


def measure(chain, x, fetch):
    r = chain(x, N)
    fetch(r)  # compile + settle (block_until_ready unreliable on axon)
    t0 = time.perf_counter()
    fetch(chain(x, N))
    dt = (time.perf_counter() - t0) / N
    byts = 2 * x.size * x.dtype.itemsize  # read + write
    return dt, byts / dt / 1e9


def main():
    x = jnp.asarray(np.random.randn(*SHAPE), jnp.bfloat16)
    dt, gbps = measure(_chain_bf16, x, lambda r: float(r[0, 0, 0, 0]))
    print(f"bf16 per-copy {dt*1e3:.3f} ms, {gbps:.1f} GB/s, "
          f"{100*gbps/V5E_HBM_GBPS:.1f}% of {V5E_HBM_GBPS:.0f} GB/s spec")
    xu = jnp.asarray(np.random.randint(0, 255, SHAPE), jnp.uint8)
    dt, gbps = measure(_chain_u8, xu, lambda r: int(r[0, 0, 0, 0]))
    print(f"u8   per-copy {dt*1e3:.3f} ms, {gbps:.1f} GB/s, "
          f"{100*gbps/V5E_HBM_GBPS:.1f}% of spec")


if __name__ == "__main__":
    main()
