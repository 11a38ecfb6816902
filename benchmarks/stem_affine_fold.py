"""Micro-benchmark: fold the per-channel input affine into the stem conv.

The r2 train-step trace (docs/design.md) shows the static-cam chain spends
~3.4 ms/step moving the 983 MB bf16 tensor through the scale_normalize
multiply-add and the relayout copy it forces. Since the stem conv is linear,
``conv(alpha*x + beta) == conv_{alpha*W}(x) + (beta . sum W + b)`` — the
affine can ride on the (tiny) kernel instead of the (huge) activation.

Compares fwd+bwd of:
  A) uint8 -> random_shift -> scale_normalize -> s2d -> conv2x2(48->32)
  B) uint8 -> random_shift -> cast bf16      -> s2d -> folded conv

Run on the real TPU: python benchmarks/stem_affine_fold.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from hulc2_tpu.ops.preprocess import random_shift, scale_and_normalize
from hulc2_tpu.ops.space_to_depth import space_to_depth

B, H, C, O = 2048, 200, 3, 32  # 64x32 frames of the static cam
MEAN, STD = 0.5, 0.5
ALPHA, BETA = 1.0 / (255.0 * STD), -MEAN / STD


def chain_a(kernel, bias, x, key):
    x = random_shift(key, x, 10)
    x = scale_and_normalize(x, [MEAN], [STD], jnp.bfloat16)
    x = space_to_depth(x, 4)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(jnp.bfloat16), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (y + bias.astype(jnp.bfloat16)).astype(jnp.float32).sum()


def chain_b(kernel, bias, x, key):
    x = random_shift(key, x, 10)
    x = space_to_depth(x.astype(jnp.bfloat16), 4)
    kf = (kernel * ALPHA).astype(jnp.bfloat16)
    bf = bias + BETA * kernel.sum(axis=(0, 1, 2))
    y = jax.lax.conv_general_dilated(
        x, kf, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (y + bf.astype(jnp.bfloat16)).astype(jnp.float32).sum()


def bench(fn, kernel, bias, x, key, n=20):
    g = jax.jit(jax.grad(fn, argnums=(0, 1)))
    out = g(kernel, bias, x, key)
    [float(o.sum()) for o in out]  # force host fetch (axon block caveat)
    t0 = time.perf_counter()
    for i in range(n):
        out = g(kernel, bias, x, jax.random.fold_in(key, i))
    [float(o.sum()) for o in out]
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 256, (B, H, H, C)), jnp.uint8)
    kernel = jnp.asarray(rng.randn(2, 2, 16 * C, O) * 0.05, jnp.float32)
    bias = jnp.zeros((O,), jnp.float32)
    key = jax.random.PRNGKey(0)

    # equivalence first (fp32 exact-ish; bf16 rounding differs slightly)
    ya = jax.jit(chain_a)(kernel, bias, x, key)
    yb = jax.jit(chain_b)(kernel, bias, x, key)
    rel = abs(float(ya) - float(yb)) / max(abs(float(ya)), 1e-9)
    print(f"sum rel-diff A vs B: {rel:.2e}")

    ta = bench(chain_a, kernel, bias, x, key)
    tb = bench(chain_b, kernel, bias, x, key)
    print(f"A (normalize on activations): {ta:.2f} ms/step fwd+bwd")
    print(f"B (affine folded into conv):  {tb:.2f} ms/step fwd+bwd")
    print(f"saving: {ta - tb:.2f} ms ({(ta - tb) / ta * 100:.1f}%)")


if __name__ == "__main__":
    main()
