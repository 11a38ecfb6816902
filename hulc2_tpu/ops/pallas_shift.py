"""Pallas TPU kernel: fused per-frame random crop + scale + normalize.

The train step's hottest non-matmul op is the DrQ RandomShift augmentation
over ~2k frames (reference semantics: hulc2/utils/transforms.py:85-106).
This kernel crops via dynamic rotates in VMEM and fuses the uint8 -> float
scale/normalize.

BENCHMARK (v5e, 2048x200x200x3, pad 10): this kernel runs at ~184 ms — the
per-frame dynamic rotates are VPU-shuffle-bound — while the one-hot matmul
formulation in ``ops/preprocess.random_shift`` runs the same workload in
~12 ms on the MXU (vs ~700 ms for vmapped dynamic-slice gathers). The matmul
version is therefore the production path; this kernel is kept as the Pallas
reference implementation and as executable documentation of two real Mosaic
constraints discovered while writing it (unaligned dynamic slices are not
lowerable; dynamic rotates miscompile with negative shifts on multi-tile
arrays).

Layout: images are viewed 2D as (H, W*C) so the lane dimension is W*C
(>= 128) instead of C=3 (which would pad 42x in VMEM). Offsets arrive via
scalar prefetch so the DMA source address is known before the body runs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(offsets_ref, pad_ref, scale_ref, shift_ref, out_ref, *, h, c):
    i = pl.program_id(0)
    r = offsets_ref[i, 0]
    cc = offsets_ref[i, 1] * c  # column offset in flattened W*C units
    # Dynamic unaligned slices are not lowerable on TPU; a dynamic circular
    # roll + aligned slice is: rows/lanes that wrap around land beyond the
    # crop and are discarded by the (cheap, static) XLA slice outside the
    # kernel. Rotate requires 32-bit data.
    # NOTE: compiled Mosaic dynamic rotates miscompile for NEGATIVE shifts on
    # multi-tile arrays (verified empirically) — always roll by size - s >= 0.
    window = pad_ref[0].astype(jnp.int32)
    window = pltpu.roll(window, window.shape[0] - r, 0)
    window = pltpu.roll(window, window.shape[1] - cc, 1)
    # roll the per-lane normalization row identically so channels line up
    scale = pltpu.roll(scale_ref[...], scale_ref.shape[1] - cc, 1)
    shift = pltpu.roll(shift_ref[...], shift_ref.shape[1] - cc, 1)
    x = window[:h].astype(jnp.float32)
    out_ref[0] = x * scale + shift


def random_shift_normalize_pallas(
    rng: jax.Array,
    imgs: jnp.ndarray,  # (N, H, W, C) uint8
    pad: int,
    mean,
    std,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused RandomShift + ScaleImageTensor + Normalize. Returns (N, H, W, C)
    in ``out_dtype`` with values ((x/255) - mean) / std."""
    n, h, w, c = imgs.shape
    # very large grids overflow SMEM with the prefetched offset table — chunk
    if n > 1024:
        keys = jax.random.split(rng, -(-n // 1024))
        outs = [
            random_shift_normalize_pallas(k, imgs[i : i + 1024], pad, mean, std, out_dtype, interpret)
            for k, i in zip(keys, range(0, n, 1024))
        ]
        return jnp.concatenate(outs, axis=0)
    wc = w * c
    padded = jnp.pad(imgs, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    padded2d = padded.reshape(n, h + 2 * pad, (w + 2 * pad) * c)
    offsets = jax.random.randint(rng, (n, 2), 0, 2 * pad + 1)

    # align to TPU tiles: uint8 sublane tile is 32 rows, lanes multiple of 128
    hp = -(-(h + 2 * pad) // 32) * 32
    wcp = -(-((w + 2 * pad) * c) // 128) * 128
    padded2d = jnp.pad(
        padded2d,
        ((0, 0), (0, hp - padded2d.shape[1]), (0, wcp - padded2d.shape[2])),
    )
    mean = jnp.broadcast_to(jnp.asarray(mean, jnp.float32), (c,))
    std = jnp.broadcast_to(jnp.asarray(std, jnp.float32), (c,))
    scale_row = jnp.tile(1.0 / (255.0 * std), -(-wcp // c))[None, :wcp]  # (1, wcp)
    shift_row = jnp.tile(-mean / std, -(-wcp // c))[None, :wcp]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # offsets
        grid=(n,),
        in_specs=[
            # one padded frame per grid step; the pallas pipeline double-
            # buffers the HBM->VMEM copies automatically
            pl.BlockSpec((1, hp, wcp), lambda i, off: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wcp), lambda i, off: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wcp), lambda i, off: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wcp), lambda i, off: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel, h=h, c=c)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, wcp), jnp.float32),
        interpret=interpret,
    )(offsets, padded2d, scale_row, shift_row)
    return out[:, :, :wc].reshape(n, h, w, c).astype(out_dtype)
