"""Space-to-depth conv-stem reparametrization.

The CALVIN encoders open with an 8x8-stride-4 conv on 3-channel images — a
shape the MXU runs at ~10% utilization (tiny contraction dim 3*8*8 split
across awkward spatial tiling; profiled ~3.3 ms fwd at full batch). Packing
4x4 spatial blocks into channels turns it into an EXACTLY equivalent
2x2-stride-1 conv over 48 input channels (the standard TPU ResNet trick):
same math, same outputs, dense MXU tiles.

``space_to_depth`` rearranges activations; ``pack_conv_kernel`` rearranges an
(8, 8, C, O) kernel into the (2, 2, 16*C, O) packed form (used both at init
and by the torch-checkpoint converter).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray, block: int = 4) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/b, W/b, b*b*C); channel order (dy, dx, c)."""
    n, h, w, c = x.shape
    assert h % block == 0 and w % block == 0, (h, w, block)
    x = x.reshape(n, h // block, block, w // block, block, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h // block, w // block, block * block * c)


def pack_conv_kernel(kernel, block: int = 4):
    """(kh, kw, C, O) -> (kh/b, kw/b, b*b*C, O) matching space_to_depth's
    (dy, dx, c) channel packing."""
    kh, kw, c, o = np.shape(kernel)
    assert kh % block == 0 and kw % block == 0
    k = np.asarray(kernel).reshape(kh // block, block, kw // block, block, c, o)
    # packed channel index = dy * block * C + dx * C + c
    k = k.transpose(0, 2, 1, 3, 4, 5).reshape(kh // block, kw // block, block * block * c, o)
    return k
