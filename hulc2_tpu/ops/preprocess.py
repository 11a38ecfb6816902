"""Fused on-device image preprocessing / augmentation.

The reference runs per-frame torchvision transforms inside CPU DataLoader
workers (reference: hulc2/utils/transforms.py, conf/datamodule/transforms/
rand_shift.yaml). Here the host pipeline ships raw uint8 frames and the whole
augmentation chain executes inside the jitted train step on TPU — one fused
XLA program, no host round-trips, PRNG-keyed and reproducible.

Key insight for RandomShiftsAug (DrQ-v2): the reference's replicate-pad +
bilinear grid_sample uses integer pixel shifts on an exactly pixel-center-
aligned grid, so it is *mathematically* a random integer crop of the padded
image. We implement it as pad + dynamic_slice — exact same outputs, no
gather/interpolation cost.

All image tensors here are NHWC (TPU-native layout).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def scale_and_normalize(imgs: jnp.ndarray, mean, std, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 [0,255] -> ((x/255) - mean) / std, folded into one multiply-add.

    Matches ScaleImageTensor + Normalize (transforms.py:8, rand_shift.yaml).
    """
    mean = jnp.asarray(mean, dtype=dtype)
    std = jnp.asarray(std, dtype=dtype)
    scale = 1.0 / (255.0 * std)
    shift = -mean / std
    return imgs.astype(dtype) * scale + shift


def normalize_vector(x: jnp.ndarray, mean, std) -> jnp.ndarray:
    """(x - mean) / std with zero-std dims treated as std=1
    (reference: transforms.py:36-46 NormalizeVector)."""
    mean = jnp.asarray(mean, dtype=x.dtype)
    std = jnp.asarray(std, dtype=x.dtype)
    std = jnp.where(std == 0.0, 1.0, std)
    return (x - mean) / std


def _crop_one(img: jnp.ndarray, off: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jax.lax.dynamic_slice(img, (off[0], off[1], 0), (h, w, img.shape[-1]))


def random_shift_slices(rng: jax.Array, imgs: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reference implementation of random_shift via per-frame dynamic slices
    (exact but gather-bound on TPU — kept for CPU paths and as the test
    oracle for the matmul formulation below)."""
    n, h, w, c = imgs.shape
    padded = jnp.pad(imgs, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    offsets = jax.random.randint(rng, (n, 2), 0, 2 * pad + 1)
    return jax.vmap(partial(_crop_one, h=h, w=w))(padded, offsets)


def random_shift(rng: jax.Array, imgs: jnp.ndarray, pad: int) -> jnp.ndarray:
    """DrQ-v2 RandomShiftsAug (reference: transforms.py:85-106), exact.

    imgs: (N, H, W, C), H == W. One independent integer shift per frame,
    equivalent to replicate-padding by ``pad`` and cropping HxW at a uniform
    offset in [0, 2*pad]^2.

    TPU-first formulation: the per-frame crop is expressed as two batched
    one-hot selection matmuls (rows, then columns) that run on the MXU
    instead of the gather unit. Selection matrices are one-hot and pixel
    values are integers <= 255, so bf16 products/sums are EXACT — ~20x faster
    than the vmapped dynamic-slice lowering at full CALVIN batch size, which
    dominated the train step (29ms -> ~1.5ms of MXU time).

    The replicate pad is never materialized: cropping the edge-padded image
    at offset o reads original index clamp(o + i - pad, 0, dim-1), so the
    one-hot selections index the RAW image with clamped indices — exactly
    equivalent, and it deletes the (N, H+2p, W+2p, C) uint8 pad-construction
    chain (~5 ms and ~300 MB of HBM traffic at full CALVIN batch, measured
    in the XLA trace). Output is float32 in the original value range.
    """
    offsets = jax.random.randint(rng, (imgs.shape[0], 2), 0, 2 * pad + 1)
    return shift_from_offsets(offsets, imgs, pad)


def shift_from_offsets(
    offsets: jnp.ndarray, imgs: jnp.ndarray, pad: int, sel_dtype=jnp.bfloat16
) -> jnp.ndarray:
    """The one-hot selection-matmul crop for given per-frame ``offsets``
    (each in [0, 2*pad]^2). ``sel_dtype=bfloat16`` is exact for integer
    pixel values <= 255 (uint8 frames); pass ``float32`` for real-valued
    images (still exact — every output element is a single one-hot product,
    never a sum) at half MXU rate."""
    n, h, w, c = imgs.shape
    rows = jnp.clip(offsets[:, 0:1] + jnp.arange(h)[None, :] - pad, 0, h - 1)
    cols = jnp.clip(offsets[:, 1:2] + jnp.arange(w)[None, :] - pad, 0, w - 1)
    row_sel = jax.nn.one_hot(rows, h, dtype=sel_dtype)
    col_sel = jax.nn.one_hot(cols, w, dtype=sel_dtype)
    # channels-major internally: keeps the minor-most dims at (H, W) so XLA
    # never materializes a tiled layout padded along a tiny C axis
    x = jnp.transpose(imgs, (0, 3, 1, 2)).astype(sel_dtype)  # (N, C, H, W)
    x = jnp.einsum("nhp,ncpw->nchw", row_sel, x, preferred_element_type=sel_dtype)
    x = jnp.einsum("nwq,nchq->nchw", col_sel, x, preferred_element_type=jnp.float32)
    return jnp.transpose(x, (0, 2, 3, 1))


def add_gaussian_noise(rng: jax.Array, x: jnp.ndarray, mean, std) -> jnp.ndarray:
    """x + N(0,1)*std + mean (reference: transforms.py:52-59)."""
    return x + jax.random.normal(rng, x.shape, x.dtype) * jnp.asarray(std, x.dtype) + jnp.asarray(mean, x.dtype)


def add_depth_noise(rng: jax.Array, x: jnp.ndarray, shape=1000.0, rate=1000.0) -> jnp.ndarray:
    """Multiplicative gamma noise on depth maps (reference: transforms.py:65-78,
    adapted from DexNet 2.0). One scalar draw per call, like the reference."""
    g = jax.random.gamma(rng, jnp.asarray(shape, x.dtype)) / jnp.asarray(rate, x.dtype)
    return g * x


def resize(imgs: jnp.ndarray, out_h: int, out_w: int, method: str = "bilinear") -> jnp.ndarray:
    """Resize NHWC images. No-op when shapes already match (the common CALVIN
    path: Resize(200) on 200x200 static / Resize(84) on 84x84 gripper)."""
    n, h, w, c = imgs.shape
    if (h, w) == (out_h, out_w):
        return imgs
    return jax.image.resize(imgs.astype(jnp.float32), (n, out_h, out_w, c), method=method)


def resize_shorter_edge(imgs: jnp.ndarray, size: int, method: str = "bilinear") -> jnp.ndarray:
    """torchvision-Resize(int) semantics: scale shorter edge to ``size``."""
    n, h, w, c = imgs.shape
    if h <= w:
        out_h, out_w = size, max(1, round(w * size / h))
    else:
        out_h, out_w = max(1, round(h * size / w)), size
    return resize(imgs, out_h, out_w, method)


def random_crop(rng: jax.Array, imgs: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Uniform random crop per frame (torchvision RandomCrop on tensors)."""
    n, h, w, c = imgs.shape
    offs = jnp.stack(
        [
            jax.random.randint(rng, (n,), 0, h - out_h + 1),
            jax.random.randint(jax.random.fold_in(rng, 1), (n,), 0, w - out_w + 1),
        ],
        axis=-1,
    )
    return jax.vmap(partial(_crop_one, h=out_h, w=out_w))(imgs, offs)


def color_jitter(
    rng: jax.Array,
    imgs: jnp.ndarray,
    brightness: float = 0.3,
    contrast: float = 0.3,
    hue: float = 0.3,
    prob: float = 0.3,
) -> jnp.ndarray:
    """Probabilistic color jitter on float images in [0,1]
    (reference: transforms.py:109-121 ColorTransform).

    Brightness/contrast are multiplicative factors in [1-f, 1+f]; hue rotates
    channels via a YIQ-space rotation (cheap, branch-free approximation of
    torchvision's HSV hue shift). Applied to the whole batch with probability
    ``prob``, like the reference's per-__getitem__ coin flip.
    """
    k_apply, k_b, k_c, k_h = jax.random.split(rng, 4)
    b = jax.random.uniform(k_b, (), minval=1.0 - brightness, maxval=1.0 + brightness)
    c = jax.random.uniform(k_c, (), minval=1.0 - contrast, maxval=1.0 + contrast)
    theta = jax.random.uniform(k_h, (), minval=-hue, maxval=hue) * 2.0 * jnp.pi

    out = imgs * b
    mean = jnp.mean(out, axis=(-3, -2, -1), keepdims=True)
    out = mean + (out - mean) * c

    # hue rotation in YIQ space
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    rgb2yiq = jnp.array(
        [[0.299, 0.587, 0.114], [0.596, -0.274, -0.322], [0.211, -0.523, 0.312]], dtype=out.dtype
    )
    yiq2rgb = jnp.array(
        [[1.0, 0.956, 0.621], [1.0, -0.272, -0.647], [1.0, -1.106, 1.703]], dtype=out.dtype
    )
    rot = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, cos_t, -sin_t], [0.0, sin_t, cos_t]], dtype=out.dtype
    )
    m = yiq2rgb @ rot @ rgb2yiq
    out = jnp.clip(out @ m.T, 0.0, 1.0)

    apply = jax.random.uniform(k_apply, ()) < prob
    return jnp.where(apply, out, imgs)


def relative_actions(actions: jnp.ndarray, robot_obs: jnp.ndarray,
                     max_pos: float = 0.02, max_orn: float = 0.05) -> jnp.ndarray:
    """Absolute world-frame actions -> clipped, scaled relative actions
    (reference: transforms.py:124-148 RelativeActions). ``actions`` and
    ``robot_obs`` are (..., 7)/(..., >=6); gripper passes through."""
    rel_pos = jnp.clip(actions[..., :3] - robot_obs[..., :3], -max_pos, max_pos) / max_pos
    diff = actions[..., 3:6] - robot_obs[..., 3:6]
    wrapped = (diff + jnp.pi) % (2 * jnp.pi) - jnp.pi
    rel_orn = jnp.clip(wrapped, -max_orn, max_orn) / max_orn
    return jnp.concatenate([rel_pos, rel_orn, actions[..., -1:]], axis=-1)
