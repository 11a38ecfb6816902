"""Affordance labeled dataset: (frame, target pixel, depth, instruction).

Format-compatible with the reference's PixeLabelDataLang on-disk layout
(reference: hulc2/affordance/datasets/pixel_label.py:18-160):

    <data_dir>/episodes_split.json       {"training": {ep: {"static_cam": [...]}},
                                          "validation": {...},
                                          "norm_values": {"depth": {"static_cam":
                                              {"mean": m, "std": s}}}}
    <data_dir>/<ep>/data/<cam>_cam/<file>.npz
        frame (H, W, 3) uint8, centers (N, 3) [label, row, col],
        depth float, lang_ann str, (robot_obs ...)

Host side only reads/resizes bookkeeping; pixel-label jitter (the RandomShift
augmentation that moves image AND label together, pixel_label.py transforms)
and normalization run on device in the training step.
"""
from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from hulc2_tpu.affordance.depth_heads import DepthNorm

logger = logging.getLogger(__name__)


def resize_pixel(pixel, old_shape, new_shape) -> np.ndarray:
    """Map a (row, col) label between resolutions
    (reference: hulc2/utils/img_utils.py:200)."""
    c = np.asarray(new_shape, np.float64) / np.asarray(old_shape, np.float64)
    return (np.asarray(pixel) * c).astype(np.int64)


class AffordanceDataset:
    def __init__(
        self,
        data_dir,
        split: str = "training",
        cam: str = "static",
        img_resize: int = 224,
        data_percent: float = 1.0,
        episodes_file: str = "episodes_split.json",
        lang_embedder=None,  # optional callable str -> (E,) embedding
        label_type: str = "pixel",  # "pixel" | "mask" (reference mask_label.py)
    ):
        self.label_type = label_type
        self.data_dir = Path(data_dir)
        self.split = split
        self.cam = cam
        self.img_resize = img_resize
        self.lang_embedder = lang_embedder
        info = json.loads((self.data_dir / episodes_file).read_text())
        self.depth_norm = DepthNorm(
            float(info["norm_values"]["depth"][f"{cam}_cam"]["mean"]),
            float(info["norm_values"]["depth"][f"{cam}_cam"]["std"]),
        )
        files: List[str] = []
        for ep, content in info[split].items():
            files.extend(f"{ep}/{f}" for f in content[f"{cam}_cam"])
        if split == "training" and data_percent < 1.0:
            files = files[: max(1, int(len(files) * data_percent))]
        self.files = files
        logger.info("%s: %d affordance frames", split, len(files))

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        ep, filename = self.files[idx].rsplit("/", 1)
        path = self.data_dir / ep / "data" / f"{self.cam}_cam" / f"{filename}.npz"
        with np.load(path, allow_pickle=True) as z:
            frame = z["frame"]  # (H, W, 3) uint8
            centers = z["centers"]  # (N, 3): label, row, col
            depth = float(z["depth"]) if "depth" in z.files else 0.0
            lang_ann = str(z["lang_ann"]) if "lang_ann" in z.files else ""
        px = resize_pixel(centers[0, 1:], frame.shape[:2], (self.img_resize, self.img_resize))
        out = {
            "frame": frame,  # raw uint8, resized on device
            "px": px.astype(np.int32),
            "depth": np.float32(depth),
            "normalized_depth": np.float32(self.depth_norm.normalize(depth)),
            "idx": np.int64(idx),
        }
        if self.label_type == "mask":
            with np.load(path, allow_pickle=True) as z:
                if "mask" in z.files:
                    mask = np.asarray(z["mask"], np.float32)
                else:  # synthesize a disc mask around the labeled pixel
                    mask = np.zeros(frame.shape[:2], np.float32)
                    r, c = centers[0, 1:]
                    yy, xx = np.ogrid[: mask.shape[0], : mask.shape[1]]
                    mask[(yy - r) ** 2 + (xx - c) ** 2 <= (mask.shape[0] // 20) ** 2] = 1.0
            if mask.shape != (self.img_resize, self.img_resize):  # nearest resize
                ri = (np.arange(self.img_resize) * mask.shape[0] / self.img_resize).astype(int)
                ci = (np.arange(self.img_resize) * mask.shape[1] / self.img_resize).astype(int)
                mask = mask[np.ix_(ri, ci)]
            out["mask"] = mask
        if self.lang_embedder is not None:
            lang = np.asarray(self.lang_embedder(lang_ann))
            # token embedders (text_tower models) return int32 CLIP-BPE ids —
            # keep them integral; float embedders normalize to float32
            out["lang"] = lang if np.issubdtype(lang.dtype, np.integer) else lang.astype(np.float32)
        else:
            out["lang_ann"] = lang_ann
        return out


def jitter_label_and_image(rng, imgs, px, pad: int):
    """RandomShift that moves the image and its pixel label coherently
    (reference: affordance/datasets/transforms.py DistanceTransform /
    RandomShift pair). imgs (B, H, W, C) float, px (B, 2). On device.

    The crop runs as one-hot selection matmuls on the MXU
    (``preprocess.shift_from_offsets``) — float32 selections, exact — instead
    of per-frame dynamic slices (the gather lowering dominated the affordance
    train step)."""
    import jax
    import jax.numpy as jnp

    from hulc2_tpu.ops.preprocess import shift_from_offsets

    n, h, w, _ = imgs.shape
    offsets = jax.random.randint(rng, (n, 2), 0, 2 * pad + 1)
    shifted = shift_from_offsets(offsets, imgs, pad, sel_dtype=jnp.float32)
    new_px = jnp.clip(px + pad - offsets, 0, jnp.asarray([h - 1, w - 1]))
    return shifted, new_px


def jitter_mask_and_image(rng, imgs, mask, px, pad: int):
    """Mask-label variant of :func:`jitter_label_and_image`: the binary mask
    rides along as an extra channel through the SAME one-hot shift matmuls,
    so image, mask and pixel label stay coherent by construction."""
    import jax
    import jax.numpy as jnp

    from hulc2_tpu.ops.preprocess import shift_from_offsets

    n, h, w, _ = imgs.shape
    offsets = jax.random.randint(rng, (n, 2), 0, 2 * pad + 1)
    stacked = jnp.concatenate([imgs, mask[..., None].astype(imgs.dtype)], axis=-1)
    shifted = shift_from_offsets(offsets, stacked, pad, sel_dtype=jnp.float32)
    new_px = jnp.clip(px + pad - offsets, 0, jnp.asarray([h - 1, w - 1]))
    return shifted[..., :-1], (shifted[..., -1] > 0.5).astype(mask.dtype), new_px
