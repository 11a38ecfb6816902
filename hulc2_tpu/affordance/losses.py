"""Affordance segmentation losses + metrics.

Counterpart of the reference's affordance loss/metrics utilities
(reference: hulc2/affordance/utils/losses.py:6-127 — cross_entropy_with_logits
over pixels, dice loss, mIoU) supporting the mask-label variant
(one_stream_attention_lang_fusion_mask.py, datasets/mask_label.py) where the
target is a binary interaction mask instead of a single pixel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_cross_entropy(logits_flat: jnp.ndarray, target_flat: jnp.ndarray) -> jnp.ndarray:
    """Softmax-over-pixels CE with a (possibly soft) target distribution
    (reference: losses.py:6). logits/target: (B, H*W)."""
    logp = jax.nn.log_softmax(logits_flat, axis=-1)
    target = target_flat / jnp.maximum(jnp.sum(target_flat, axis=-1, keepdims=True), 1e-9)
    return -jnp.mean(jnp.sum(target * logp, axis=-1))


def binary_mask_bce(logits: jnp.ndarray, mask: jnp.ndarray, pos_weight: float = 1.0) -> jnp.ndarray:
    """Per-pixel sigmoid BCE for mask labels. logits/mask: (B, H, W) or flat."""
    z = logits
    loss = jax.nn.softplus(z) - z * mask
    if pos_weight != 1.0:
        loss = jnp.where(mask > 0.5, pos_weight * loss, loss)
    return jnp.mean(loss)


def dice_loss(logits: jnp.ndarray, mask: jnp.ndarray, eps: float = 1.0) -> jnp.ndarray:
    """Soft dice over sigmoid probabilities (reference: losses.py:106)."""
    p = jax.nn.sigmoid(logits).reshape(logits.shape[0], -1)
    m = mask.reshape(mask.shape[0], -1)
    inter = jnp.sum(p * m, axis=-1)
    denom = jnp.sum(p, axis=-1) + jnp.sum(m, axis=-1)
    return jnp.mean(1.0 - (2.0 * inter + eps) / (denom + eps))


def miou(pred_mask: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Mean IoU of binary masks (reference: losses.py:118-127)."""
    p = pred_mask.reshape(pred_mask.shape[0], -1) > 0.5
    m = mask.reshape(mask.shape[0], -1) > 0.5
    inter = jnp.sum(p & m, axis=-1)
    union = jnp.sum(p | m, axis=-1)
    return jnp.mean(inter / jnp.maximum(union, 1))


def mask_criterion(
    logits_flat: jnp.ndarray,
    mask: jnp.ndarray,
    dice_weight: float = 0.5,
) -> tuple:
    """Combined BCE + dice for the mask-label affordance variant; returns
    (loss, metrics) with mIoU."""
    b = logits_flat.shape[0]
    logits = logits_flat.reshape(b, *mask.shape[1:])
    bce = binary_mask_bce(logits, mask)
    dice = dice_loss(logits, mask)
    loss = (1 - dice_weight) * bce + dice_weight * dice
    metrics = {
        "mask_bce": bce,
        "dice_loss": dice,
        "miou": miou(jax.nn.sigmoid(logits), mask),
    }
    return loss, metrics
