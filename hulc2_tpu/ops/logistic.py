"""Discretized logistic mixture likelihood + inversion sampling.

TPU-native (pure jnp, fully fuseable by XLA on the VPU) re-derivation of the
PixelCNN++-style mixture the reference uses for continuous action dims
(reference: hulc2/models/decoders/logistic_decoder_rnn.py:181-255) and for the
affordance depth head (hulc2/affordance/models/depth/depth_logistics.py).

Shapes use a trailing mixture axis: params are (..., A, K) for A action dims
and K mixture components; targets are (..., A).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def logistic_mixture_log_prob(
    logit_probs: jnp.ndarray,
    log_scales: jnp.ndarray,
    means: jnp.ndarray,
    targets: jnp.ndarray,
    act_min: jnp.ndarray,
    act_max: jnp.ndarray,
    num_classes: int,
    log_scale_min: float = -7.0,
) -> jnp.ndarray:
    """Per-dim log-likelihood log p(target) under a discretized logistic mixture.

    The value range [act_min, act_max] is discretized into ``num_classes`` bins;
    edge bins integrate the open tails. Returns (..., A).
    """
    log_scales = jnp.maximum(log_scales, log_scale_min)
    x = targets[..., None]  # (..., A, 1) broadcast over K
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    half_bin = (act_max - act_min) / 2.0 / (num_classes - 1)

    plus_in = inv_stdv * (centered + half_bin)
    min_in = inv_stdv * (centered - half_bin)
    cdf_delta = jax.nn.sigmoid(plus_in) - jax.nn.sigmoid(min_in)

    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)  # left tail bin
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)  # right tail bin
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    log_probs = jnp.where(
        x < act_min + 1e-3,
        log_cdf_plus,
        jnp.where(
            x > act_max - 1e-3,
            log_one_minus_cdf_min,
            jnp.where(
                cdf_delta > 1e-5,
                jnp.log(jnp.maximum(cdf_delta, 1e-12)),
                log_pdf_mid - jnp.log((num_classes - 1) / 2.0),
            ),
        ),
    )
    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    return jax.nn.logsumexp(log_probs, axis=-1)  # (..., A)


def logistic_mixture_loss(
    logit_probs: jnp.ndarray,
    log_scales: jnp.ndarray,
    means: jnp.ndarray,
    targets: jnp.ndarray,
    act_min: jnp.ndarray,
    act_max: jnp.ndarray,
    num_classes: int,
    log_scale_min: float = -7.0,
) -> jnp.ndarray:
    """NLL: sum over action dims, mean over all leading dims (batch & seq),
    matching the reference's reduction (logistic_decoder_rnn.py:227)."""
    lp = logistic_mixture_log_prob(
        logit_probs, log_scales, means, targets, act_min, act_max, num_classes, log_scale_min
    )
    return -jnp.mean(jnp.sum(lp, axis=-1))


def logistic_mixture_sample(
    rng: jax.Array,
    logit_probs: jnp.ndarray,
    log_scales: jnp.ndarray,
    means: jnp.ndarray,
) -> jnp.ndarray:
    """Sample actions (..., A) from the mixture.

    Gumbel-max over components followed by inversion sampling of the selected
    logistic, with uniforms drawn in (1e-5, 1 - 1e-5] as in the reference
    (logistic_decoder_rnn.py:235-249).
    """
    r1, r2 = 1e-5, 1.0 - 1e-5
    k_sel, k_inv = jax.random.split(rng)
    u_sel = jax.random.uniform(k_sel, logit_probs.shape, minval=r1, maxval=r2)
    gumbel = logit_probs - jnp.log(-jnp.log(u_sel))
    sel = jax.nn.one_hot(jnp.argmax(gumbel, axis=-1), logit_probs.shape[-1], dtype=means.dtype)

    log_scale = jnp.sum(sel * log_scales, axis=-1)
    mean = jnp.sum(sel * means, axis=-1)
    u = jax.random.uniform(k_inv, mean.shape, minval=r1, maxval=r2)
    return mean + jnp.exp(log_scale) * (jnp.log(u) - jnp.log(1.0 - u))
