"""Depth estimation heads: Gaussian NLL and discretized-logistic mixture.

(reference: hulc2/affordance/models/depth/depth_gaussian.py:12 and
depth_logistics.py:13.) Both consume the affordance encoder's bottleneck
features concatenated with the language embedding and regress the interaction
depth; the logistic variant shares the mixture math with the action decoder
(hulc2_tpu.ops.logistic — one fused implementation for both subsystems).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hulc2_tpu.models.layers import Dense
from hulc2_tpu.ops import logistic


class DepthNorm(NamedTuple):
    """Normalization stats for depth targets (statistics of the labeled
    dataset; reference: depth_gaussian.py:33-36)."""

    mean: float = 0.0
    std: float = 1.0

    def normalize(self, d):
        return (d - self.mean) / self.std

    def denormalize(self, d):
        return d * self.std + self.mean


class GaussianDepthHead(nn.Module):
    """fc(feat ++ lang) -> fc(++ lang) -> fc -> (mu, sigma); NLL loss
    (reference: depth_gaussian.py:57-102)."""

    hidden_dim: int = 256
    lang_dim: int = 1024

    @nn.compact
    def __call__(self, bottleneck: jnp.ndarray, lang: jnp.ndarray):
        x = bottleneck.reshape(bottleneck.shape[0], -1)
        x = jax.nn.relu(Dense(self.hidden_dim * 3, name="fc1")(jnp.concatenate([x, lang], -1)))
        x = jax.nn.relu(Dense(self.hidden_dim * 2, name="fc2")(jnp.concatenate([x, lang], -1)))
        x = jax.nn.relu(Dense(self.hidden_dim, name="fc3")(x))
        mu = Dense(1, name="depth_mu")(x)
        log_sigma = jnp.clip(Dense(1, name="depth_sigma")(x), -20.0, 2.0)
        return mu, jnp.exp(log_sigma)

    @staticmethod
    def loss(pred: Tuple[jnp.ndarray, jnp.ndarray], target: jnp.ndarray) -> jnp.ndarray:
        """torch GaussianNLLLoss semantics: 0.5*(log(var) + (x-mu)^2/var),
        var clamped at eps, mean reduction."""
        mu, sigma = pred
        var = jnp.maximum(sigma**2, 1e-6)
        return jnp.mean(0.5 * (jnp.log(var) + (target - mu) ** 2 / var))

    @staticmethod
    def sample(rng: jax.Array, pred, norm: Optional[DepthNorm] = None) -> jnp.ndarray:
        mu, sigma = pred
        s = mu + sigma * jax.random.normal(rng, mu.shape, mu.dtype)
        return norm.denormalize(s) if norm else s


class LogisticDepthHead(nn.Module):
    """10-mixture discretized logistic over depth
    (reference: depth_logistics.py:13-60); bounds [-2,2] normalized or
    [1.3, 4.5] metric, 128 bins."""

    hidden_dim: int = 256
    lang_dim: int = 1024
    n_mixtures: int = 10
    num_classes: int = 128
    normalized: bool = True
    log_scale_min: float = -7.0

    @property
    def bounds(self) -> Tuple[float, float]:
        return (-2.0, 2.0) if self.normalized else (1.3, 4.5)

    @nn.compact
    def __call__(self, bottleneck: jnp.ndarray, lang: jnp.ndarray):
        x = bottleneck.reshape(bottleneck.shape[0], -1)
        x = jax.nn.relu(Dense(self.hidden_dim * 3, name="fc1")(jnp.concatenate([x, lang], -1)))
        x = jax.nn.relu(Dense(self.hidden_dim * 2, name="fc2")(jnp.concatenate([x, lang], -1)))
        x = jax.nn.relu(Dense(self.hidden_dim, name="fc3")(x))
        k = self.n_mixtures
        logit_probs = Dense(k, name="prob_fc")(x)[:, None, :]  # (B, 1, K)
        means = Dense(k, name="mean_fc")(x)[:, None, :]
        log_scales = jnp.maximum(Dense(k, name="scale_fc")(x)[:, None, :], self.log_scale_min)
        return logit_probs, log_scales, means

    def loss(self, pred, target: jnp.ndarray) -> jnp.ndarray:
        return logistic_depth_loss(pred, target, self.normalized, self.num_classes, self.log_scale_min)

    def sample(self, rng: jax.Array, pred, norm: Optional[DepthNorm] = None) -> jnp.ndarray:
        return logistic_depth_sample(rng, pred, norm if self.normalized else None)


def logistic_bounds(normalized: bool) -> Tuple[float, float]:
    return (-2.0, 2.0) if normalized else (1.3, 4.5)


def logistic_depth_loss(pred, target: jnp.ndarray, normalized: bool = True,
                        num_classes: int = 128, log_scale_min: float = -7.0) -> jnp.ndarray:
    """Free-function form (usable outside flax binding)."""
    logit_probs, log_scales, means = pred
    lo, hi = logistic_bounds(normalized)
    return logistic.logistic_mixture_loss(
        logit_probs, log_scales, means, target.reshape(-1, 1),
        jnp.asarray(lo), jnp.asarray(hi), num_classes, log_scale_min,
    )


def logistic_depth_sample(rng: jax.Array, pred, norm: Optional[DepthNorm] = None) -> jnp.ndarray:
    logit_probs, log_scales, means = pred
    s = logistic.logistic_mixture_sample(rng, logit_probs, log_scales, means)
    return norm.denormalize(s) if norm else s


DEPTH_HEADS = {"gaussian": GaussianDepthHead, "logistic": LogisticDepthHead}
