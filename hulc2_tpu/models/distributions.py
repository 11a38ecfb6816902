"""Latent-plan distribution abstraction: discrete straight-through one-hot
categorical (default, 32 categories x 32 classes) or diagonal Normal.

TPU-native re-design of the reference's torch.distributions wrapper
(reference: hulc2/utils/distributions.py:15-60, conf/model/distribution/
discrete.yaml). States are NamedTuples of arrays (jit/pytree friendly);
sampling takes explicit PRNG keys; the straight-through estimator is the
standard ``sample + probs - stop_grad(probs)`` construction that
``OneHotCategoricalStraightThrough.rsample`` implements.
"""
from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp


class DiscState(NamedTuple):
    logit: jnp.ndarray  # (..., category_size * class_size)


class ContState(NamedTuple):
    mean: jnp.ndarray
    std: jnp.ndarray


State = Union[DiscState, ContState]


class PlanDistribution:
    """Stateless helper bundling the distribution family + sizes."""

    def __init__(self, dist: str, category_size: int = 0, class_size: int = 0, plan_features: int = 0):
        assert dist in ("discrete", "continuous")
        self.dist = dist
        self.category_size = category_size
        self.class_size = class_size
        self._plan_features = plan_features

    @property
    def plan_features(self) -> int:
        if self.dist == "discrete":
            return self.category_size * self.class_size
        return self._plan_features

    @property
    def state_dim(self) -> int:
        """Output width of the fc_state head producing distribution params."""
        return self.plan_features if self.dist == "discrete" else 2 * self._plan_features

    # -- state construction ------------------------------------------------
    def forward_dist(self, x: jnp.ndarray) -> State:
        """Raw fc_state output -> State (reference: distributions.py:51-60)."""
        if self.dist == "discrete":
            return DiscState(x)
        mean, var = jnp.split(x, 2, axis=-1)
        std = jax.nn.softplus(var) + 1e-4
        return ContState(mean, std)

    def detach_state(self, state: State) -> State:
        return jax.tree_util.tree_map(jax.lax.stop_gradient, state)

    def _logits(self, state: DiscState) -> jnp.ndarray:
        s = state.logit.shape
        return state.logit.reshape(*s[:-1], self.category_size, self.class_size)

    # -- sampling ----------------------------------------------------------
    def sample(self, rng: jax.Array, state: State) -> jnp.ndarray:
        """Non-reparameterized sample, flattened to (..., plan_features)."""
        if self.dist == "discrete":
            logits = self._logits(state)
            idx = jax.random.categorical(rng, logits, axis=-1)
            one_hot = jax.nn.one_hot(idx, self.class_size, dtype=logits.dtype)
            return one_hot.reshape(*one_hot.shape[:-2], -1)
        eps = jax.random.normal(rng, state.mean.shape, state.mean.dtype)
        return state.mean + state.std * eps

    def rsample(self, rng: jax.Array, state: State) -> jnp.ndarray:
        """Reparameterized / straight-through sample, flattened."""
        if self.dist == "discrete":
            logits = self._logits(state)
            idx = jax.random.categorical(rng, logits, axis=-1)
            one_hot = jax.nn.one_hot(idx, self.class_size, dtype=logits.dtype)
            probs = jax.nn.softmax(logits, axis=-1)
            st = one_hot + probs - jax.lax.stop_gradient(probs)
            return st.reshape(*st.shape[:-2], -1)
        eps = jax.random.normal(rng, state.mean.shape, state.mean.dtype)
        return state.mean + state.std * eps

    # -- divergence ---------------------------------------------------------
    def kl_divergence(self, p: State, q: State) -> jnp.ndarray:
        """KL(p || q), reduced over the event dims -> (...,) batch shape."""
        if self.dist == "discrete":
            lp = jax.nn.log_softmax(self._logits(p), axis=-1)
            lq = jax.nn.log_softmax(self._logits(q), axis=-1)
            kl = jnp.sum(jnp.exp(lp) * (lp - lq), axis=-1)  # per category
            return jnp.sum(kl, axis=-1)
        var_p, var_q = p.std**2, q.std**2
        kl = 0.5 * ((var_p + (p.mean - q.mean) ** 2) / var_q - 1.0) + jnp.log(q.std / p.std)
        return jnp.sum(kl, axis=-1)

    def kl_balanced(self, prior: State, posterior: State, alpha: float) -> jnp.ndarray:
        """Hafner-style KL balancing (reference: hulc2/models/hulc2.py:444-466):
        ``alpha * KL(sg(post) || prior) + (1-alpha) * KL(post || sg(prior))``,
        each term meaned over the batch."""
        lhs = jnp.mean(self.kl_divergence(self.detach_state(posterior), prior))
        rhs = jnp.mean(self.kl_divergence(posterior, self.detach_state(prior)))
        return alpha * lhs + (1.0 - alpha) * rhs
