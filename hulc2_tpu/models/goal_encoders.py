"""Goal encoders: visual goal MLP, language goal MLP, trainable language MLP.

(reference: hulc2/models/encoders/goal_encoders.py:8,37 and
hulc2/models/encoders/lang_encoder.py:5)
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from hulc2_tpu.models.layers import Dense, get_activation
from hulc2_tpu.models.vision import _l2_normalize


class VisualGoalEncoder(nn.Module):
    """3-layer MLP: perceptual_emb[:, -1] -> 32-d latent goal + LayerNorm."""

    latent_goal_features: int = 32
    hidden_size: int = 2048
    l2_normalize_goal_embeddings: bool = False
    activation_function: str = "ReLU"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_activation(self.activation_function)
        x = act(Dense(self.hidden_size, dtype=self.dtype, name="fc0")(x))
        x = act(Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x))
        x = Dense(self.latent_goal_features, dtype=self.dtype, name="fc2")(x)
        if self.l2_normalize_goal_embeddings:
            x = _l2_normalize(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")(x)


class LanguageGoalEncoder(nn.Module):
    """Word-dropout + 3-layer MLP on (frozen) sentence embeddings -> 32-d goal."""

    latent_goal_features: int = 32
    hidden_size: int = 2048
    word_dropout_p: float = 0.0
    l2_normalize_goal_embeddings: bool = False
    activation_function: str = "ReLU"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_activation(self.activation_function)
        x = nn.Dropout(self.word_dropout_p)(x, deterministic=deterministic)
        x = act(Dense(self.hidden_size, dtype=self.dtype, name="fc0")(x))
        x = act(Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x))
        x = Dense(self.latent_goal_features, dtype=self.dtype, name="fc2")(x)
        if self.l2_normalize_goal_embeddings:
            x = _l2_normalize(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")(x)


class LanguageEncoderMLP(nn.Module):
    """Trainable MLP over precomputed language embeddings
    (reference: lang_encoder.py:5-27)."""

    out_features: int = 256
    hidden_size: int = 2048
    word_dropout_p: float = 0.0
    activation_function: str = "ReLU"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_activation(self.activation_function)
        x = nn.Dropout(self.word_dropout_p)(x, deterministic=deterministic)
        x = act(Dense(self.hidden_size, dtype=self.dtype, name="fc0")(x))
        x = act(Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x))
        return Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
