"""Plan proposal (prior) and plan recognition (posterior) networks.

TPU-native counterparts of the reference's plan encoders:
- PlanProposalNetwork: 4-layer 2048-wide MLP on (s0_emb ++ goal)
  (reference: hulc2/models/plan_encoders/plan_proposal_net.py:8)
- PlanRecognitionTransformer: 2-layer 8-head post-norm encoder over the
  sequence with learned position embeddings, mean-pool, fc -> state
  (reference: hulc2/models/plan_encoders/plan_recognition_net.py:77)
- BiLSTM / BiRNN alternatives (plan_recognition_net.py:12,44)

All return (State, seq_feat) where State parametrizes the plan distribution.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hulc2_tpu.models.distributions import PlanDistribution, State
from hulc2_tpu.models.layers import LSTM, Dense, TransformerEncoderLayer, get_activation


class PlanProposalNetwork(nn.Module):
    """Prior p(z | s0, goal)."""

    dist: PlanDistribution
    hidden_size: int = 2048
    activation_function: str = "ReLU"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, initial_percep_emb: jnp.ndarray, latent_goal: jnp.ndarray) -> State:
        act = get_activation(self.activation_function)
        x = jnp.concatenate([initial_percep_emb, latent_goal], axis=-1)
        for i in range(4):
            x = act(Dense(self.hidden_size, dtype=self.dtype, name=f"fc{i}")(x))
        x = Dense(self.dist.state_dim, dtype=self.dtype, name="fc_state")(x)
        return self.dist.forward_dist(x.astype(jnp.float32))


class PlanRecognitionTransformer(nn.Module):
    """Posterior q(z | s_{1..T}) over the full window."""

    dist: PlanDistribution
    num_heads: int = 8
    num_layers: int = 2
    encoder_hidden_size: int = 2048
    fc_hidden_size: int = 4096
    max_position_embeddings: int = 32
    dropout_p: float = 0.1
    encoder_normalize: bool = False
    positional_normalize: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, perceptual_emb: jnp.ndarray, deterministic: bool = True):
        b, s, f = perceptual_emb.shape
        pad = (-f) % self.num_heads  # pad feature dim to a multiple of heads
        x = perceptual_emb
        if pad:
            x = jnp.concatenate([x, jnp.zeros((b, s, pad), x.dtype)], axis=-1)
        e = f + pad

        pos_emb = self.param(
            "position_embeddings",
            nn.initializers.normal(1.0),
            (self.max_position_embeddings, e),
        )
        x = x + pos_emb[None, :s, :].astype(x.dtype)
        if self.positional_normalize:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="pos_ln")(x)
        x = nn.Dropout(self.dropout_p)(x, deterministic=deterministic)
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.num_heads, self.encoder_hidden_size, self.dropout_p,
                dtype=self.dtype, name=f"layer{i}",
            )(x, deterministic=deterministic)
        if self.encoder_normalize:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_ln")(x)
        x = Dense(self.fc_hidden_size, dtype=self.dtype, name="fc")(x)
        seq_feat = jnp.mean(x, axis=1)  # pool the whole window
        state_raw = Dense(self.dist.state_dim, dtype=self.dtype, name="fc_state")(seq_feat)
        return self.dist.forward_dist(state_raw.astype(jnp.float32)), seq_feat


class PlanRecognitionBiLSTM(nn.Module):
    """BiLSTM posterior (reference: plan_recognition_net.py:12-41)."""

    dist: PlanDistribution
    hidden_size: int = 2048
    num_layers: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, perceptual_emb: jnp.ndarray, deterministic: bool = True):
        x, _ = LSTM(self.hidden_size, self.num_layers, bidirectional=True, name="bilstm")(
            perceptual_emb
        )
        seq_feat = x[:, -1]
        state_raw = Dense(self.dist.state_dim, dtype=self.dtype, name="fc_state")(seq_feat)
        return self.dist.forward_dist(state_raw.astype(jnp.float32)), seq_feat


class PlanRecognitionBiRNN(nn.Module):
    """Bidirectional ReLU-RNN posterior (reference: plan_recognition_net.py:44-74)."""

    dist: PlanDistribution
    hidden_size: int = 2048
    num_layers: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, perceptual_emb: jnp.ndarray, deterministic: bool = True):
        from hulc2_tpu.models.layers import ReluRNN

        x = perceptual_emb
        for layer in range(self.num_layers):
            fwd, _ = ReluRNN(self.hidden_size, 1, name=f"fwd{layer}")(x)
            bwd, _ = ReluRNN(self.hidden_size, 1, name=f"bwd{layer}")(x[:, ::-1])
            x = jnp.concatenate([fwd, bwd[:, ::-1]], axis=-1)
        seq_feat = x[:, -1]
        state_raw = Dense(self.dist.state_dim, dtype=self.dtype, name="fc_state")(seq_feat)
        return self.dist.forward_dist(state_raw.astype(jnp.float32)), seq_feat
