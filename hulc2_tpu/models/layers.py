"""Flax building blocks with PyTorch-matching semantics.

The reference trains with torch defaults (Linear/Conv kaiming-uniform init,
LayerNorm eps 1e-5, post-norm TransformerEncoderLayer, ReLU nn.RNN). For both
(a) loading converted PyTorch checkpoints with < 1e-3 action MAE and
(b) reproducing training dynamics from scratch, these blocks replicate those
semantics exactly while staying XLA-idiomatic (big fused matmuls, lax.scan
recurrences with the input projection hoisted out of the scan).
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def torch_linear_init(scale: float = 1.0 / 3.0):
    """torch nn.Linear / nn.Conv2d weight init: kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    return nn.initializers.variance_scaling(scale, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Dense(nn.Module):
    """nn.Dense with torch Linear initialization."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_linear_init(),
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            name="linear",
        )(x)


class Conv(nn.Module):
    """VALID-padded NHWC conv with torch Conv2d initialization."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str = "VALID"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * self.kernel_size[0] * self.kernel_size[1]
        return nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            kernel_init=torch_linear_init(),
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)


class LayerNorm(nn.Module):
    """LayerNorm with torch eps (1e-5), computed in fp32."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")(x)


def get_activation(name: str) -> Callable:
    return {
        "ReLU": jax.nn.relu,
        "ELU": jax.nn.elu,
        "GELU": jax.nn.gelu,
        "Tanh": jnp.tanh,
        "SiLU": jax.nn.silu,
    }[name]


class MLP(nn.Module):
    """Stack of Dense layers with activation between (not after) them."""

    hidden: Sequence[int]
    activation: str = "ReLU"
    activate_final: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        for i, h in enumerate(self.hidden):
            x = Dense(h, dtype=self.dtype, name=f"fc{i}")(x)
            if i < len(self.hidden) - 1 or self.activate_final:
                x = act(x)
        return x


class MultiHeadAttention(nn.Module):
    """Self-attention matching torch nn.MultiheadAttention numerics:
    packed qkv projection, scale 1/sqrt(head_dim), output projection."""

    num_heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        b, s, e = x.shape
        h = self.num_heads
        hd = e // h
        assert hd * h == e
        qkv = nn.Dense(
            3 * e,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="in_proj",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, e)
        return nn.Dense(
            e,
            kernel_init=torch_linear_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="out_proj",
        )(out)


class TransformerEncoderLayer(nn.Module):
    """Post-norm (torch default norm_first=False) encoder layer, ReLU FF."""

    num_heads: int
    ff_size: int
    dropout_p: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        e = x.shape[-1]
        a = MultiHeadAttention(self.num_heads, dtype=self.dtype, name="self_attn")(x, deterministic)
        a = nn.Dropout(self.dropout_p)(a, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x + a)
        f = Dense(self.ff_size, dtype=self.dtype, name="ff1")(x)
        f = jax.nn.relu(f)
        f = nn.Dropout(self.dropout_p)(f, deterministic=deterministic)
        f = Dense(e, dtype=self.dtype, name="ff2")(f)
        f = nn.Dropout(self.dropout_p)(f, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x + f)


def _rnn_param_init(hidden_size: int):
    bound = 1.0 / math.sqrt(hidden_size)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class StackedRNNBase(nn.Module):
    """Shared machinery for stacked torch-style RNN/GRU/LSTM over (B, S, F).

    TPU-first structure: the input-to-hidden projection for *all* timesteps of
    a layer is one large (B*S, F) x (F, G*H) matmul on the MXU; only the
    hidden-to-hidden recurrence runs inside ``lax.scan``.
    """

    hidden_size: int
    num_layers: int
    gates: int  # 1 (rnn), 3 (gru), 4 (lstm)

    def _layer_params(self, layer: int, in_features: int):
        g, hsz = self.gates, self.hidden_size
        init = _rnn_param_init(hsz)
        w_ih = self.param(f"w_ih_l{layer}", init, (in_features, g * hsz))
        w_hh = self.param(f"w_hh_l{layer}", init, (hsz, g * hsz))
        b_ih = self.param(f"b_ih_l{layer}", init, (g * hsz,))
        b_hh = self.param(f"b_hh_l{layer}", init, (g * hsz,))
        return w_ih, w_hh, b_ih, b_hh

    @staticmethod
    def _scan(cell, x_proj, carry0):
        def step(carry, x_t):
            carry = cell(carry, x_t)
            out = carry[0] if isinstance(carry, tuple) else carry
            return carry, out

        carry, ys = jax.lax.scan(step, carry0, jnp.swapaxes(x_proj, 0, 1))
        return carry, jnp.swapaxes(ys, 0, 1)


class ReluRNN(StackedRNNBase):
    """torch nn.RNN(nonlinearity='relu', batch_first=True) equivalent
    (the default `rnn_decoder`, reference: models/decoders/utils/rnn.py:5)."""

    hidden_size: int = 2048
    num_layers: int = 2
    gates: int = 1

    @nn.compact
    def __call__(self, x, h0=None):
        b = x.shape[0]
        hs = []
        for layer in range(self.num_layers):
            w_ih, w_hh, b_ih, b_hh = self._layer_params(layer, x.shape[-1])
            x_proj = x @ w_ih + b_ih  # (B, S, H) in one matmul
            h_init = jnp.zeros((b, self.hidden_size), x.dtype) if h0 is None else h0[layer]

            def cell(h, x_t, w_hh=w_hh, b_hh=b_hh):
                return jax.nn.relu(x_t + h @ w_hh + b_hh)

            h_last, x = self._scan(cell, x_proj, h_init)
            hs.append(h_last)
        return x, jnp.stack(hs)


class GRU(StackedRNNBase):
    """torch nn.GRU equivalent: gates ordered (r, z, n); note torch's
    n-gate applies r *after* adding b_hh: n = tanh(x_n + b_ihn + r*(h W_hn + b_hhn))."""

    hidden_size: int = 2048
    num_layers: int = 2
    gates: int = 3

    @nn.compact
    def __call__(self, x, h0=None):
        b = x.shape[0]
        hsz = self.hidden_size
        hs = []
        for layer in range(self.num_layers):
            w_ih, w_hh, b_ih, b_hh = self._layer_params(layer, x.shape[-1])
            x_proj = x @ w_ih + b_ih
            h_init = jnp.zeros((b, hsz), x.dtype) if h0 is None else h0[layer]

            def cell(h, x_t, w_hh=w_hh, b_hh=b_hh):
                hp = h @ w_hh + b_hh
                xr, xz, xn = jnp.split(x_t, 3, axis=-1)
                hr, hz, hn = jnp.split(hp, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)
                return (1 - z) * n + z * h

            h_last, x = self._scan(cell, x_proj, h_init)
            hs.append(h_last)
        return x, jnp.stack(hs)


class LSTM(StackedRNNBase):
    """torch nn.LSTM equivalent: gates ordered (i, f, g, o)."""

    hidden_size: int = 2048
    num_layers: int = 2
    gates: int = 4
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x, state0=None):
        b = x.shape[0]
        hsz = self.hidden_size
        directions = 2 if self.bidirectional else 1
        h_lasts = []
        for layer in range(self.num_layers):
            outs = []
            layer_in = x
            for d in range(directions):
                suffix = "_reverse" if d == 1 else ""
                w_ih, w_hh, b_ih, b_hh = self._layer_params(f"{layer}{suffix}", layer_in.shape[-1])
                seq = layer_in[:, ::-1] if d == 1 else layer_in
                x_proj = seq @ w_ih + b_ih
                if state0 is None:
                    carry0 = (jnp.zeros((b, hsz), x.dtype), jnp.zeros((b, hsz), x.dtype))
                else:
                    carry0 = (state0[0][layer * directions + d], state0[1][layer * directions + d])

                def cell(carry, x_t, w_hh=w_hh, b_hh=b_hh):
                    h, c = carry
                    gates = x_t + h @ w_hh + b_hh
                    i, f, g, o = jnp.split(gates, 4, axis=-1)
                    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                    h = jax.nn.sigmoid(o) * jnp.tanh(c)
                    return (h, c)

                carry, ys = self._scan(cell, x_proj, carry0)
                outs.append(ys[:, ::-1] if d == 1 else ys)
                h_lasts.append(carry)
            x = jnp.concatenate(outs, axis=-1) if directions == 2 else outs[0]
        h = jnp.stack([hc[0] for hc in h_lasts])
        c = jnp.stack([hc[1] for hc in h_lasts])
        return x, (h, c)
