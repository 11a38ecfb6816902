"""Parity tests: our flax blocks + weight converter vs PyTorch primitives.

These validate the exact semantics needed to load reference checkpoints with
< 1e-3 action MAE: RNN gate math, transformer layer numerics, conv layouts.
We compare against torch *library* modules (nn.RNN, nn.GRU, nn.LSTM,
nn.TransformerEncoderLayer, nn.Conv2d) — the same primitives the reference
composes.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hulc2_tpu.models import layers  # noqa: E402
from hulc2_tpu.utils import convert  # noqa: E402

ATOL = 2e-5


def _np(x):
    return x.detach().numpy()


class TestRNNParity:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_relu_rnn_matches_torch(self, seed):
        torch.manual_seed(seed)
        b, s, f, h, L = 3, 7, 12, 16, 2
        ref = tnn.RNN(f, h, L, nonlinearity="relu", batch_first=True)
        x = torch.randn(b, s, f)
        h0 = torch.randn(L, b, h)
        with torch.no_grad():
            y_ref, hn_ref = ref(x, h0)

        mod = layers.ReluRNN(h, L)
        sd = {f"rnn.{k}": v for k, v in ref.state_dict().items()}
        params = {"params": convert.rnn(sd, "rnn", L)}
        y, hn = mod.apply(params, jnp.asarray(_np(x)), jnp.asarray(_np(h0)))
        np.testing.assert_allclose(np.asarray(y), _np(y_ref), atol=ATOL)
        np.testing.assert_allclose(np.asarray(hn), _np(hn_ref), atol=ATOL)

    def test_gru_matches_torch(self):
        torch.manual_seed(2)
        b, s, f, h, L = 2, 5, 8, 12, 2
        ref = tnn.GRU(f, h, L, batch_first=True)
        x = torch.randn(b, s, f)
        with torch.no_grad():
            y_ref, hn_ref = ref(x)
        sd = {f"rnn.{k}": v for k, v in ref.state_dict().items()}
        params = {"params": convert.rnn(sd, "rnn", L)}
        y, hn = layers.GRU(h, L).apply(params, jnp.asarray(_np(x)))
        np.testing.assert_allclose(np.asarray(y), _np(y_ref), atol=ATOL)
        np.testing.assert_allclose(np.asarray(hn), _np(hn_ref), atol=ATOL)

    def test_lstm_matches_torch(self):
        torch.manual_seed(3)
        b, s, f, h, L = 2, 5, 8, 12, 2
        ref = tnn.LSTM(f, h, L, batch_first=True)
        x = torch.randn(b, s, f)
        with torch.no_grad():
            y_ref, (hn_ref, cn_ref) = ref(x)
        sd = {f"rnn.{k}": v for k, v in ref.state_dict().items()}
        params = {"params": convert.rnn(sd, "rnn", L)}
        y, (hn, cn) = layers.LSTM(h, L).apply(params, jnp.asarray(_np(x)))
        np.testing.assert_allclose(np.asarray(y), _np(y_ref), atol=ATOL)
        np.testing.assert_allclose(np.asarray(hn), _np(hn_ref), atol=ATOL)
        np.testing.assert_allclose(np.asarray(cn), _np(cn_ref), atol=ATOL)

    def test_bilstm_matches_torch(self):
        torch.manual_seed(4)
        b, s, f, h, L = 2, 6, 8, 10, 2
        ref = tnn.LSTM(f, h, L, batch_first=True, bidirectional=True)
        x = torch.randn(b, s, f)
        with torch.no_grad():
            y_ref, _ = ref(x)
        sd = {f"rnn.{k}": v for k, v in ref.state_dict().items()}
        params = {"params": convert.rnn(sd, "rnn", L, bidirectional=True)}
        y, _ = layers.LSTM(h, L, bidirectional=True).apply(params, jnp.asarray(_np(x)))
        np.testing.assert_allclose(np.asarray(y), _np(y_ref), atol=ATOL)


class TestTransformerParity:
    def test_encoder_layer_matches_torch(self):
        torch.manual_seed(5)
        e, heads, ff = 16, 4, 32
        ref = tnn.TransformerEncoderLayer(e, heads, dim_feedforward=ff, dropout=0.0)
        ref.eval()
        b, s = 3, 9
        x = torch.randn(s, b, e)  # torch default: (S, B, E)
        with torch.no_grad():
            y_ref = ref(x)
        sd = {f"layer.{k}": v for k, v in ref.state_dict().items()}
        params = {"params": convert.transformer_encoder_layer(sd, "layer")}
        y = layers.TransformerEncoderLayer(heads, ff, 0.0).apply(
            params, jnp.asarray(_np(x.permute(1, 0, 2)))
        )
        np.testing.assert_allclose(
            np.asarray(y), _np(y_ref.permute(1, 0, 2)), atol=5e-5
        )


class TestConvParity:
    def test_conv_valid_matches_torch(self):
        torch.manual_seed(6)
        ref = tnn.Conv2d(3, 8, 5, stride=2)
        x = torch.randn(2, 3, 21, 21)
        with torch.no_grad():
            y_ref = ref(x)
        sd = {f"c.{k}": v for k, v in ref.state_dict().items()}
        from hulc2_tpu.models.layers import Conv

        params = {"params": convert.conv2d(sd, "c")}
        y = Conv(8, (5, 5), (2, 2)).apply(params, jnp.asarray(_np(x.permute(0, 2, 3, 1))))
        np.testing.assert_allclose(
            np.asarray(y).transpose(0, 3, 1, 2), _np(y_ref), atol=ATOL
        )


class TestVisionNetworkParity:
    def test_full_static_encoder_matches_torch_composition(self):
        """Compose the reference static encoder out of torch primitives with
        reference-matching names, convert, compare."""
        torch.manual_seed(7)

        class TorchStatic(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv_model = tnn.Sequential(
                    tnn.Conv2d(3, 32, 8, stride=4), tnn.ReLU(),
                    tnn.Conv2d(32, 64, 4, stride=2), tnn.ReLU(),
                    tnn.Conv2d(64, 64, 3, stride=1), tnn.ReLU(),
                )
                self.fc1 = tnn.Sequential(tnn.Linear(128, 512), tnn.ReLU(), tnn.Dropout(0.0))
                self.fc2 = tnn.Linear(512, 64)
                self.ln = tnn.LayerNorm(64)

            def forward(self, x):
                import torch.nn.functional as F

                x = self.conv_model(x)
                n, c, h, w = x.shape
                flat = x.contiguous().view(-1, h * w)
                attn = F.softmax(flat / 1.0, dim=1)
                gx, gy = torch.meshgrid(
                    torch.linspace(-1.0, 1.0, h), torch.linspace(-1.0, 1.0, w), indexing="ij"
                )
                ex = torch.sum(gx.reshape(-1) * attn, dim=1, keepdim=True)
                ey = torch.sum(gy.reshape(-1) * attn, dim=1, keepdim=True)
                x = torch.cat((ex, ey), 1).view(-1, c * 2)
                return self.ln(self.fc2(self.fc1(x)))

        ref = TorchStatic().eval()
        x = torch.randn(2, 3, 84, 84) * 0.5
        with torch.no_grad():
            y_ref = ref(x)

        from hulc2_tpu.models.vision import VisionNetwork

        sd = {f"enc.{k}": v for k, v in ref.state_dict().items()}
        params = {"params": convert.vision_network(sd, "enc")}
        mod = VisionNetwork(visual_features=64, spatial_softmax_temp=1.0)
        y = mod.apply(params, jnp.asarray(_np(x.permute(0, 2, 3, 1))))
        np.testing.assert_allclose(np.asarray(y), _np(y_ref), atol=5e-5)
