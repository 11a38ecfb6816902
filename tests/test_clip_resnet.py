"""Parity test: flax CLIP ModifiedResNet vs a torch-primitive replica of the
public OpenAI architecture (stem + anti-aliased bottleneck + attention pool),
using OpenAI checkpoint naming so the converter is exercised end to end."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from hulc2_tpu.models.clip_resnet import ClipModifiedResNet, convert_clip_visual  # noqa: E402


class TorchClipBottleneck(tnn.Module):
    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * 4
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.stride = stride
        self.downsample = None
        if stride > 1 or cin != cout:
            # real CLIP checkpoint naming: avgpool is "-1" (paramless), so the
            # conv is downsample.0 and the bn downsample.1
            self.downsample = tnn.Sequential()
            self.downsample.add_module("-1", tnn.AvgPool2d(stride) if stride > 1 else tnn.Identity())
            self.downsample.add_module("0", tnn.Conv2d(cin, cout, 1, bias=False))
            self.downsample.add_module("1", tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        if self.stride > 1:
            y = F.avg_pool2d(y, self.stride)
        y = self.bn3(self.conv3(y))
        return torch.relu(y + idt)


class TorchClipVisual(tnn.Module):
    def __init__(self, layers=(2, 2), width=16, output_dim=32, heads=4):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, width // 2, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width // 2)
        self.conv2 = tnn.Conv2d(width // 2, width // 2, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width // 2)
        self.conv3 = tnn.Conv2d(width // 2, width, 3, 1, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width)
        cin = width
        for stage, n in enumerate(layers):
            w = width * (2**stage)
            blocks = []
            for b in range(n):
                stride = 2 if (b == 0 and stage > 0) else 1
                blocks.append(TorchClipBottleneck(cin, w, stride))
                cin = w * 4
            setattr(self, f"layer{stage+1}", tnn.Sequential(*blocks))
        self.heads = heads
        c = cin
        self.output_dim = output_dim
        # attention pool params with OpenAI naming
        self.attnpool = tnn.Module()
        self.attnpool.positional_embedding = tnn.Parameter(torch.randn(65, c))  # set per input below
        self.attnpool.q_proj = tnn.Linear(c, c)
        self.attnpool.k_proj = tnn.Linear(c, c)
        self.attnpool.v_proj = tnn.Linear(c, c)
        self.attnpool.c_proj = tnn.Linear(c, output_dim)

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = torch.relu(self.bn3(self.conv3(y)))
        y = F.avg_pool2d(y, 2)
        feats = [y]
        for stage in range(1, 3):
            y = getattr(self, f"layer{stage}")(y)
            feats.append(y)
        # attention pool (replicating CLIP's AttentionPool2d math)
        b, c, h, w = y.shape
        t = y.reshape(b, c, h * w).permute(0, 2, 1)  # B, HW, C
        t = torch.cat([t.mean(1, keepdim=True), t], dim=1) + self.attnpool.positional_embedding[None]
        q = self.attnpool.q_proj(t[:, :1])
        k = self.attnpool.k_proj(t)
        v = self.attnpool.v_proj(t)
        hd = c // self.heads
        q = q.reshape(b, 1, self.heads, hd).transpose(1, 2)
        k = k.reshape(b, -1, self.heads, hd).transpose(1, 2)
        v = v.reshape(b, -1, self.heads, hd).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) / np.sqrt(hd), dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, 1, c)
        return self.attnpool.c_proj(out[:, 0]), feats


def test_clip_visual_matches_torch():
    torch.manual_seed(0)
    layers, width, out_dim, heads = (2, 2), 16, 32, 4
    ref = TorchClipVisual(layers, width, out_dim, heads).eval()
    x = torch.randn(2, 3, 64, 64)
    # positional embedding sized for the final map: 64 -> stem/2, pool/2, stage2/2 => 8x8
    with torch.no_grad():
        ref.attnpool.positional_embedding.data = torch.randn(8 * 8 + 1, width * 2 * 4)
        for m in ref.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)
        emb_ref, feats_ref = ref(x)

    sd = {f"visual.{k}": v for k, v in ref.state_dict().items()}
    variables = convert_clip_visual(sd, layers)
    model = ClipModifiedResNet(layers=layers, width=width, output_dim=out_dim, heads=heads)
    emb, feats = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(emb), emb_ref.numpy(), atol=2e-4)
    for f_j, f_t in zip(feats, feats_ref):
        np.testing.assert_allclose(
            np.asarray(f_j).transpose(0, 3, 1, 2), f_t.numpy(), atol=2e-4
        )
