"""Parity test: flax CLIP VisionTransformer vs a torch-primitive replica of
the public OpenAI ViT architecture (reference behavior:
hulc2/models/perceptual_encoders/clip.py:266-307), using OpenAI checkpoint
naming so ``convert_clip_vit`` is exercised end to end."""
from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hulc2_tpu.models.clip_vit import ClipVisionTransformer, convert_clip_vit  # noqa: E402


class QuickGELU(tnn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class TorchResBlock(tnn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.attn = tnn.MultiheadAttention(d, heads)
        self.ln_1 = tnn.LayerNorm(d)
        self.mlp = tnn.Sequential(OrderedDict([
            ("c_fc", tnn.Linear(d, 4 * d)),
            ("gelu", QuickGELU()),
            ("c_proj", tnn.Linear(4 * d, d)),
        ]))
        self.ln_2 = tnn.LayerNorm(d)

    def forward(self, x):  # (L, N, D)
        y = self.ln_1(x)
        x = x + self.attn(y, y, y, need_weights=False)[0]
        x = x + self.mlp(self.ln_2(x))
        return x


class TorchViT(tnn.Module):
    """Reference VisionTransformer structure with OpenAI state-dict naming."""

    def __init__(self, input_resolution, patch_size, width, layers, heads, output_dim):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, width, patch_size, patch_size, bias=False)
        scale = width**-0.5
        self.class_embedding = tnn.Parameter(scale * torch.randn(width))
        self.positional_embedding = tnn.Parameter(
            scale * torch.randn((input_resolution // patch_size) ** 2 + 1, width)
        )
        self.ln_pre = tnn.LayerNorm(width)
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.Sequential(
            *[TorchResBlock(width, heads) for _ in range(layers)]
        )
        self.ln_post = tnn.LayerNorm(width)
        self.proj = tnn.Parameter(scale * torch.randn(width, output_dim))

    def forward(self, x):
        x = self.conv1(x)  # (N, D, g, g)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)  # (N, g*g, D)
        cls = self.class_embedding + torch.zeros(x.shape[0], 1, x.shape[-1])
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        x = self.transformer.resblocks(x.permute(1, 0, 2)).permute(1, 0, 2)
        return self.ln_post(x[:, 0, :]) @ self.proj


def test_clip_vit_matches_torch():
    torch.manual_seed(0)
    res, patch, width, layers, heads, out_dim = 32, 8, 32, 2, 4, 16
    ref = TorchViT(res, patch, width, layers, heads, out_dim).eval()
    x = torch.randn(2, 3, res, res)
    with torch.no_grad():
        emb_ref = ref(x)

    sd = {f"visual.{k}": v for k, v in ref.state_dict().items()}
    params, kwargs = convert_clip_vit(sd)
    assert kwargs == {"patch_size": patch, "width": width, "layers": layers,
                      "heads": max(1, width // 64), "output_dim": out_dim,
                      "input_resolution": res}
    model = ClipVisionTransformer(patch_size=patch, width=width, layers=layers,
                                  heads=heads, output_dim=out_dim, input_resolution=res)
    emb = model.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(emb), emb_ref.numpy(), atol=2e-4)


@pytest.mark.slow
def test_vision_clip_vit_backbone_frozen():
    """VisionClip with the ViT tower: correct output width and zero gradient
    into the frozen backbone (reference vision_clip.py:19-21)."""
    from hulc2_tpu.models.pretrained_vision import VisionClip

    model = VisionClip(visual_features=8, model_name="ViT-B/32",
                       tower_kwargs={"patch_size": 8, "width": 32, "layers": 2,
                                     "heads": 4, "output_dim": 512})
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 8)

    def loss(p):
        return jnp.sum(model.apply({"params": p}, x) ** 2)

    grads = jax.grad(loss)(variables["params"])
    clip_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["clip"]))
    head_norm = sum(float(jnp.abs(g).sum())
                    for k in ("fc1", "fc2")
                    for g in jax.tree_util.tree_leaves(grads[k]))
    assert clip_norm == 0.0
    assert head_norm > 0.0
