"""Parity test: flax ResNet vs a torch-primitive ResNet18 with torchvision
naming (torchvision itself is not installed in this image)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from hulc2_tpu.models.resnet import ResNet, convert_torchvision_resnet  # noqa: E402


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idt)


class TorchResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(TorchBasicBlock(64, 64), TorchBasicBlock(64, 64))
        self.layer2 = tnn.Sequential(TorchBasicBlock(64, 128, 2), TorchBasicBlock(128, 128))
        self.layer3 = tnn.Sequential(TorchBasicBlock(128, 256, 2), TorchBasicBlock(256, 256))
        self.layer4 = tnn.Sequential(TorchBasicBlock(256, 512, 2), TorchBasicBlock(512, 512))

    def forward(self, x):
        stem = torch.relu(self.bn1(self.conv1(x)))
        y = self.maxpool(stem)
        l1 = self.layer1(y)
        l2 = self.layer2(l1)
        l3 = self.layer3(l2)
        l4 = self.layer4(l3)
        return stem, l1, l2, l3, l4


def test_resnet18_matches_torch():
    torch.manual_seed(0)
    ref = TorchResNet18().eval()
    # randomize running stats so BN conversion is actually exercised
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    # remap downsample naming to torchvision's ("downsample.0" / "downsample.1")
    sd = {}
    for k, v in ref.state_dict().items():
        sd[k] = v
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        stem, l1, l2, l3, l4 = ref(x)

    variables = convert_torchvision_resnet(sd, "resnet18")
    model = ResNet("resnet18")
    feats = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    assert model.out_channels == (3, 64, 64, 128, 256, 512)
    for name, t, f in [("stem", stem, feats[1]), ("l1", l1, feats[2]), ("l2", l2, feats[3]),
                       ("l3", l3, feats[4]), ("l4", l4, feats[5])]:
        np.testing.assert_allclose(
            np.asarray(f).transpose(0, 3, 1, 2), t.numpy(), atol=5e-4, err_msg=name
        )
