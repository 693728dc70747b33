"""Test-only stand-in for ``torchvision.models.densenet``.

The reference model imports ``_DenseLayer / _DenseBlock / _Transition /
model_urls`` from torchvision (reference ``Dense_U_Net_lidar.py:9``), which is
not installed in this environment. This fixture implements the public DenseNet
building blocks (Huang et al., arXiv:1608.06993) with torchvision's module
layout and parameter naming — norm1/relu1/conv1/norm2/relu2/conv2 inside
``denselayerN``, norm/relu/conv/pool inside ``transitionN`` — so the actual
reference network can be instantiated and compared numerically against the
JAX model (tests/test_reference_parity.py), and so torchvision-style key
inventories can be generated for the checkpoint-port tests.

Written from the published architecture; not copied from torchvision or the
reference repo.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class _DenseLayer(nn.Module):
    """BN -> ReLU -> 1x1 conv (bottleneck) -> BN -> ReLU -> 3x3 conv."""

    def __init__(self, num_input_features, growth_rate, bn_size, drop_rate,
                 memory_efficient=False):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(num_input_features)
        self.relu1 = nn.ReLU(inplace=True)
        self.conv1 = nn.Conv2d(num_input_features, bn_size * growth_rate,
                               kernel_size=1, stride=1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth_rate)
        self.relu2 = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(bn_size * growth_rate, growth_rate,
                               kernel_size=3, stride=1, padding=1, bias=False)
        self.drop_rate = float(drop_rate)

    def forward(self, x):
        prev = [x] if isinstance(x, torch.Tensor) else list(x)
        bottleneck = self.conv1(self.relu1(self.norm1(torch.cat(prev, 1))))
        out = self.conv2(self.relu2(self.norm2(bottleneck)))
        if self.drop_rate > 0:
            out = F.dropout(out, p=self.drop_rate, training=self.training)
        return out


class _DenseBlock(nn.ModuleDict):
    def __init__(self, num_layers, num_input_features, bn_size, growth_rate,
                 drop_rate, memory_efficient=False):
        super().__init__()
        for i in range(num_layers):
            self.add_module(
                "denselayer%d" % (i + 1),
                _DenseLayer(num_input_features + i * growth_rate, growth_rate,
                            bn_size, drop_rate, memory_efficient),
            )

    def forward(self, init_features):
        features = [init_features]
        for layer in self.values():
            features.append(layer(features))
        return torch.cat(features, 1)


class _Transition(nn.Sequential):
    def __init__(self, num_input_features, num_output_features):
        super().__init__()
        self.add_module("norm", nn.BatchNorm2d(num_input_features))
        self.add_module("relu", nn.ReLU(inplace=True))
        self.add_module("conv", nn.Conv2d(num_input_features, num_output_features,
                                          kernel_size=1, stride=1, bias=False))
        self.add_module("pool", nn.AvgPool2d(kernel_size=2, stride=2))


model_urls = {
    "densenet121": "https://download.pytorch.org/models/densenet121-a639ec97.pth",
    "densenet169": "https://download.pytorch.org/models/densenet169-b2777c0a.pth",
    "densenet201": "https://download.pytorch.org/models/densenet201-c1103571.pth",
    "densenet161": "https://download.pytorch.org/models/densenet161-8d451a50.pth",
}


def torchvision_densenet_keys(growth_rate=32, block_config=(6, 12, 24, 16),
                              num_init_features=64, legacy=False):
    """The exact key inventory of a torchvision densenet checkpoint.

    ``legacy=True`` yields the pre-0.4 dotted names (``norm.1.weight``) that
    the reference's re-key regex handles (reference model:281-282).
    """
    bn = ["weight", "bias", "running_mean", "running_var"]
    keys = ["features.conv0.weight"] + [f"features.norm0.{a}" for a in bn]
    for b, num_layers in enumerate(block_config, start=1):
        for l in range(1, num_layers + 1):
            for unit in ("1", "2"):
                norm = f"norm.{unit}" if legacy else f"norm{unit}"
                conv = f"conv.{unit}" if legacy else f"conv{unit}"
                keys += [f"features.denseblock{b}.denselayer{l}.{norm}.{a}" for a in bn]
                keys += [f"features.denseblock{b}.denselayer{l}.{conv}.weight"]
        if b != len(block_config):
            keys += [f"features.transition{b}.norm.{a}" for a in bn]
            keys += [f"features.transition{b}.conv.weight"]
    keys += [f"features.norm5.{a}" for a in bn]
    keys += ["classifier.weight", "classifier.bias"]
    return keys
