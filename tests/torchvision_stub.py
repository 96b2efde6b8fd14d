"""Structural stand-in for ``torchvision.models`` (torchvision is absent in
this image) so the reference's ``lib/model/detector.py`` can be EXECUTED as a
test oracle (see tests/test_reference_full_model.py).

This reimplements the torchvision-0.2-era public ResNet exactly as the
reference code depends on it (reference detector.py:164-180, 289-311):

  - module tree ``conv1, bn1, relu, maxpool, layer1..layer4, avgpool, fc``
    (the reference slices it by attribute name into conv body / conv head);
  - ``Bottleneck`` with ``conv1`` 1x1 stride-1, ``conv2`` 3x3 carrying the
    stride, ``conv3`` 1x1, BN after each, and ``downsample = Sequential(1x1
    conv, BN)`` — the reference then swaps the stride onto ``conv1`` for
    caffe2 compatibility (detector.py:169-175), so the stride placement here
    must match stock torchvision for that swap to land correctly;
  - BN as a frozen eval-mode BatchNorm: ``weight``/``bias`` parameters plus
    ``running_mean``/``running_var`` buffers (eps=1e-5, the torchvision
    default), registered in that order so ``state_dict()`` key order matches
    torchvision-0.2 — the reference derives caffe2 FPN blob names from the
    LAST state-dict key of each layer (detector.py:355-360) and skips only
    keys containing ``'running'`` when loading (detector.py:300-302), so
    torch-2.x's extra ``num_batches_tracked`` key must not exist.

Only the pieces the reference touches are implemented; this is a test
fixture, never imported by the framework.
"""

import torch
import torch.nn as nn


class FrozenBatchNorm2d(nn.Module):
    """Eval-mode BatchNorm2d without num_batches_tracked (torchvision-0.2
    state_dict layout). With the running stats left at init (mean 0, var 1 —
    the reference's loader skips them), this computes
    ``x * weight / sqrt(1 + eps) + bias`` exactly like a 0.4-era
    ``nn.BatchNorm2d`` in eval mode."""

    def __init__(self, num_features, eps=1e-5):
        super().__init__()
        self.num_features = num_features  # fpn_body reads bn3.num_features
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(num_features))
        self.bias = nn.Parameter(torch.zeros(num_features))
        self.register_buffer("running_mean", torch.zeros(num_features))
        self.register_buffer("running_var", torch.ones(num_features))

    def forward(self, x):
        scale = self.weight / torch.sqrt(self.running_var + self.eps)
        shift = self.bias - self.running_mean * scale
        return x * scale.view(1, -1, 1, 1) + shift.view(1, -1, 1, 1)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, kernel_size=1, bias=False)
        self.bn1 = FrozenBatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, kernel_size=3, stride=stride,
                               padding=1, bias=False)
        self.bn2 = FrozenBatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, kernel_size=1, bias=False)
        self.bn3 = FrozenBatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        residual = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.relu(out + residual)


class ResNet(nn.Module):
    def __init__(self, layers):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, kernel_size=7, stride=2, padding=3,
                               bias=False)
        self.bn1 = FrozenBatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2)
        self.layer4 = self._make_layer(512, layers[3], stride=2)
        self.avgpool = nn.AvgPool2d(7)
        self.fc = nn.Linear(512 * Bottleneck.expansion, 1000)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * Bottleneck.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * Bottleneck.expansion,
                          kernel_size=1, stride=stride, bias=False),
                FrozenBatchNorm2d(planes * Bottleneck.expansion),
            )
        mods = [Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * Bottleneck.expansion
        for _ in range(1, blocks):
            mods.append(Bottleneck(self.inplanes, planes))
        return nn.Sequential(*mods)

    def forward(self, x):  # unused by the reference detector, kept faithful
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x)
        return self.fc(x.view(x.size(0), -1))


def resnet50():
    return ResNet([3, 4, 6, 3])


def resnet101():
    return ResNet([3, 4, 23, 3])
