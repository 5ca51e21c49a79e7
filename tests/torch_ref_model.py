"""Python-3 torch re-implementation of the reference CU-Net TOPOLOGY, used
only as a numeric oracle for checkpoint-converter parity tests.

This reproduces the module/parameter NAMING and dataflow of
ref:models/cu_net.py:271-360 (the "current" scheme) so that
``model.state_dict()`` has exactly the key structure of the published
checkpoints; the code itself is an independent py3 rewrite (the reference is
py2 torch 0.4). ``to_prev_scheme`` re-keys a current-scheme state dict into
the "prev" scheme of ref:models/cu_net_prev_version.py:118-348 (fused
bottleneck with flat ``norm_weight``/``conv_weight`` parameters, ``norm.2``/
``conv.2`` child names) for converter coverage of that naming.
"""

from __future__ import annotations

import math
from collections import OrderedDict

import torch
import torch.nn as nn


def loss_anchors(layer_num: int, loss_num: int):
    """py2 round = half-away-from-zero (ref:models/cu_net.py:274-283)."""
    every = float(layer_num) / float(loss_num)
    out = []
    for i in range(loss_num):
        a = int(math.floor(every * (i + 1) + 0.5))
        if a <= layer_num:
            out.append(a)
    return out


class RefAdapter(nn.Module):
    """concat -> BN -> ReLU -> 1x1 conv (ref:models/cu_net.py:19-35)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.adapter_norm = nn.BatchNorm2d(cin)
        self.adapter_relu = nn.ReLU()
        self.adapter_conv = nn.Conv2d(cin, cout, 1, bias=False)

    def forward(self, feats):
        x = torch.cat(feats, 1)
        return self.adapter_conv(self.adapter_relu(self.adapter_norm(x)))


class RefDenseLayer(nn.Module):
    """Bottleneck 1x1 then BN->ReLU->3x3 (ref:models/cu_net.py:38-65)."""

    def __init__(self, cin, growth, neck):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(cin)
        self.relu1 = nn.ReLU()
        self.conv1 = nn.Conv2d(cin, neck * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(neck * growth)
        self.relu2 = nn.ReLU()
        self.conv2 = nn.Conv2d(neck * growth, growth, 3, padding=1, bias=False)

    def forward(self, feats):
        b = self.conv1(self.relu1(self.norm1(torch.cat(feats, 1))))
        return self.conv2(self.relu2(self.norm2(b)))


class RefDenseBlock(nn.Module):
    """Order-K dense block: one slot per U-Net index, FIFO of <= max_link
    previous outputs (ref:models/cu_net.py:67-144)."""

    def __init__(self, in_num, growth, neck, layer_num, max_link,
                 requires_skip, is_up=False):
        super().__init__()
        self.max_link = max_link
        self.requires_skip = requires_skip
        self.layers = nn.ModuleList(
            [RefDenseLayer(in_num + min(i, max_link) * growth, growth, neck)
             for i in range(layer_num)]
        )
        out_num = in_num // 2 if is_up else in_num
        ad_in = [in_num + (min(i, max_link) + 1) * growth for i in range(layer_num)]
        self.adapters_ahead = nn.ModuleList([RefAdapter(c, out_num) for c in ad_in])
        if requires_skip:
            self.adapters_skip = nn.ModuleList([RefAdapter(c, out_num) for c in ad_in])
        self.saved = []

    def forward(self, x, i):
        if i == 0:
            self.saved = []
        feats = (list(x) if isinstance(x, list) else [x]) + self.saved
        out = self.layers[i](feats)
        if i < self.max_link:
            self.saved.append(out)
        elif self.saved:
            self.saved.pop(0)
            self.saved.append(out)
        feats = feats + [out]
        ahead = self.adapters_ahead[i](feats)
        if self.requires_skip:
            return ahead, self.adapters_skip[i](feats)
        return ahead


class RefIntermedia(nn.Module):
    """Couples successive U-Net inputs (ref:models/cu_net.py:146-190)."""

    def __init__(self, num, layer_num, max_link):
        super().__init__()
        self.max_link = max_link
        self.adapters = nn.ModuleList(
            [RefAdapter(num + (min(i, max_link - 1) + 1) * num, num)
             for i in range(layer_num - 1)]
        )
        self.saved = []

    def forward(self, x, i):
        if i == 0:
            self.saved = [x] if self.max_link != 0 else []
            return x
        feats = [x] + self.saved
        out = self.adapters[i - 1](feats)
        if i < self.max_link:
            self.saved.append(out)
        elif self.saved:
            self.saved.pop(0)
            self.saved.append(out)
        return out


class RefHead(nn.Module):
    """_Bn_Relu_Conv1x1 head (ref:models/cu_net.py:192-198)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.norm = nn.BatchNorm2d(cin)
        self.relu = nn.ReLU()
        self.conv = nn.Conv2d(cin, cout, 1, bias=False)

    def forward(self, x):
        return self.conv(self.relu(self.norm(x)))


class RefHourglass(nn.Module):
    """4-down / neck / 4-up with maxpool + nearest upsample
    (ref:models/cu_net.py:227-269; num_blocks parameterized for tests)."""

    def __init__(self, num, growth, neck, layer_num, max_link, num_blocks=4):
        super().__init__()
        self.num_blocks = num_blocks
        mk = lambda cin, skip, up=False: RefDenseBlock(
            cin, growth, neck, layer_num, max_link, requires_skip=skip, is_up=up)
        self.down_blocks = nn.ModuleList([mk(num, True) for _ in range(num_blocks)])
        self.up_blocks = nn.ModuleList([mk(num * 2, False, True) for _ in range(num_blocks)])
        self.neck_block = mk(num, False)
        self.maxpool = nn.MaxPool2d(2, 2)
        self.upsample = nn.Upsample(scale_factor=2)

    def forward(self, x, i):
        skips = [None] * self.num_blocks
        for j in range(self.num_blocks):
            x, skips[j] = self.down_blocks[j](x, i)
            x = self.maxpool(x)
        x = self.neck_block(x, i)
        for j in reversed(range(self.num_blocks)):
            x = self.upsample(x)
            x = self.up_blocks[j]([x, skips[j]], i)
        return x


class RefCUNet(nn.Module):
    """_CU_Net_Wrapper (ref:models/cu_net.py:271-360)."""

    def __init__(self, init_chan_num, neck_size, growth_rate, class_num,
                 layer_num, order, loss_num, num_blocks=4):
        super().__init__()
        self.layer_num = layer_num
        self.anchors = loss_anchors(layer_num, loss_num)
        self.features = nn.Sequential(OrderedDict([
            ("conv0", nn.Conv2d(3, init_chan_num, 7, stride=2, padding=3, bias=False)),
            ("norm0", nn.BatchNorm2d(init_chan_num)),
            ("relu0", nn.ReLU()),
            ("pool0", nn.MaxPool2d(2, 2)),
        ]))
        self.hg = RefHourglass(init_chan_num, growth_rate, neck_size,
                               layer_num, order, num_blocks)
        self.linears = nn.ModuleList(
            [RefHead(init_chan_num, class_num) for _ in range(layer_num)]
        )
        self.intermedia = RefIntermedia(init_chan_num, layer_num, order)

    def forward(self, x):
        x = self.features(x)
        out = []
        for i in range(self.layer_num):
            x = self.intermedia(x, i)
            x = self.hg(x, i)
            if (i + 1) in self.anchors:
                out.append(self.linears[i](x))
        return out


def randomize_bn_stats(model: nn.Module, seed: int = 0):
    """Give running stats non-trivial values so eval-mode parity is a real
    test (fresh init is mean=0/var=1, which hides scale/shift mix-ups)."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0.0, 0.3, generator=g)
            m.running_var.uniform_(0.5, 1.5, generator=g)


def to_prev_scheme(sd: dict) -> dict:
    """Re-key a current-scheme state dict into the prev-version naming
    (ref:models/cu_net_prev_version.py): dense-layer bottlenecks become flat
    ``bottleneck.norm_*``/``bottleneck.conv_weight`` with ``norm.2``/
    ``conv.2`` children; adapters/intermedia lose the ``adapter_`` module and
    hold flat ``norm_*``/``conv_weight`` directly."""
    out = {}
    for k, v in sd.items():
        nk = k
        if ".norm1." in k:
            nk = k.replace(".norm1.weight", ".bottleneck.norm_weight")
            nk = nk.replace(".norm1.bias", ".bottleneck.norm_bias")
            nk = nk.replace(".norm1.running_mean", ".bottleneck.norm_running_mean")
            nk = nk.replace(".norm1.running_var", ".bottleneck.norm_running_var")
        elif ".conv1.weight" in k:
            nk = k.replace(".conv1.weight", ".bottleneck.conv_weight")
        elif ".norm2." in k:
            nk = k.replace(".norm2.", ".norm.2.")
        elif ".conv2.weight" in k:
            nk = k.replace(".conv2.weight", ".conv.2.weight")
        elif ".adapter_norm." in k:
            nk = k.replace(".adapter_norm.weight", ".norm_weight")
            nk = nk.replace(".adapter_norm.bias", ".norm_bias")
            nk = nk.replace(".adapter_norm.running_mean", ".norm_running_mean")
            nk = nk.replace(".adapter_norm.running_var", ".norm_running_var")
        elif ".adapter_conv.weight" in k:
            nk = k.replace(".adapter_conv.weight", ".conv_weight")
        if "num_batches_tracked" in k:
            continue
        out[nk] = v
    return out
