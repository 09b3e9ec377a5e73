"""Checkpoint-converter parity: torch modules -> converted flax -> same output."""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from occformer_tpu.engine.checkpoint import convert_resnet, t2f_conv, t2f_linear
from occformer_tpu.engine.convert_weights import (
    TreeBuilder,
    convert_mmcv_mha,
    match_to_tree,
    _reverse_offset_triples,
)


class TorchBasicBlock(nn.Module):
    """torchvision-style basic block (naming compatible with the converter)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU()
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(y + idt)


class TorchResNet18(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        chans = [64, 128, 256, 512]
        for i, c in enumerate(chans):
            cin = 64 if i == 0 else chans[i - 1]
            stride = 1 if i == 0 else 2
            setattr(self, f"layer{i + 1}", nn.Sequential(
                TorchBasicBlock(cin, c, stride), TorchBasicBlock(c, c, 1)))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
            outs.append(x)
        return outs


@pytest.mark.quick
def test_resnet18_conversion_numeric_parity(rng):
    torch.manual_seed(0)
    tm = TorchResNet18().eval()
    # randomize BN stats so the test exercises running-stat conversion
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    params, stats = convert_resnet(sd)

    from occformer_tpu.models.resnet import ResNet

    jm = ResNet(depth=18, train=False)
    x = rng.randn(1, 64, 96, 3).astype(np.float32)
    init_vars = jm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    matched_p, msgs_p = match_to_tree(params, init_vars["params"])
    matched_s, msgs_s = match_to_tree(stats, init_vars["batch_stats"])
    assert not msgs_p, msgs_p
    assert not msgs_s, msgs_s

    outs_j = jm.apply({"params": matched_p, "batch_stats": matched_s}, jnp.asarray(x))
    with torch.no_grad():
        outs_t = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    for oj, ot in zip(outs_j, outs_t):
        ref = np.moveaxis(ot.numpy(), 1, -1)
        np.testing.assert_allclose(np.asarray(oj), ref, rtol=1e-4, atol=1e-4)


def test_mha_inproj_split_parity(rng):
    """Packed torch MultiheadAttention == our split q/k/v module."""
    torch.manual_seed(1)
    C, H, Q, K = 32, 4, 6, 9
    tm = nn.MultiheadAttention(C, H, batch_first=True)
    tm.eval()
    sd = {"x.attn." + k: v.detach().numpy() for k, v in tm.state_dict().items()}

    tb = TreeBuilder()
    convert_mmcv_mha(tb, sd, "x", "mha")

    from occformer_tpu.models.layers import MultiheadAttention

    jm = MultiheadAttention(C, H)
    q = rng.randn(2, Q, C).astype(np.float32)
    k = rng.randn(2, K, C).astype(np.float32)
    init_p = jm.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(k),
                     jnp.asarray(k))["params"]
    matched, msgs = match_to_tree(tb.params["mha"], init_p)
    assert not msgs, msgs
    out_j = jm.apply({"params": matched}, jnp.asarray(q), jnp.asarray(k), jnp.asarray(k))
    with torch.no_grad():
        out_t, _ = tm(torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(k))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), rtol=1e-4, atol=1e-5)


def test_reverse_offset_triples():
    w = np.arange(12).reshape(12, 1)  # 4 triples of (z, y, x)
    r = _reverse_offset_triples(w, axis=0).reshape(-1)
    np.testing.assert_array_equal(r[:6], [2, 1, 0, 5, 4, 3])


class TorchCaffeBottleneck(nn.Module):
    """mmdet caffe-style bottleneck: the stride sits on the FIRST 1x1 conv
    (mmdet.models.backbones.resnet.Bottleneck, style='caffe'), as in the
    FCOS3D-pretrained R101-DCN checkpoint (occformer_nusc_r101_896x1600.py)."""

    def __init__(self, cin, planes, stride=2):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, stride, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = nn.Sequential(
            nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
            nn.BatchNorm2d(planes * 4))
        self.relu = nn.ReLU()

    def forward(self, x):
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + self.downsample(x))


def test_caffe_bottleneck_stride_placement_parity(rng):
    torch.manual_seed(2)
    cin, planes = 16, 8
    tm = TorchCaffeBottleneck(cin, planes, stride=2).eval()
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.5, 1.5)
    sd = {"layer1.0." + k: v.detach().numpy() for k, v in tm.state_dict().items()}
    # stem keys so convert_resnet is happy (not compared)
    sd["conv1.weight"] = np.zeros((8, 3, 7, 7), np.float32)
    for k, v in (("weight", np.ones(8)), ("bias", np.zeros(8)),
                 ("running_mean", np.zeros(8)), ("running_var", np.ones(8))):
        sd[f"bn1.{k}"] = v.astype(np.float32)
    params, stats = convert_resnet(sd)

    from occformer_tpu.models.resnet import Bottleneck

    x = rng.randn(2, 10, 12, cin).astype(np.float32)
    for style, should_match in (("caffe", True), ("pytorch", False)):
        jm = Bottleneck(planes=planes, stride=2, has_downsample=True,
                        style=style, train=False)
        out = jm.apply({"params": params["layer1_0"],
                        "batch_stats": stats["layer1_0"]}, jnp.asarray(x))
        with torch.no_grad():
            ref = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
        ref = np.moveaxis(ref.numpy(), 1, -1)
        assert out.shape == ref.shape
        close = np.allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
        assert close == should_match, (
            f"style={style}: expected match={should_match}")
