"""EfficientNet torch-checkpoint conversion: numeric parity test.

Builds a pure-torch replica of the reference ``CustomEfficientNet``
(projects/mmdet3d_plugin/occformer/backbones/efficientnet.py:275-533) with the
exact mmcv ConvModule / mmdet SELayer key naming, converts its random
state_dict with ``convert_efficientnet`` and checks our flax forward matches
the torch forward bit-for-bit (eval mode, fp32).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from occformer_tpu.engine.convert_weights import TreeBuilder, convert_efficientnet
from occformer_tpu.models.efficientnet import (
    ARCH_SETTINGS,
    LAYER_SETTINGS,
    CustomEfficientNet,
    make_divisible,
    scale_layer_settings,
)


def _adaptive_pad(x, k, s):
    """mmcv Conv2dAdaptivePadding = TF-SAME."""
    ih, iw = x.shape[-2:]
    ph = max((-(-ih // s) - 1) * s + k - ih, 0)
    pw = max((-(-iw // s) - 1) * s + k - iw, 0)
    return F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])


class ConvModule(tnn.Module):
    def __init__(self, cin, cout, k, s=1, groups=1, norm=True, act="swish"):
        super().__init__()
        self.k, self.s = k, s
        self.conv = tnn.Conv2d(cin, cout, k, s, 0, groups=groups, bias=not norm)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3) if norm else None
        self.act = act

    def forward(self, x):
        x = self.conv(_adaptive_pad(x, self.k, self.s))
        if self.bn is not None:
            x = self.bn(x)
        if self.act == "swish":
            x = F.silu(x)
        elif self.act == "sigmoid":
            x = torch.sigmoid(x)
        return x


class SELayer(tnn.Module):
    """mmdet SELayer: conv1 (swish) -> conv2 (sigmoid), reduce = channels/ratio."""

    def __init__(self, channels, ratio):
        super().__init__()
        red = int(channels / ratio)
        self.conv1 = ConvModule(channels, red, 1, norm=False, act="swish")
        self.conv2 = ConvModule(red, channels, 1, norm=False, act="sigmoid")

    def forward(self, x):
        g = x.mean((2, 3), keepdim=True)
        return x * self.conv2(self.conv1(g))


class InvertedResidual(tnn.Module):
    def __init__(self, cin, cout, k, s, expand, se_ratio):
        super().__init__()
        mid = int(cin * expand)
        self.residual = s == 1 and cin == cout
        if mid != cin:
            self.expand_conv = ConvModule(cin, mid, 1)
        self.depthwise_conv = ConvModule(mid, mid, k, s, groups=mid)
        if se_ratio > 0:
            self.se = SELayer(mid, se_ratio * expand)
        self.linear_conv = ConvModule(mid, cout, 1, act=None)

    def forward(self, x):
        y = x
        if hasattr(self, "expand_conv"):
            y = self.expand_conv(y)
        y = self.depthwise_conv(y)
        if hasattr(self, "se"):
            y = self.se(y)
        y = self.linear_conv(y)
        return x + y if self.residual else y


class EdgeResidual(tnn.Module):
    def __init__(self, cin, cout, k, s, expand, se_ratio):
        super().__init__()
        mid = int(cin * expand)
        self.residual = s == 1 and cin == cout
        self.conv1 = ConvModule(cin, mid, k, s)
        if se_ratio > 0:
            self.se = SELayer(mid, se_ratio * expand)
        self.conv2 = ConvModule(mid, cout, 1, act=None)

    def forward(self, x):
        y = self.conv1(x)
        if hasattr(self, "se"):
            y = self.se(y)
        y = self.conv2(y)
        return x + y if self.residual else y


class TorchEfficientNet(tnn.Module):
    """Reference CustomEfficientNet skeleton with checkpoint-exact naming."""

    def __init__(self, arch, out_indices):
        super().__init__()
        self.out_indices = out_indices
        width, depth = ARCH_SETTINGS[arch]
        setting = scale_layer_settings(LAYER_SETTINGS[arch[:1]], width, depth)
        stem = setting[0][0]
        final = setting[-1][0]
        cin = make_divisible(stem[1], 8)
        self.layers = tnn.ModuleList([ConvModule(3, cin, stem[0], stem[3])])
        for layer in setting[1:-1]:
            blocks = []
            for (k, cout, se, s, e, btype) in layer:
                cls = InvertedResidual if btype == 0 else EdgeResidual
                blocks.append(cls(cin, cout, k, s, e, se))
                cin = cout
            self.layers.append(tnn.Sequential(*blocks))
        if max(out_indices) >= len(self.layers):
            self.layers.append(ConvModule(cin, final[1], final[0], final[3]))

    def forward(self, x):
        outs = []
        for i, layer in enumerate(self.layers):
            x = layer(x)
            if i in self.out_indices:
                outs.append(x)
        return outs


@pytest.mark.parametrize("arch,out_indices", [
    ("b0", (2, 3, 4, 5, 6)),
    ("es", (2, 3, 4)),
])
def test_efficientnet_conversion_numeric_parity(arch, out_indices):
    torch.manual_seed(0)
    tm = TorchEfficientNet(arch, out_indices).eval()
    # randomize BN stats so parity exercises them
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.5, 1.5)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    tb = TreeBuilder()
    convert_efficientnet(tb, sd, "", "backbone")
    variables = {"params": tb.params["backbone"],
                 "batch_stats": tb.stats["backbone"]}

    model = CustomEfficientNet(arch=arch, out_indices=tuple(out_indices))
    x = np.random.RandomState(0).randn(1, 65, 97, 3).astype(np.float32)
    init_vars = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # converted tree must cover the model tree exactly
    flat_model = jax.tree_util.tree_leaves_with_path(init_vars["params"])
    flat_conv = jax.tree_util.tree_leaves_with_path(variables["params"])
    paths_m = {jax.tree_util.keystr(p): l.shape for p, l in flat_model}
    paths_c = {jax.tree_util.keystr(p): l.shape for p, l in flat_conv}
    assert paths_m == paths_c, (
        f"missing: {sorted(set(paths_m) - set(paths_c))[:5]} "
        f"extra: {sorted(set(paths_c) - set(paths_m))[:5]}")

    outs_j = model.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        outs_t = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    assert len(outs_j) == len(outs_t)
    for oj, ot in zip(outs_j, outs_t):
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(oj), -1, 1), ot.numpy(),
            rtol=2e-4, atol=2e-4)
