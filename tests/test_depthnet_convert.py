"""DepthNet checkpoint-conversion numeric parity.

Torch replica of the reference camera-aware DepthNet
(ViewTransformerLSSBEVDepth.py:410-504: Mlp / SELayer / BasicBlock x3 /
no-residual ASPP / DCN / 1x1) with checkpoint-exact naming; its state_dict is
converted by ``convert_depthnet`` and our flax DepthNet must reproduce the
torch forward.  The DCN is evaluated through the same numpy oracle validated
in tests/test_dcn_convert.py.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from occformer_tpu.engine.convert_weights import (
    TreeBuilder,
    convert_depthnet,
    match_to_tree,
)
from occformer_tpu.models.depthnet import DepthNet
from tests.test_dcn_convert import _mmcv_deform_conv_np

MID, CTX, D, CAM = 16, 8, 12, 27


class Mlp(tnn.Module):
    def __init__(self, cin, hidden, cout):
        super().__init__()
        self.fc1 = tnn.Linear(cin, hidden)
        self.fc2 = tnn.Linear(hidden, cout)

    def forward(self, x):
        return self.fc2(F.relu(self.fc1(x)))


class SELayer(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv_reduce = tnn.Conv2d(c, c, 1, bias=True)
        self.conv_expand = tnn.Conv2d(c, c, 1, bias=True)

    def forward(self, x, x_se):
        g = self.conv_expand(F.relu(self.conv_reduce(x_se)))
        return x * torch.sigmoid(g)


class BasicBlock(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = tnn.Conv2d(c, c, 3, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(c)
        self.conv2 = tnn.Conv2d(c, c, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(c)

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(x + y)


class _ASPPModule(tnn.Module):
    def __init__(self, cin, cout, k, padding, dilation):
        super().__init__()
        self.atrous_conv = tnn.Conv2d(cin, cout, k, padding=padding,
                                      dilation=dilation, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.atrous_conv(x)))


class ASPP(tnn.Module):
    """DepthNet variant: no residual (ViewTransformerLSSBEVDepth.py:337-409)."""

    def __init__(self, c, mid):
        super().__init__()
        self.aspp1 = _ASPPModule(c, mid, 1, 0, 1)
        self.aspp2 = _ASPPModule(c, mid, 3, 6, 6)
        self.aspp3 = _ASPPModule(c, mid, 3, 12, 12)
        self.aspp4 = _ASPPModule(c, mid, 3, 18, 18)
        self.global_avg_pool = tnn.Sequential(
            tnn.AdaptiveAvgPool2d((1, 1)),
            tnn.Conv2d(c, mid, 1, bias=False),
            tnn.BatchNorm2d(mid), tnn.ReLU())
        self.conv1 = tnn.Conv2d(mid * 5, mid, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid)

    def forward(self, x):
        xs = [m(x) for m in (self.aspp1, self.aspp2, self.aspp3, self.aspp4)]
        g = self.global_avg_pool(x)
        g = F.interpolate(g, size=xs[0].shape[2:], mode="bilinear",
                          align_corners=True)
        y = torch.cat(xs + [g], dim=1)
        return F.relu(self.bn1(self.conv1(y)))


class NpDCN(tnn.Module):
    """mmcv DeformConv2dPack via the validated numpy oracle (eval only)."""

    def __init__(self, c, groups):
        super().__init__()
        self.weight = tnn.Parameter(torch.randn(c, c // groups, 3, 3) * 0.1)
        self.conv_offset = tnn.Conv2d(c, 2 * 9, 3, padding=1, bias=True)
        self.groups = groups

    def forward(self, x):
        out = _mmcv_deform_conv_np(
            x.numpy().astype(np.float64), self.weight.detach().numpy(), None,
            self.conv_offset.weight.detach().numpy().astype(np.float64),
            self.conv_offset.bias.detach().numpy().astype(np.float64),
            modulated=False, conv_groups=self.groups)
        return torch.from_numpy(out.astype(np.float32))


class TorchDepthNet(tnn.Module):
    def __init__(self, mid=MID, ctx=CTX, d=D, cam=CAM):
        super().__init__()
        self.reduce_conv = tnn.Sequential(
            tnn.Conv2d(mid, mid, 3, padding=1), tnn.BatchNorm2d(mid), tnn.ReLU())
        self.bn = tnn.BatchNorm1d(cam)
        self.depth_mlp = Mlp(cam, mid, mid)
        self.depth_se = SELayer(mid)
        self.context_mlp = Mlp(cam, mid, mid)
        self.context_se = SELayer(mid)
        self.context_conv = tnn.Conv2d(mid, ctx, 1)
        self.depth_conv = tnn.Sequential(
            BasicBlock(mid), BasicBlock(mid), BasicBlock(mid),
            ASPP(mid, mid), NpDCN(mid, groups=4), tnn.Conv2d(mid, d, 1))

    def forward(self, x, mlp_input):
        mlp_input = self.bn(mlp_input)
        x = self.reduce_conv(x)
        ctx = self.context_conv(self.context_se(x, self.context_mlp(mlp_input)[..., None, None]))
        dep = self.depth_se(x, self.depth_mlp(mlp_input)[..., None, None])
        dep = self.depth_conv(dep)
        return dep, ctx


def test_depthnet_conversion_numeric_parity():
    torch.manual_seed(0)
    tm = TorchDepthNet().eval()
    for m in tm.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.5, 1.5)
    sd = {"dn." + k: v.detach().numpy() for k, v in tm.state_dict().items()}

    tb = TreeBuilder()
    convert_depthnet(tb, sd, "dn", "depth_net")

    model = DepthNet(mid_channels=MID, context_channels=CTX, depth_channels=D,
                     cam_channels=CAM, use_dcn=True)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 8, MID)).astype(np.float32)
    mlp = rng.standard_normal((2, CAM)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mlp))

    variables, missing = match_to_tree(
        {"params": tb.params["depth_net"], "batch_stats": tb.stats["depth_net"]},
        {"params": init["params"], "batch_stats": init["batch_stats"]})
    assert not missing, missing

    dep_j, ctx_j = model.apply(variables, jnp.asarray(x), jnp.asarray(mlp))
    with torch.no_grad():
        dep_t, ctx_t = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()),
                          torch.from_numpy(mlp))
    np.testing.assert_allclose(np.moveaxis(np.asarray(ctx_j), -1, 1),
                               ctx_t.numpy(), rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.moveaxis(np.asarray(dep_j), -1, 1),
                               dep_t.numpy(), rtol=3e-4, atol=3e-4)
