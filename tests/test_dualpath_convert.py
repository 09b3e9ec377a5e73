"""DualpathTransformerBlock checkpoint-conversion numeric parity.

Torch replica of the reference block (dualpath_block.py:13-82) with
checkpoint-exact naming — input_conv / bev_encoder (Swin) / BottleNeckASPP /
combine_coeff / downsample — converted via ``convert_dualpath_block`` and
compared against our flax block.  The Swin internals reuse the oracle already
validated in tests/test_swin_parity.py.
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
    convert_dualpath_block,
    match_to_tree,
)
from occformer_tpu.models.occnet import DualpathTransformerBlock
from tests.test_swin_parity import TorchWindowAttention, torch_swin_block

CIN, C, GN_GROUPS = 32, 32, 8


class TorchSwinBlock(tnn.Module):
    """mmcv-style naming: norm1 / attn.w_msa.* / norm2 / ffn.layers.*"""

    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.window, self.shift = window, shift
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = tnn.Module()
        self.attn.w_msa = TorchWindowAttention(dim, heads, window)
        # expose the bias table under the reference parameter name
        self.attn.w_msa.relative_position_bias_table = \
            self.attn.w_msa.bias_table
        self.norm2 = tnn.LayerNorm(dim)
        self.ffn = tnn.Module()
        self.ffn.layers = tnn.Sequential(
            tnn.Sequential(tnn.Linear(dim, dim)), tnn.Linear(dim, dim))

    def forward(self, x_nchw):
        x = x_nchw.permute(0, 2, 3, 1)  # -> NHWC for the oracle
        y = torch_swin_block(
            x, self.attn.w_msa, self.norm1, self.norm2,
            self.ffn.layers[0][0], self.ffn.layers[1],
            self.window, self.shift)
        return y.permute(0, 3, 1, 2)


class _ASPPModule(tnn.Module):
    def __init__(self, cin, cout, k, pad, dil, groups):
        super().__init__()
        self.atrous_conv = tnn.Conv2d(cin, cout, k, padding=pad, dilation=dil,
                                      bias=False)
        self.bn = tnn.GroupNorm(groups, cout)

    def forward(self, x):
        return F.relu(self.bn(self.atrous_conv(x)))


class TorchASPP(tnn.Module):
    """aspp.py:49-130 — WITH the residual."""

    def __init__(self, c, groups):
        super().__init__()
        mid = c
        self.aspp1 = _ASPPModule(c, mid, 1, 0, 1, groups)
        self.aspp2 = _ASPPModule(c, mid, 3, 6, 6, groups)
        self.aspp3 = _ASPPModule(c, mid, 3, 12, 12, groups)
        self.aspp4 = _ASPPModule(c, mid, 3, 18, 18, groups)
        self.global_avg_pool = tnn.Sequential(
            tnn.AdaptiveAvgPool2d((1, 1)), tnn.Conv2d(c, mid, 1, bias=False),
            tnn.GroupNorm(groups, mid), tnn.ReLU())
        self.conv1 = tnn.Conv2d(mid * 5, c, 1, bias=False)
        self.bn1 = tnn.GroupNorm(groups, c)

    def forward(self, x):
        xs = [m(x) for m in (self.aspp1, self.aspp2, self.aspp3, self.aspp4)]
        g = self.global_avg_pool(x)
        g = F.interpolate(g, size=xs[0].shape[2:], mode="bilinear",
                          align_corners=True)
        y = torch.cat(xs + [g], dim=1)
        return x + F.relu(self.bn1(self.conv1(y)))


class TorchBottleNeckASPP(tnn.Module):
    """aspp.py:132-171: 1x1 reduce -> ASPP -> 1x1 expand, outer residual."""

    def __init__(self, c, reduction=4, num_groups=GN_GROUPS):
        super().__init__()
        mid = c // reduction
        aspp_groups = mid // 2 if mid <= num_groups else num_groups
        self.input_conv = tnn.Sequential(
            tnn.Conv2d(c, mid, 1, bias=False), tnn.GroupNorm(num_groups, mid),
            tnn.ReLU())
        self.aspp = TorchASPP(mid, aspp_groups)
        self.output_conv = tnn.Sequential(
            tnn.Conv2d(mid, c, 1, bias=False), tnn.GroupNorm(num_groups, c),
            tnn.ReLU())

    def forward(self, x):
        return x + self.output_conv(self.aspp(self.input_conv(x)))


class TorchDualpathBlock(tnn.Module):
    def __init__(self, cin, c, stride, shift):
        super().__init__()
        heads = c // 32
        self.input_conv = tnn.Sequential(
            tnn.Conv3d(cin, c, 3, stride=stride, padding=1, bias=False),
            tnn.GroupNorm(GN_GROUPS, c), tnn.ReLU())
        self.bev_encoder = TorchSwinBlock(c, heads, 7, shift)
        self.aspp = TorchBottleNeckASPP(c)
        self.combine_coeff = tnn.Conv3d(c, 1, 1, bias=True)
        if stride > 1:
            self.downsample = tnn.Sequential(
                tnn.Conv3d(cin, c, 1, stride=stride, bias=False),
                tnn.GroupNorm(GN_GROUPS, c))
        else:
            self.downsample = tnn.Identity()

    def forward(self, x):
        identity = x.clone()
        x = self.input_conv(x)
        x_bev = x.mean(dim=-1)
        B = x_bev.shape[0]
        Z = x.shape[-1]
        x = x.permute(0, 4, 1, 2, 3).reshape(-1, *x.shape[1:4])  # (b z) c x y
        x = torch.cat((x_bev, x), dim=0)
        x = self.bev_encoder(x)
        x_bev, x = x[:B], x[B:]
        x = x.reshape(B, Z, *x.shape[1:]).permute(0, 2, 3, 4, 1)  # b c x y z
        x_bev = self.aspp(x_bev)
        coeff = torch.sigmoid(self.combine_coeff(x))
        x = x + coeff * x_bev.unsqueeze(-1)
        return x + self.downsample(identity)


@pytest.mark.parametrize("stride,shift", [(1, False), (2, True)])
def test_dualpath_block_conversion_parity(stride, shift):
    torch.manual_seed(0)
    tm = TorchDualpathBlock(CIN, C, stride, shift).eval()
    sd = {"blk." + k: v.detach().numpy() for k, v in tm.state_dict().items()}

    tb = TreeBuilder()
    convert_dualpath_block(tb, sd, "blk", "blk")

    model = DualpathTransformerBlock(
        channels=C, stride=stride, layer_index=1 if shift else 0,
        num_groups=GN_GROUPS)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 14, 14, 4, CIN)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables, missing = match_to_tree(
        {"params": tb.params["blk"], "batch_stats": tb.stats.get("blk", {})},
        {"params": init["params"], "batch_stats": init.get("batch_stats", {})})
    assert not missing, missing

    out_j = model.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        out_t = tm(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)).copy()))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out_j), (0, 4, 1, 2, 3)), out_t.numpy(),
        rtol=5e-4, atol=5e-4)
