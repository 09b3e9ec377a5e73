"""DCN/DCNv2 checkpoint-conversion numeric parity.

Oracle: a numpy implementation of mmcv's (modulated_)deform_conv2d semantics
(mmcv/ops kernels): conv_offset produces per-deform-group interleaved
(y_k, x_k) offset pairs (DCNv2: + a trailing mask third, sigmoid-gated),
sampling positions are p0 + p_k + offset with align-to-pixel-index bilinear
interpolation and zeros outside.  The converter must permute mmcv's
conv_offset output channels into our blocked [dy, dx, mask] layout
(engine/convert_weights._dcn_offset_perm) — this test fails if it doesn't.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from occformer_tpu.engine.convert_weights import TreeBuilder, convert_dcn
from occformer_tpu.models.dcn import DeformConv2d


def _conv2d_np(x, w, b, stride=1, pad=1):
    """Plain conv oracle, NCHW."""
    B, C, H, W = x.shape
    O, I, K, _ = w.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    oh = (H + 2 * pad - K) // stride + 1
    ow = (W + 2 * pad - K) // stride + 1
    out = np.zeros((B, O, oh, ow), np.float64)
    for i in range(oh):
        for j in range(ow):
            patch = xp[:, :, i * stride:i * stride + K, j * stride:j * stride + K]
            out[:, :, i, j] = np.einsum("bckl,ockl->bo", patch, w)
    return out + b[None, :, None, None]


def _bilinear(x, py, px):
    """Sample x [C, H, W] at float positions (py, px); zeros outside."""
    C, H, W = x.shape
    y0 = np.floor(py).astype(int)
    x0 = np.floor(px).astype(int)
    out = np.zeros((C,) + py.shape, np.float64)
    for dy, dx in [(0, 0), (0, 1), (1, 0), (1, 1)]:
        yy, xx = y0 + dy, x0 + dx
        wgt = (1 - abs(py - yy)) * (1 - abs(px - xx))
        ok = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        vals = np.where(ok, x[:, np.clip(yy, 0, H - 1), np.clip(xx, 0, W - 1)], 0.0)
        out += vals * np.where(ok, wgt, 0.0)
    return out


def _mmcv_deform_conv_np(x, weight, bias, off_w, off_b, modulated,
                         deform_groups=1, conv_groups=1, stride=1, pad=1):
    """mmcv (Modulated)DeformConv2dPack forward, numpy, NCHW."""
    B, C, H, W = x.shape
    O, Ig, K, _ = weight.shape
    offs = _conv2d_np(x, off_w, off_b, stride, pad)  # [B, (2|3)GKK, oh, ow]
    _, _, oh, ow = offs.shape
    KK = K * K
    G = deform_groups
    out = np.zeros((B, O, oh, ow), np.float64)
    for b in range(B):
        sampled = np.zeros((C, KK, oh, ow), np.float64)
        for g in range(G):
            cg = C // G
            for k in range(KK):
                dy = offs[b, g * 2 * KK + 2 * k]
                dx = offs[b, g * 2 * KK + 2 * k + 1]
                if modulated:
                    m = 1 / (1 + np.exp(-offs[b, 2 * G * KK + g * KK + k]))
                else:
                    m = 1.0
                base_y = (np.arange(oh) * stride - pad + k // K)[:, None]
                base_x = (np.arange(ow) * stride - pad + k % K)[None, :]
                s = _bilinear(x[b, g * cg:(g + 1) * cg], base_y + dy, base_x + dx)
                sampled[g * cg:(g + 1) * cg, k] = s * m
        for cg_i in range(conv_groups):
            ic = C // conv_groups
            oc = O // conv_groups
            out[b, cg_i * oc:(cg_i + 1) * oc] = np.einsum(
                "ckhw,ock->ohw",
                sampled[cg_i * ic:(cg_i + 1) * ic],
                weight[cg_i * oc:(cg_i + 1) * oc].reshape(oc, ic, KK))
    if bias is not None:
        out += bias[None, :, None, None]
    return out


@pytest.mark.parametrize("modulated,conv_groups", [(False, 1), (True, 1),
                                                   (False, 2), (True, 2)])
def test_dcn_conversion_numeric_parity(modulated, conv_groups):
    rng = np.random.default_rng(0)
    C, O, K, H, W = 4, 4, 3, 7, 6
    T = 3 if modulated else 2
    x = rng.standard_normal((1, C, H, W))
    weight = rng.standard_normal((O, C // conv_groups, K, K)) * 0.3
    off_w = rng.standard_normal((T * K * K, C, K, K)) * 0.1
    off_b = rng.standard_normal(T * K * K) * 0.1

    ref = _mmcv_deform_conv_np(x, weight, None, off_w, off_b, modulated,
                               conv_groups=conv_groups)

    sd = {
        "dcn.weight": weight.astype(np.float32),
        "dcn.conv_offset.weight": off_w.astype(np.float32),
        "dcn.conv_offset.bias": off_b.astype(np.float32),
    }
    tb = TreeBuilder()
    convert_dcn(tb, sd, "dcn", "dcn", modulated=modulated)

    mod = DeformConv2d(O, kernel_size=K, padding=1, groups=conv_groups,
                       modulated=modulated, use_bias=False)
    xj = jnp.asarray(np.moveaxis(x, 1, -1).astype(np.float32))
    init = mod.init(jax.random.PRNGKey(0), xj)
    # shape agreement between converted and model trees
    conv_shapes = jax.tree_util.tree_map(lambda a: a.shape, tb.params["dcn"])
    model_shapes = jax.tree_util.tree_map(lambda a: a.shape, init["params"])
    assert conv_shapes == model_shapes
    out = mod.apply({"params": tb.params["dcn"]}, xj)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out), -1, 1), ref, rtol=1e-4, atol=1e-4)


def test_resnet_dcn_bottleneck_conversion_parity():
    """convert_resnet's DCNv2-in-bottleneck branch (R101-DCN checkpoints):
    torch bottleneck with mmcv-layout modulated DCN at conv2 -> converted ->
    our Bottleneck(with_dcn=True) matches numerically."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    import torch.nn.functional as TF

    from occformer_tpu.engine.checkpoint import convert_resnet
    from occformer_tpu.models.resnet import Bottleneck

    C, P = 8, 4  # planes P, in channels C = P (so downsample 1x1 exists: 4*P != C)
    rng = np.random.default_rng(0)

    class TorchBottleneckDCN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(C, P, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(P)
            # mmcv ModulatedDeformConv2dPack naming: conv2.weight + conv2.conv_offset
            self.conv2 = tnn.Module()
            self.conv2.weight = tnn.Parameter(torch.randn(P, P, 3, 3) * 0.2)
            self.conv2.conv_offset = tnn.Conv2d(P, 27, 3, padding=1, bias=True)
            self.bn2 = tnn.BatchNorm2d(P)
            self.conv3 = tnn.Conv2d(P, P * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(P * 4)
            self.downsample = tnn.Sequential(
                tnn.Conv2d(C, P * 4, 1, bias=False), tnn.BatchNorm2d(P * 4))

        def forward(self, x):
            y = TF.relu(self.bn1(self.conv1(x)))
            out = _mmcv_deform_conv_np(
                y.numpy().astype(np.float64),
                self.conv2.weight.detach().numpy(), None,
                self.conv2.conv_offset.weight.detach().numpy().astype(np.float64),
                self.conv2.conv_offset.bias.detach().numpy().astype(np.float64),
                modulated=True)
            y = TF.relu(self.bn2(torch.from_numpy(out.astype(np.float32))))
            y = self.bn3(self.conv3(y))
            return TF.relu(y + self.downsample(x))

    torch.manual_seed(0)
    tm = TorchBottleneckDCN().eval()
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.5, 1.5)
    sd = {"layer1.0." + k: v.detach().numpy() for k, v in tm.state_dict().items()}
    # convert_resnet also expects the stem; give it one (not compared here)
    sd["conv1.weight"] = rng.standard_normal((8, 3, 7, 7)).astype(np.float32)
    for k, v in (("weight", np.ones(8)), ("bias", np.zeros(8)),
                 ("running_mean", np.zeros(8)), ("running_var", np.ones(8))):
        sd[f"bn1.{k}"] = v.astype(np.float32)
    params, stats = convert_resnet(sd, "")

    mod = Bottleneck(planes=P, stride=1, has_downsample=True, with_dcn=True)
    x = rng.standard_normal((1, 6, 7, C)).astype(np.float32)
    import jax
    import jax.numpy as jnp

    init = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    from occformer_tpu.engine.convert_weights import match_to_tree

    variables, missing = match_to_tree(
        {"params": params["layer1_0"], "batch_stats": stats["layer1_0"]},
        {"params": init["params"], "batch_stats": init["batch_stats"]})
    assert not missing, missing
    out = mod.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()
    np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1), ref,
                               rtol=3e-4, atol=3e-4)
