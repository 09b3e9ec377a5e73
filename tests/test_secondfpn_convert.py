"""SECONDFPN torch-checkpoint conversion numeric parity.

Covers the deconv kernel-layout transpose (t2f_deconv) and the fractional-
stride conv path against a pure-torch replica of mmdet3d SECONDFPN
(mmdetection3d/mmdet3d/models/necks/second_fpn.py:12-100) with checkpoint-
exact ``deblocks.{i}.{0,1}`` naming.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from occformer_tpu.engine.convert_weights import TreeBuilder, match_to_tree, t2f_conv
from occformer_tpu.models.second_fpn import SECONDFPN

IN_CH = (8, 12, 16, 20)
OUT_CH = (6, 6, 6, 6)
STRIDES = (0.5, 1, 2, 4)


class TorchSECONDFPN(tnn.Module):
    def __init__(self, in_ch=IN_CH, out_ch=OUT_CH, strides=STRIDES):
        super().__init__()
        self.deblocks = tnn.ModuleList()
        for cin, cout, s in zip(in_ch, out_ch, strides):
            if s >= 1:
                si = int(s)
                up = tnn.ConvTranspose2d(cin, cout, si, stride=si, bias=False)
            else:
                si = int(round(1 / s))
                up = tnn.Conv2d(cin, cout, si, stride=si, bias=False)
            self.deblocks.append(tnn.Sequential(
                up, tnn.BatchNorm2d(cout, eps=1e-3, momentum=0.01), tnn.ReLU()))

    def forward(self, feats):
        return torch.cat([d(x) for d, x in zip(self.deblocks, feats)], dim=1)


def test_secondfpn_conversion_numeric_parity():
    torch.manual_seed(0)
    tm = TorchSECONDFPN().eval()
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.5, 1.5)
    sd = {"img_neck." + k: v.detach().numpy() for k, v in tm.state_dict().items()}

    # converter fragment (mirrors convert_occformer's neck section)
    from occformer_tpu.engine.convert_weights import t2f_deconv

    tb = TreeBuilder()
    i = 0
    while f"img_neck.deblocks.{i}.0.weight" in sd:
        w = sd[f"img_neck.deblocks.{i}.0.weight"]
        tb.deconv(sd, f"img_neck.deblocks.{i}.0", f"neck/deblock{i}_up")
        tb.p(f"neck/deblock{i}_conv/Conv_0/kernel", t2f_conv(w))
        tb.bn(sd, f"img_neck.deblocks.{i}.1", f"neck/deblock{i}_bn")
        i += 1

    model = SECONDFPN(in_channels=IN_CH, out_channels=OUT_CH,
                      upsample_strides=STRIDES)
    rng = np.random.default_rng(0)
    # base stride-4 map 16x24; levels at strides 4/8/16/32 relative sizes
    sizes = [(32, 48), (16, 24), (8, 12), (4, 6)]
    feats_np = [rng.standard_normal((1, h, w, c)).astype(np.float32)
                for (h, w), c in zip(sizes, IN_CH)]
    init = model.init(jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats_np])

    params, missing = match_to_tree(
        {"params": tb.params["neck"], "batch_stats": tb.stats["neck"]},
        {"params": init["params"], "batch_stats": init["batch_stats"]})
    assert not missing, missing

    out_j = model.apply(params, [jnp.asarray(f) for f in feats_np])
    with torch.no_grad():
        out_t = tm([torch.from_numpy(np.moveaxis(f, -1, 1).copy())
                    for f in feats_np])
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out_j), -1, 1), out_t.numpy(),
        rtol=2e-4, atol=2e-4)
