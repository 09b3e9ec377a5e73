"""Full-model checkpoint conversion: key coverage of ``convert_occformer``.

Assembles a synthetic reference-named state dict for the ENTIRE tiny
OccupancyFormer (backbone + SECONDFPN + DepthNet + 4 dual-path blocks +
pixel decoder + Mask2Former head) from the per-component torch replicas, runs
the real top-level ``convert_occformer`` and requires that every leaf of the
model tree is covered — zero "kept init" messages.  Per-component numerics
are covered by the dedicated parity tests; what THIS test pins down is the
top-level prefix wiring and loop/termination logic of the converter.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from occformer_tpu.engine.convert_weights import convert_occformer, match_to_tree
from occformer_tpu.models.detector import OccupancyFormer

import tiny_cfg
from tests.test_convert import TorchResNet18
from tests.test_depthnet_convert import TorchDepthNet
from tests.test_dualpath_convert import TorchDualpathBlock
from tests.test_mask2former_head_convert import TorchHead
from tests.test_pixel_decoder_layer_convert import TorchMSDeformAttn3D
from tests.test_secondfpn_convert import TorchSECONDFPN

VO = tiny_cfg.VOXEL_OUT  # 48


class TorchPixelDecoder(tnn.Module):
    """multiscale_deformattn_3d.py:60-120 naming (state-dict only)."""

    def __init__(self, in_channels, feat, n_enc=3, n_layers=2, heads=4,
                 points=2, groups=tiny_cfg.NUM_GROUPS, ffn_ratio=2):
        super().__init__()
        n_in = len(in_channels)
        self.input_convs = tnn.ModuleList()
        for i in range(n_in - 1, n_in - n_enc - 1, -1):
            m = tnn.Module()
            m.conv = tnn.Conv3d(in_channels[i], feat, 1, bias=True)
            m.gn = tnn.GroupNorm(groups, feat)
            self.input_convs.append(m)
        self.encoder = tnn.Module()
        layers = []
        for _ in range(n_layers):
            lay = tnn.Module()
            lay.attentions = tnn.ModuleList(
                [TorchMSDeformAttn3D(feat, heads, n_enc, points)])
            lay.norms = tnn.ModuleList([tnn.LayerNorm(feat) for _ in range(2)])
            ffn = tnn.Module()
            ffn.layers = tnn.Sequential(
                tnn.Sequential(tnn.Linear(feat, feat * ffn_ratio)),
                tnn.Linear(feat * ffn_ratio, feat))
            lay.ffns = tnn.ModuleList([ffn])
            layers.append(lay)
        self.encoder.layers = tnn.ModuleList(layers)
        self.level_encoding = tnn.Embedding(n_enc, feat)
        self.lateral_convs = tnn.ModuleList()
        self.output_convs = tnn.ModuleList()
        for i in range(n_in - n_enc - 1, -1, -1):
            lat = tnn.Module()
            lat.conv = tnn.Conv3d(in_channels[i], feat, 1, bias=False)
            lat.gn = tnn.GroupNorm(groups, feat)
            out = tnn.Module()
            out.conv = tnn.Conv3d(feat, feat, 3, padding=1, bias=False)
            out.gn = tnn.GroupNorm(groups, feat)
            self.lateral_convs.append(lat)
            self.output_convs.append(out)
        self.mask_feature = tnn.Conv3d(feat, feat, 1)


def _build_state_dict():
    torch.manual_seed(0)
    sd = {}

    def add(prefix, module):
        for k, v in module.state_dict().items():
            sd[prefix + "." + k] = v.detach().numpy()

    add("img_backbone", TorchResNet18())
    add("img_neck", TorchSECONDFPN(
        in_ch=(64, 128, 256, 512), out_ch=(16,) * 4, strides=(0.5, 1, 2, 4)))
    add("img_view_transformer.depth_net",
        TorchDepthNet(mid=64, ctx=tiny_cfg.NUMC_TRANS, d=8, cam=27))
    chans = [tiny_cfg.NUMC_TRANS] + list(tiny_cfg.VOXEL_CHANNELS)
    for si in range(4):
        add(f"img_bev_encoder_backbone.layers.{si}.0",
            TorchDualpathBlock(chans[si], chans[si + 1],
                               tiny_cfg.model_cfg()["img_bev_encoder_backbone"]["block_strides"][si],
                               shift=(si % 2) == 1))
    add("img_bev_encoder_neck", TorchPixelDecoder(
        tiny_cfg.VOXEL_CHANNELS, VO))
    add("pts_bbox_head", TorchHead(c=VO, nq=8, nh=4, nlayers=3,
                                   ncls=tiny_cfg.NUM_CLASSES))
    return sd


def test_full_model_conversion_key_coverage():
    cfg = tiny_cfg.model_cfg()
    model = OccupancyFormer(
        **{k: cfg[k] for k in (
            "img_backbone", "img_neck", "img_view_transformer",
            "img_bev_encoder_backbone", "img_bev_encoder_neck", "pts_bbox_head",
        )},
        train=False,
    )
    batch = tiny_cfg.make_batch(np.random.RandomState(0))
    variables = model.init(jax.random.PRNGKey(0), batch)

    sd = _build_state_dict()
    conv = convert_occformer(sd)
    params, msgs_p = match_to_tree(conv["params"], variables["params"])
    stats, msgs_s = match_to_tree(conv["batch_stats"],
                                  variables.get("batch_stats", {}))
    msgs = msgs_p + msgs_s
    assert not msgs, "\n".join(msgs[:40])

    # converted model must run
    out = model.apply({"params": params, "batch_stats": stats}, batch)
    assert np.all(np.isfinite(np.asarray(out["cls_preds"])))
