#!/usr/bin/env python
"""Generate released-checkpoint key manifests (state-dict name -> shape).

The reference releases three checkpoints (reference README.md:47-49):

  * ``occformer_kitti``               — SemanticKITTI, EfficientNet-B7
  * ``occformer_nusc_r50_256x704``    — nuScenes, ResNet-50
  * ``occformer_nusc_r101_896x1600``  — nuScenes, ResNet-101 + DCNv2 (caffe)

No ``.pth`` files exist in this environment, so the converter
(``occformer_tpu/engine/convert_weights.py``) cannot be exercised against the
real key space directly.  This script reconstructs that key space from the
reference module trees:

  * torch replica modules already numerics-validated by the per-component
    conversion parity tests (tests/test_*_convert.py) are composed at the
    released configs' full sizes — their ``state_dict()`` gives names+shapes
    exactly as torch would serialize them;
  * registered buffers that replicas omit are added explicitly:
    ``img_view_transformer.{dx,bx,nx}`` (nn.Parameter(requires_grad=False),
    reference ViewTransformerLSSBEVDepth.py:81-84) and each Swin block's
    ``relative_position_index`` (window_attention.py:61);
  * replica-only artifacts (``.bias_table`` alias, ``.rel_idx``) are dropped.

Module-tree provenance (all under /root/reference/projects/mmdet3d_plugin/):
  occformer/detectors/bevdepth.py:22-32 (top-level prefixes),
  occformer/image2bev/ViewTransformerLSSBEVDepth.py:450-577 (DepthNet, dx/bx/nx),
  occformer/backbones/occnet.py:32-61 (layers.{stage}.{block}),
  occformer/backbones/dualpath_block.py:36-63,
  occformer/necks/multiscale_deformattn_3d.py:66-117,
  occformer/mask2former/mask2former_occ.py:95-121 (identical attr names in the
  nusc variant, mask2former_nusc_occ.py:93-119; decoder_input_projs are
  nn.Identity because decoder embed_dims == feat_channels, :102-108),
  mmdetection3d/mmdet3d/models/necks/second_fpn.py:39-66.

Output: tests/fixtures/key_manifests/<name>.json, pinned by
tests/test_key_manifest.py (full converter coverage in both directions).
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import torch  # noqa: E402
import torch.nn as tnn  # noqa: E402

from tests.test_depthnet_convert import TorchDepthNet  # noqa: E402
from tests.test_dualpath_convert import TorchDualpathBlock  # noqa: E402
from tests.test_efficientnet_convert import TorchEfficientNet  # noqa: E402
from tests.test_full_checkpoint_convert import TorchPixelDecoder  # noqa: E402
from tests.test_mask2former_head_convert import TorchHead  # noqa: E402
from tests.test_secondfpn_convert import TorchSECONDFPN  # noqa: E402

# replica implementation details that do not exist in real checkpoints
_REPLICA_ONLY = (".bias_table", ".rel_idx")


class _Bottleneck(tnn.Module):
    """mmdet ResNet Bottleneck key space (optionally DCNv2 at conv2, as in
    stage_with_dcn stages of the R101 config; conv_offset has 27 = 3*3*3
    output channels for deform_groups=1 modulated DCN)."""

    def __init__(self, cin, planes, stride=1, dcn=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        if dcn:
            self.conv2 = tnn.Module()
            self.conv2.weight = tnn.Parameter(
                torch.empty(planes, planes, 3, 3))
            self.conv2.conv_offset = tnn.Conv2d(planes, 27, 3, padding=1)
        else:
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        if stride != 1 or cin != planes * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))


class _ResNet(tnn.Module):
    """mmdet ResNet-50/101 key space (conv1/bn1 stem + layer{1..4})."""

    DEPTHS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}

    def __init__(self, depth, dcn_stages=()):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        cin = 64
        for si, nblocks in enumerate(self.DEPTHS[depth]):
            planes = 64 * (2 ** si)
            stride = 1 if si == 0 else 2
            blocks = []
            for bi in range(nblocks):
                blocks.append(_Bottleneck(
                    cin, planes, stride if bi == 0 else 1,
                    dcn=(si + 1) in dcn_stages))
                cin = planes * 4
            setattr(self, f"layer{si + 1}", tnn.Sequential(*blocks))


def _sd(prefix, module):
    out = {}
    for k, v in module.state_dict().items():
        if any(s in k for s in _REPLICA_ONLY):
            continue
        out[f"{prefix}.{k}" if prefix else k] = list(v.shape)
    return out


def _common_trunk(numc_input, cam_channels, num_classes):
    """Everything above the image backbone/neck is shared by all released
    configs: numC_Trans=128, D=112 (dbound [2,58,0.5]), voxel channels
    [128,256,512,1024] x 2 blocks, pixel decoder feat=192 (6 layers, 8 heads,
    3 levels, 4 points, FFN x4), head Q=100 (9 layers, 6 heads, FFN x8)."""
    keys = {}
    # view transformer: dx/bx/nx nn.Parameters + DepthNet
    for name in ("dx", "bx", "nx"):
        keys[f"img_view_transformer.{name}"] = [3]
    keys.update(_sd("img_view_transformer.depth_net",
                    TorchDepthNet(mid=numc_input, ctx=128, d=112,
                                  cam=cam_channels)))
    # OccupancyEncoder: 4 stages x 2 DualpathTransformerBlocks
    chans = [128, 128, 256, 512, 1024]
    strides = [1, 2, 2, 2]
    layer_index = 0
    for si in range(4):
        for bi in range(2):
            cin = chans[si] if bi == 0 else chans[si + 1]
            stride = strides[si] if bi == 0 else 1
            block = TorchDualpathBlock(
                cin, chans[si + 1], stride, shift=(layer_index % 2) == 1)
            pre = f"img_bev_encoder_backbone.layers.{si}.{bi}"
            keys.update(_sd(pre, block))
            keys[f"{pre}.bev_encoder.attn.w_msa.relative_position_index"] = \
                [49, 49]
            layer_index += 1
    # pixel decoder + head
    keys.update(_sd("img_bev_encoder_neck", TorchPixelDecoder(
        [128, 256, 512, 1024], 192, n_enc=3, n_layers=6, heads=8,
        points=4, groups=32, ffn_ratio=4)))
    keys.update(_sd("pts_bbox_head", TorchHead(
        c=192, nq=100, nh=6, nlayers=9, ncls=num_classes, ffn_ratio=8)))
    return keys


def build_manifest(name):
    if name == "occformer_nusc_r50_256x704":
        keys = _sd("img_backbone", _ResNet(50))
        keys.update(_sd("img_neck", TorchSECONDFPN(
            in_ch=(256, 512, 1024, 2048), out_ch=(128,) * 4,
            strides=(0.25, 0.5, 1, 2))))
        keys.update(_common_trunk(512, cam_channels=27, num_classes=17))
    elif name == "occformer_nusc_r101_896x1600":
        keys = _sd("img_backbone", _ResNet(101, dcn_stages=(3, 4)))
        keys.update(_sd("img_neck", TorchSECONDFPN(
            in_ch=(256, 512, 1024, 2048), out_ch=(128,) * 4,
            strides=(0.25, 0.5, 1, 2))))
        keys.update(_common_trunk(512, cam_channels=27, num_classes=17))
    elif name == "occformer_kitti":
        keys = _sd("img_backbone",
                   TorchEfficientNet("b7", (2, 3, 4, 5, 6)))
        keys.update(_sd("img_neck", TorchSECONDFPN(
            in_ch=(48, 80, 224, 640, 2560), out_ch=(128,) * 5,
            strides=(0.25, 0.5, 1, 2, 2))))
        keys.update(_common_trunk(640, cam_channels=33, num_classes=20))
    else:
        raise ValueError(name)
    return keys


def _fpn_neck_keys():
    """mmdet FPN key space at FCOS3D sizes (lateral 1x1 + fpn 3x3 convs,
    in [256,512,1024,2048] -> 256, num_outs=5 w/ one extra downsample conv).
    These keys intentionally do NOT exist in OccupancyFormer's SECONDFPN —
    the partial loader must skip them like mmcv strict=False does."""
    keys = {}
    for i, cin in enumerate((256, 512, 1024, 2048)):
        keys[f"img_neck.lateral_convs.{i}.conv.weight"] = [256, cin, 1, 1]
        keys[f"img_neck.lateral_convs.{i}.conv.bias"] = [256]
        keys[f"img_neck.fpn_convs.{i}.conv.weight"] = [256, 256, 3, 3]
        keys[f"img_neck.fpn_convs.{i}.conv.bias"] = [256]
    keys["img_neck.fpn_convs.4.conv.weight"] = [256, 2048, 3, 3]
    keys["img_neck.fpn_convs.4.conv.bias"] = [256]
    return keys


def build_init_manifest(name):
    """Key spaces of the three TRAINING-INIT checkpoints (distinct from the
    released fine-tuned checkpoints above):

      * resnet50-0676ba61.pth — torchvision ImageNet classifier (reference
        occformer_nusc_r50_256x704.py:66): bare ResNet keys + fc head;
      * efficientnet-b7 mmcls classifier (occformer_kitti.py:74,
        init_cfg prefix='backbone'): backbone.* + head.fc.*.  mmcls 'b'
        archs merge stride-1 stages (model_scaling, reference
        efficientnet.py:260-270), so b7 is exactly stem + 5 merged stages +
        final conv — the classifier backbone and the kitti model's key
        spaces coincide;
      * r101_dcn_fcos3d_pretrain.pth (occformer_nusc_r101_896x1600.py:10,
        whole-model load_from): img_backbone.* R101-DCN(caffe) keys that
        partial-load, plus FPN img_neck.* keys that must be skipped.
    """
    if name == "init_resnet50_torchvision":
        keys = _sd("", _ResNet(50))
        keys["fc.weight"] = [1000, 2048]
        keys["fc.bias"] = [1000]
    elif name == "init_efficientnet_b7_mmcls":
        keys = _sd("backbone", TorchEfficientNet("b7", (2, 3, 4, 5, 6)))
        keys["head.fc.weight"] = [1000, 2560]
        keys["head.fc.bias"] = [1000]
    elif name == "init_r101_dcn_fcos3d":
        keys = _sd("img_backbone", _ResNet(101, dcn_stages=(3, 4)))
        keys.update(_fpn_neck_keys())
    else:
        raise ValueError(name)
    return keys


INIT_MANIFESTS = ("init_resnet50_torchvision", "init_efficientnet_b7_mmcls",
                  "init_r101_dcn_fcos3d")


def main():
    out_dir = os.path.join(REPO, "tests", "fixtures", "key_manifests")
    os.makedirs(out_dir, exist_ok=True)
    for name in ("occformer_nusc_r50_256x704", "occformer_nusc_r101_896x1600",
                 "occformer_kitti"):
        keys = build_manifest(name)
        path = os.path.join(out_dir, f"{name}.json")
        with open(path, "w") as f:
            json.dump({"checkpoint": name,
                       "source": "reference README.md:47-49 model zoo",
                       "provenance": "RECONSTRUCTED from reference module "
                       "trees (no .pth in this environment); re-verify "
                       "against the real files per tools/parity_runbook.md "
                       "step 1",
                       "num_keys": len(keys),
                       "keys": dict(sorted(keys.items()))}, f, indent=0)
        n_params = sum(1 for k in keys if "num_batches_tracked" not in k
                       and "relative_position_index" not in k)
        print(f"{name}: {len(keys)} keys ({n_params} tensors) -> {path}")
    for name in INIT_MANIFESTS:
        keys = build_init_manifest(name)
        path = os.path.join(out_dir, f"{name}.json")
        with open(path, "w") as f:
            json.dump({"checkpoint": name,
                       "source": "reference training-init checkpoints "
                       "(occformer_nusc_r50_256x704.py:66, "
                       "occformer_kitti.py:74, "
                       "occformer_nusc_r101_896x1600.py:10)",
                       "provenance": "RECONSTRUCTED from torch replica "
                       "modules (no .pth in this environment); re-verify "
                       "against the real files per tools/parity_runbook.md "
                       "step 1",
                       "num_keys": len(keys),
                       "keys": dict(sorted(keys.items()))}, f, indent=0)
        print(f"{name}: {len(keys)} keys -> {path}")


if __name__ == "__main__":
    main()
