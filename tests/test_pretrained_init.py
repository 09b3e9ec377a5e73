"""Pretrained-backbone initialization: key coverage + numerics + CLI wiring.

The reference never trains from random init (SURVEY.md §5 checkpoint/resume):
torchvision R50 (occformer_nusc_r50_256x704.py:66), mmcls EfficientNet-B7
with prefix='backbone' (occformer_kitti.py:74), and the FCOS3D-pretrained
R101-DCN via whole-model strict=False load_from
(occformer_nusc_r101_896x1600.py:10).  No ``.pth`` exists in this
environment, so these tests drive ``engine/pretrained.py`` with synthetic
state dicts built from the RECONSTRUCTED init-checkpoint manifests
(tests/fixtures/key_manifests/init_*.json, tools/gen_key_manifest.py) and
assert, per config:

  1. zero kept-init leaves on the covered subtree (params + batch_stats of
     ``backbone``) — the init really reaches every backbone weight;
  2. every manifest key is consumed except a closed allowlist (classifier
     heads, num_batches_tracked, and — for the FCOS3D file — the FPN
     ``img_neck.*`` keys that mmcv strict=False would skip too);
  3. spot-check numerics (torch OIHW -> flax HWIO transpose);
  4. the end-to-end ``init_from_pretrained`` path from a real temp ``.pth``
     (exercising torch deserialization, prefix handling, and path fallback).
"""
import json
import os
import re
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST_DIR = os.path.join(REPO, "tests", "fixtures", "key_manifests")
sys.path.insert(0, os.path.join(REPO, "tools"))

from occformer_tpu.engine.pretrained import (  # noqa: E402
    init_from_pretrained, load_backbone_pretrained, partial_load_torch,
)


class _RecordingDict(dict):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        if super().__contains__(k):
            self.consumed.add(k)
        return super().get(k, default)


def _manifest_sd(name, seed=0):
    with open(os.path.join(MANIFEST_DIR, f"{name}.json")) as f:
        manifest = json.load(f)["keys"]
    rng = np.random.RandomState(seed)
    return _RecordingDict(
        {k: rng.standard_normal(shape).astype(np.float32)
         for k, shape in manifest.items()})


def _abstract_variables(cfg_path, **kw):
    from tpu_train_trial import build_trial

    model, batch, _, cfg = build_trial(
        cfg_path, batch_size=1, max_lidar=256, num_points=64, **kw)
    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda b: model.init({"params": key, "dropout": key}, b), batch)
    return dict(shapes), cfg


def _assert_backbone_covered(rep):
    kept = rep.get("kept_init", [])
    assert not kept, f"{len(kept)} kept-init leaves on covered subtree:\n" + \
        "\n".join(kept[:40])


@pytest.mark.slow
@pytest.mark.quick
def test_r50_torchvision_init_coverage():
    variables, cfg = _abstract_variables(
        "occformer_tpu/configs/occformer_nusc_r50_256x704.py")
    sd = _manifest_sd("init_resnet50_torchvision")
    bb_cfg = dict(cfg["model"]["img_backbone"])
    assert bb_cfg.get("pretrained"), "config lost its pretrained field"
    out, rep = load_backbone_pretrained(
        variables, bb_cfg, "resnet50-0676ba61.pth", state_dict=sd)
    _assert_backbone_covered(rep)
    # torchvision classifier fc + BN step counters are legitimately unread
    allowed = re.compile(r"(^fc\.|\.num_batches_tracked$)")
    unconsumed = {k for k in sd if k not in sd.consumed
                  and not allowed.search(k)}
    assert not unconsumed, sorted(unconsumed)[:20]
    # numerics: flax kernel is the OIHW->HWIO transpose of torch conv1
    k = out["params"]["backbone"]["conv1"]["Conv_0"]["kernel"]
    np.testing.assert_array_equal(k, sd["conv1.weight"].transpose(2, 3, 1, 0))
    # batch_stats grafted too
    m = out["batch_stats"]["backbone"]["bn1"]["BatchNorm_0"]["mean"]
    np.testing.assert_array_equal(m, sd["bn1.running_mean"])


@pytest.mark.slow
def test_kitti_b7_mmcls_init_coverage():
    variables, cfg = _abstract_variables(
        "occformer_tpu/configs/occformer_kitti.py")
    sd = _manifest_sd("init_efficientnet_b7_mmcls")
    bb_cfg = dict(cfg["model"]["img_backbone"])
    init_cfg = dict(bb_cfg.get("init_cfg") or {})
    assert init_cfg.get("type") == "Pretrained" and \
        init_cfg.get("prefix") == "backbone", \
        "kitti config must carry the reference init_cfg (occformer_kitti.py:74)"
    out, rep = load_backbone_pretrained(
        variables, bb_cfg, "efficientnet-b7.pth", prefix="backbone",
        state_dict=dict(sd))
    _assert_backbone_covered(rep)
    # numerics through prefix strip + ConvModule naming
    k = out["params"]["backbone"]["stem_conv"]["kernel"]
    np.testing.assert_array_equal(
        k, sd["backbone.layers.0.conv.weight"].transpose(2, 3, 1, 0))


@pytest.mark.slow
def test_r101_fcos3d_partial_load():
    variables, cfg = _abstract_variables(
        "occformer_tpu/configs/occformer_nusc_r101_896x1600.py")
    assert str(cfg.get("load_from", "")).endswith(".pth"), \
        "r101 config must keep the raw-torch load_from (reference :10)"
    sd = _manifest_sd("init_r101_dcn_fcos3d")
    out, rep = partial_load_torch(variables, "r101_dcn_fcos3d_pretrain.pth",
                                  state_dict=sd)
    _assert_backbone_covered(rep)
    assert rep["loaded_subtrees"] == ["img_backbone"]
    assert "img_neck" in rep["skipped_subtrees"]
    allowed = re.compile(r"(^img_neck\.|\.num_batches_tracked$)")
    unconsumed = {k for k in sd if k not in sd.consumed
                  and not allowed.search(k)}
    assert not unconsumed, sorted(unconsumed)[:20]
    # DCN stage keys made it through (layer3/4 conv2 + conv_offset)
    b = out["params"]["backbone"]["layer3_0"]["conv2"]
    assert "conv_offset" in b or "offset_conv" in b or len(b) > 1, \
        f"DCN block tree unexpectedly shallow: {list(b)}"


def test_init_from_pretrained_end_to_end(tmp_path):
    """Real .pth round trip: TorchResNet18 replica state dict -> temp file ->
    init_from_pretrained -> flax ResNet-18 variables, zero kept-init."""
    import torch

    from tests.test_convert import TorchResNet18

    from occformer_tpu.models.resnet import ResNet

    torch.manual_seed(0)
    tm = TorchResNet18()
    path = tmp_path / "resnet18.pth"
    torch.save({"state_dict": tm.state_dict()}, str(path))

    model = ResNet(depth=18, out_indices=(0, 1, 2, 3))
    x = np.zeros((1, 32, 32, 3), np.float32)
    init_vars = model.init(jax.random.PRNGKey(0), x)
    variables = {"params": {"backbone": init_vars["params"]},
                 "batch_stats": {"backbone": init_vars["batch_stats"]}}

    model_cfg = {"img_backbone": {"type": "ResNet", "depth": 18,
                                  "pretrained": str(path)}}
    out, reports = init_from_pretrained(variables, model_cfg)
    assert len(reports) == 1 and not reports[0].get("kept_init"), reports
    got = out["params"]["backbone"]["conv1"]["Conv_0"]["kernel"]
    want = tm.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_init_from_pretrained_missing_file_warns_not_raises():
    model_cfg = {"img_backbone": {"type": "ResNet", "depth": 50,
                                  "pretrained": "ckpts/nope.pth"}}
    variables = {"params": {"backbone": {}}, "batch_stats": {}}
    out, reports = init_from_pretrained(
        variables, model_cfg, load_from="ckpts/also_nope.pth")
    assert out is variables
    assert [r.get("found") for r in reports] == [False, False]
