"""Inverse converter: flax variables -> reference torch state dict.

`export_torch_state_dict` numerically inverts `convert_occformer` (probe
indices through the forward permutation), so the one test that matters is
exact round-trip bit-equality over every consumed checkpoint key — any
forward-mapping rule the inverse missed would corrupt at least one element.
"""
import numpy as np
import pytest

import jax

import tiny_cfg
from occformer_tpu.engine.convert_weights import (
    build_export_permutation,
    convert_occformer,
    export_torch_state_dict,
    match_to_tree,
)
from occformer_tpu.models.detector import OccupancyFormer
from tests.test_full_checkpoint_convert import _build_state_dict


def _tiny_model_and_sd():
    cfg = tiny_cfg.model_cfg()
    model = OccupancyFormer(
        **{k: cfg[k] for k in (
            "img_backbone", "img_neck", "img_view_transformer",
            "img_bev_encoder_backbone", "img_bev_encoder_neck",
            "pts_bbox_head",
        )},
        train=False,
    )
    batch = tiny_cfg.make_batch(np.random.RandomState(0))
    variables = model.init(jax.random.PRNGKey(0), batch)
    # drop replica-only artifacts that real checkpoints don't contain
    # (same filter as tools/gen_key_manifest.py _REPLICA_ONLY)
    sd = {k: np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
          for k, v in _build_state_dict().items()
          if ".bias_table" not in k and ".rel_idx" not in k}
    return variables, sd


@pytest.mark.quick
def test_export_roundtrip_bit_exact():
    variables, sd = _tiny_model_and_sd()
    conv = convert_occformer(sd)
    params, msgs_p = match_to_tree(conv["params"], variables["params"])
    stats, msgs_s = match_to_tree(conv["batch_stats"],
                                  variables.get("batch_stats", {}))
    assert not msgs_p + msgs_s
    loaded = {"params": params, "batch_stats": stats}

    manifest = {k: tuple(v.shape) for k, v in sd.items()}
    out = export_torch_state_dict(loaded, manifest)
    # every key the converter consumed must come back bit-identical
    checked = 0
    for k, v in sd.items():
        if k not in out:
            continue
        if v.dtype.kind == "f":
            np.testing.assert_array_equal(out[k], v.astype(np.float32),
                                          err_msg=k)
            checked += 1
    assert checked >= len(sd) * 0.9  # nearly all keys are float tensors


def test_export_rejects_unreachable_manifest_keys():
    variables, sd = _tiny_model_and_sd()
    manifest = {k: tuple(v.shape) for k, v in sd.items()}
    manifest["pts_bbox_head.nonexistent.weight"] = (4, 4)
    with pytest.raises(ValueError, match="not reachable"):
        export_torch_state_dict(variables, manifest)


def test_export_synthesizes_buffers():
    variables, sd = _tiny_model_and_sd()
    manifest = {k: tuple(v.shape) for k, v in sd.items()}
    manifest["img_backbone.bn1.num_batches_tracked"] = ()
    out = export_torch_state_dict(
        variables, manifest,
        grid_config=None)
    assert out["img_backbone.bn1.num_batches_tracked"].shape == ()


@pytest.mark.slow
def test_export_permutation_covers_released_r50_manifest():
    """At full released scale (shapes only, eval_shape tree): every element
    of the R50 manifest is reachable from the flax tree except the
    synthesizable buffers — the exporter can reproduce the full .pth."""
    import json
    import os
    import re
    import sys

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from tpu_train_trial import build_trial

    with open(os.path.join(
            REPO, "tests", "fixtures", "key_manifests",
            "occformer_nusc_r50_256x704.json")) as f:
        manifest = json.load(f)["keys"]

    model, batch, _, _ = build_trial(
        "occformer_tpu/configs/occformer_nusc_r50_256x704.py",
        batch_size=1, max_lidar=256, num_points=64)
    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda b: model.init({"params": key, "dropout": key}, b), batch)

    index_map, offsets, total = build_export_permutation(manifest, shapes)
    filled = np.zeros((total,), bool)
    for idx in index_map.values():
        filled[idx.ravel()] = True
    synth = re.compile(r"(\.num_batches_tracked$|\.relative_position_index$"
                       r"|^img_view_transformer\.(dx|bx|nx)$)")
    unfilled = []
    for k, (start, shape) in offsets.items():
        n = int(np.prod(shape)) if shape else 1
        if not filled[start:start + n].all() and not synth.search(k):
            unfilled.append(k)
    assert not unfilled, unfilled[:20]
