"""Pin the converter to the released checkpoints' key space.

The three released ``.pth``s (reference README.md:47-49) are not available in
this environment, so ``tests/fixtures/key_manifests/*.json`` commit their
reconstructed key spaces (name -> shape; see tools/gen_key_manifest.py for
provenance).  For each released config this test asserts, in both directions:

  1. every flax leaf of the full-scale model built from the shipped config is
     filled by ``convert_occformer`` — zero "kept init" / shape mismatches;
  2. every checkpoint key is consumed by the converter, except a closed
     allowlist of buffers that are recomputed on our side
     (``num_batches_tracked``, Swin ``relative_position_index``, the view
     transformer's ``dx/bx/nx`` grid constants).

A naming or shape drift in either the converter or any model module fails
here before real weights ever arrive.  The model tree is built abstractly
(``jax.eval_shape``), so the full-resolution configs cost tracing only.
"""
import json
import os
import re

import numpy as np
import pytest

import jax

from occformer_tpu.engine.convert_weights import convert_occformer, match_to_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST_DIR = os.path.join(REPO, "tests", "fixtures", "key_manifests")

# checkpoint keys the converter intentionally does not consume: torch-side
# buffers whose values are recomputed from the config on our side
_ALLOWED_UNCONSUMED = re.compile(
    r"(\.num_batches_tracked$"
    r"|\.relative_position_index$"
    r"|^img_view_transformer\.(dx|bx|nx)$)"
)


class _RecordingDict(dict):
    """Tracks which keys the converter actually reads."""

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


CONFIGS = [
    ("occformer_nusc_r50_256x704",
     "occformer_tpu/configs/occformer_nusc_r50_256x704.py"),
    ("occformer_nusc_r101_896x1600",
     "occformer_tpu/configs/occformer_nusc_r101_896x1600.py"),
    ("occformer_kitti", "occformer_tpu/configs/occformer_kitti.py"),
]


@pytest.mark.slow
@pytest.mark.parametrize("name,cfg_path", CONFIGS, ids=[c[0] for c in CONFIGS])
@pytest.mark.quick
def test_released_checkpoint_key_coverage(name, cfg_path):
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from tpu_train_trial import build_trial

    with open(os.path.join(MANIFEST_DIR, f"{name}.json")) as f:
        manifest = json.load(f)["keys"]
    assert len(manifest) > 500, "manifest implausibly small"

    sd = _RecordingDict(
        {k: np.zeros(shape, np.float32) for k, shape in manifest.items()})
    conv = convert_occformer(sd)

    # tiny point budgets: they size loss-time tensors, not the param tree
    model, batch, _, _ = build_trial(
        cfg_path, batch_size=1, max_lidar=256, num_points=64)
    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda b: model.init({"params": key, "dropout": key}, b), batch)

    _, msgs_p = match_to_tree(conv["params"], shapes["params"])
    _, msgs_s = match_to_tree(conv["batch_stats"],
                              shapes.get("batch_stats", {}))
    msgs = msgs_p + msgs_s
    assert not msgs, f"{len(msgs)} uncovered/mismatched leaves:\n" + \
        "\n".join(msgs[:40])

    unconsumed = {k for k in manifest
                  if k not in sd.consumed and not _ALLOWED_UNCONSUMED.search(k)}
    assert not unconsumed, \
        f"{len(unconsumed)} checkpoint keys dropped by the converter:\n" + \
        "\n".join(sorted(unconsumed)[:40])
