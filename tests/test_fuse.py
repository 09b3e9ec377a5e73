"""Conv+BN fusion (engine/fuse.py): exact-output transform.

Reference tools/misc/fuse_conv_bn.py folds BN into Conv2d and swaps BN for
Identity; our tree transform must leave EVAL-mode outputs bit-close (fp32
rounding only) while making every fused BN an exact add.
"""
import jax
import numpy as np
import pytest

from occformer_tpu.engine.fuse import fuse_conv_bn
from occformer_tpu.models.resnet import ResNet


@pytest.mark.quick
def test_resnet_fused_outputs_match():
    model = ResNet(depth=18, out_indices=(0, 1, 2, 3))
    x = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    # non-trivial BN stats (fresh init is mean=0/var=1 which fuses to a
    # no-op; pretend one training epoch happened)
    r = np.random.RandomState(1)
    variables = jax.tree_util.tree_map_with_path(
        lambda p, v: (r.rand(*v.shape).astype(np.float32) + 0.5
                      if "var" in jax.tree_util.keystr(p)
                      else r.randn(*v.shape).astype(np.float32) * 0.1
                      if "mean" in jax.tree_util.keystr(p) else v),
        dict(variables))

    ref = model.apply(variables, x)
    fused, pairs, unpaired = fuse_conv_bn(variables)
    # ResNet-18: stem + 8 blocks x 2 convs + 3 downsamples = 20 pairs
    assert len(pairs) == 20, pairs
    out = model.apply(fused, x)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    # every fused BN is an exact add now
    for key, bn in fused["params"].items():
        if key.startswith("bn") or "bn" in key:
            np.testing.assert_array_equal(
                bn["BatchNorm_0"]["scale"],
                np.ones_like(bn["BatchNorm_0"]["scale"]))


def test_unpaired_modules_untouched():
    variables = {
        "params": {"convX": {"Conv_0": {"kernel": np.ones((3, 3, 4, 8),
                                                          np.float32)}},
                   "lonely_bn": {"BatchNorm_0": {
                       "scale": np.ones(8, np.float32),
                       "bias": np.zeros(8, np.float32)}}},
        "batch_stats": {"lonely_bn": {"BatchNorm_0": {
            "mean": np.zeros(8, np.float32),
            "var": np.ones(8, np.float32)}}},
    }
    fused, pairs, unpaired = fuse_conv_bn(variables)
    assert pairs == []
    np.testing.assert_array_equal(
        fused["params"]["convX"]["Conv_0"]["kernel"],
        variables["params"]["convX"]["Conv_0"]["kernel"])
