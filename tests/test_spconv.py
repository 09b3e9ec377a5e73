"""Sparse-conv formulation tests: submanifold masking, strided active-set,
densify/sparsify round trip, PAConv assembly."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occformer_tpu.ops.spconv import (
    SparseConv3d,
    SubMConv3d,
    assign_score_withk,
    densify,
    sparse_max_pool,
    sparsify,
)


def _sites(rng, n, grid, cap):
    coords = np.stack([rng.randint(0, g, cap) for g in grid], -1).astype(np.int32)
    # dedupe to honor the unique-coords contract
    lin = (coords[:, 0] * grid[1] + coords[:, 1]) * grid[2] + coords[:, 2]
    _, first = np.unique(lin, return_index=True)
    valid = np.zeros(cap, bool)
    valid[first[:n]] = True
    feats = rng.randn(cap, 4).astype(np.float32) * valid[:, None]
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid)


def test_densify_sparsify_roundtrip(rng):
    grid = (6, 6, 4)
    feats, coords, valid = _sites(rng, 20, grid, 32)
    dense = densify(feats, coords, valid, grid)
    back = sparsify(dense, coords, valid)
    np.testing.assert_allclose(np.asarray(back), np.asarray(feats), atol=1e-6)
    assert float(jnp.sum(jnp.any(dense != 0, -1))) <= 20


def test_subm_conv_preserves_active_set(rng):
    grid = (6, 6, 4)
    feats, coords, valid = _sites(rng, 15, grid, 32)
    m = SubMConv3d(features=8)
    p = m.init(jax.random.PRNGKey(0), feats, coords, valid, grid)
    out, oc, ov = m.apply(p, feats, coords, valid, grid)
    assert out.shape == (32, 8)
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(valid))
    # invalid slots produce zeros
    assert float(jnp.abs(out[~valid]).sum()) == 0.0


def test_sparse_conv_stride_downsamples(rng):
    grid = (8, 8, 4)
    feats, coords, valid = _sites(rng, 25, grid, 64)
    m = SparseConv3d(features=6, stride=2, max_out_sites=128)
    p = m.init(jax.random.PRNGKey(0), feats, coords, valid, grid)
    out, oc, ov, og = m.apply(p, feats, coords, valid, grid)
    assert og == (4, 4, 2)
    assert out.shape == (32, 6)  # capacity caps at the output cell count
    # every valid output coord is within the new grid
    oc = np.asarray(oc)[np.asarray(ov)]
    assert (oc >= 0).all() and (oc < np.array(og)).all()


def test_sparse_max_pool(rng):
    grid = (4, 4, 2)
    feats, coords, valid = _sites(rng, 10, grid, 16)
    out, oc, ov, og = sparse_max_pool(feats, coords, valid, grid, 2, 2)
    assert og == (2, 2, 1)
    assert out.shape == feats.shape


def test_assign_score_withk(rng):
    B, N, K, M, C = 2, 5, 3, 4, 6
    scores = jnp.asarray(rng.rand(B, N, K, M).astype(np.float32))
    pf = jnp.asarray(rng.randn(B, N, K, M, C).astype(np.float32))
    cf = jnp.asarray(rng.randn(B, N, K, M, C).astype(np.float32))
    out = np.asarray(assign_score_withk(scores, pf, cf))
    ref = (np.asarray(scores)[..., None] * (np.asarray(pf) - np.asarray(cf))).sum(3)
    np.testing.assert_allclose(out, ref, rtol=1e-5)
