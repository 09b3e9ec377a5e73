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


def test_subm_gather_matches_dense(rng):
    """The gather-GEMM backend is numerically identical to the densify
    bridge (same param tree — checkpoints swap between backends)."""
    grid = (7, 6, 5)
    feats, coords, valid = _sites(rng, 22, grid, 40)
    dense_m = SubMConv3d(features=8, use_bias=True)
    gather_m = SubMConv3d(features=8, use_bias=True, backend="gather")
    p = dense_m.init(jax.random.PRNGKey(0), feats, coords, valid, grid)
    out_d, _, _ = dense_m.apply(p, feats, coords, valid, grid)
    out_g, oc, ov = gather_m.apply(p, feats, coords, valid, grid)
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(valid))
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_d),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride,kernel", [(2, 3), (1, 3), (2, 2)])
def test_strided_gather_matches_dense(rng, stride, kernel):
    """Strided gather backend: same active set (every output cell whose
    receptive field contains an active input, lowest-lin-first on overflow)
    and same features as the dense path, compared as lin->feature maps."""
    grid = (8, 8, 6)
    feats, coords, valid = _sites(rng, 25, grid, 64)
    mk = dict(features=6, stride=stride, kernel_size=kernel, max_out_sites=128)
    dense_m = SparseConv3d(**mk)
    gather_m = SparseConv3d(**mk, backend="gather")
    p = dense_m.init(jax.random.PRNGKey(0), feats, coords, valid, grid)
    out_d, oc_d, ov_d, og_d = dense_m.apply(p, feats, coords, valid, grid)
    out_g, oc_g, ov_g, og_g = gather_m.apply(p, feats, coords, valid, grid)
    assert og_d == og_g

    def as_map(out, oc, ov, og):
        out, oc, ov = map(np.asarray, (out, oc, ov))
        lin = (oc[:, 0] * og[1] + oc[:, 1]) * og[2] + oc[:, 2]
        return {int(l): out[i] for i, l in enumerate(lin) if ov[i]}

    md = as_map(out_d, oc_d, ov_d, og_d)
    mg = as_map(out_g, oc_g, ov_g, og_g)
    assert set(md) == set(mg)
    assert md  # non-degenerate
    for l in md:
        np.testing.assert_allclose(mg[l], md[l], rtol=1e-5, atol=1e-5,
                                   err_msg=f"cell {l}")


def test_subm_gather_matches_dense_bf16(rng):
    """Production dtype: both backends agree in bf16 too (tap-sum order
    differs, so tolerance is bf16-scale)."""
    grid = (7, 6, 5)
    feats, coords, valid = _sites(rng, 22, grid, 40)
    feats = feats.astype(jnp.bfloat16)
    dense_m = SubMConv3d(features=8, dtype=jnp.bfloat16)
    gather_m = SubMConv3d(features=8, dtype=jnp.bfloat16, backend="gather")
    p = dense_m.init(jax.random.PRNGKey(0), feats, coords, valid, grid)
    out_d, _, _ = dense_m.apply(p, feats, coords, valid, grid)
    out_g, _, _ = gather_m.apply(p, feats, coords, valid, grid)
    np.testing.assert_allclose(
        np.asarray(out_g, np.float32), np.asarray(out_d, np.float32),
        rtol=0.05, atol=0.05)


def test_subm_gather_precomputed_neighbor_table(rng):
    """A shared neighbor table (spconv indice-pair reuse) gives identical
    results to the internal rebuild."""
    from occformer_tpu.ops.spconv import build_neighbor_table

    grid = (7, 6, 5)
    feats, coords, valid = _sites(rng, 22, grid, 40)
    m = SubMConv3d(features=8, backend="gather")
    p = m.init(jax.random.PRNGKey(0), feats, coords, valid, grid)
    table = build_neighbor_table(coords, valid, grid, 3)
    out_a, _, _ = m.apply(p, feats, coords, valid, grid)
    out_b, _, _ = m.apply(p, feats, coords, valid, grid, nbr=table)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_strided_gather_capacity_overflow_keeps_lowest_lin(rng):
    grid = (8, 8, 6)
    feats, coords, valid = _sites(rng, 40, grid, 64)
    cap = 5
    mk = dict(features=4, stride=2, max_out_sites=cap)
    dense_m = SparseConv3d(**mk)
    gather_m = SparseConv3d(**mk, backend="gather")
    p = dense_m.init(jax.random.PRNGKey(0), feats, coords, valid, grid)
    _, oc_d, ov_d, og = dense_m.apply(p, feats, coords, valid, grid)
    _, oc_g, ov_g, _ = gather_m.apply(p, feats, coords, valid, grid)
    assert np.asarray(ov_d).sum() == np.asarray(ov_g).sum() == cap

    def lins(oc, ov):
        oc = np.asarray(oc)[np.asarray(ov)]
        return sorted((oc[:, 0] * og[1] + oc[:, 1]) * og[2] + oc[:, 2])

    assert lins(oc_d, ov_d) == lins(oc_g, ov_g)


def test_gather_backend_large_grid_and_grads(rng):
    """SECOND-scale grid: the gather backend never materializes the dense
    volume, so a 41x160x140 grid (dense path: ~3.7M-cell intermediates per
    layer) runs at active-set cost; gradients flow and are finite."""
    grid = (41, 160, 140)
    feats, coords, valid = _sites(rng, 1500, grid, 2048)
    subm = SubMConv3d(features=8, backend="gather")
    down = SparseConv3d(features=8, stride=2, max_out_sites=2048,
                        backend="gather")
    p1 = subm.init(jax.random.PRNGKey(0), feats, coords, valid, grid)
    out1, _, _ = subm.apply(p1, feats, coords, valid, grid)
    p2 = down.init(jax.random.PRNGKey(1), out1, coords, valid, grid)

    def total(f):
        o1, c1, v1 = subm.apply(p1, f, coords, valid, grid)
        o2, _, v2, _ = down.apply(p2, o1, c1, v1, grid)
        return jnp.sum(o2 ** 2)

    g = jax.grad(total)(feats)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
    assert np.isfinite(np.asarray(out1)).all()


def test_subm_gather_vmap_batched(rng):
    """Batched (SECOND-style) usage: vmap over per-sample active sets gives
    the same per-sample results as individual applies."""
    grid = (6, 6, 4)
    per = [_sites(np.random.RandomState(s), 12, grid, 24) for s in (1, 2, 3)]
    feats = jnp.stack([p[0] for p in per])
    coords = jnp.stack([p[1] for p in per])
    valid = jnp.stack([p[2] for p in per])
    m = SubMConv3d(features=8, backend="gather")
    p0 = m.init(jax.random.PRNGKey(0), feats[0], coords[0], valid[0], grid)
    batched = jax.vmap(
        lambda f, c, v: m.apply(p0, f, c, v, grid)[0])(feats, coords, valid)
    for i in range(3):
        single, _, _ = m.apply(p0, feats[i], coords[i], valid[i], grid)
        np.testing.assert_allclose(np.asarray(batched[i]), np.asarray(single),
                                   rtol=1e-6, atol=1e-6)


def test_assign_score_withk(rng):
    B, N, K, M, C = 2, 5, 3, 4, 6
    scores = jnp.asarray(rng.rand(B, N, K, M).astype(np.float32))
    pf = jnp.asarray(rng.randn(B, N, K, M, C).astype(np.float32))
    cf = jnp.asarray(rng.randn(B, N, K, M, C).astype(np.float32))
    out = np.asarray(assign_score_withk(scores, pf, cf))
    ref = (np.asarray(scores)[..., None] * (np.asarray(pf) - np.asarray(cf))).sum(3)
    np.testing.assert_allclose(out, ref, rtol=1e-5)
