"""Fused multi-level Pallas trilerp vs the per-level XLA reference.

ops/trilerp_fused.py packs all pyramid levels into one kernel call (row
concatenation + absolute corner rows in meta).  Interpret-mode parity here;
the on-chip composed check rides bench.py's kernel-parity stage and
tools/probe_trilerp_amortized.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occformer_tpu.ops.sampling import grid_sample_3d_cfirst
from occformer_tpu.ops.trilerp import cfirst_to_slab
from occformer_tpu.ops.trilerp_fused import (
    fused_multilevel_gather,
    make_meta_rows,
)

SPATIALS = [(8, 8, 4), (4, 4, 2), (2, 2, 2)]
C = 6
G = 3


def _rand(spill=0.0, S=57, seed=0):
    rng = np.random.RandomState(seed)
    vols, coords = [], []
    for (X, Y, Z) in SPATIALS:
        vols.append(jnp.asarray(rng.randn(G, C, X * Y * Z), jnp.float32))
        coords.append(jnp.asarray(
            rng.uniform(-1.0 - spill, 1.0 + spill, (G, S, 3)), jnp.float32))
    return vols, coords


def _fused(vols, coords, window=0, s_block=32):
    slabs = [cfirst_to_slab(v, s) for v, s in zip(vols, SPATIALS)]
    return fused_multilevel_gather(slabs, SPATIALS, C, coords,
                                   s_block=s_block, interpret=True,
                                   window=window)


def _xla(vols, coords):
    return [grid_sample_3d_cfirst(v, s, c, padding_mode="zeros")
            for v, s, c in zip(vols, SPATIALS, coords)]


@pytest.mark.quick
@pytest.mark.parametrize("window", [0, 32])
@pytest.mark.parametrize("spill", [0.0, 0.6])
def test_fused_forward_matches_xla(spill, window):
    vols, coords = _rand(spill)
    got = _fused(vols, coords, window)
    want = _xla(vols, coords)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_fused_grads_match_xla():
    vols, coords = _rand(0.4, S=40, seed=2)
    rng = np.random.RandomState(3)
    probes = [jnp.asarray(rng.randn(G, C, 40), jnp.float32) for _ in SPATIALS]

    def loss_fused(vs, cs):
        outs = _fused(vs, cs, window=32)
        return sum(jnp.sum(o * p) for o, p in zip(outs, probes))

    def loss_xla(vs, cs):
        outs = _xla(vs, cs)
        return sum(jnp.sum(o * p) for o, p in zip(outs, probes))

    gv_k, gc_k = jax.grad(loss_fused, (0, 1))(vols, coords)
    gv_x, gc_x = jax.grad(loss_xla, (0, 1))(vols, coords)
    for a, b in zip(gv_k + gc_k, gv_x + gc_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_unequal_sample_counts_and_padding():
    """Different S per level + S not divisible by s_block: padded samples
    and the row padding to the escape-chunk multiple must stay inert."""
    rng = np.random.RandomState(5)
    vols, coords = [], []
    for i, (X, Y, Z) in enumerate(SPATIALS):
        vols.append(jnp.asarray(rng.randn(G, C, X * Y * Z), jnp.float32))
        coords.append(jnp.asarray(
            rng.uniform(-1.3, 1.3, (G, 17 + 11 * i, 3)), jnp.float32))
    got = _fused(vols, coords, window=16)
    want = _xla(vols, coords)
    for i, (a, b) in enumerate(zip(got, want)):
        assert a.shape == (G, C, 17 + 11 * i)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_fused_grid_local_windowed():
    """Production regime: grid-ordered queries + small offsets, a window
    that never escapes on the big level and trivially covers small ones."""
    rng = np.random.RandomState(7)
    vols = [jnp.asarray(rng.randn(G, C, X * Y * Z), jnp.float32)
            for (X, Y, Z) in SPATIALS]
    coords = []
    for (X, Y, Z) in SPATIALS:
        xs = (np.arange(X) + 0.5) / X
        ys = (np.arange(Y) + 0.5) / Y
        zs = (np.arange(Z) + 0.5) / Z
        ref = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"),
                       axis=-1).reshape(-1, 3)
        off = rng.uniform(-0.9, 0.9, (G,) + ref.shape) / np.array([X, Y, Z])
        coords.append(jnp.asarray((ref[None] + off) * 2.0 - 1.0, jnp.float32))
    got = _fused(vols, coords, window=32)
    want = _xla(vols, coords)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_fused_bf16_tables():
    vols, coords = _rand(0.2, S=48, seed=8)
    got = _fused([v.astype(jnp.bfloat16) for v in vols], coords, window=32)
    want = _xla(vols, coords)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b),
                                   rtol=3e-2, atol=3e-2)


def test_meta_rows_differentiable():
    _, coords = _rand(S=16, seed=9)
    g = jax.grad(lambda c: jnp.sum(
        make_meta_rows(c, SPATIALS[0], 100) ** 2))(coords[0])
    assert np.isfinite(np.asarray(g)).all()


# ---- weighted fold (attention-weighted P-sum in-kernel, round 5) -----------

from occformer_tpu.ops.trilerp_fused import fused_multilevel_weighted_gather

P = 3


def _rand_w(spill=0.0, Sq=19, seed=0):
    rng = np.random.RandomState(seed)
    vols, coords, weights = [], [], []
    for (X, Y, Z) in SPATIALS:
        vols.append(jnp.asarray(rng.randn(G, C, X * Y * Z), jnp.float32))
        coords.append(jnp.asarray(
            rng.uniform(-1.0 - spill, 1.0 + spill, (G, Sq * P, 3)),
            jnp.float32))
        weights.append(jnp.asarray(rng.rand(G, Sq * P), jnp.float32))
    return vols, coords, weights


def _wfold(vols, coords, weights, window=0):
    slabs = [cfirst_to_slab(v, s) for v, s in zip(vols, SPATIALS)]
    return fused_multilevel_weighted_gather(
        slabs, SPATIALS, C, coords, weights, P, s_block=P * 16,
        interpret=True, window=window)


def _wfold_ref(vols, coords, weights):
    """XLA oracle: per-level gather + explicit weighted P-sum."""
    outs = []
    for v, sp, c, w in zip(vols, SPATIALS, coords, weights):
        s = grid_sample_3d_cfirst(v, sp, c, padding_mode="zeros")  # [G, C, S]
        Sq = c.shape[1] // P
        s = s.reshape(G, C, Sq, P)
        outs.append(jnp.einsum("gcqp,gqp->gcq", s,
                               w.reshape(G, Sq, P),
                               preferred_element_type=jnp.float32))
    return outs


@pytest.mark.quick
@pytest.mark.parametrize("window", [0, 32])
@pytest.mark.parametrize("spill", [0.0, 0.6])
def test_wfold_forward_matches_ref(spill, window):
    vols, coords, weights = _rand_w(spill)
    got = _wfold(vols, coords, weights, window)
    want = _wfold_ref(vols, coords, weights)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_wfold_grads_match_ref():
    """Gradients w.r.t. tables, coords AND the attention weights (softmax
    weights are learned — d_aw is load-bearing)."""
    vols, coords, weights = _rand_w(0.4, Sq=13, seed=2)
    rng = np.random.RandomState(3)
    probes = [jnp.asarray(rng.randn(G, C, 13), jnp.float32) for _ in SPATIALS]

    def loss(fn, vs, cs, ws):
        return sum(jnp.sum(o * p) for o, p in zip(fn(vs, cs, ws), probes))

    gk = jax.grad(lambda *a: loss(lambda v, c, w: _wfold(v, c, w, 32), *a),
                  (0, 1, 2))(vols, coords, weights)
    gx = jax.grad(lambda *a: loss(_wfold_ref, *a), (0, 1, 2))(vols, coords,
                                                              weights)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_wfold_sample_padding_inert():
    """Sq*P not divisible by s_block: padded samples carry zero weight and
    the per-query output rows line up after trimming."""
    vols, coords, weights = _rand_w(0.2, Sq=7, seed=5)  # 21 % 48 != 0
    got = _wfold(vols, coords, weights, window=16)
    want = _wfold_ref(vols, coords, weights)
    for a, b in zip(got, want):
        assert a.shape == (G, C, 7)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
