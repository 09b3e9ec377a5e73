"""Pallas trilinear-gather kernel vs the XLA reference path.

The MXU one-hot kernel (ops/trilerp.py) must match ops/sampling.py's
grid_sample_3d_cfirst (zeros padding) exactly in f32, including gradients
w.r.t. both the volume and the sampling coordinates — the deform-attn
offsets are learned, so location grads are load-bearing.  Runs the kernel in
interpret mode on CPU (SURVEY §4 implication (1)); an on-chip compiled
parity check lives in tools/bench_gather_variants.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occformer_tpu.ops.sampling import grid_sample_3d_cfirst
from occformer_tpu.ops.trilerp import (
    cfirst_to_slab,
    grid_sample_3d_cfirst_mxu,
    make_trilerp_meta,
    trilerp_gather_slab,
)

SPATIAL = (8, 8, 4)
C = 6
G = 3


def _rand(s_extra=0.0, S=57, seed=0):
    rng = np.random.RandomState(seed)
    X, Y, Z = SPATIAL
    vol = jnp.asarray(rng.randn(G, C, X * Y * Z), jnp.float32)
    # spill past [-1, 1] to exercise zeros padding + unclamped-alias paths
    coords = jnp.asarray(
        rng.uniform(-1.0 - s_extra, 1.0 + s_extra, size=(G, S, 3)), jnp.float32)
    return vol, coords


def _kernel(vol, coords):
    return grid_sample_3d_cfirst_mxu(vol, SPATIAL, coords, s_block=32,
                                     interpret=True)


def _xla(vol, coords):
    return grid_sample_3d_cfirst(vol, SPATIAL, coords, padding_mode="zeros")


@pytest.mark.quick
@pytest.mark.parametrize("spill", [0.0, 0.6])
def test_forward_matches_xla(spill):
    vol, coords = _rand(spill)
    got = np.asarray(_kernel(vol, coords))
    want = np.asarray(_xla(vol, coords))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_forward_boundary_exact_corners():
    """Sampling points exactly on voxel corners / edges of the volume."""
    X, Y, Z = SPATIAL
    rng = np.random.RandomState(1)
    vol = jnp.asarray(rng.randn(G, C, X * Y * Z), jnp.float32)
    # pixel-space corners incl. the last row/col (y0 == Y-1 alias case) and
    # half-out samples (exactly one corner in range)
    pix = np.array([
        [0.0, 0.0, 0.0],
        [X - 1.0, Y - 1.0, Z - 1.0],
        [X - 1.5, Y - 1.0, 0.5],
        [-0.5, 2.0, Z - 1.0],
        [3.0, -0.5, -0.5],
        [X - 0.5, Y - 0.5, Z - 0.5],
    ], np.float32)
    # invert the align_corners=False unnormalize: pix -> [-1, 1]
    norm = np.stack([
        (2 * pix[:, 0] + 1) / X - 1,
        (2 * pix[:, 1] + 1) / Y - 1,
        (2 * pix[:, 2] + 1) / Z - 1,
    ], axis=-1)
    coords = jnp.asarray(np.tile(norm[None], (G, 1, 1)), jnp.float32)
    got = np.asarray(_kernel(vol, coords))
    want = np.asarray(_xla(vol, coords))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_grads_match_xla():
    vol, coords = _rand(0.4, S=40, seed=2)
    probe = jnp.asarray(np.random.RandomState(3).randn(G, C, 40), jnp.float32)

    def loss(fn, v, c):
        return jnp.sum(fn(v, c) * probe)

    gv_k, gc_k = jax.grad(lambda v, c: loss(_kernel, v, c), (0, 1))(vol, coords)
    gv_x, gc_x = jax.grad(lambda v, c: loss(_xla, v, c), (0, 1))(vol, coords)
    np.testing.assert_allclose(np.asarray(gv_k), np.asarray(gv_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc_k), np.asarray(gc_x),
                               rtol=1e-4, atol=1e-4)


def test_grads_numerical_coords():
    """Finite-difference check of the coordinate gradient through the kernel."""
    vol, coords = _rand(0.0, S=5, seed=4)

    def f(c):
        return jnp.sum(jnp.sin(_kernel(vol, c)))

    g = np.asarray(jax.grad(f)(coords))
    eps = 1e-3
    rng = np.random.RandomState(5)
    for _ in range(4):
        i = (rng.randint(G), rng.randint(5), rng.randint(3))
        e = np.zeros(coords.shape, np.float32)
        e[i] = eps
        fd = (float(f(coords + e)) - float(f(coords - e))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-2, atol=2e-3)


def test_slab_layout_roundtrip():
    vol, _ = _rand()
    X, Y, Z = SPATIAL
    slab = np.asarray(cfirst_to_slab(vol, SPATIAL))
    v = np.asarray(vol).reshape(G, C, X, Y, Z)
    for g, x, y, z, c in [(0, 1, 2, 3, 4), (2, 7, 0, 1, 5), (1, 3, 7, 0, 0)]:
        assert slab[g, x * Y + y, z * C + c] == v[g, c, x, y, z]


def test_meta_pad_rows_produce_zero():
    """S not divisible by s_block: padded samples must not pollute output."""
    vol, coords = _rand(0.3, S=33, seed=6)
    got = np.asarray(grid_sample_3d_cfirst_mxu(
        vol, SPATIAL, coords, s_block=32, interpret=True))
    want = np.asarray(_xla(vol, coords))
    assert got.shape == (G, C, 33)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_meta_is_differentiable_wrt_coords():
    _, coords = _rand(S=16, seed=7)
    g = jax.grad(
        lambda c: jnp.sum(make_trilerp_meta(c, SPATIAL) ** 2))(coords)
    assert np.isfinite(np.asarray(g)).all()


def _kernel_win(vol, coords, window=32):
    return grid_sample_3d_cfirst_mxu(vol, SPATIAL, coords, s_block=32,
                                     interpret=True, window=window)


@pytest.mark.quick
@pytest.mark.parametrize("spill", [0.0, 0.6])
@pytest.mark.parametrize("window", [16, 32, 48])
def test_windowed_forward_matches_xla(spill, window):
    """Uniform-random coords make nearly every block take the escape pass —
    the windowed kernel must stay exact there too."""
    vol, coords = _rand(spill, seed=10)
    got = np.asarray(_kernel_win(vol, coords, window))
    want = np.asarray(_xla(vol, coords))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_windowed_grid_local_matches_xla():
    """Grid-ordered queries with small offsets: the windowed fast path (no
    escape) — the production regime of the deform-attn encoder."""
    X, Y, Z = SPATIAL
    rng = np.random.RandomState(11)
    vol = jnp.asarray(rng.randn(G, C, X * Y * Z), jnp.float32)
    xs = (np.arange(X) + 0.5) / X
    ys = (np.arange(Y) + 0.5) / Y
    zs = (np.arange(Z) + 0.5) / Z
    ref = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1).reshape(-1, 3)
    off = rng.uniform(-1.5, 1.5, size=(G,) + ref.shape) / np.array([X, Y, Z])
    coords = jnp.asarray((ref[None] + off) * 2.0 - 1.0, jnp.float32)
    got = np.asarray(_kernel_win(vol, coords, 32))
    want = np.asarray(_xla(vol, coords))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_windowed_grads_match_xla():
    vol, coords = _rand(0.4, S=40, seed=12)
    probe = jnp.asarray(np.random.RandomState(13).randn(G, C, 40), jnp.float32)

    def loss(fn, v, c):
        return jnp.sum(fn(v, c) * probe)

    gv_k, gc_k = jax.grad(
        lambda v, c: loss(_kernel_win, v, c), (0, 1))(vol, coords)
    gv_x, gc_x = jax.grad(lambda v, c: loss(_xla, v, c), (0, 1))(vol, coords)
    np.testing.assert_allclose(np.asarray(gv_k), np.asarray(gv_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc_k), np.asarray(gc_x),
                               rtol=1e-4, atol=1e-4)


def test_windowed_grads_grid_local():
    """Gradients through the pure windowed path (no escapes)."""
    X, Y, Z = SPATIAL
    rng = np.random.RandomState(14)
    vol = jnp.asarray(rng.randn(G, C, X * Y * Z), jnp.float32)
    xs = (np.arange(X) + 0.5) / X
    ys = (np.arange(Y) + 0.5) / Y
    zs = (np.arange(Z) + 0.5) / Z
    ref = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1).reshape(-1, 3)
    off = rng.uniform(-0.9, 0.9, size=(G,) + ref.shape) / np.array([X, Y, Z])
    coords = jnp.asarray((ref[None] + off) * 2.0 - 1.0, jnp.float32)
    probe = jnp.asarray(rng.randn(G, C, ref.shape[0]), jnp.float32)

    def loss(fn, v, c):
        return jnp.sum(fn(v, c) * probe)

    gv_k, gc_k = jax.grad(
        lambda v, c: loss(_kernel_win, v, c), (0, 1))(vol, coords)
    gv_x, gc_x = jax.grad(lambda v, c: loss(_xla, v, c), (0, 1))(vol, coords)
    np.testing.assert_allclose(np.asarray(gv_k), np.asarray(gv_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc_k), np.asarray(gc_x),
                               rtol=1e-4, atol=1e-4)


def test_bf16_table():
    vol, coords = _rand(0.2, S=48, seed=8)
    got = np.asarray(grid_sample_3d_cfirst_mxu(
        vol.astype(jnp.bfloat16), SPATIAL, coords, s_block=32,
        interpret=True)).astype(np.float32)
    want = np.asarray(_xla(vol, coords))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


# ---- border padding (loss-path semantics, round 4) --------------------------

@pytest.mark.quick
@pytest.mark.parametrize("window", [0, 32])
def test_border_padding_matches_xla(window):
    """padding_mode='border' == clamping unnormalized coords to [0, N-1]
    (per-corner index clamping of torch grid_sample).  The loss samples
    out-of-range LiDAR points with border padding
    (reference mask2former_nusc_occ.py:244-249)."""
    vol, coords = _rand(0.8, S=96, seed=7)
    got = np.asarray(trilerp_gather_slab(
        cfirst_to_slab(vol, SPATIAL), SPATIAL, C, coords, s_block=32,
        interpret=True, window=window, padding_mode="border"))
    want = np.asarray(grid_sample_3d_cfirst(
        vol, SPATIAL, coords, padding_mode="border"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_border_padding_grads_match_xla():
    vol, coords = _rand(0.8, S=64, seed=8)

    def lk(v, c):
        out = trilerp_gather_slab(cfirst_to_slab(v, SPATIAL), SPATIAL, C, c,
                                  s_block=32, interpret=True,
                                  padding_mode="border")
        return jnp.sum(jnp.sin(out))

    def lx(v, c):
        return jnp.sum(jnp.sin(grid_sample_3d_cfirst(
            v, SPATIAL, c, padding_mode="border")))

    gk = jax.grad(lk, (0, 1))(vol, coords)
    gx = jax.grad(lx, (0, 1))(vol, coords)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
