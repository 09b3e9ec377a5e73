"""Native C++ kernels vs numpy implementations (golden parity)."""
import numpy as np
import pytest

from occformer_tpu.data.native import (
    build_native,
    get_lib,
    majority_vote_native,
    unpack_bits_native,
    zbuffer_depth_native,
)
from occformer_tpu.data.voxelize import majority_vote_voxelize


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable (g++ build failed)")
    return lib


@pytest.mark.quick
def test_native_majority_vote_matches_numpy(lib, rng):
    grid = (8, 8, 4)
    pcr = [-4, -4, -2, 4, 4, 2]
    pts = rng.uniform(-4, 4, size=(2000, 3)).astype(np.float32)
    labels = rng.randint(0, 20, 2000)
    ref = majority_vote_voxelize(pts, labels, grid, pcr, empty_id=17)

    # replicate the quantization, feed the native kernel
    gs = np.asarray(grid)
    vs = (np.asarray(pcr[3:], np.float64) - np.asarray(pcr[:3], np.float64)) / gs
    p = np.clip(pts, np.asarray(pcr[:3]), np.asarray(pcr[3:]) - 1e-5)
    idx = np.floor((p - np.asarray(pcr[:3])) / vs).astype(np.int64)
    flat = (idx[:, 0] * gs[1] + idx[:, 1]) * gs[2] + idx[:, 2]
    out = majority_vote_native(flat, labels, int(np.prod(gs)), 17)
    np.testing.assert_array_equal(out.reshape(grid), ref.astype(np.int64))


def test_native_majority_vote_suppress_zero(lib):
    # voxel 0: labels [0, 0, 5] -> 5 wins under suppression
    # voxel 1: labels [0] -> stays 0 (alone)
    flat = np.array([0, 0, 0, 1], np.int64)
    labels = np.array([0, 0, 5, 0], np.int64)
    out = majority_vote_native(flat, labels, 4, empty_id=9, suppress_zero=True)
    np.testing.assert_array_equal(out, [5, 0, 9, 9])


def test_native_zbuffer_nearest_wins(lib):
    u = np.array([1, 1, 2], np.int32)
    v = np.array([0, 0, 1], np.int32)
    d = np.array([5.0, 2.0, 7.0], np.float32)
    valid = np.ones(3, np.uint8)
    depth = zbuffer_depth_native(u, v, d, valid, 2, 4)
    assert depth[0, 1] == 2.0  # nearest of the two returns
    assert depth[1, 2] == 7.0
    assert depth[0, 0] == 0.0


def test_native_bit_unpack_matches_numpy(lib, rng):
    data = rng.randint(0, 256, 64).astype(np.uint8)
    ours = unpack_bits_native(data)
    ref = np.unpackbits(data)
    np.testing.assert_array_equal(ours, ref)
