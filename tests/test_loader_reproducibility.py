"""End-to-end loader reproducibility (VERDICT r1 weak #7).

The reference seeds each dataloader worker (worker_init_fn,
datasets/builder.py:96-101) so runs are reproducible given --seed.  Here the
collation-time randomness (LiDAR overflow subsampling in pad_points) is
sample-addressed: RandomState(seed, epoch, first dataset index), so two
loaders with the same seed yield bit-identical batches and the draw for a
sample does not depend on host count or step order.
"""
import numpy as np
import pytest

from occformer_tpu.data.loader import ShardedLoader, pad_points


class PointsDS:
    """Each sample carries more points than max_points -> subsampling fires."""

    def __init__(self, n=6):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        r = np.random.RandomState(7000 + i)  # deterministic raw sample
        P = 200
        pts = np.concatenate(
            [r.rand(P, 3).astype(np.float32) * 10,
             r.randint(1, 5, (P, 1)).astype(np.float32)], axis=1)
        return {
            "imgs": r.rand(2, 4, 4, 3).astype(np.float32),
            "rots": np.tile(np.eye(3, dtype=np.float32), (2, 1, 1)),
            "trans": np.zeros((2, 3), np.float32),
            "intrins": np.tile(np.eye(3, dtype=np.float32), (2, 1, 1)),
            "post_rots": np.tile(np.eye(3, dtype=np.float32), (2, 1, 1)),
            "post_trans": np.zeros((2, 3), np.float32),
            "bda": np.eye(3, dtype=np.float32),
            "points_occ": pts,
            "pc_range": np.array([0, 0, 0, 10, 10, 10], np.float32),
        }


def _batches(seed, epoch=0, shuffle=True):
    loader = ShardedLoader(PointsDS(), batch_size=2, shuffle=shuffle,
                           seed=seed, max_points=100)
    loader.set_epoch(epoch)
    return list(loader)


@pytest.mark.quick
def test_same_seed_identical_batches():
    a = _batches(seed=3)
    b = _batches(seed=3)
    assert len(a) == len(b) > 0
    for ba, bb in zip(a, b):
        assert set(ba) == set(bb)
        for k in ba:
            if k == "_meta":
                assert ba[k] == bb[k]
            else:
                np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)


def test_subsampling_is_seed_and_epoch_dependent():
    a = _batches(seed=3, shuffle=False)
    b = _batches(seed=4, shuffle=False)
    # same sample order (no shuffle) but different collation seed -> the
    # 200->100 point subsample differs
    assert not np.array_equal(a[0]["lidar_xyz"], b[0]["lidar_xyz"])
    c = _batches(seed=3, epoch=1, shuffle=False)
    assert not np.array_equal(a[0]["lidar_xyz"], c[0]["lidar_xyz"])


def test_pad_points_explicit_rng():
    pts = np.random.RandomState(0).rand(50, 4).astype(np.float32)
    o1, v1 = pad_points(pts, 20, rng=np.random.RandomState(5))
    o2, v2 = pad_points(pts, 20, rng=np.random.RandomState(5))
    np.testing.assert_array_equal(o1, o2)
    assert v1.all() and v2.all()


def test_custom_single_arg_collate_fn_still_works():
    loader = ShardedLoader(PointsDS(), batch_size=2, shuffle=False,
                           collate_fn=lambda samples: {"n": len(samples)})
    out = list(loader)
    assert all(b == {"n": 2} for b in out)
