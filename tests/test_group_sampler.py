"""Group-aware sampling (DistributedGroupSampler parity, VERDICT r1 missing #4).

Reference: datasets/samplers/group_sampler.py:14-77 (GroupSampler) and
:80-150 (DistributedGroupSampler) — batches are drawn within an
aspect-ratio ``flag`` group, groups padded to a multiple of
``samples_per_gpu * num_replicas``, and indices dealt across ranks so every
rank runs the same number of steps.
"""
import numpy as np
import pytest

from occformer_tpu.data.loader import ShardedLoader, build_dataloader


class FlaggedDS:
    """Tiny dataset with a reference-style per-sample ``flag`` attribute."""

    def __init__(self, flags):
        self.flag = np.asarray(flags)

    def __len__(self):
        return len(self.flag)

    def __getitem__(self, i):
        return {"idx": int(i)}


def _collate(samples, rng=None):
    return {"idx": np.array([s["idx"] for s in samples])}


def _host_batches(flags, batch_size, num_hosts, host_id, seed=0, epoch=0):
    loader = ShardedLoader(
        FlaggedDS(flags), batch_size=batch_size, shuffle=True, seed=seed,
        num_hosts=num_hosts, host_id=host_id, collate_fn=_collate)
    loader.set_epoch(epoch)
    batches = list(loader)
    assert len(batches) == len(loader)
    return batches


FLAGS = [0] * 7 + [1] * 5  # uneven groups, neither divisible by bs*nh


@pytest.mark.quick
def test_batches_are_group_pure():
    flags = np.asarray(FLAGS)
    for host in range(2):
        for b in _host_batches(FLAGS, batch_size=2, num_hosts=2, host_id=host):
            groups = flags[b["idx"]]
            assert (groups == groups[0]).all(), b["idx"]


def test_equal_step_counts_and_padding():
    a = _host_batches(FLAGS, batch_size=2, num_hosts=2, host_id=0)
    b = _host_batches(FLAGS, batch_size=2, num_hosts=2, host_id=1)
    # group 0: ceil(7/4)*4 = 8 -> 4 units; group 1: ceil(5/4)*4 = 8 -> 4
    # units; 8 units dealt over 2 hosts -> 4 batches each
    assert len(a) == len(b) == 4
    # shards are disjoint in units and together cover every sample at least
    # once (padding duplicates only, never drops)
    seen = np.concatenate([x["idx"] for x in a + b])
    assert set(seen) == set(range(len(FLAGS)))


def test_epoch_reshuffles_and_seed_reproduces():
    a0 = _host_batches(FLAGS, 2, 1, 0, seed=3, epoch=0)
    a0b = _host_batches(FLAGS, 2, 1, 0, seed=3, epoch=0)
    a1 = _host_batches(FLAGS, 2, 1, 0, seed=3, epoch=1)
    flat = lambda bs: np.concatenate([b["idx"] for b in bs])
    np.testing.assert_array_equal(flat(a0), flat(a0b))
    assert not np.array_equal(flat(a0), flat(a1))


def test_single_group_degenerates_to_plain_shuffle_lengths():
    # one group, divisible sizes: same step count as the ungrouped loader
    flags = [0] * 8
    grouped = ShardedLoader(FlaggedDS(flags), batch_size=2, shuffle=True,
                            num_hosts=2, host_id=0, collate_fn=_collate)
    plain = ShardedLoader(FlaggedDS(flags), batch_size=2, shuffle=True,
                          num_hosts=2, host_id=0, collate_fn=_collate,
                          group_flags=None)
    plain.group_flags = None  # force the ungrouped path
    assert len(grouped) == len(plain) == 2


def test_eval_path_ignores_flags():
    # ordered evaluation must cover each sample exactly once, no padding
    loader = ShardedLoader(FlaggedDS(FLAGS), batch_size=2, shuffle=False,
                           drop_last=False, collate_fn=_collate)
    seen = np.concatenate([b["idx"] for b in loader])
    np.testing.assert_array_equal(np.sort(seen), np.arange(len(FLAGS)))


def test_build_dataloader_picks_up_dataset_flag():
    dl = build_dataloader(FlaggedDS(FLAGS), samples_per_gpu=2, shuffle=True)
    assert dl.group_flags is not None
    dl2 = build_dataloader(FlaggedDS(FLAGS), samples_per_gpu=2, shuffle=True,
                           group_flags=np.zeros(len(FLAGS), np.int64))
    assert (dl2.group_flags == 0).all()


def test_flag_length_mismatch_raises():
    with pytest.raises(AssertionError):
        ShardedLoader(FlaggedDS(FLAGS), batch_size=2,
                      group_flags=np.zeros(3, np.int64))
