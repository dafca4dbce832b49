"""Per-host data sharding: interleaved slices of one global shuffle."""

import numpy as np

from adaptsegnet_tpu.data.pipeline import epoch_batches


def _take(it, n):
    return [next(it) for _ in range(n)]


def test_process_slices_partition_the_epoch():
    n, bs, hosts = 64, 4, 4
    per_host_batches = n // hosts // bs
    seen = []
    for p in range(hosts):
        it = epoch_batches(n, bs, shuffle=True, seed=7,
                           process_index=p, process_count=hosts)
        for b in _take(it, per_host_batches):
            seen.extend(b.tolist())
    # One epoch across all hosts covers every item exactly once.
    assert sorted(seen) == list(range(n))


def test_same_shuffle_across_hosts():
    it0 = epoch_batches(40, 2, seed=3, process_index=0, process_count=2)
    it1 = epoch_batches(40, 2, seed=3, process_index=1, process_count=2)
    a = np.concatenate(_take(it0, 10))
    b = np.concatenate(_take(it1, 10))
    assert set(a) & set(b) == set()
    assert len(set(a) | set(b)) == 40


def test_single_process_unchanged():
    a = np.concatenate(_take(epoch_batches(16, 4, seed=1), 4))
    b = np.concatenate(_take(
        epoch_batches(16, 4, seed=1, process_index=0, process_count=1), 4))
    np.testing.assert_array_equal(a, b)
