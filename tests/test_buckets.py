"""Bucket store: CSR layout round-trips ids and bucket membership."""

import numpy as np

from tpulmi.buckets import bucket_stats, build_bucket_store


def test_store_roundtrip(rng):
    n, d, c = 1000, 8, 7
    labels = rng.integers(0, c, size=n).astype(np.int32)
    data = rng.normal(size=(n, d)).astype(np.float32)
    store = build_bucket_store(labels, data, c, pad_rows=64)

    ids = np.asarray(store.ids_sorted)
    offsets = np.asarray(store.offsets)
    counts = np.asarray(store.counts)

    assert store.n == n and store.pad_rows == 64
    assert offsets[-1] == n
    np.testing.assert_array_equal(counts, np.bincount(labels, minlength=c))
    # every row of bucket b sits in [offsets[b], offsets[b+1]) and carries
    # its original id
    for b in range(c):
        seg = ids[offsets[b]: offsets[b + 1]]
        np.testing.assert_array_equal(np.sort(seg), np.where(labels == b)[0])
    # data rows are the original rows permuted
    np.testing.assert_allclose(
        np.asarray(store.data_sorted)[:n], data[ids[:n]], rtol=1e-6
    )
    # padding rows flagged
    assert (ids[n:] == -1).all()


def test_store_empty_buckets(rng):
    labels = np.zeros(50, dtype=np.int32)  # all rows in bucket 0, buckets 1..4 empty
    data = rng.normal(size=(50, 4)).astype(np.float32)
    store = build_bucket_store(labels, data, 5)
    counts = np.asarray(store.counts)
    assert counts[0] == 50 and (counts[1:] == 0).all()
    mx, mn, mean = bucket_stats(store)
    assert mx == 50 and mn == 0
