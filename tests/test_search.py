"""Probe search vs oracles.

The strongest invariant: probing ALL buckets must reproduce exact brute-force
k-NN bit-for-bit (same distances, compatible ids) — that makes the grouped,
chunked, masked pipeline verifiable without any recall slack.
"""

import numpy as np
import pytest

from tpulmi.buckets import build_bucket_store
from tpulmi.ops.distance import SENTINEL_DIST, exact_knn
from tpulmi.search import probe_search, size_class


def _setup(rng, n=3000, d=16, c=11, q=64):
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = rng.normal(size=(q, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    labels = rng.integers(0, c, size=n).astype(np.int32)
    store = build_bucket_store(labels, data, c)
    return data, queries, labels, store


def test_probe_all_equals_exact(rng):
    data, queries, labels, store = _setup(rng)
    c = store.n_categories
    # every query probes every bucket (rank order arbitrary)
    probes = np.tile(np.arange(c, dtype=np.int32), (queries.shape[0], 1))
    dists, ids = probe_search(probes, queries, store, k=10)
    want_d, want_i = exact_knn(queries, data, k=10, normalized=True)
    np.testing.assert_allclose(np.asarray(dists), np.asarray(want_d), atol=1e-5)
    # distances of the chosen ids must match (ids may swap on exact ties)
    chosen = 1.0 - np.einsum("qkd,qd->qk", data[np.asarray(ids)], queries)
    np.testing.assert_allclose(chosen, np.asarray(want_d), atol=1e-5)


def test_single_probe_matches_restricted_oracle(rng):
    data, queries, labels, store = _setup(rng)
    c = store.n_categories
    probes = rng.integers(0, c, size=(queries.shape[0], 1)).astype(np.int32)
    dists, ids = probe_search(probes, queries, store, k=5)
    dists, ids = np.asarray(dists), np.asarray(ids)
    for i in range(queries.shape[0]):
        bucket = probes[i, 0]
        members = np.where(labels == bucket)[0]
        d_all = 1.0 - data[members] @ queries[i]
        order = np.argsort(d_all, kind="stable")[:5]
        np.testing.assert_allclose(dists[i][: len(order)], d_all[order], atol=1e-5)
        assert set(ids[i][: len(order)]) <= set(members)


def test_subk_buckets_sentinel(rng):
    # 30 rows over 10 buckets: most buckets have <k members
    data, queries, labels, store = _setup(rng, n=30, c=10, q=8)
    probes = rng.integers(0, 10, size=(8, 1)).astype(np.int32)
    dists, ids = probe_search(probes, queries, store, k=10)
    dists, ids = np.asarray(dists), np.asarray(ids)
    for i in range(8):
        cnt = (labels == probes[i, 0]).sum()
        assert (ids[i, cnt:] == -1).all()
        assert (dists[i, cnt:] == SENTINEL_DIST).all()


def test_multi_probe_merge_is_sorted(rng):
    data, queries, labels, store = _setup(rng)
    probes = np.stack(
        [rng.permutation(store.n_categories)[:4] for _ in range(queries.shape[0])]
    ).astype(np.int32)
    dists, ids = probe_search(probes, queries, store, k=10)
    dists = np.asarray(dists)
    assert (np.diff(dists, axis=1) >= -1e-6).all()
    # no duplicate ids per query (buckets are disjoint)
    ids = np.asarray(ids)
    for i in range(ids.shape[0]):
        real = ids[i][ids[i] >= 0]
        assert len(set(real)) == len(real)


def test_chunking_invariance(rng):
    data, queries, labels, store = _setup(rng)
    probes = np.stack(
        [rng.permutation(store.n_categories)[:3] for _ in range(queries.shape[0])]
    ).astype(np.int32)
    d1, i1 = probe_search(probes, queries, store, k=10, data_chunk=128)
    d2, i2 = probe_search(probes, queries, store, k=10, data_chunk=1024)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)


def test_size_class():
    assert size_class(1) == 128
    assert size_class(128) == 128
    assert size_class(129) == 256
    assert size_class(1000) == 1024


def test_fetch_dtype_narrows_wire_not_ranking(synthetic_small):
    """fetch_dtype casts only the fetched distance leaf: ids must be
    bit-identical to the exact-f32 fetch, distances equal to f16 rounding,
    and the public dtype stays float32."""
    from tpulmi.index import LearnedIndex
    from tpulmi.utils.config import IndexConfig, SearchConfig

    cfg = IndexConfig(n_categories=24, epochs=6, lr=0.003, model_type="MLP-5")
    li = LearnedIndex(cfg)
    li.build(synthetic_small["data_nav"], synthetic_small["data_search"])
    qn = synthetic_small["queries_nav"][:64]
    qs = synthetic_small["queries_search"][:64]

    d_ref, i_ref = li.search(qn, qs, n_buckets=4, k=10)
    scfg = SearchConfig(k=10, n_buckets=4, fetch_dtype="float16")
    d16, i16 = li.search(qn, qs, n_buckets=4, k=10, search_config=scfg)

    np.testing.assert_array_equal(i16, i_ref)
    assert d16.dtype == np.float32
    finite = d_ref < 100.0  # skip sentinel slots (f16 rounds 10_000 coarsely)
    np.testing.assert_allclose(d16[finite], d_ref[finite], rtol=2e-3, atol=2e-3)
    # the wire values really are f16-rounded
    np.testing.assert_array_equal(
        d16[finite], d16[finite].astype(np.float16).astype(np.float32))
