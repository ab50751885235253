"""Guard-rail coverage (ADVICE r1): misaligned stores must be rejected by
the Pallas path, k beyond the lane width must error, sharding must survive
pad_rows=0 and row_align>1 stores, and the qpb_pad overflow-retry branch of
LearnedIndex.search must actually fire under skewed routing."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpulmi.buckets import build_bucket_store
from tpulmi.index import LearnedIndex
from tpulmi.ops.pallas_topk import pallas_probe_search
from tpulmi.parallel.mesh import make_mesh
from tpulmi.parallel.sharded import shard_store, sharded_probe_search
from tpulmi.search import probe_search
from tpulmi.utils.config import IndexConfig, SearchConfig


def _store(rng, n=1000, d=128, c=7, row_align=1, pad_rows=256):
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    labels = rng.integers(0, c, size=n).astype(np.int32)
    return data, labels, build_bucket_store(
        labels, data, c, pad_rows=pad_rows, row_align=row_align
    )


def test_pallas_rejects_unaligned_store(rng):
    """row_align=1 stores (even with a coincidentally block-divisible total
    row count) must be rejected: block index maps would floor offsets into
    the preceding bucket."""
    # n + pad_rows = 1000 + 24 = 1024 — divisible by mc=256, but unaligned
    data, labels, store = _store(rng, n=1000, row_align=1, pad_rows=24)
    assert store.data_sorted.shape[0] % 256 == 0
    probes = np.zeros((8, 1), np.int32)
    queries = data[:8]
    with pytest.raises(ValueError, match="row_align"):
        pallas_probe_search(
            jnp.asarray(probes), jnp.asarray(queries), store,
            k=10, qc=128, mc=256, max_chunks=1, interpret=True,
        )


def test_pallas_rejects_partial_alignment(rng):
    """row_align smaller than mc (e.g. 256-aligned store, 512 blocks) is
    exactly the silent-corruption case from ADVICE r1 — must raise."""
    data, labels, store = _store(rng, n=1000, row_align=256)
    with pytest.raises(ValueError, match="row_align"):
        pallas_probe_search(
            jnp.zeros((8, 1), jnp.int32), jnp.asarray(data[:8]), store,
            k=10, qc=128, mc=512, max_chunks=1, interpret=True,
        )


def test_pallas_rejects_k_beyond_lane(rng):
    data, labels, store = _store(rng, n=1000, row_align=256)
    with pytest.raises(ValueError, match="128"):
        pallas_probe_search(
            jnp.zeros((8, 1), jnp.int32), jnp.asarray(data[:8]), store,
            k=129, qc=128, mc=256, max_chunks=1, interpret=True,
        )


def test_sharded_search_zero_pad_rows(rng):
    """A source store built with pad_rows=0 must not crash the sharded
    path's chunk-size clamp (ADVICE r1: ZeroDivisionError)."""
    data, labels, store = _store(rng, n=800, d=16, c=8, pad_rows=0)
    sstore = shard_store(store, 4)
    mesh = make_mesh(4, ("buckets",))
    probes = np.stack([np.random.default_rng(i).permutation(8)[:3]
                       for i in range(16)]).astype(np.int32)
    queries = data[:16]
    d_shard, i_shard = sharded_probe_search(probes, queries, sstore, mesh, k=5)
    d_single, _ = probe_search(probes, queries, store, k=5)
    np.testing.assert_allclose(np.asarray(d_shard), np.asarray(d_single),
                               atol=1e-5)


def test_sharded_search_row_aligned_store(rng):
    """Stores built with row_align>1 have gap-padded offsets; the shard
    local CSR must rebase those offsets, not recompute them from counts."""
    data, labels, store = _store(rng, n=900, d=16, c=9, row_align=64)
    assert store.row_align == 64
    sstore = shard_store(store, 4)
    assert sstore.row_align == 64
    mesh = make_mesh(4, ("buckets",))
    probes = np.stack([np.random.default_rng(i).permutation(9)[:4]
                       for i in range(16)]).astype(np.int32)
    queries = data[:16]
    d_shard, i_shard = sharded_probe_search(probes, queries, sstore, mesh, k=5)
    d_single, _ = probe_search(probes, queries, store, k=5)
    np.testing.assert_allclose(np.asarray(d_shard), np.asarray(d_single),
                               atol=1e-5)


def test_qpb_pad_overflow_retry(rng):
    """Skewed routing (every query picks the same buckets) must overflow the
    initial 4x-mean qpb_pad guess and take the re-pad branch of
    LearnedIndex.search (`tpulmi/index.py`), ending with a validated pad and
    correct results."""
    n, d, c, q = 4000, 24, 122, 256
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    li = LearnedIndex(IndexConfig(
        n_categories=c, epochs=2, lr=0.003, batch_size=512, row_align=1,
    ))
    li.build(data, data)

    # identical queries -> all q*2 slots land on the same 2 buckets
    one = rng.normal(size=(1, d)).astype(np.float32)
    queries = np.repeat(one, q, axis=0)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    scfg = SearchConfig(k=5, n_buckets=2, backend="xla")

    # the initial guess for this shape must be smaller than the true
    # max_slots=q so the overflow branch is exercised
    guess = min(q * 2, max(4 * q * 2 // c, 128))
    assert guess < q
    dists, ids = li.search(queries, queries, n_buckets=2, k=5,
                           search_config=scfg)
    # branch taken: the validated pad exceeds the initial guess
    assert li._qpb_pads[(q, 2)] >= q
    # and the results are right: every row of the identical queries agrees
    np.testing.assert_allclose(dists, np.repeat(dists[:1], q, axis=0),
                               atol=1e-5)
    d_ref, i_ref = li.search(queries[:1], queries[:1], n_buckets=2, k=5,
                             search_config=scfg)
    np.testing.assert_allclose(dists[:1], d_ref, atol=1e-5)
    np.testing.assert_array_equal(ids[:1], i_ref)


def test_tail_clamp_no_duplicates(rng):
    """A tail bucket larger than data_chunk in a store with no pad slack:
    the clamped last chunk re-covers rows of earlier chunks, and the mask
    must exclude them — duplicates in the top-k displace true neighbors
    (round-2 review finding, reproduced)."""
    from tpulmi.ops.distance import exact_knn

    n, d, c = 3100, 32, 2
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    # bucket 0 tiny, bucket 1 huge (3000 rows) at the store tail
    labels = np.concatenate([
        np.zeros(100, np.int32), np.ones(3000, np.int32)
    ])
    store = build_bucket_store(labels, data, c, pad_rows=0)
    queries = data[:8]
    probes = np.full((8, 2), 0, np.int32)
    probes[:, 1] = 1  # probe both buckets = exact search
    d_got, i_got = probe_search(probes, queries, store, k=10,
                                data_chunk=2048)
    i_got = np.asarray(i_got)
    for i in range(8):
        assert len(set(i_got[i].tolist())) == 10, f"duplicate ids: {i_got[i]}"
    want_d, want_i = exact_knn(queries, data, k=10, normalized=True)
    np.testing.assert_array_equal(i_got, np.asarray(want_i))
