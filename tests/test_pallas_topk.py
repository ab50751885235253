"""Pallas fused probe kernel vs the XLA reference pipeline (interpret mode
on CPU; the same kernel compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpulmi.buckets import build_bucket_store
from tpulmi.ops.distance import exact_knn
from tpulmi.ops.pallas_topk import pallas_probe_search
from tpulmi.search import probe_search


def _setup(rng, n=4000, d=128, c=13, q=64, mc=256):
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = rng.normal(size=(q, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    labels = rng.integers(0, c, size=n).astype(np.int32)
    store = build_bucket_store(labels, data, c, pad_rows=mc, row_align=mc)
    return data, queries, labels, store


@pytest.mark.parametrize("n_probes", [1, 3])
def test_pallas_matches_xla(rng, n_probes):
    data, queries, labels, store = _setup(rng)
    c = store.n_categories
    probes = np.stack(
        [rng.permutation(c)[:n_probes] for _ in range(queries.shape[0])]
    ).astype(np.int32)
    max_bucket = int(np.asarray(store.counts).max())
    mc = 256
    d_p, i_p, ms = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store,
        k=10, qc=128, mc=mc, max_chunks=-(-max_bucket // mc),
        compute_dtype=jnp.float32, interpret=True,
    )
    d_x, i_x = probe_search(probes, queries, store, k=10, data_chunk=mc)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=1e-5)
    # id sets must match wherever distances are unique
    assert (np.asarray(i_p) == np.asarray(i_x)).mean() > 0.99


def test_pallas_probe_all_equals_exact(rng):
    data, queries, labels, store = _setup(rng, n=2000, c=7, q=32)
    probes = np.tile(np.arange(7, dtype=np.int32), (32, 1))
    max_bucket = int(np.asarray(store.counts).max())
    d_p, i_p, _ = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store,
        k=10, qc=128, mc=256, max_chunks=-(-max_bucket // 256),
        compute_dtype=jnp.float32, interpret=True,
    )
    want_d, _ = exact_knn(queries, data, k=10, normalized=True)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(want_d), atol=1e-5)
    chosen = 1.0 - np.einsum("qkd,qd->qk", data[np.asarray(i_p)], queries)
    np.testing.assert_allclose(chosen, np.asarray(want_d), atol=1e-5)


def test_pallas_subk_sentinels(rng):
    # tiny buckets: fewer than k rows probed -> sentinel rows with id -1
    data, queries, labels, store = _setup(rng, n=40, c=10, q=8)
    probes = rng.integers(0, 10, size=(8, 1)).astype(np.int32)
    d_p, i_p, _ = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store,
        k=10, qc=128, mc=256, max_chunks=1,
        compute_dtype=jnp.float32, interpret=True,
    )
    d_p, i_p = np.asarray(d_p), np.asarray(i_p)
    for i in range(8):
        cnt = (labels == probes[i, 0]).sum()
        assert (i_p[i, cnt:] == -1).all()


def test_pallas_int8_queries_matches_xla(rng):
    """int8_queries runs the matmul int8 x int8 -> int32 with the query's
    scale factored out of the kernel. Feeding the XLA quantized pipeline the
    DEQUANTIZED quantized queries reproduces the kernel's exact operands, so
    distances must agree to f32 rounding and the id sets must match."""
    from tpulmi.ops.quantize import quantize_store

    data, queries, labels, store = _setup(rng, mc=1024)
    store_q = quantize_store(store)
    c = store_q.n_categories
    probes = np.stack(
        [rng.permutation(c)[:3] for _ in range(queries.shape[0])]
    ).astype(np.int32)
    d_p, i_p, _ = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store_q,
        k=10, qc=128, mc=1024, max_chunks=1,
        compute_dtype=jnp.float32, int8_queries=True, interpret=True,
    )
    qs = np.maximum(np.abs(queries).max(axis=1), 1e-12)
    qcodes = np.clip(np.round(queries / qs[:, None] * 127.0), -127, 127)
    q_dq = (qcodes * (qs[:, None] / 127.0)).astype(np.float32)
    d_x, i_x = probe_search(probes, q_dq, store_q, k=10, data_chunk=1024)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=1e-4)
    assert (np.asarray(i_p) == np.asarray(i_x)).mean() > 0.99
    # and the int8-query ranking stays close to the full-precision one
    d_f, i_f, _ = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store_q,
        k=10, qc=128, mc=1024, max_chunks=1,
        compute_dtype=jnp.float32, interpret=True,
    )
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10.0
        for a, b in zip(np.asarray(i_p), np.asarray(i_f))
    ])
    assert overlap > 0.9


def test_pallas_dump_ids_dropped(rng):
    """Probe-mass truncation replaces dropped probes with the out-of-range
    dump id (== n_categories). The kernel's worklist must route those
    slots into dead padding blocks (live-slot count ≤ 0) so they return
    sentinels — identical to the XLA pipeline's segment-drop."""
    data, queries, labels, store = _setup(rng)
    c = store.n_categories
    probes = np.stack(
        [rng.permutation(c)[:4] for _ in range(queries.shape[0])]
    ).astype(np.int32)
    # drop a random ~half of the non-rank-0 probes per query
    drop = rng.random(probes.shape) < 0.5
    drop[:, 0] = False
    probes_dumped = np.where(drop, c, probes).astype(np.int32)

    max_bucket = int(np.asarray(store.counts).max())
    mc = 256
    d_p, i_p, _ = pallas_probe_search(
        jnp.asarray(probes_dumped), jnp.asarray(queries), store,
        k=10, qc=128, mc=mc, max_chunks=-(-max_bucket // mc),
        compute_dtype=jnp.float32, interpret=True,
    )
    d_x, i_x = probe_search(probes_dumped, queries, store, k=10,
                            data_chunk=mc)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=1e-5)
    assert (np.asarray(i_p) == np.asarray(i_x)).mean() > 0.99
