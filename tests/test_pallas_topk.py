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
@pytest.mark.parametrize("mode", ["scalar", "group", "group2"])
def test_pallas_matches_xla(rng, n_probes, mode):
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
        compute_dtype=jnp.float32, extract_mode=mode, interpret=True,
    )
    d_x, i_x = probe_search(probes, queries, store, k=10, data_chunk=mc)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=1e-5)
    # id sets must match wherever distances are unique
    assert (np.asarray(i_p) == np.asarray(i_x)).mean() > 0.99


@pytest.mark.parametrize("mode", ["scalar", "group", "group2"])
def test_pallas_probe_all_equals_exact(rng, mode):
    data, queries, labels, store = _setup(rng, n=2000, c=7, q=32)
    probes = np.tile(np.arange(7, dtype=np.int32), (32, 1))
    max_bucket = int(np.asarray(store.counts).max())
    d_p, i_p, _ = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store,
        k=10, qc=128, mc=256, max_chunks=-(-max_bucket // 256),
        compute_dtype=jnp.float32, extract_mode=mode, interpret=True,
    )
    want_d, _ = exact_knn(queries, data, k=10, normalized=True)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(want_d), atol=1e-5)
    chosen = 1.0 - np.einsum("qkd,qd->qk", data[np.asarray(i_p)], queries)
    np.testing.assert_allclose(chosen, np.asarray(want_d), atol=1e-5)


@pytest.mark.parametrize("mode", ["scalar", "group", "group2"])
def test_pallas_subk_sentinels(rng, mode):
    # tiny buckets: fewer than k rows probed -> sentinel rows with id -1
    data, queries, labels, store = _setup(rng, n=40, c=10, q=8)
    probes = rng.integers(0, 10, size=(8, 1)).astype(np.int32)
    d_p, i_p, _ = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store,
        k=10, qc=128, mc=256, max_chunks=1,
        compute_dtype=jnp.float32, extract_mode=mode, interpret=True,
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


@pytest.mark.parametrize("mode", ["scalar", "group", "group2"])
def test_pallas_group_collisions_exact(rng, mode):
    """Adversarial case for the group-harvest extraction: every one of a
    query's true top-k sits in the SAME 128-lane column group (store rows
    spaced exactly 128 apart inside one chunk), forcing the maximum number
    of harvest rounds (one per collision). Results must still match the
    XLA pipeline exactly."""
    n, d, mc = 2048, 128, 1024
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = rng.normal(size=(4, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    # plant each query's 10 nearest at rows {q*8, q*8+128, ..., q*8+9*128}
    # — lane (q*8 % 128) of chunk 0, ascending distances
    for qi in range(4):
        for r in range(10):
            row = qi * 8 + r * 128
            v = queries[qi] + (0.01 + 0.002 * r) * data[row]
            data[row] = v / np.linalg.norm(v)
    labels = np.zeros(n, dtype=np.int32)
    store = build_bucket_store(labels, data, 1, pad_rows=mc, row_align=mc)
    probes = np.zeros((4, 1), dtype=np.int32)
    d_p, i_p, _ = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store,
        k=10, qc=128, mc=mc, max_chunks=-(-n // mc),
        compute_dtype=jnp.float32, extract_mode=mode, interpret=True,
    )
    d_x, i_x = probe_search(probes, queries, store, k=10, data_chunk=mc)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))
    # the planted rows really are the top-k
    for qi in range(4):
        want = {qi * 8 + r * 128 for r in range(10)}
        assert set(np.asarray(i_p)[qi].tolist()) == want


def test_pallas_group_default_sub_divides_qc(rng):
    """extract_sub=0 under group mode resolves to the largest divisor of
    qc that is <= 256 (the hardware optimum), so a qc like 384 must not
    trip the divisibility check."""
    data, queries, labels, store = _setup(rng)
    c = store.n_categories
    probes = np.stack(
        [rng.permutation(c)[:2] for _ in range(queries.shape[0])]
    ).astype(np.int32)
    max_bucket = int(np.asarray(store.counts).max())
    d_p, i_p, _ = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store,
        k=10, qc=384, mc=256, max_chunks=-(-max_bucket // 256),
        compute_dtype=jnp.float32, extract_mode="group", interpret=True,
    )
    d_x, i_x = probe_search(probes, queries, store, k=10, data_chunk=256)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=1e-5)


@pytest.mark.parametrize("int8q", [False, True])
@pytest.mark.parametrize("mode", ["scalar", "group", "group2"])
def test_pallas_flat_worklist_matches_dense(rng, int8q, mode):
    """wl_pad > 0 switches the kernel to the flat worklist grid (one step
    per live (block, chunk) pair — skew costs nothing). Results must be
    identical to the dense 2-D grid on a SKEWED store with empty probed
    buckets and dump ids, for both the f32 and int8×int8 paths; the
    returned worklist total must match the closed form Σ ceil(slots/qc)
    · max(chunks, 1)."""
    from tpulmi.ops.quantize import quantize_store

    mc = 1024 if int8q else 256
    data, queries, labels, store = _setup(rng, mc=mc)
    if int8q:
        store = quantize_store(store)
    c = store.n_categories
    # skew the routing: everyone probes bucket 0 plus random others, ~40%
    # of non-rank-0 probes dumped (probe-mass truncation), one empty probe
    probes = np.stack(
        [rng.permutation(c)[:4] for _ in range(queries.shape[0])]
    ).astype(np.int32)
    probes[:, 0] = 0
    drop = rng.random(probes.shape) < 0.4
    drop[:, 0] = False
    probes = np.where(drop, c, probes).astype(np.int32)

    max_bucket = int(np.asarray(store.counts).max())
    maxch = -(-max_bucket // mc)
    kw = dict(k=10, qc=128, mc=mc, max_chunks=maxch,
              compute_dtype=jnp.float32, int8_queries=int8q,
              extract_mode=mode, interpret=True)
    d2, i2, ms2 = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store, **kw)
    df, if_, msf, total = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store, wl_pad=4096, **kw)
    np.testing.assert_allclose(np.asarray(df), np.asarray(d2), atol=1e-5)
    assert (np.asarray(if_) == np.asarray(i2)).mean() > 0.99
    assert int(msf) == int(ms2)

    sc = np.bincount(probes.reshape(-1)[probes.reshape(-1) < c],
                     minlength=c)
    ndb = np.maximum(-(-np.asarray(store.counts) // mc), 1)
    want = int(np.sum((-(-sc // 128)) * ndb * (sc > 0)))
    assert int(total) == want

    # a tight pad equal to the true total is sufficient
    d3, i3, _, t3 = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store, wl_pad=want, **kw)
    np.testing.assert_allclose(np.asarray(d3), np.asarray(d2), atol=1e-5)
    assert int(t3) == want

    # an UNDERSIZED pad still reports the true total (the caller's
    # overflow contract: results invalid, re-run larger)
    _, _, _, t4 = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store,
        wl_pad=max(want // 2, 1), **kw)
    assert int(t4) == want


def test_index_worklist_end_to_end(rng):
    """SearchConfig.pallas_worklist through the facade: identical results
    to the dense grid, wl-pad cache populated, overflow re-run safe."""
    from tpulmi.index import LearnedIndex
    from tpulmi.utils.config import IndexConfig, SearchConfig

    n, d_nav, d = 2000, 32, 128
    nav = rng.normal(size=(n, d_nav)).astype(np.float32)
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    li = LearnedIndex(IndexConfig(n_categories=8, epochs=2, lr=0.003,
                                  batch_size=256, row_align=256))
    li.build(nav, data)
    qn, qs = nav[:40], data[:40]
    base = SearchConfig(k=5, backend="pallas", compute_dtype="float32",
                        pallas_qc=128, pallas_mc=256)
    dw = SearchConfig(k=5, backend="pallas", compute_dtype="float32",
                      pallas_qc=128, pallas_mc=256, pallas_worklist=True)
    d0, i0 = li.search(qn, qs, n_buckets=3, k=5, search_config=base)
    d1, i1 = li.search(qn, qs, n_buckets=3, k=5, search_config=dw)
    np.testing.assert_allclose(d1, d0, atol=1e-5)
    np.testing.assert_array_equal(i1, i0)
    assert li._wl_pads[(40, 3)] >= 1024

    # force an overflow: shrink the cached pad below the true total and
    # verify the re-run path restores correct results
    li._wl_pads[(40, 3)] = 1  # hmm: pad=1 -> program with wl_pad=1
    d2, i2 = li.search(qn, qs, n_buckets=3, k=5, search_config=dw)
    np.testing.assert_allclose(d2, d0, atol=1e-5)
    assert li._wl_pads[(40, 3)] >= 1024


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


def test_pallas_dump_ids_dropped_worklist(rng):
    """Dump ids on the FLAT WORKLIST grid (regression): dumped slots sit in
    blocks the worklist gives zero grid steps, so their output tiles are
    never written — the scatter-back must route them to the discard row,
    not copy uninitialized tiles into real (query, probe) slots (measured
    on hardware at 300K: probe_mass + pallas_worklist collapsed recall
    0.9653 -> 0.0488 before the fix). Interpret mode fills unvisited tiles
    with NaN, which LOSES the top-k merge — so the only interpret-visible
    symptom is a query whose every probe is dumped: it must come back all
    sentinel (the XLA pipeline's answer), not NaN."""
    data, queries, labels, store = _setup(rng)
    c = store.n_categories
    probes = np.stack(
        [rng.permutation(c)[:4] for _ in range(queries.shape[0])]
    ).astype(np.int32)
    drop = rng.random(probes.shape) < 0.5
    drop[:, 0] = False
    drop[:8, :] = True  # all-dumped queries: sentinels must surface
    probes_dumped = np.where(drop, c, probes).astype(np.int32)

    max_bucket = int(np.asarray(store.counts).max())
    mc = 256
    d_p, i_p, _, wl_total = pallas_probe_search(
        jnp.asarray(probes_dumped), jnp.asarray(queries), store,
        k=10, qc=128, mc=mc, max_chunks=-(-max_bucket // mc),
        compute_dtype=jnp.float32, interpret=True, wl_pad=4096,
    )
    d_x, i_x = probe_search(probes_dumped, queries, store, k=10,
                            data_chunk=mc)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=1e-5)
    assert (np.asarray(i_p) == np.asarray(i_x)).mean() > 0.99


def test_worklist_smem_cap(rng, monkeypatch):
    """The worklist is a scalar-prefetch SMEM operand: the kernel refuses
    pads above the chunked ceiling (WL_SEGMENTS_MAX segments), and the
    facade's estimator falls back to the dense grid (returns 0, caches the
    disable) instead of crashing the backend — the measured 10M failure
    mode."""
    import tpulmi.ops.pallas_topk as pk
    from tpulmi.index import LearnedIndex
    from tpulmi.utils.config import IndexConfig, SearchConfig

    data, queries, labels, store = _setup(rng)
    c = store.n_categories
    probes = np.stack(
        [rng.permutation(c)[:3] for _ in range(queries.shape[0])]
    ).astype(np.int32)
    max_bucket = int(np.asarray(store.counts).max())
    with pytest.raises(ValueError, match="WL_SEGMENTS_MAX"):
        pallas_probe_search(
            jnp.asarray(probes), jnp.asarray(queries), store,
            k=10, qc=128, mc=256, max_chunks=-(-max_bucket // 256),
            compute_dtype=jnp.float32,
            wl_pad=pk.WL_PAD_MAX * (pk.WL_SEGMENTS_MAX + 2),
            interpret=True,
        )

    n, d_nav, d = 2000, 32, 128
    nav = rng.normal(size=(n, d_nav)).astype(np.float32)
    dd = rng.normal(size=(n, d)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    li = LearnedIndex(IndexConfig(n_categories=8, epochs=2, lr=0.003,
                                  batch_size=256, row_align=256))
    li.build(nav, dd)
    monkeypatch.setattr(pk, "WL_PAD_MAX", 512)  # below the 1024 floor
    monkeypatch.setattr(pk, "WL_SEGMENTS_MAX", 1)  # and no chunk escape
    scfg = SearchConfig(k=5, backend="pallas", compute_dtype="float32",
                        pallas_qc=128, pallas_mc=256, pallas_worklist=True)
    base = SearchConfig(k=5, backend="pallas", compute_dtype="float32",
                        pallas_qc=128, pallas_mc=256)
    qn, qs = nav[:40], dd[:40]
    d0, i0 = li.search(qn, qs, n_buckets=3, k=5, search_config=base)
    d1, i1 = li.search(qn, qs, n_buckets=3, k=5, search_config=scfg)
    np.testing.assert_array_equal(i1, i0)
    assert li._wl_pads[(40, 3)] == -1  # disabled, not re-estimated
    # steady state: second call reuses the disable without re-routing
    d2, i2 = li.search(qn, qs, n_buckets=3, k=5, search_config=scfg)
    np.testing.assert_array_equal(i2, i0)


@pytest.mark.parametrize("mode", ["group", "group2"])
def test_pallas_pool_topk_prefix_exact(rng, mode):
    """k_out > k: rows [0, k) must still be the EXACT top-k (bit-equal to
    the XLA pipeline); rows [k, k_out) are best-effort pool candidates —
    ascending, and every live id must map back to its claimed distance."""
    data, queries, labels, store = _setup(rng)
    c = store.n_categories
    probes = np.stack(
        [rng.permutation(c)[:3] for _ in range(queries.shape[0])]
    ).astype(np.int32)
    max_bucket = int(np.asarray(store.counts).max())
    mc = 256
    d_p, i_p, _ = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store,
        k=5, k_out=16, qc=128, mc=mc, max_chunks=-(-max_bucket // mc),
        compute_dtype=jnp.float32, extract_mode=mode, interpret=True,
    )
    d_p, i_p = np.asarray(d_p), np.asarray(i_p)
    assert d_p.shape == (queries.shape[0], 16)
    d_x, i_x = probe_search(probes, queries, store, k=5, data_chunk=mc)
    np.testing.assert_allclose(d_p[:, :5], np.asarray(d_x), atol=1e-5)
    assert (i_p[:, :5] == np.asarray(i_x)).mean() > 0.99
    assert np.all(np.diff(d_p, axis=1) >= -1e-6)
    live = i_p >= 0
    assert live[:, :5].all()
    chosen = 1.0 - np.einsum(
        "qkd,qd->qk", data[np.maximum(i_p, 0)], queries)
    np.testing.assert_allclose(np.where(live, chosen, 0.0),
                               np.where(live, d_p, 0.0), atol=1e-5)


def test_pallas_pool_requires_harvest_mode(rng):
    data, queries, labels, store = _setup(rng, n=500, c=4, q=8)
    probes = np.zeros((8, 1), np.int32)
    with pytest.raises(ValueError, match="rerank pool"):
        pallas_probe_search(
            jnp.asarray(probes), jnp.asarray(queries), store,
            k=5, k_out=16, qc=128, mc=256, max_chunks=1,
            compute_dtype=jnp.float32, extract_mode="scalar",
            interpret=True,
        )


def test_index_pallas_pool_rerank(rng):
    """SearchConfig.pallas_pool end-to-end: quantized store, kernel tracks
    the exact top-k while the rerank extras come from the pool lanes. The
    output must be duplicate-free per row (the host dedupe) and the exact
    rerank must keep recall at the non-pool level."""
    from tpulmi.index import LearnedIndex
    from tpulmi.ops.distance import exact_knn
    from tpulmi.utils.config import IndexConfig, SearchConfig

    n, d = 6000, 128
    data_nav = rng.normal(size=(n, 24)).astype(np.float32)
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    li = LearnedIndex(IndexConfig(
        n_categories=12, epochs=4, lr=0.003, batch_size=512,
        row_align=1024,
    ))
    li.build(data_nav, data)
    li.quantize(host_corpus=data, normalized=True)
    qn, qs = data_nav[:32], data[:32]
    scfg = SearchConfig(k=10, backend="pallas", compute_dtype=None,
                        pallas_qc=128, pallas_mc=1024,
                        pallas_pool=True, rerank_extra=10)
    d_p, i_p = li.search(qn, qs, n_buckets=12, k=10, search_config=scfg)
    # no duplicate ids per row
    assert all(len(set(row.tolist())) == 10 for row in i_p)
    want_d, want_i = exact_knn(qs, data, k=10, normalized=True)
    recall = np.mean([
        len(set(i_p[i]) & set(np.asarray(want_i)[i] + 1)) / 10
        for i in range(32)
    ])
    assert recall >= 0.98


@pytest.mark.parametrize("mode", ["group", "group2"])
def test_pallas_pool_worklist_matches_dense(rng, mode):
    """The rerank pool composed with the flat-worklist grid (the round-3
    bug zone: dumped slots + uninitialized tiles) must be identical to the
    dense grid, dump ids and skew included."""
    data, queries, labels, store = _setup(rng)
    c = store.n_categories
    probes = np.stack(
        [rng.permutation(c)[:4] for _ in range(queries.shape[0])]
    ).astype(np.int32)
    probes[:, 0] = 0
    drop = rng.random(probes.shape) < 0.4
    drop[:, 0] = False
    probes = np.where(drop, c, probes).astype(np.int32)
    max_bucket = int(np.asarray(store.counts).max())
    kw = dict(k=5, k_out=16, qc=128, mc=256,
              max_chunks=-(-max_bucket // 256),
              compute_dtype=jnp.float32, extract_mode=mode, interpret=True)
    d2, i2, _ = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store, **kw)
    df, if_, _, _ = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store, wl_pad=4096, **kw)
    np.testing.assert_allclose(np.asarray(df), np.asarray(d2), atol=1e-5)
    assert (np.asarray(if_) == np.asarray(i2)).mean() > 0.99


@pytest.mark.parametrize("mode", ["scalar", "group", "group2"])
def test_pallas_pair_matches_dense(rng, mode):
    """``pair=True`` fuses two consecutive mc-row chunks into one 2·mc-wide
    compute tile (two DMA refs per grid step). Results must be identical to
    the single-chunk grid on a store whose buckets have ODD and sub-mc
    chunk counts (the second ref then clamps to the last chunk and its
    duplicated columns must be masked, never extracted)."""
    data, queries, labels, store = _setup(rng, n=4000, c=13, q=64, mc=256)
    c = store.n_categories
    probes = np.stack(
        [rng.permutation(c)[:3] for _ in range(queries.shape[0])]
    ).astype(np.int32)
    max_bucket = int(np.asarray(store.counts).max())
    kw = dict(k=10, qc=128, mc=256, max_chunks=-(-max_bucket // 256),
              compute_dtype=jnp.float32, extract_mode=mode, interpret=True)
    d0, i0, ms0 = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store, **kw)
    d1, i1, ms1 = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store, pair=True, **kw)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    assert int(ms1) == int(ms0)


@pytest.mark.parametrize("packed", [False, True])
def test_pallas_pair_int8_worklist(rng, packed):
    """pair × int8-query × flat-worklist × probe-mass dumps, on int8 and
    packed-int4 stores: the worklist total must use pair-unit step counts
    and results must match the dense single-chunk grid."""
    from tpulmi.ops.quantize import quantize_store

    mc = 1024
    d = 256 if packed else 128
    data, queries, labels, store = _setup(rng, n=9000, d=d, c=5, q=48, mc=mc)
    store = quantize_store(store, bits=4 if packed else 8)
    c = store.n_categories
    probes = np.stack(
        [rng.permutation(c)[:3] for _ in range(queries.shape[0])]
    ).astype(np.int32)
    drop = rng.random(probes.shape) < 0.3
    drop[:, 0] = False
    probes = np.where(drop, c, probes).astype(np.int32)
    max_bucket = int(np.asarray(store.counts).max())
    kw = dict(k=10, qc=128, mc=mc, max_chunks=-(-max_bucket // mc),
              compute_dtype=jnp.float32, int8_queries=True,
              extract_mode="group2", interpret=True)
    d0, i0, _ = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store, **kw)
    d1, i1, _ = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store, pair=True, **kw)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=1e-5)
    assert (np.asarray(i1) == np.asarray(i0)).mean() > 0.99

    dw, iw, _, total = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store, pair=True,
        wl_pad=2048, **kw)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(d0), atol=1e-5)
    assert (np.asarray(iw) == np.asarray(i0)).mean() > 0.99
    # worklist totals count PAIR steps: Σ ceil(slots/qc)·max(ceil(chunks/2),1)
    sc = np.bincount(probes.reshape(-1)[probes.reshape(-1) < c],
                     minlength=c)
    ndb = -(-np.asarray(store.counts) // mc)
    steps = np.maximum(-(-ndb // 2), 1)
    want = int(np.sum((-(-sc // 128)) * steps * (sc > 0)))
    assert int(total) == want


def test_index_pair_end_to_end(rng):
    """SearchConfig.pallas_pair through the facade: identical results to
    the single-chunk grid, composed with the flat worklist (pair-unit pad
    estimate)."""
    from tpulmi.index import LearnedIndex
    from tpulmi.utils.config import IndexConfig, SearchConfig

    n, d_nav, d = 2000, 32, 128
    nav = rng.normal(size=(n, d_nav)).astype(np.float32)
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    li = LearnedIndex(IndexConfig(n_categories=8, epochs=2, lr=0.003,
                                  batch_size=256, row_align=256))
    li.build(nav, data)
    qn, qs = nav[:40], data[:40]
    base = SearchConfig(k=5, backend="pallas", compute_dtype="float32",
                        pallas_qc=128, pallas_mc=256)
    d0, i0 = li.search(qn, qs, n_buckets=3, k=5, search_config=base)
    for wl in (False, True):
        pp = SearchConfig(k=5, backend="pallas", compute_dtype="float32",
                          pallas_qc=128, pallas_mc=256, pallas_pair=True,
                          pallas_worklist=wl)
        d1, i1 = li.search(qn, qs, n_buckets=3, k=5, search_config=pp)
        np.testing.assert_allclose(d1, d0, atol=1e-5)
        np.testing.assert_array_equal(i1, i0)


# ---------------------------------------------------------------- VMEM guard

def test_vmem_model_flags_observed_crash_shape():
    """The paired bf16 grid at the 300K default tiles (qc=512, mc=1024,
    d=768) overflowed Mosaic's scoped-VMEM budget on hardware (18.40M >
    16.00M, BENCH_r04.json tail); the model must flag it, and must pass
    every tiling measured good on hardware (kbench/NOTES.md)."""
    from tpulmi.ops.pallas_topk import VMEM_LIMIT, estimate_vmem_bytes

    crash = estimate_vmem_bytes(qc=512, mc=1024, d=768, d_stored=768,
                                q_itemsize=2, data_itemsize=2,
                                quantized=False, pair=True)
    assert crash > VMEM_LIMIT
    good = [
        # 300K bf16 single-ref default (runs every bench.py session)
        dict(qc=512, mc=1024, d=768, d_stored=768, q_itemsize=2,
             data_itemsize=2, quantized=False, pair=False),
        # 20M int8 x int8 pair (kbench 15.9 ms measured good)
        dict(qc=192, mc=1024, d=768, d_stored=768, q_itemsize=1,
             data_itemsize=1, quantized=True, pair=True),
        # 40M packed-int4 qc=96 (BENCH_40M.md)
        dict(qc=96, mc=1024, d=768, d_stored=384, q_itemsize=1,
             data_itemsize=1, quantized=True, pair=False),
        # int8 mc=2048 single-ref (kbench round-4)
        dict(qc=192, mc=2048, d=768, d_stored=768, q_itemsize=1,
             data_itemsize=1, quantized=True, pair=False),
    ]
    for kw in good:
        assert estimate_vmem_bytes(**kw) <= VMEM_LIMIT, kw


def test_resolve_tiling_halves_qc_or_declines_pair():
    from tpulmi.ops.pallas_topk import resolve_tiling

    # crash shape: pair survives at a halved query block
    pair, qc = resolve_tiling(512, 1024, d=768, d_stored=768, q_itemsize=2,
                              data_itemsize=2, quantized=False, pair=True)
    assert pair and qc < 512
    # bf16 mc=2048 pair survives only at the qc=64 floor
    pair, qc = resolve_tiling(512, 2048, d=768, d_stored=768, q_itemsize=2,
                              data_itemsize=2, quantized=False, pair=True)
    assert pair and qc == 64
    # f32 mc=2048: the two double-buffered refs alone overflow at every
    # qc — pair declined outright
    pair, qc = resolve_tiling(512, 2048, d=768, d_stored=768, q_itemsize=4,
                              data_itemsize=4, quantized=False, pair=True)
    assert not pair
    # an eligible request passes through untouched
    pair, qc = resolve_tiling(192, 1024, d=768, d_stored=768, q_itemsize=1,
                              data_itemsize=1, quantized=True, pair=True)
    assert pair and qc == 192


def test_pallas_probe_search_refuses_oversized_tile(rng):
    """Compiled dispatch (interpret=False) of a tile past the scoped-VMEM
    budget must be a trace-time ValueError, not a backend crash."""
    data, queries, labels, store = _setup(rng, n=4000, d=768, c=4, q=64,
                                          mc=1024)
    probes = np.zeros((64, 1), np.int32)
    with pytest.raises(ValueError, match="scoped-VMEM"):
        pallas_probe_search(
            jnp.asarray(probes), jnp.asarray(queries), store,
            k=10, qc=512, mc=1024, max_chunks=4,
            compute_dtype=jnp.bfloat16, pair=True, interpret=False,
        )


def test_plan_resolves_pair_tiling(rng):
    """_plan_search re-tiles an ineligible pallas_pair request instead of
    dispatching it: the bf16 crash shape keeps pair at a halved qc, and a
    declined shape (mc=2048) falls back to the single-ref grid."""
    from tpulmi.index import LearnedIndex
    from tpulmi.utils.config import IndexConfig, SearchConfig

    li = LearnedIndex(IndexConfig(n_categories=4))
    scfg = SearchConfig(pallas_pair=True, pallas_qc=512, pallas_mc=1024,
                        compute_dtype="bfloat16")
    pair, qc = li._resolve_pallas_tiling(scfg, d=768, d_stored=768,
                                         quantized=False)
    assert pair and qc < 512
    # f32 mc=2048: the paired refs overflow at every qc — declined
    scfg2 = SearchConfig(pallas_pair=True, pallas_qc=512, pallas_mc=2048,
                         compute_dtype=None)
    pair, qc = li._resolve_pallas_tiling(scfg2, d=768, d_stored=768,
                                         quantized=False)
    assert not pair
    # int8 + int8-queries at the measured-good 20M tiling: untouched
    scfg3 = SearchConfig(pallas_pair=True, pallas_qc=192, pallas_mc=1024,
                         int8_queries=True)
    pair, qc = li._resolve_pallas_tiling(scfg3, d=768, d_stored=768,
                                         quantized=True)
    assert pair and qc == 192


# ------------------------------------------------------------ chunked worklist

@pytest.mark.parametrize("mode", ["group", "group2"])
@pytest.mark.parametrize("int8q", [False, True])
def test_pallas_worklist_chunked_matches_dense(rng, monkeypatch, mode, int8q):
    """wl_pad above WL_PAD_MAX splits the worklist into block-aligned SMEM
    segments chained through donated output buffers — results must be
    identical to the dense grid. WL_PAD_MAX is shrunk so a small workload
    spans several segments, including all-padding tail segments (their
    items write the trash block's sentinel tile, never a real one). The
    int8 variant also exercises the shifted alias indices (the scales
    input sits between the data refs and the donated buffers)."""
    import tpulmi.ops.pallas_topk as pk
    from tpulmi.ops.quantize import quantize_store

    if int8q:
        # int8 scales arrive (mc/128, 128)-tiled: mc must be 1024
        n, c, mc = 8000, 3, 1024
    else:
        n, c, mc = 2000, 7, 128
    data, queries, labels, store = _setup(rng, n=n, d=128, c=c, q=64, mc=mc)
    if int8q:
        store = quantize_store(store)
    probes = np.stack(
        [rng.permutation(c)[:min(3, c)] for _ in range(64)]).astype(np.int32)
    max_bucket = int(np.asarray(store.counts).max())
    kw = dict(k=5, qc=32, mc=mc, max_chunks=-(-max_bucket // mc),
              compute_dtype=jnp.float32, extract_mode=mode,
              int8_queries=int8q, interpret=True)
    d_dense, i_dense, _ = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store, **kw)
    monkeypatch.setattr(pk, "WL_PAD_MAX", 16)
    d_ck, i_ck, _, wl_total = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store, wl_pad=48, **kw)
    assert int(wl_total) <= 48, "test shape must fit the chunked capacity"
    np.testing.assert_allclose(np.asarray(d_ck), np.asarray(d_dense),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_ck), np.asarray(i_dense))


@pytest.mark.parametrize("pair", [False, True])
def test_pallas_worklist_chunked_pair_and_pool(rng, monkeypatch, pair):
    """Chunked worklist composed with the paired-block grid and the rerank
    pool (k_out > k): the exact k-prefix must match the dense grid."""
    import tpulmi.ops.pallas_topk as pk

    data, queries, labels, store = _setup(rng, n=2000, d=128, c=7, q=64,
                                          mc=128)
    probes = np.stack(
        [rng.permutation(7)[:3] for _ in range(64)]).astype(np.int32)
    max_bucket = int(np.asarray(store.counts).max())
    kw = dict(k=5, k_out=9, qc=32, mc=128, max_chunks=-(-max_bucket // 128),
              compute_dtype=jnp.float32, extract_mode="group2",
              interpret=True, pair=pair)
    d_dense, i_dense, _ = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store, **kw)
    monkeypatch.setattr(pk, "WL_PAD_MAX", 16)
    d_ck, i_ck, _, wl_total = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store, wl_pad=48, **kw)
    assert int(wl_total) <= 48
    np.testing.assert_allclose(np.asarray(d_ck[:, :5]),
                               np.asarray(d_dense[:, :5]), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_ck[:, :5]),
                                  np.asarray(i_dense[:, :5]))


def test_index_worklist_chunked_end_to_end(rng, monkeypatch):
    """Facade path: with WL_PAD_MAX shrunk below the estimated pad, the
    planner keeps the worklist (chunked) instead of disabling it, and
    search results equal the dense grid's."""
    import tpulmi.ops.pallas_topk as pk
    from tpulmi.index import LearnedIndex
    from tpulmi.utils.config import IndexConfig, SearchConfig

    n, d_nav, d = 2000, 32, 128
    nav = rng.normal(size=(n, d_nav)).astype(np.float32)
    dd = rng.normal(size=(n, d)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    li = LearnedIndex(IndexConfig(n_categories=8, epochs=2, lr=0.003,
                                  batch_size=256, row_align=256))
    li.build(nav, dd)
    monkeypatch.setattr(pk, "WL_PAD_MAX", 256)
    scfg = SearchConfig(k=5, backend="pallas", compute_dtype="float32",
                        pallas_qc=128, pallas_mc=256, pallas_worklist=True)
    base = SearchConfig(k=5, backend="pallas", compute_dtype="float32",
                        pallas_qc=128, pallas_mc=256)
    qn, qs = nav[:40], dd[:40]
    d0, i0 = li.search(qn, qs, n_buckets=3, k=5, search_config=base)
    d1, i1 = li.search(qn, qs, n_buckets=3, k=5, search_config=scfg)
    np.testing.assert_array_equal(i1, i0)
    assert li._wl_pads[(40, 3)] > pk.WL_PAD_MAX  # chunked, not disabled
