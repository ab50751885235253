"""Packed int4 store quantization (tpulmi/ops/quantize.py): nibble
pack/unpack numerics, both probe backends on packed stores, the facade
quantize/rerank/save/load path, the host layout, and sharded search.

Reference parity: the reference has no quantization at all — int4 is a
capacity feature (quarter the HBM of bf16, ~40M rows/chip) that preserves
end-result quality through the exact host rerank (SURVEY.md §7 "100M
beyond HBM")."""

import numpy as np
import pytest

from tpulmi.ops.quantize import (
    INT4_CLIP,
    pack_int4,
    quantize_rows_int4,
    quantize_rows_int4_host,
    quantize_store,
    unpack_int4,
)


def _unit(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_pack_unpack_roundtrip(rng):
    codes = rng.integers(-8, 8, size=(64, 128)).astype(np.int8)
    import jax.numpy as jnp

    packed = pack_int4(jnp.asarray(codes))
    assert packed.shape == (64, 64) and str(packed.dtype) == "int8"
    back = np.asarray(unpack_int4(packed))
    np.testing.assert_array_equal(back, codes)
    # numpy semantics agree with the jnp unpack (hoststore path relies on it)
    back_np = np.asarray(unpack_int4(np.asarray(packed)))
    np.testing.assert_array_equal(back_np, codes)


def test_host_quantizer_matches_device(rng):
    x = _unit(rng, 200, 128)
    q_dev, s_dev = quantize_rows_int4(x)
    q_host, s_host = quantize_rows_int4_host(x)
    np.testing.assert_array_equal(np.asarray(q_dev), q_host)
    np.testing.assert_allclose(np.asarray(s_dev), s_host, rtol=1e-6)


def test_int4_reconstruction_error(rng):
    """Dequantized rows approximate the source: values under the row's
    (adaptively chosen) clip are within half a step (s/14); clipped
    outliers within (1-clip)*max|x|."""
    x = _unit(rng, 300, 256)
    packed, s = quantize_rows_int4(x)
    back = np.asarray(unpack_int4(packed)).astype(np.float32) * (
        np.asarray(s) / 7.0)[:, None]
    err = np.abs(back - x)
    maxabs = np.abs(x).max(axis=1, keepdims=True)
    clip_eff = np.asarray(s)[:, None] / maxabs   # the per-row chosen clip
    bound = np.maximum((1 - clip_eff) * maxabs,
                       (clip_eff * maxabs) / 14.0) + 1e-6
    assert (err <= bound).all()


def test_int4_adaptive_clip_beats_fixed(rng):
    """The per-row clip-grid pick never reconstructs worse than the old
    fixed clip (0.85 is ON the grid, so per-row squared error is ≤ by
    construction), and strictly wins on a meaningful fraction of rows."""
    x = _unit(rng, 400, 768)
    packed, s = quantize_rows_int4(x)
    back = np.asarray(unpack_int4(packed)).astype(np.float32) * (
        np.asarray(s) / 7.0)[:, None]
    err_adaptive = ((back - x) ** 2).sum(axis=1)

    s_fixed = np.maximum(np.abs(x).max(axis=1) * INT4_CLIP, 1e-12)
    q = np.clip(np.rint(x / s_fixed[:, None] * 7.0), -8, 7)
    err_fixed = ((q * (s_fixed / 7.0)[:, None] - x) ** 2).sum(axis=1)

    assert (err_adaptive <= err_fixed + 1e-9).all()
    assert (err_adaptive < err_fixed - 1e-9).mean() > 0.3


def test_int4_topk_candidate_recall(rng):
    """int4 similarities must keep the exact top-10 inside the int4 top-30
    with high probability — the contract the deeper rerank pool relies on."""
    data = _unit(rng, 4000, 768)
    queries = _unit(rng, 64, 768)
    packed, s = quantize_rows_int4(data)
    deq = np.asarray(unpack_int4(packed)).astype(np.float32) * (
        np.asarray(s) / 7.0)[:, None]
    got = 1.0 - queries @ deq.T
    want = 1.0 - queries @ data.T
    hit = np.mean([
        len(set(np.argsort(want[i])[:10]) & set(np.argsort(got[i])[:30])) / 10
        for i in range(64)
    ])
    assert hit > 0.95


def test_quantize_store_bits_validation(rng):
    from tpulmi.buckets import build_bucket_store

    data = _unit(rng, 1000, 64)
    labels = rng.integers(0, 8, size=1000).astype(np.int32)
    store = build_bucket_store(labels, data, 8)
    with pytest.raises(ValueError, match="bits"):
        quantize_store(store, bits=2)
    q4 = quantize_store(store, bits=4)
    assert q4.packed and q4.quant_bits == 4 and q4.q_levels == 7.0
    assert q4.dim == 64 and q4.data_sorted.shape[1] == 32
    # re-quantizing to a different width must refuse (compounding error)
    with pytest.raises(ValueError, match="already int4"):
        quantize_store(q4, bits=8)
    assert quantize_store(q4, bits=4) is q4


def test_int4_store_probe_search_xla(rng):
    """A packed int4 store drops into the XLA probe pipeline; distances
    track full precision to the documented ~4e-3 cosine error."""
    from tpulmi.buckets import build_bucket_store
    from tpulmi.search import probe_search

    n, d, c, q = 3000, 128, 11, 40
    data = _unit(rng, n, d)
    queries = _unit(rng, q, d)
    labels = rng.integers(0, c, size=n).astype(np.int32)
    store = build_bucket_store(labels, data, c)
    qstore = quantize_store(store, bits=4)

    probes = np.stack(
        [rng.permutation(c)[:4] for _ in range(q)]
    ).astype(np.int32)
    d_f, i_f = probe_search(probes, queries, store, k=10)
    d_q, i_q = probe_search(probes, queries, qstore, k=10)
    # ~4e-3 cosine error at d=768 scales ~1/sqrt(d): ~1e-2 typical at d=128
    np.testing.assert_allclose(np.asarray(d_q), np.asarray(d_f), atol=3e-2)
    overlap = np.mean([
        len(set(np.asarray(i_q)[i]) & set(np.asarray(i_f)[i])) / 10
        for i in range(q)
    ])
    assert overlap >= 0.8


def test_int4_store_pallas_matches_xla(rng):
    """The Pallas kernel's packed path (nibbles unpacked in VMEM) must agree
    with the XLA int4 pipeline. d=256 (packed width 128 keeps lane tiling)."""
    import jax.numpy as jnp

    from tpulmi.buckets import build_bucket_store
    from tpulmi.ops.pallas_topk import pallas_probe_search
    from tpulmi.search import probe_search

    n, d, c, q, mc = 9000, 256, 9, 32, 1024
    data = _unit(rng, n, d)
    queries = _unit(rng, q, d)
    labels = rng.integers(0, c, size=n).astype(np.int32)
    store = quantize_store(
        build_bucket_store(labels, data, c, pad_rows=mc, row_align=mc),
        bits=4,
    )
    assert store.packed and store.data_sorted.shape[1] == d // 2
    probes = np.stack(
        [rng.permutation(c)[:3] for _ in range(q)]
    ).astype(np.int32)
    max_bucket = int(np.asarray(store.counts).max())
    d_p, i_p, _ = pallas_probe_search(
        jnp.asarray(probes), jnp.asarray(queries), store,
        k=10, qc=128, mc=mc, max_chunks=-(-max_bucket // mc),
        compute_dtype=jnp.float32, interpret=True,
    )
    d_x, i_x = probe_search(probes, queries, store, k=10, data_chunk=mc)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=1e-5)
    assert (np.asarray(i_p) == np.asarray(i_x)).mean() > 0.99


def test_index_int4_quantize_rerank_save_load(rng, tmp_path):
    """Facade path: quantize(bits=4) + exact host rerank with the deeper
    pool recovers the exact oracle when all buckets are probed; save/load
    round-trips the packed store (quant_bits in meta) bit-identically."""
    from tpulmi.index import LearnedIndex
    from tpulmi.ops.distance import exact_knn
    from tpulmi.utils.config import IndexConfig, SearchConfig

    n, d, c, q, k = 5000, 128, 12, 48, 10
    data = _unit(rng, n, d)
    queries = _unit(rng, q, d)
    li = LearnedIndex(IndexConfig(
        n_categories=c, epochs=4, lr=0.003, batch_size=512, row_align=1,
    ))
    li.build(data, data)
    li.quantize(host_corpus=data, normalized=True, bits=4)
    st = li.built.store
    assert st.packed and st.data_sorted.shape[1] == d // 2

    scfg = SearchConfig(k=k, n_buckets=c, backend="xla", rerank_extra=60)
    d_q, i_q = li.search(queries, queries, n_buckets=c, k=k,
                         search_config=scfg)
    want_d, want_i = exact_knn(queries, data, k=k, normalized=True)
    np.testing.assert_array_equal(i_q, np.asarray(want_i) + 1)
    np.testing.assert_allclose(d_q, np.asarray(want_d), atol=1e-5)

    path = str(tmp_path / "int4_ckpt")
    li.save(path, include_corpus=True)
    li2 = LearnedIndex.load(path)
    st2 = li2.built.store
    assert st2.quant_bits == 4 and st2.packed
    np.testing.assert_array_equal(
        np.asarray(st2.data_sorted), np.asarray(st.data_sorted))
    d_l, i_l = li2.search(queries, queries, n_buckets=c, k=k,
                          search_config=scfg)
    np.testing.assert_array_equal(i_l, i_q)
    np.testing.assert_allclose(d_l, d_q, atol=1e-6)


def test_host_store_int4_layout_and_search(rng, synthetic_small):
    """build_with_host_store(store_dtype='int4') lays out packed codes on
    the host (quarter the bytes); search with rerank matches the exact
    oracle at full probe budget."""
    from tpulmi.index import LearnedIndex
    from tpulmi.ops.distance import exact_knn
    from tpulmi.utils.config import IndexConfig, SearchConfig

    data = np.asarray(synthetic_small["data_search"], np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    nav = synthetic_small["data_nav"]
    li = LearnedIndex(IndexConfig(
        n_categories=24, epochs=4, lr=0.003, batch_size=512, row_align=1,
    ))
    li.build_with_host_store(nav, data, normalized=True, store_dtype="int4")
    st = li.built.store
    assert st.packed and st.data_sorted.shape[1] == data.shape[1] // 2

    qn = synthetic_small["queries_nav"][:64]
    qs = np.asarray(synthetic_small["queries_search"][:64], np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    scfg = SearchConfig(k=10, backend="xla", rerank_extra=60)
    d_q, i_q = li.search(qn, qs, n_buckets=24, k=10, search_config=scfg)
    want_d, want_i = exact_knn(qs, data, k=10, normalized=True)
    np.testing.assert_array_equal(i_q, np.asarray(want_i) + 1)
    np.testing.assert_allclose(d_q, np.asarray(want_d), atol=1e-5)


def test_sharded_int4_matches_single_chip(rng, synthetic_small):
    """li.shard(mesh) on an int4 store: the multi-chip program unpacks the
    per-shard nibbles and matches the single-device result."""
    from tpulmi.index import LearnedIndex
    from tpulmi.parallel.mesh import make_mesh
    from tpulmi.utils.config import IndexConfig, SearchConfig

    data = np.asarray(synthetic_small["data_search"], np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    li = LearnedIndex(IndexConfig(
        n_categories=24, epochs=4, lr=0.003, batch_size=512, row_align=1,
    ))
    li.build(synthetic_small["data_nav"], data)
    li.quantize(host_corpus=data, normalized=True, bits=4)
    qn = synthetic_small["queries_nav"][:64]
    qs = synthetic_small["queries_search"][:64]
    scfg = SearchConfig(k=10, backend="xla", rerank_extra=40)
    d_1, i_1 = li.search(qn, qs, n_buckets=6, k=10, search_config=scfg)
    li.shard(make_mesh(8, ("buckets",)))
    d_8, i_8 = li.search(qn, qs, n_buckets=6, k=10, search_config=scfg)
    np.testing.assert_array_equal(i_8, i_1)
    np.testing.assert_allclose(d_8, d_1, atol=1e-5)


def test_int4_bucket_bounds(rng):
    """compute_bucket_bounds dequantizes packed rows chunk-by-chunk: the
    spherical-cap invariant must hold for the stored (quantized) rows."""
    from tpulmi.buckets import build_bucket_store, compute_bucket_bounds

    n, d, c = 4000, 128, 8
    data = _unit(rng, n, d)
    labels = rng.integers(0, c, size=n).astype(np.int32)
    store = quantize_store(build_bucket_store(labels, data, c), bits=4)
    store = compute_bucket_bounds(store, chunk=512)
    assert store.has_bounds

    deq = np.asarray(unpack_int4(store.data_sorted)).astype(np.float32) * (
        np.asarray(store.scales) / 7.0)[:, None]
    ids = np.asarray(store.ids_sorted)
    offs = np.asarray(store.offsets)
    cents = np.asarray(store.bucket_centroids)
    cos_r = np.asarray(store.bucket_cos_r)
    max_norm = np.asarray(store.bucket_max_norm)
    for b in range(c):
        rows = deq[offs[b]:offs[b + 1]]
        rows = rows[ids[offs[b]:offs[b + 1]] >= 0]
        norms = np.linalg.norm(rows, axis=1)
        rhat = rows / np.maximum(norms[:, None], 1e-12)
        assert norms.max() <= max_norm[b] + 1e-5
        assert (rhat @ cents[b]).min() >= cos_r[b] - 1e-5
