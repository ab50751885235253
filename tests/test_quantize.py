"""Int8 row quantization numerics: reconstruction and cosine-distance error
bounds on normalized vectors."""

import numpy as np

from tpulmi.ops.quantize import cosine_dists_int8, dequantize_rows, quantize_rows


def _unit(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_roundtrip_error(rng):
    x = _unit(rng, 200, 768)
    q, s = quantize_rows(x)
    back = np.asarray(dequantize_rows(q, s))
    rel = np.abs(back - x).max() / np.abs(x).max()
    assert rel < 0.01


def test_cosine_dist_error(rng):
    data = _unit(rng, 500, 768)
    queries = _unit(rng, 50, 768)
    qd, sd = quantize_rows(data)
    qq, sq = quantize_rows(queries)
    got = np.asarray(cosine_dists_int8(qq, sq, qd, sd))
    want = 1.0 - queries @ data.T
    err = np.abs(got - want)
    assert err.max() < 5e-3
    assert err.mean() < 1e-3


def test_topk_agreement(rng):
    """int8 distances must preserve the neighbor ranking well enough that
    the int8 top-10 overlaps the exact top-10 ≥ 9/10 on average."""
    data = _unit(rng, 2000, 768)
    queries = _unit(rng, 64, 768)
    qd, sd = quantize_rows(data)
    qq, sq = quantize_rows(queries)
    got = np.asarray(cosine_dists_int8(qq, sq, qd, sd))
    want = 1.0 - queries @ data.T
    overlap = np.mean([
        len(set(np.argsort(got[i])[:10]) & set(np.argsort(want[i])[:10])) / 10
        for i in range(64)
    ])
    assert overlap > 0.9


def test_quantized_store_probe_search(rng):
    """A quantized store drops into the XLA probe pipeline; distances match
    full precision to the documented ~1e-3 cosine error and the top-k sets
    overlap ≥ 9/10."""
    from tpulmi.buckets import build_bucket_store
    from tpulmi.ops.quantize import quantize_store
    from tpulmi.search import probe_search

    n, d, c, q = 3000, 128, 11, 40
    data = _unit(rng, n, d)
    queries = _unit(rng, q, d)
    labels = rng.integers(0, c, size=n).astype(np.int32)
    store = build_bucket_store(labels, data, c)
    qstore = quantize_store(store)
    assert qstore.is_quantized and str(qstore.data_sorted.dtype) == "int8"

    probes = np.stack(
        [rng.permutation(c)[:4] for _ in range(q)]
    ).astype(np.int32)
    d_f, i_f = probe_search(probes, queries, store, k=10)
    d_q, i_q = probe_search(probes, queries, qstore, k=10)
    np.testing.assert_allclose(np.asarray(d_q), np.asarray(d_f), atol=5e-3)
    overlap = np.mean([
        len(set(np.asarray(i_q)[i]) & set(np.asarray(i_f)[i])) / 10
        for i in range(q)
    ])
    assert overlap >= 0.9


def test_quantized_store_pallas_matches_xla(rng):
    """The Pallas kernel's int8 path (codes dequantized in VMEM, per-row
    scales on the sim columns) must agree with the XLA int8 pipeline."""
    import jax.numpy as jnp

    from tpulmi.buckets import build_bucket_store
    from tpulmi.ops.pallas_topk import pallas_probe_search
    from tpulmi.ops.quantize import quantize_store
    from tpulmi.search import probe_search

    # mc=1024: the int8 kernel's scales tile is (mc/128, 128), needing
    # mc % 1024 == 0 on TPU hardware
    n, d, c, q, mc = 9000, 128, 9, 32, 1024
    data = _unit(rng, n, d)
    queries = _unit(rng, q, d)
    labels = rng.integers(0, c, size=n).astype(np.int32)
    store = quantize_store(
        build_bucket_store(labels, data, c, pad_rows=mc, row_align=mc)
    )
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


def test_index_quantize_and_rerank(rng):
    """End-to-end: quantize a built index in place, attach the host corpus,
    and verify the reranked distances are exact (full-precision) and recall
    does not regress vs the full-precision index."""
    from tpulmi.index import LearnedIndex
    from tpulmi.ops.distance import exact_knn
    from tpulmi.utils.config import IndexConfig, SearchConfig

    n, d, c, q, k = 5000, 64, 16, 64, 10
    data = _unit(rng, n, d)
    queries = _unit(rng, q, d)
    li = LearnedIndex(IndexConfig(
        n_categories=c, epochs=4, lr=0.003, batch_size=512, row_align=1,
    ))
    li.build(data, data)
    scfg = SearchConfig(k=k, n_buckets=c, backend="xla")
    d_f, i_f = li.search(queries, queries, n_buckets=c, k=k,
                         search_config=scfg)

    li.quantize(host_corpus=data, normalized=True)
    assert li.built.store.is_quantized
    d_q, i_q = li.search(queries, queries, n_buckets=c, k=k,
                         search_config=scfg)

    # probing all buckets == exact search; the reranked result must equal
    # the exact oracle (quantization error erased by the rerank)
    want_d, want_i = exact_knn(queries, data, k=k, normalized=True)
    np.testing.assert_array_equal(i_q, np.asarray(want_i) + 1)
    np.testing.assert_allclose(d_q, np.asarray(want_d), atol=1e-5)

    # and without the rerank the distances are close but approximate
    d_nr, _ = li.search(queries, queries, n_buckets=c, k=k,
                        search_config=SearchConfig(
                            k=k, n_buckets=c, backend="xla", rerank=False))
    assert np.abs(d_nr - np.asarray(want_d)).max() < 5e-3


def test_rerank_host_mirror_and_f16(rng, monkeypatch):
    """The rerank's host-query mirror path must (a) be used when the caller
    passes numpy queries or an explicit mirror, avoiding the device
    download, and (b) produce identical results; rerank_dtype=float16
    gathers from the cached f16 shadow with near-identical top-k."""
    from tpulmi.index import LearnedIndex
    from tpulmi.utils.config import IndexConfig, SearchConfig

    n, d, c, q, k = 4000, 64, 12, 48, 10
    data = _unit(rng, n, d)
    queries = _unit(rng, q, d)
    li = LearnedIndex(IndexConfig(
        n_categories=c, epochs=4, lr=0.003, batch_size=512, row_align=1,
    ))
    li.build(data, data)
    li.quantize(host_corpus=data, normalized=True)
    scfg = SearchConfig(k=k, n_buckets=c, backend="xla")

    seen = []
    orig = LearnedIndex._rerank_host

    def spy(self, dists, ids, qs, k, host_queries=None,
            rerank_dtype="float32"):
        seen.append((host_queries is not None, rerank_dtype))
        return orig(self, dists, ids, qs, k, host_queries=host_queries,
                    rerank_dtype=rerank_dtype)

    monkeypatch.setattr(LearnedIndex, "_rerank_host", spy)

    import jax.numpy as jnp
    d_dev, i_dev = li.search(jnp.asarray(queries), jnp.asarray(queries),
                             n_buckets=c, k=k, search_config=scfg)
    assert seen[-1] == (False, "float32")  # device arrays: no mirror

    # numpy queries: mirror captured automatically
    d_np, i_np = li.search(queries, queries, n_buckets=c, k=k,
                           search_config=scfg)
    assert seen[-1][0] is True
    np.testing.assert_array_equal(i_np, i_dev)
    np.testing.assert_allclose(d_np, d_dev, atol=1e-6)

    # explicit mirror alongside device arrays (the bench pattern)
    d_m, i_m = li.search(jnp.asarray(queries), jnp.asarray(queries),
                         n_buckets=c, k=k, search_config=scfg,
                         queries_search_host=queries)
    assert seen[-1][0] is True
    np.testing.assert_array_equal(i_m, i_dev)

    # f16 shadow: near-identical ranking, tiny distance error, cached
    scfg16 = SearchConfig(k=k, n_buckets=c, backend="xla",
                          rerank_dtype="float16")
    d_16, i_16 = li.search(queries, queries, n_buckets=c, k=k,
                           search_config=scfg16)
    overlap = np.mean([
        len(set(i_16[i]) & set(i_dev[i])) / k for i in range(q)
    ])
    assert overlap > 0.99
    assert np.abs(d_16 - d_dev).max() < 2e-3
    assert li._rerank_shadow[0] is data
    shadow_before = li._rerank_shadow[1]
    li.search(queries, queries, n_buckets=c, k=k, search_config=scfg16)
    assert li._rerank_shadow[1] is shadow_before  # cached, not rebuilt

    # attaching a different corpus invalidates the shadow
    li.attach_host_corpus(np.array(data), normalized=True)
    li.search(queries, queries, n_buckets=c, k=k, search_config=scfg16)
    assert li._rerank_shadow[1] is not shadow_before


def test_native_rerank_dot_parity(rng, monkeypatch):
    """The fused C++ rerank (native_layout.rerank_dot) must reproduce the
    gather+bmm path: same sims for f32/f16 corpora, normalized and not,
    sentinel ids clamped like the NumPy gather; and _rerank_host must fall
    back to the bmm path when the native kernel is unavailable."""
    from tpulmi.index import LearnedIndex
    from tpulmi.native import native_layout
    from tpulmi.utils.config import IndexConfig, SearchConfig

    if not native_layout.available():
        pytest.skip("no native toolchain")

    n, d, q, keff = 3000, 64, 32, 12
    corpus = _unit(rng, n, d)
    ids = rng.integers(0, n, size=(q, keff)).astype(np.int64)
    ids[0, :3] = -1
    qs = _unit(rng, q, d)

    import ml_dtypes

    for src in (corpus, corpus.astype(np.float16),
                corpus.astype(ml_dtypes.bfloat16)):
        sims = native_layout.rerank_dot(src, ids, qs, normalized=True)
        rows = src[np.maximum(ids, 0).reshape(-1)].astype(
            np.float32).reshape(q, keff, d)
        ref = np.einsum("qkd,qd->qk", rows, qs)
        atol = 1e-5 if src.dtype == np.float32 else 2e-3
        np.testing.assert_allclose(sims, ref, atol=atol)

    # un-normalized corpus: rows L2-normalized on the fly
    raw = rng.normal(size=(n, d)).astype(np.float32) * 3.0
    sims = native_layout.rerank_dot(raw, ids, qs, normalized=False)
    rows = raw[np.maximum(ids, 0).reshape(-1)].reshape(q, keff, d)
    rows = rows / np.maximum(
        np.linalg.norm(rows, axis=2, keepdims=True), 1e-12)
    ref = np.einsum("qkd,qd->qk", rows, qs)
    np.testing.assert_allclose(sims, ref, atol=1e-5)

    # end-to-end: native on vs native off must give identical search output
    data = _unit(rng, 4000, d)
    li = LearnedIndex(IndexConfig(
        n_categories=12, epochs=4, lr=0.003, batch_size=512, row_align=1))
    li.build(data, data)
    li.quantize(host_corpus=data, normalized=True)
    scfg = SearchConfig(k=10, n_buckets=12, backend="xla")
    d_nat, i_nat = li.search(qs, qs, n_buckets=12, k=10, search_config=scfg)
    monkeypatch.setattr(type(native_layout), "available", lambda self: False)
    d_bmm, i_bmm = li.search(qs, qs, n_buckets=12, k=10, search_config=scfg)
    np.testing.assert_array_equal(i_nat, i_bmm)
    np.testing.assert_allclose(d_nat, d_bmm, atol=1e-5)
