"""search_stream: the pipelined serving loop must be a pure reordering of
`search` — identical results per batch, in order, across warm/steady/overflow
paths, quantized stores with rerank, and mixed batch shapes."""

import numpy as np
import pytest

from tpulmi.index import LearnedIndex
from tpulmi.utils.config import IndexConfig, SearchConfig


@pytest.fixture(scope="module")
def built(synthetic_small):
    cfg = IndexConfig(n_categories=24, epochs=8, lr=0.003, model_type="MLP-5")
    li = LearnedIndex(cfg)
    li.build(synthetic_small["data_nav"], synthetic_small["data_search"])
    return li


def _batches(ds, sizes):
    lo = 0
    out = []
    for s in sizes:
        out.append((ds["queries_nav"][lo:lo + s],
                    ds["queries_search"][lo:lo + s]))
        lo += s
    return out


def test_stream_matches_search(built, synthetic_small):
    batches = _batches(synthetic_small, [50, 50, 50, 50])
    got = list(built.search_stream(batches, n_buckets=4, k=10, depth=2))
    assert len(got) == 4
    for (qn, qs), (d_s, i_s) in zip(batches, got):
        d_ref, i_ref = built.search(qn, qs, n_buckets=4, k=10)
        np.testing.assert_array_equal(i_s, i_ref)
        np.testing.assert_allclose(d_s, d_ref, rtol=0, atol=0)


def test_stream_mixed_shapes_and_depth(built, synthetic_small):
    # a new shape mid-stream drains in-flight work and warms synchronously;
    # results stay ordered and identical
    batches = _batches(synthetic_small, [60, 60, 40, 40])
    got = list(built.search_stream(batches, n_buckets=3, k=5, depth=3))
    assert len(got) == 4
    for (qn, qs), (d_s, i_s) in zip(batches, got):
        d_ref, i_ref = built.search(qn, qs, n_buckets=3, k=5)
        np.testing.assert_array_equal(i_s, i_ref)


def test_stream_single_batch_and_empty(built, synthetic_small):
    batches = _batches(synthetic_small, [80])
    got = list(built.search_stream(batches, n_buckets=4, k=10))
    d_ref, i_ref = built.search(*batches[0], n_buckets=4, k=10)
    np.testing.assert_array_equal(got[0][1], i_ref)
    assert list(built.search_stream([], n_buckets=4)) == []


def test_stream_overflow_fallback(built, synthetic_small):
    # poison the qpb cache with an undersized (but chunk-aligned) pad: the
    # in-flight result overflows and the batch silently re-runs through the
    # synchronous path — results must still be exact
    qn = synthetic_small["queries_nav"][:100]
    qs = synthetic_small["queries_search"][:100]
    d_ref, i_ref = built.search(qn, qs, n_buckets=6, k=10)
    built._qpb_pads[(100, 6)] = 8
    got = list(built.search_stream([(qn, qs)] * 3, n_buckets=6, k=10))
    for d_s, i_s in got:
        np.testing.assert_array_equal(i_s, i_ref)
    # the cache healed itself for subsequent steady-state batches
    assert built._qpb_pads[(100, 6)] >= 8


def test_stream_quantized_rerank(synthetic_small):
    cfg = IndexConfig(n_categories=16, epochs=6, lr=0.003, model_type="MLP-5")
    li = LearnedIndex(cfg)
    data = np.asarray(synthetic_small["data_search"], np.float32)
    data /= np.maximum(np.linalg.norm(data, axis=1, keepdims=True), 1e-12)
    li.build(synthetic_small["data_nav"], data)
    li.quantize(host_corpus=data, normalized=True)
    scfg = SearchConfig(k=10, n_buckets=5, rerank=True)
    batches = _batches(synthetic_small, [64, 64, 64])
    got = list(li.search_stream(batches, n_buckets=5, k=10,
                                search_config=scfg, depth=2))
    for (qn, qs), (d_s, i_s) in zip(batches, got):
        d_ref, i_ref = li.search(qn, qs, n_buckets=5, k=10,
                                 search_config=scfg)
        np.testing.assert_array_equal(i_s, i_ref)
        np.testing.assert_allclose(d_s, d_ref, rtol=0, atol=0)


def test_stream_hierarchical(synthetic_small):
    """search_stream is inherited by HierarchicalIndex (joint router
    dispatches through the same plan machinery); results must equal the
    synchronous search per batch."""
    from tpulmi.hierarchical import HierarchicalConfig, HierarchicalIndex

    cfg = HierarchicalConfig(
        n_groups=3,
        inner=IndexConfig(n_categories=6, epochs=4, lr=0.003,
                          model_type="MLP-5"),
    )
    hi = HierarchicalIndex(cfg)
    hi.build(synthetic_small["data_nav"][:8000],
             synthetic_small["data_search"][:8000])
    batches = _batches(synthetic_small, [50, 50, 50])
    got = list(hi.search_stream(batches, n_buckets=4, k=10, depth=2))
    for (qn, qs), (d_s, i_s) in zip(batches, got):
        d_ref, i_ref = hi.search(qn, qs, n_buckets=4, k=10)
        np.testing.assert_array_equal(i_s, i_ref)


def test_stream_overlap_finalize_runs_off_thread(built, synthetic_small):
    """overlap_finalize moves the host post-process to the worker thread
    (steady-state batches), and overlap_finalize=False keeps everything on
    the caller's thread; both must return `search`'s exact results."""
    import threading

    batches = _batches(synthetic_small, [50, 50, 50, 50])
    want = [built.search(qn, qs, n_buckets=4, k=10) for qn, qs in batches]

    idents = []
    orig = built._finalize

    def recording_finalize(*a, **kw):
        idents.append(threading.get_ident())
        return orig(*a, **kw)

    built._finalize = recording_finalize
    try:
        got = list(built.search_stream(batches, n_buckets=4, k=10, depth=2))
        assert any(t != threading.get_ident() for t in idents)
        off = list(built.search_stream(batches, n_buckets=4, k=10, depth=2,
                                       overlap_finalize=False))
        assert all(t == threading.get_ident() for t in idents[len(got):])
    finally:
        built._finalize = orig
    for (wd, wi), (gd, gi), (od, oi) in zip(want, got, off):
        np.testing.assert_array_equal(gi, wi)
        np.testing.assert_array_equal(oi, wi)
        np.testing.assert_allclose(gd, wd, rtol=0, atol=0)
        np.testing.assert_allclose(od, wd, rtol=0, atol=0)
