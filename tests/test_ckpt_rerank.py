"""Quantized-checkpoint rerank contract: save -> load must preserve the
exact host rerank (VERDICT r2 weak #4 — an int8 checkpoint previously lost
its rerank corpus silently and searched quantized-only)."""

import numpy as np
import pytest

from tpulmi.index import LearnedIndex
from tpulmi.utils.config import IndexConfig, SearchConfig


def _unit(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture()
def quantized_index(rng):
    nav = _unit(rng, 1500, 16)
    data = _unit(rng, 1500, 64)
    li = LearnedIndex(IndexConfig(
        n_categories=8, epochs=3, lr=0.003, batch_size=256, row_align=1,
    ))
    li.build(nav, data)
    li.quantize(host_corpus=data, normalized=True)
    queries_nav = _unit(rng, 24, 16)
    queries_search = _unit(rng, 24, 64)
    return li, data, queries_nav, queries_search


def test_included_corpus_roundtrip(tmp_path, quantized_index):
    li, data, qn, qs = quantized_index
    scfg = SearchConfig(k=5, backend="xla")
    d0, i0 = li.search(qn, qs, n_buckets=3, k=5, search_config=scfg)

    li.save(tmp_path / "ckpt", include_corpus=True)
    restored = LearnedIndex.load(tmp_path / "ckpt")
    assert restored._host_corpus is not None
    d1, i1 = restored.search(qn, qs, n_buckets=3, k=5, search_config=scfg)
    np.testing.assert_allclose(d1, d0, atol=1e-6)
    np.testing.assert_array_equal(i1, i0)


def test_missing_corpus_warns_and_attach_restores(tmp_path, quantized_index,
                                                  caplog):
    li, data, qn, qs = quantized_index
    scfg = SearchConfig(k=5, backend="xla")
    d0, i0 = li.search(qn, qs, n_buckets=3, k=5, search_config=scfg)

    li.save(tmp_path / "ckpt")  # fingerprint only; corpus is not a memmap
    import logging

    with caplog.at_level(logging.WARNING):
        restored = LearnedIndex.load(tmp_path / "ckpt")
    assert restored._host_corpus is None
    assert any("WITHOUT its rerank corpus" in r.message % r.args
               if r.args else "WITHOUT its rerank corpus" in r.message
               for r in caplog.records)

    # attaching the right corpus restores the exact pre-save results
    restored.attach_host_corpus(data)
    d1, i1 = restored.search(qn, qs, n_buckets=3, k=5, search_config=scfg)
    np.testing.assert_allclose(d1, d0, atol=1e-6)
    np.testing.assert_array_equal(i1, i0)

    # attaching the WRONG corpus is rejected by the fingerprint
    wrong = np.roll(data, 1, axis=0)
    with pytest.raises(ValueError, match="fingerprint"):
        restored.attach_host_corpus(wrong)


def test_memmap_corpus_reattaches_by_path(tmp_path, rng):
    nav = _unit(rng, 1000, 16)
    data = _unit(rng, 1000, 64)
    corpus_path = tmp_path / "corpus.npy"
    np.save(corpus_path, data)
    corpus = np.load(corpus_path, mmap_mode="r")

    li = LearnedIndex(IndexConfig(
        n_categories=6, epochs=3, lr=0.003, batch_size=256, row_align=1,
    ))
    li.build(nav, data)
    li.quantize(host_corpus=corpus, normalized=True)
    qn, qs = _unit(rng, 16, 16), _unit(rng, 16, 64)
    scfg = SearchConfig(k=5, backend="xla")
    d0, i0 = li.search(qn, qs, n_buckets=3, k=5, search_config=scfg)

    li.save(tmp_path / "ckpt")  # records corpus_path, no copy
    assert not (tmp_path / "ckpt" / "corpus.npy").exists()
    restored = LearnedIndex.load(tmp_path / "ckpt")
    assert restored._host_corpus is not None
    d1, i1 = restored.search(qn, qs, n_buckets=3, k=5, search_config=scfg)
    np.testing.assert_allclose(d1, d0, atol=1e-6)
    np.testing.assert_array_equal(i1, i0)
