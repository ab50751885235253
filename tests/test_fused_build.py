"""Fused single-program build vs the modular per-stage path."""

import numpy as np
import pytest

from tpulmi.baseline import Baseline
from tpulmi.index import LearnedIndex
from tpulmi.utils.config import IndexConfig


def _recall(ids, gt_ids, k=10):
    return np.mean(
        [len(set(ids[i, :k]) & set(gt_ids[i, :k])) / k for i in range(ids.shape[0])]
    )


def test_fused_build_recall_parity(synthetic_small):
    gt = Baseline().search(
        synthetic_small["queries_search"], synthetic_small["data_search"], k=10
    )[1]
    recalls = {}
    for fused in (True, False):
        cfg = IndexConfig(
            n_categories=24, epochs=8, lr=0.003, model_type="MLP-5",
            fused_build=fused,
        )
        li = LearnedIndex(cfg)
        pred, build_t = li.build(
            synthetic_small["data_nav"], synthetic_small["data_search"]
        )
        assert pred.shape == (synthetic_small["data_nav"].shape[0],)
        _, ids = li.search(
            synthetic_small["queries_nav"], synthetic_small["queries_search"],
            n_buckets=4, k=10,
        )
        recalls[fused] = _recall(ids, gt)
    assert recalls[True] > 0.9
    assert abs(recalls[True] - recalls[False]) < 0.05


def test_reference_step_semantics_build(synthetic_small):
    """The reference's one-optimizer-step-per-epoch training bug is
    reproducible behind a flag (SURVEY.md §3.6): the build completes and the
    index still works, just with a weaker router."""
    cfg = IndexConfig(n_categories=24, epochs=20, lr=0.01, model_type="MLP-5",
                      reference_step_semantics=True)
    li = LearnedIndex(cfg)
    pred, _ = li.build(synthetic_small["data_nav"], synthetic_small["data_search"])
    _, ids = li.search(
        synthetic_small["queries_nav"], synthetic_small["queries_search"],
        n_buckets=24, k=10,
    )
    gt = Baseline().search(
        synthetic_small["queries_search"], synthetic_small["data_search"], k=10
    )[1]
    # probing ALL buckets is exhaustive regardless of router quality (the
    # ~1% slack is bf16 distance rounding swapping near-ties vs the f32
    # oracle, not missed candidates)
    assert _recall(ids, gt) > 0.98


def test_fused_build_store_consistent(synthetic_small):
    cfg = IndexConfig(n_categories=24, epochs=4, lr=0.003, fused_build=True,
                      row_align=256)
    li = LearnedIndex(cfg)
    pred, _ = li.build(synthetic_small["data_nav"], synthetic_small["data_search"])
    store = li.built.store
    ids = np.asarray(store.ids_sorted)
    offsets = np.asarray(store.offsets)
    counts = np.asarray(store.counts)
    np.testing.assert_array_equal(counts, np.bincount(pred, minlength=24))
    # bucket row ranges are 256-aligned: real rows first, sentinel padding after
    assert (offsets % 256 == 0).all()
    for b in (0, 7, 23):
        real = ids[offsets[b]: offsets[b] + counts[b]]
        np.testing.assert_array_equal(np.sort(real), np.where(pred == b)[0])
        pad = ids[offsets[b] + counts[b]: offsets[b + 1]]
        assert (pad == -1).all()
    # every real row appears exactly once overall
    all_real = np.sort(ids[ids >= 0])
    np.testing.assert_array_equal(all_real,
                                  np.arange(synthetic_small["data_nav"].shape[0]))
