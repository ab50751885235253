"""Centroid-bound threshold pruning: the spherical-cap tile-skip must save
scan work while producing BIT-IDENTICAL results to the unpruned pipeline
(the reference's threshold prune also cannot change results —
`search/li/utils.py:14-43` only skips work)."""

import numpy as np
import pytest

import jax

from tpulmi.buckets import build_bucket_store, compute_bucket_bounds
from tpulmi.index import LearnedIndex
from tpulmi.utils.config import IndexConfig, SearchConfig


def _unit(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_bound_is_a_true_lower_bound(rng):
    """For every (query, bucket): min exact distance over the bucket's rows
    must be ≥ the spherical-cap bound."""
    n, d, n_cat, q = 2000, 32, 8, 50
    data = _unit(rng, n, d)
    labels = rng.integers(0, n_cat, size=n).astype(np.int32)
    store = compute_bucket_bounds(
        build_bucket_store(labels, data, n_cat, pad_rows=64), chunk=512)
    queries = _unit(rng, q, d)

    cb = np.asarray(jax.device_get(store.bucket_centroids))
    cr = np.asarray(jax.device_get(store.bucket_cos_r))
    mn = np.asarray(jax.device_get(store.bucket_max_norm))
    cq = np.clip(queries @ cb.T, -1.0, 1.0)              # (q, n_cat)
    cos_delta = np.where(
        cq >= cr[None, :], 1.0,
        cq * cr[None, :]
        + np.sqrt(np.maximum(1 - cq ** 2, 0.0))
        * np.sqrt(np.maximum(1 - cr[None, :] ** 2, 0.0)))
    bound = 1.0 - mn[None, :] * np.maximum(cos_delta, 0.0)

    dists = 1.0 - queries @ data.T                        # (q, n)
    for c in range(n_cat):
        rows = labels == c
        if not rows.any():
            continue
        dmin = dists[:, rows].min(axis=1)
        assert np.all(dmin >= bound[:, c] - 1e-5)


def _tight_clusters(seed=11, n=6000, q=64, d_nav=12, d=24, n_clusters=12,
                    noise=0.03):
    """TIGHT low-dimensional clusters: the spherical-cap bound only fires
    when bucket radii are small relative to inter-bucket angles, which
    high-dimensional concentration rules out (in 768-d even sub-cluster
    caps prune ~0% — the scan-work killer there is probe-mass truncation,
    see SearchConfig.probe_mass). This regime is where the exact prune
    earns its keep."""
    rng = np.random.default_rng(seed)
    cents = _unit(rng, n_clusters, d)
    cents_nav = _unit(rng, n_clusters, d_nav)
    a = rng.integers(0, n_clusters, size=n)
    data = cents[a] + noise * rng.normal(size=(n, d))
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    nav = cents_nav[a] + noise * rng.normal(size=(n, d_nav))
    aq = rng.integers(0, n_clusters, size=q)
    qs = cents[aq] + noise * rng.normal(size=(q, d))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    qn = cents_nav[aq] + noise * rng.normal(size=(q, d_nav))
    return nav.astype(np.float32), data.astype(np.float32), \
        qn.astype(np.float32), qs.astype(np.float32)


@pytest.fixture(scope="module")
def clustered_index():
    nav, data, qn, qs = _tight_clusters()
    li = LearnedIndex(IndexConfig(
        n_categories=12, epochs=8, lr=0.003, batch_size=512, row_align=1,
    ))
    li.build(nav, data)
    li.compute_bounds(chunk=1024)
    return li, qn, qs


@pytest.mark.parametrize("compute_dtype", ["float32", "bfloat16"])
def test_prune_identical_results(clustered_index, compute_dtype):
    li, qn, qs = clustered_index
    base = SearchConfig(k=10, backend="xla", compute_dtype=compute_dtype)
    pruned = SearchConfig(k=10, backend="xla", compute_dtype=compute_dtype,
                          prune_after=1)
    d0, i0 = li.search(qn, qs, n_buckets=8, k=10, search_config=base)
    assert li.last_scan_rows is None  # stats only exist when pruning
    d1, i1 = li.search(qn, qs, n_buckets=8, k=10, search_config=pruned)
    np.testing.assert_array_equal(i1, i0)
    np.testing.assert_array_equal(d1, d0)
    # tight clusters + probe-0 threshold: most deeper probes are provably
    # fruitless and their scans must actually be skipped
    assert li.last_scan_rows is not None
    assert li.last_scan_rows < li.last_nominal_rows


def test_prune_identical_results_int8():
    nav, data, qn, qs = _tight_clusters(seed=13)
    li = LearnedIndex(IndexConfig(
        n_categories=12, epochs=8, lr=0.003, batch_size=512, row_align=1,
    ))
    li.build(nav, data)
    li.quantize(host_corpus=data, normalized=True)
    li.compute_bounds(chunk=1024)   # bounds AFTER quantize: they describe
    # the stored codes the scan will actually compute distances on
    base = SearchConfig(k=10, backend="xla", compute_dtype="float32")
    pruned = SearchConfig(k=10, backend="xla", compute_dtype="float32",
                          prune_after=1)
    d0, i0 = li.search(qn, qs, n_buckets=6, k=10, search_config=base)
    d1, i1 = li.search(qn, qs, n_buckets=6, k=10, search_config=pruned)
    np.testing.assert_array_equal(i1, i0)
    np.testing.assert_array_equal(d1, d0)
    assert li.last_scan_rows < li.last_nominal_rows


def test_bounds_survive_checkpoint(clustered_index, tmp_path):
    li, qn, qs = clustered_index
    li.save(tmp_path / "ckpt")
    restored = LearnedIndex.load(tmp_path / "ckpt")
    assert restored.built.store.has_bounds
    pruned = SearchConfig(k=10, backend="xla", compute_dtype="float32",
                          prune_after=1)
    d0, i0 = li.search(qn[:32], qs[:32], n_buckets=8, k=10,
                       search_config=pruned)
    d1, i1 = restored.search(qn[:32], qs[:32], n_buckets=8, k=10,
                             search_config=pruned)
    np.testing.assert_array_equal(i1, i0)
    np.testing.assert_array_equal(d1, d0)


def test_batched_queries_accumulate_scan_stats(clustered_index):
    li, qn, qs = clustered_index
    pruned = SearchConfig(k=10, backend="xla", compute_dtype="float32",
                          prune_after=1)
    li.search(qn, qs, n_buckets=8, k=10, search_config=pruned)
    whole = (li.last_scan_rows, li.last_nominal_rows)
    batched = SearchConfig(k=10, backend="xla", compute_dtype="float32",
                           prune_after=1, batch_queries=20)
    li.search(qn, qs, n_buckets=8, k=10, search_config=batched)
    # stats accumulate over the sub-batches (nominal is query-chunk
    # granular, so its absolute value legitimately differs per batching)
    assert whole[0] is not None and whole[0] < whole[1]
    assert li.last_scan_rows is not None
    assert li.last_scan_rows <= li.last_nominal_rows


def test_probe_mass_full_keeps_everything(clustered_index):
    """probe_mass=1.0 keeps every probe — identical results, and the scan
    counters become available."""
    li, qn, qs = clustered_index
    base = SearchConfig(k=10, backend="xla", compute_dtype="float32")
    full = SearchConfig(k=10, backend="xla", compute_dtype="float32",
                        probe_mass=1.0)
    d0, i0 = li.search(qn, qs, n_buckets=6, k=10, search_config=base)
    d1, i1 = li.search(qn, qs, n_buckets=6, k=10, search_config=full)
    np.testing.assert_array_equal(i1, i0)
    np.testing.assert_array_equal(d1, d0)
    assert li.last_scan_rows == li.last_nominal_rows


def test_probe_mass_truncation_saves_scan_work(clustered_index):
    """On tight clusters the router's mass concentrates: a 0.9 mass stop
    must scan far fewer rows than the full budget at equal recall. Savings
    are query-chunk granular, so use enough queries that buckets span
    several chunks (the 20M bench regime: ~1000 slots/bucket at qc=512)."""
    li, _, _ = clustered_index
    _, _, qn, qs = _tight_clusters(q=256)
    full = SearchConfig(k=10, backend="xla", compute_dtype="float32",
                        probe_mass=1.0, query_chunk=16)
    li.search(qn, qs, n_buckets=8, k=10, search_config=full)
    rows_full = li.last_scan_rows
    trunc = SearchConfig(k=10, backend="xla", compute_dtype="float32",
                         probe_mass=0.9, query_chunk=16)
    d1, i1 = li.search(qn, qs, n_buckets=8, k=10, search_config=trunc)
    assert li.last_scan_rows < rows_full
    # recall vs the exact oracle stays high: dropped probes carried ~no mass
    from tpulmi.ops.distance import exact_knn

    # reconstruct the corpus the fixture indexed
    nav, data, _, _ = _tight_clusters()
    _, gt = exact_knn(qs, data, k=10)
    gt = np.asarray(gt) + 1
    recall = np.mean([
        len(set(i1[r]) & set(gt[r])) / 10 for r in range(len(qs))
    ])
    assert recall > 0.95


def test_probe_mass_sharded_ragged_shards():
    """n_categories % n_shards != 0: the last shard's local bucket window is
    ragged (hi - lo < cat_pad). Truncation dump ids must fall outside EVERY
    shard's local range — a dump id equal to the global bucket count lands
    INSIDE the ragged last shard's padded window, turning every truncated
    slot into a live (empty-bucket) slot and inflating that shard's slot
    counts/qpb_pad (regression: sharded.py used logits.shape[1] as dump)."""
    from tpulmi.parallel.mesh import make_mesh

    nav, data, qn, qs = _tight_clusters(seed=17, n_clusters=10)
    li = LearnedIndex(IndexConfig(
        n_categories=10, epochs=8, lr=0.003, batch_size=512, row_align=1,
    ))
    li.build(nav, data)
    trunc = SearchConfig(k=10, backend="xla", compute_dtype="float32",
                         probe_mass=0.9)
    d0, i0 = li.search(qn, qs, n_buckets=8, k=10, search_config=trunc)
    q = len(qn)
    li.shard(make_mesh(4, ("buckets",)))  # 10 cats / 4 shards: cat_pad=3,
    try:                                  # last shard owns one real bucket
        d1, i1 = li.search(qn, qs, n_buckets=8, k=10, search_config=trunc)
    finally:
        li.unshard()
    np.testing.assert_allclose(d1, d0, atol=1e-6)
    # dumped slots must not count toward any shard's slot load: the sharded
    # program's validated pad can never exceed the flat program's
    assert li._qpb_pads[("sharded", q, 8)] <= li._qpb_pads[(q, 8)]


def test_probe_mass_sharded_matches_flat(clustered_index):
    """The sharded program's truncation (dump ids dropped by the shard
    remap) must produce the flat program's exact results."""
    from tpulmi.parallel.mesh import make_mesh

    li, qn, qs = clustered_index
    trunc = SearchConfig(k=10, backend="xla", compute_dtype="float32",
                         probe_mass=0.9)
    d0, i0 = li.search(qn, qs, n_buckets=8, k=10, search_config=trunc)
    li.shard(make_mesh(4, ("buckets",)))
    try:
        d1, i1 = li.search(qn, qs, n_buckets=8, k=10, search_config=trunc)
    finally:
        li.unshard()
    np.testing.assert_allclose(d1, d0, atol=1e-6)


def test_sharded_batched_search_clears_stale_scan_stats(clustered_index):
    """The sharded path keeps no scan counters; after a flat pruned search
    set them, a batched sharded search must report None — not the previous
    flat totals summed once per batch (regression)."""
    from tpulmi.parallel.mesh import make_mesh

    li, qn, qs = clustered_index
    pruned = SearchConfig(k=10, backend="xla", compute_dtype="float32",
                          prune_after=1)
    li.search(qn, qs, n_buckets=8, k=10, search_config=pruned)
    assert li.last_scan_rows is not None
    li.shard(make_mesh(4, ("buckets",)))
    try:
        batched = SearchConfig(k=10, backend="xla", compute_dtype="float32",
                               batch_queries=20)
        li.search(qn, qs, n_buckets=8, k=10, search_config=batched)
    finally:
        li.unshard()
    assert li.last_scan_rows is None and li.last_nominal_rows is None
