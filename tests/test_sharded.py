"""Multi-chip paths on an 8-device virtual CPU mesh: sharded search must
equal the single-chip pipeline's k-set; DP training must run and reduce loss."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpulmi.buckets import build_bucket_store
from tpulmi.models.mlp import make_model
from tpulmi.ops.distance import exact_knn
from tpulmi.parallel.mesh import make_mesh
from tpulmi.parallel.sharded import (
    make_dp_train_step,
    shard_store,
    sharded_probe_search,
)
from tpulmi.search import probe_search


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8, ("buckets",))


def _setup(rng, n=3000, d=16, c=22, q=48):
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = rng.normal(size=(q, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    labels = rng.integers(0, c, size=n).astype(np.int32)
    store = build_bucket_store(labels, data, c)
    return data, queries, labels, store


def test_sharded_probe_all_equals_exact(rng, mesh8):
    data, queries, labels, store = _setup(rng)
    sstore = shard_store(store, 8)
    probes = np.tile(np.arange(store.n_categories, dtype=np.int32),
                     (queries.shape[0], 1))
    dists, ids = sharded_probe_search(probes, queries, sstore, mesh8, k=10)
    want_d, _ = exact_knn(queries, data, k=10, normalized=True)
    np.testing.assert_allclose(np.asarray(dists), np.asarray(want_d), atol=1e-5)
    chosen = 1.0 - np.einsum("qkd,qd->qk", data[np.asarray(ids)], queries)
    np.testing.assert_allclose(chosen, np.asarray(want_d), atol=1e-5)


def test_sharded_matches_single_chip(rng, mesh8):
    data, queries, labels, store = _setup(rng)
    sstore = shard_store(store, 8)
    probes = np.stack(
        [rng.permutation(store.n_categories)[:5] for _ in range(queries.shape[0])]
    ).astype(np.int32)
    d_single, i_single = probe_search(probes, queries, store, k=10)
    d_shard, i_shard = sharded_probe_search(probes, queries, sstore, mesh8, k=10)
    np.testing.assert_allclose(
        np.asarray(d_shard), np.asarray(d_single), atol=1e-5
    )


def test_shard_store_partition(rng):
    data, queries, labels, store = _setup(rng, c=10)
    sstore = shard_store(store, 4)
    assert sstore.n_shards == 4
    assert sstore.cat_pad == 3  # ceil(10/4)
    # all real rows present exactly once across shards
    all_ids = np.asarray(sstore.ids_sorted).reshape(-1)
    real = np.sort(all_ids[all_ids >= 0])
    np.testing.assert_array_equal(real, np.arange(data.shape[0]))
    # per-shard counts match the global ones
    counts = np.asarray(store.counts)
    cnts = np.asarray(sstore.counts)
    for s in range(4):
        lo, hi = 3 * s, min(3 * (s + 1), 10)
        np.testing.assert_array_equal(cnts[s, : hi - lo], counts[lo:hi])


def test_sharded_with_empty_shards(rng, mesh8):
    """Fewer buckets than shards: trailing shards own only padding buckets
    and must contribute nothing but sentinels."""
    data, queries, labels, store = _setup(rng, n=800, c=5, q=16)
    sstore = shard_store(store, 8)  # ceil(5/8)=1 bucket per shard, 3 empty
    probes = np.stack(
        [rng.permutation(5)[:2] for _ in range(16)]
    ).astype(np.int32)
    d_single, _ = probe_search(probes, queries, store, k=10)
    d_shard, i_shard = sharded_probe_search(probes, queries, sstore, mesh8, k=10)
    np.testing.assert_allclose(
        np.asarray(d_shard), np.asarray(d_single), atol=1e-5
    )
    assert np.asarray(i_shard).max() < 800


def test_dp_train_step(rng, mesh8):
    model = make_model("MLP-5", n_classes=6)
    tx = optax.adam(1e-2)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)))["params"]
    opt_state = tx.init(params)
    step = make_dp_train_step(model, tx, make_mesh(8, ("data",)))

    centers = 3.0 * rng.normal(size=(6, 16)).astype(np.float32)
    y = rng.integers(0, 6, size=1024).astype(np.int32)
    x = centers[y] + 0.3 * rng.normal(size=(1024, 16)).astype(np.float32)

    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5


def test_facade_shard_search_matches_single(rng, synthetic_small, mesh8):
    """LearnedIndex.shard(mesh): the transparent multi-chip search returns
    the same k-set as single-chip, and repeated calls reuse one compiled
    program (no per-call recompile)."""
    from tpulmi.index import LearnedIndex
    from tpulmi.utils.config import IndexConfig, SearchConfig

    li = LearnedIndex(IndexConfig(
        n_categories=24, epochs=4, lr=0.003, batch_size=512, row_align=1,
    ))
    li.build(synthetic_small["data_nav"], synthetic_small["data_search"])
    qn = synthetic_small["queries_nav"][:64]
    qs = synthetic_small["queries_search"][:64]
    scfg = SearchConfig(k=10, backend="xla")
    d_single, i_single = li.search(qn, qs, n_buckets=5, k=10,
                                   search_config=scfg)

    li.shard(mesh8)
    d_shard, i_shard = li.search(qn, qs, n_buckets=5, k=10, search_config=scfg)
    np.testing.assert_allclose(d_shard, d_single, atol=1e-5)
    n_progs = len(li._sharded_programs)
    # repeated searches: same program, same answers
    d2, i2 = li.search(qn, qs, n_buckets=5, k=10, search_config=scfg)
    assert len(li._sharded_programs) == n_progs == 1
    np.testing.assert_array_equal(i2, i_shard)

    li.unshard()
    d3, _ = li.search(qn, qs, n_buckets=5, k=10, search_config=scfg)
    np.testing.assert_allclose(d3, d_single, atol=1e-5)


def test_facade_shard_quantized(rng, synthetic_small, mesh8):
    """Sharded search over an int8 store (per-shard codes + scales),
    including the host rerank."""
    from tpulmi.index import LearnedIndex
    from tpulmi.ops.distance import exact_knn
    from tpulmi.utils.config import IndexConfig, SearchConfig

    data = np.asarray(synthetic_small["data_search"], np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    li = LearnedIndex(IndexConfig(
        n_categories=24, epochs=4, lr=0.003, batch_size=512, row_align=1,
    ))
    li.build(synthetic_small["data_nav"], data)
    li.quantize(host_corpus=data, normalized=True)
    li.shard(mesh8)
    qn = synthetic_small["queries_nav"][:64]
    qs = synthetic_small["queries_search"][:64]
    scfg = SearchConfig(k=10, backend="xla")
    d_q, i_q = li.search(qn, qs, n_buckets=24, k=10, search_config=scfg)
    # all buckets probed + rerank == exact oracle
    want_d, want_i = exact_knn(qs, data, k=10, normalized=True)
    np.testing.assert_array_equal(i_q, np.asarray(want_i) + 1)
    np.testing.assert_allclose(d_q, np.asarray(want_d), atol=1e-5)


def test_build_distributed(rng, synthetic_small, mesh8):
    """The one-program multi-chip build: DP-trained router (pmean'd grads),
    sharded k-means assign, sharded predict — then transparent sharded
    search. Quality must match the single-device build's regime."""
    from tpulmi.baseline import Baseline
    from tpulmi.index import LearnedIndex
    from tpulmi.parallel.mesh import make_mesh
    from tpulmi.utils.config import IndexConfig, SearchConfig

    cfg = IndexConfig(n_categories=24, epochs=6, lr=0.003, batch_size=1024,
                      row_align=1)
    li = LearnedIndex(cfg)
    mesh = make_mesh(8, ("data",))
    pred, _ = li.build_distributed(
        synthetic_small["data_nav"], synthetic_small["data_search"],
        mesh=mesh,
    )
    assert pred.shape[0] == synthetic_small["data_nav"].shape[0]
    assert li._sharded is not None  # search now runs multi-chip

    qn = synthetic_small["queries_nav"][:128]
    qs = synthetic_small["queries_search"][:128]
    _, gt, _ = Baseline().search(qs, synthetic_small["data_search"], k=10)
    _, ids = li.search(qn, qs, n_buckets=6, k=10,
                       search_config=SearchConfig(k=10, backend="xla"))
    recall = np.mean([
        len(set(ids[i]) & set(gt[i])) / 10 for i in range(ids.shape[0])
    ])
    assert recall > 0.9

    # the DP-trained router actually learned the partition: training loss
    # must have dropped well below chance (ln 24 ≈ 3.18)
    li.unshard()
    _, ids2 = li.search(qn, qs, n_buckets=6, k=10,
                        search_config=SearchConfig(k=10, backend="xla"))
    np.testing.assert_array_equal(ids2, ids)


def _pallas_index(rng, n=4096, d_nav=24, d=128, c=16, row_align=128):
    """A facade index whose store satisfies the Pallas kernel's alignment
    (d % 128 == 0, row_align % mc == 0) so backend="pallas" applies on
    every shard (per-shard stores inherit row_align)."""
    from tpulmi.index import LearnedIndex
    from tpulmi.utils.config import IndexConfig

    data_nav = rng.normal(size=(n, d_nav)).astype(np.float32)
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    li = LearnedIndex(IndexConfig(
        n_categories=c, epochs=4, lr=0.003, batch_size=512,
        row_align=row_align,
    ))
    li.build(data_nav, data)
    return li, data_nav, data


def test_facade_shard_pallas_matches_xla(rng, mesh8):
    """backend="pallas" through the facade's sharded program (the fused
    kernel running per shard under shard_map, interpret mode on CPU) must
    return the single-chip k-set — the multi-chip path inherits the
    measured ~3.3x kernel speedup (NOTES.md) instead of being pinned to
    the XLA pipeline."""
    from tpulmi.utils.config import SearchConfig

    li, data_nav, data = _pallas_index(rng)
    qn, qs = data_nav[:48], data[:48]
    scfg_x = SearchConfig(k=10, backend="xla", compute_dtype=None)
    scfg_p = SearchConfig(k=10, backend="pallas", compute_dtype=None,
                          pallas_qc=128, pallas_mc=128,
                          pallas_extract="scalar")
    d_single, i_single = li.search(qn, qs, n_buckets=4, k=10,
                                   search_config=scfg_x)
    li.shard(mesh8)
    d_x, i_x = li.search(qn, qs, n_buckets=4, k=10, search_config=scfg_x)
    d_p, i_p = li.search(qn, qs, n_buckets=4, k=10, search_config=scfg_p)
    np.testing.assert_allclose(d_p, d_single, atol=1e-5)
    np.testing.assert_allclose(d_p, d_x, atol=1e-5)
    assert (i_p == i_x).mean() > 0.99
    assert (i_p == i_single).mean() > 0.99
    # paired-block grid per shard: same k-set again
    scfg_pp = SearchConfig(k=10, backend="pallas", compute_dtype=None,
                           pallas_qc=128, pallas_mc=128,
                           pallas_extract="scalar", pallas_pair=True)
    d_pp, i_pp = li.search(qn, qs, n_buckets=4, k=10, search_config=scfg_pp)
    np.testing.assert_allclose(d_pp, d_single, atol=1e-5)
    assert (i_pp == i_single).mean() > 0.99


def test_facade_shard_pallas_quantized_rerank(rng, mesh8):
    """Sharded pallas over an int8 store with int8 query tiles + the host
    rerank: probing every bucket must reproduce the exact oracle (the
    rerank erases both quantization errors)."""
    from tpulmi.ops.distance import exact_knn
    from tpulmi.utils.config import SearchConfig

    li, data_nav, data = _pallas_index(rng, n=6000, row_align=1024)
    li.quantize(host_corpus=data, normalized=True)
    li.shard(mesh8)
    qn, qs = data_nav[:32], data[:32]
    scfg = SearchConfig(k=10, backend="pallas", compute_dtype=None,
                        pallas_qc=128, pallas_mc=1024, int8_queries=True)
    d_p, i_p = li.search(qn, qs, n_buckets=16, k=10, search_config=scfg)
    want_d, want_i = exact_knn(qs, data, k=10, normalized=True)
    np.testing.assert_array_equal(i_p, np.asarray(want_i) + 1)
    np.testing.assert_allclose(d_p, np.asarray(want_d), atol=1e-5)


def test_sharded_search_stream_dispatch_ahead(rng, mesh8):
    """Sharded `search_stream` pipelines through the multi-chip program
    (plan → dispatch-ahead → absorb) instead of degrading to sequential
    `search` calls; results must equal per-batch `search` exactly."""
    from tpulmi.utils.config import SearchConfig

    li, data_nav, data = _pallas_index(rng)
    li.shard(mesh8)
    scfg = SearchConfig(k=10, backend="xla", compute_dtype=None)
    batches = [(data_nav[lo:lo + 40], data[lo:lo + 40])
               for lo in range(0, 200, 40)]
    want = [li.search(qn, qs, n_buckets=4, k=10, search_config=scfg)
            for qn, qs in batches]
    assert ("sharded", 40, 4) in li._qpb_pads  # pads validated → pipeline on
    calls = {"n": 0}
    orig = li.search

    def counting_search(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    li.search = counting_search
    got = list(li.search_stream(batches, n_buckets=4, k=10,
                                search_config=scfg, depth=2))
    li.search = orig
    assert calls["n"] == 0  # every batch dispatched ahead, none fell back
    for (wd, wi), (gd, gi) in zip(want, got):
        np.testing.assert_array_equal(gi, wi)
        np.testing.assert_allclose(gd, wd, atol=1e-6)
