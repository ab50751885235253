"""Per-shard host-layout upload: >HBM stores must shard WITHOUT ever being
resident on a single device (VERDICT r2 missing #1; BASELINE.md 100M row;
SURVEY.md §7 stage 9)."""

import numpy as np
import pytest

import jax

from tpulmi.hoststore import layout_host_store
from tpulmi.index import LearnedIndex
from tpulmi.parallel.mesh import make_mesh
from tpulmi.parallel.sharded import shard_store, shard_store_from_host
from tpulmi.utils.config import IndexConfig, SearchConfig


def _unit(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


N_DEV = 4


@pytest.mark.parametrize("store_dtype", ["float32", "int8", "int4"])
def test_shard_from_host_matches_shard_store(rng, store_dtype):
    """shard_store_from_host(arrays, mesh) must produce exactly the shards
    shard_store builds from a one-device store of the same layout — with a
    small slab size so the per-shard dynamic_update_slice loop (multiple
    slabs + ragged tail) is exercised."""
    from tpulmi.buckets import BucketStore

    n, d, n_cat = 3000, 32, 10
    data = _unit(rng, n, d)
    pred = rng.integers(0, n_cat, size=n).astype(np.int32)
    arrays = layout_host_store(
        pred, data, n_cat, row_align=1, store_dtype=store_dtype,
        normalized=True, pad_rows=64,
    )
    mesh = make_mesh(N_DEV, ("buckets",))
    sstore = shard_store_from_host(arrays, mesh, slab_rows=256)

    flat = BucketStore(
        data_sorted=jax.numpy.asarray(arrays.data_sorted),
        ids_sorted=jax.numpy.asarray(arrays.ids_sorted),
        offsets=jax.numpy.asarray(arrays.offsets),
        counts=jax.numpy.asarray(arrays.counts),
        n=arrays.n, pad_rows=arrays.pad_rows, row_align=arrays.row_align,
        scales=(jax.numpy.asarray(arrays.scales)
                if arrays.scales is not None else None),
        quant_bits=arrays.quant_bits,
    )
    want = shard_store(flat, N_DEV)
    assert sstore.quant_bits == want.quant_bits == arrays.quant_bits

    np.testing.assert_array_equal(
        np.asarray(jax.device_get(sstore.ids_sorted)),
        np.asarray(jax.device_get(want.ids_sorted)))
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(sstore.offsets)),
        np.asarray(jax.device_get(want.offsets)))
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(sstore.counts)),
        np.asarray(jax.device_get(want.counts)))
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(sstore.bucket_start)),
        np.asarray(jax.device_get(want.bucket_start)))
    got_data = np.asarray(jax.device_get(sstore.data_sorted), np.float32)
    want_data = np.asarray(jax.device_get(want.data_sorted), np.float32)
    np.testing.assert_array_equal(got_data, want_data)
    if store_dtype in ("int8", "int4"):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(sstore.scales)),
            np.asarray(jax.device_get(want.scales)))

    # the point of the exercise: one shard per device, never the full store
    shards = sstore.data_sorted.addressable_shards
    assert len(shards) == N_DEV
    for s in shards:
        assert s.data.shape[0] == 1  # 1/N_DEV of the global leading axis
    assert len({s.device for s in shards}) == N_DEV


def test_host_store_mesh_build_matches_single_chip(rng):
    """build_with_host_store(mesh=...) searches identically to the same
    build landed on one device."""
    n, q = 4000, 32
    nav = _unit(rng, n, 16)
    data = _unit(rng, n, 64)
    qn, qs = _unit(rng, q, 16), _unit(rng, q, 64)
    cfg = IndexConfig(n_categories=12, epochs=3, lr=0.003, batch_size=512,
                      row_align=1)
    scfg = SearchConfig(k=5, backend="xla")

    li1 = LearnedIndex(cfg)
    li1.build_with_host_store(nav, data, normalized=True,
                              store_dtype="float32")
    d1, i1 = li1.search(qn, qs, n_buckets=4, k=5, search_config=scfg)

    mesh = make_mesh(N_DEV, ("buckets",))
    li2 = LearnedIndex(cfg)
    li2.build_with_host_store(nav, data, normalized=True,
                              store_dtype="float32", mesh=mesh)
    assert li2._sharded is not None
    d2, i2 = li2.search(qn, qs, n_buckets=4, k=5, search_config=scfg)
    np.testing.assert_allclose(d2, d1, atol=1e-5)
    # distance ties can reorder equal-distance ids across merges; the
    # distance multiset must match exactly, ids where distances are unique
    uniq = np.abs(np.sort(d1, axis=1)[:, 1:] - np.sort(d1, axis=1)[:, :-1]).min(
        axis=1) > 1e-6
    np.testing.assert_array_equal(i2[uniq], i1[uniq])


def test_host_store_mesh_build_int8_rerank(rng):
    """int8 sharded host build: native int8 shard search + host rerank."""
    n, q = 3000, 24
    nav = _unit(rng, n, 16)
    data = _unit(rng, n, 64)
    qn, qs = _unit(rng, q, 16), _unit(rng, q, 64)
    cfg = IndexConfig(n_categories=8, epochs=3, lr=0.003, batch_size=512,
                      row_align=1)
    scfg = SearchConfig(k=5, backend="xla")

    mesh = make_mesh(N_DEV, ("buckets",))
    li = LearnedIndex(cfg)
    li.build_with_host_store(nav, data, normalized=True, store_dtype="int8",
                             mesh=mesh)
    assert li._host_corpus is not None
    d, i = li.search(qn, qs, n_buckets=4, k=5, search_config=scfg)

    # rerank distances are exact full-precision cosine of the returned ids
    for row in range(q):
        for col in range(5):
            rid = int(i[row, col]) - 1
            want = 1.0 - float(qs[row] @ data[rid])
            assert abs(float(d[row, col]) - want) < 1e-5


def test_hierarchical_mesh_build_group_per_chip(rng):
    """Hierarchical host build over a mesh: one group's bucket range per
    chip; joint-routed sharded search reaches oracle-level recall."""
    from tpulmi.hierarchical import HierarchicalConfig, HierarchicalIndex
    from tpulmi.ops.distance import exact_knn

    n, q = 4000, 32
    nav = _unit(rng, n, 16)
    data = _unit(rng, n, 48)
    qn, qs = _unit(rng, q, 16), _unit(rng, q, 48)
    cfg = HierarchicalConfig(
        n_groups=N_DEV, outer_epochs=3,
        inner=IndexConfig(n_categories=3, epochs=3, lr=0.003,
                          batch_size=512, row_align=1),
    )
    mesh = make_mesh(N_DEV, ("buckets",))
    hi = HierarchicalIndex(cfg)
    hi.build_with_host_store(nav, data, normalized=True,
                             store_dtype="float32", mesh=mesh)
    sstore, _ = hi._sharded
    assert sstore.cat_pad == 3  # one group (3 inner buckets) per chip
    # probe every global bucket: the sharded scan + merge must then equal
    # the exact oracle (random data has no cluster structure to route by —
    # this asserts the multi-chip plumbing, not router quality)
    d, i = hi.search(qn, qs, n_buckets=12, k=5,
                     search_config=SearchConfig(k=5, backend="xla",
                                                compute_dtype="float32"))
    gt_d, gt = exact_knn(qs, data, k=5)
    gt = np.asarray(gt) + 1
    recall = np.mean([
        len(set(i[r]) & set(gt[r])) / 5 for r in range(q)
    ])
    assert recall > 0.99
    np.testing.assert_allclose(d, np.asarray(gt_d), atol=1e-5)


def test_mesh_built_index_checkpoints_to_flat(rng, tmp_path):
    """A mesh-built index (whose built.store holds the HOST layout arrays)
    must checkpoint, and the restored index searches flat-on-one-device
    with identical results to the sharded original."""
    n, q = 3000, 24
    nav = _unit(rng, n, 16)
    data = _unit(rng, n, 48)
    qn, qs = _unit(rng, q, 16), _unit(rng, q, 48)
    cfg = IndexConfig(n_categories=8, epochs=3, lr=0.003, batch_size=512,
                      row_align=1)
    scfg = SearchConfig(k=5, backend="xla", compute_dtype="float32")

    mesh = make_mesh(N_DEV, ("buckets",))
    li = LearnedIndex(cfg)
    li.build_with_host_store(nav, data, normalized=True,
                             store_dtype="float32", mesh=mesh)
    d0, i0 = li.search(qn, qs, n_buckets=4, k=5, search_config=scfg)

    li.save(tmp_path / "ckpt")
    restored = LearnedIndex.load(tmp_path / "ckpt")
    assert restored._sharded is None  # restores to single-device flat
    d1, i1 = restored.search(qn, qs, n_buckets=4, k=5, search_config=scfg)
    np.testing.assert_allclose(d1, d0, atol=1e-5)
