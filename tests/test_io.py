"""Host I/O: SISAP result format, normalization, synthetic data contract."""

import numpy as np

from tpulmi.baseline import Baseline
from tpulmi.data import normalize, store_results, synthetic_dataset
from tpulmi.ops.distance import exact_knn


def test_store_results_sisap_format(tmp_path, rng):
    import h5py

    dists = rng.random((10, 5)).astype(np.float32)
    anns = rng.integers(1, 100, size=(10, 5)).astype(np.int64)
    dst = tmp_path / "res" / "out.h5"
    store_results(str(dst), "Learned-index", "pca96v2", dists, anns, 1.5, 0.25,
                  "id-string", "300K")
    with h5py.File(dst, "r") as f:
        assert f.attrs["algo"] == "Learned-index"
        assert f.attrs["data"] == "pca96v2"
        assert f.attrs["buildtime"] == 1.5
        assert f.attrs["querytime"] == 0.25
        assert f.attrs["size"] == "300K"
        assert f.attrs["params"] == "id-string"
        np.testing.assert_array_equal(f["knns"][:], anns)
        np.testing.assert_allclose(f["dists"][:], dists)


def test_normalize(rng):
    x = rng.normal(size=(20, 6)) * 7
    n = normalize(x)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-6)


def test_synthetic_dataset_contract():
    ds = synthetic_dataset(n=500, n_queries=20, d_nav=8, d_search=24, n_clusters=5,
                           seed=1)
    assert ds["data_nav"].shape == (500, 8)
    assert ds["data_search"].shape == (500, 24)
    assert ds["queries_nav"].shape == (20, 8)
    assert ds["queries_search"].shape == (20, 24)
    for key in ("data_nav", "data_search", "queries_nav", "queries_search"):
        np.testing.assert_allclose(
            np.linalg.norm(ds[key], axis=1), 1.0, atol=1e-5
        )
    assert ds["cluster_assignments"].min() >= 0
    assert ds["cluster_assignments"].max() < 5


def test_baseline_matches_numpy_and_is_one_based(rng):
    data = rng.normal(size=(200, 12)).astype(np.float32)
    queries = rng.normal(size=(15, 12)).astype(np.float32)
    b = Baseline()
    assert b.build(data) >= 0
    dists, nns, t = b.search(queries, k=5)
    assert nns.min() >= 1 and nns.max() <= 200
    want_d, want_i = exact_knn(queries, data, k=5)
    np.testing.assert_allclose(dists, np.asarray(want_d), atol=1e-6)
    np.testing.assert_array_equal(nns, np.asarray(want_i) + 1)


def test_f32_to_bf16_bits_matches_ml_dtypes(rng):
    import ml_dtypes

    from tpulmi.data import _f32_to_bf16_bits

    x = rng.normal(size=4096).astype(np.float32) * 10.0
    x = np.concatenate([x, np.array(
        [0.0, -0.0, np.inf, -np.inf, 3.4e38, -3.4e38, 1e-40, np.nan],
        np.float32)])
    got = _f32_to_bf16_bits(x)
    want = x.astype(ml_dtypes.bfloat16).view(np.uint16)
    # NaN payloads may differ between implementations; compare NaN-ness there
    nan = np.isnan(x)
    np.testing.assert_array_equal(got[~nan], want[~nan])
    assert np.all(np.isnan(got[nan].view(ml_dtypes.bfloat16).astype(np.float32)))


def test_synthetic_dataset_big_host_backend(tmp_path):
    import ml_dtypes

    from tpulmi.data import synthetic_dataset_big

    kw = dict(n=3000, n_queries=16, d_nav=8, d_search=32, n_clusters=6,
              seed=3, cache_dir=str(tmp_path), chunk=1000)
    ds = synthetic_dataset_big(**kw)
    assert ds["data_search"].dtype == ml_dtypes.bfloat16
    assert ds["data_search"].shape == (3000, 32)
    assert ds["data_nav"].shape == (3000, 8)
    assert ds["queries_search"].dtype == np.float32
    norms = np.linalg.norm(np.asarray(ds["data_search"], np.float32), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=2e-2)  # bf16 rounding
    np.testing.assert_allclose(
        np.linalg.norm(ds["queries_search"], axis=1), 1.0, atol=1e-5)
    # disk cache round-trips bit-exactly
    ds2 = synthetic_dataset_big(**kw)
    np.testing.assert_array_equal(
        np.asarray(ds2["data_search"]).view(np.uint16),
        np.asarray(ds["data_search"]).view(np.uint16))
    np.testing.assert_array_equal(ds2["queries_nav"], ds["queries_nav"])


def test_big_host_datagen_resumes(tmp_path):
    """A killed big-corpus generation resumes at the first unwritten chunk
    (the sidecar .progress marker) and the resumed output is byte-identical
    to a fresh generation — per-chunk RNG streams are independent of
    completion order (tpulmi/data.py::_synthetic_big_host)."""
    import os

    from tpulmi.data import _synthetic_big_host

    paths = {k: str(tmp_path / (k + ".npy")) for k in
             ("data_nav", "data_search", "queries_nav", "queries_search")}
    kw = dict(n=5000, n_queries=16, d_nav=8, d_search=32, n_clusters=4,
              seed=7, cluster_std=0.9, skew=1.5, chunk=1000, paths=paths)
    full = _synthetic_big_host(**kw)
    ref_ds = np.array(np.asarray(full["data_search"]).view(np.uint16))
    ref_dn = np.array(full["data_nav"])
    del full

    # simulate a crash after 2 chunks: corrupt the tail, write the marker
    ds = np.lib.format.open_memmap(paths["data_search"], mode="r+")
    ds[2000:] = 0xABCD
    dn = np.lib.format.open_memmap(paths["data_nav"], mode="r+")
    dn[2000:] = -99.0
    del ds, dn
    with open(paths["data_search"] + ".progress", "w") as f:
        f.write("2000")

    resumed = _synthetic_big_host(**kw)
    assert np.array_equal(
        np.array(np.asarray(resumed["data_search"]).view(np.uint16)), ref_ds)
    assert np.array_equal(np.array(resumed["data_nav"]), ref_dn)
    assert not os.path.exists(paths["data_search"] + ".progress")
