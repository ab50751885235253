"""The real-LAION data path, proven end-to-end against local fixtures.

S3 egress is blocked in this environment, so the SISAP-layout h5 files are
synthesized locally in the exact on-disk layout `prepare()` produces
(`data/<kind>/<size>/{dataset,query}.h5` with the dataset under the
embedding key). `download()` skips existing files (reference
`search/li/utils.py:63-68` semantics), so `cli.run`'s non-synthetic branch
— prepare → h5 load → normalize → dual-space build/search → SISAP result
write — runs exactly as it would against the real subsets
(`search/search.py:46-93`)."""

import os

import h5py
import numpy as np
import pytest

from tpulmi import cli
from tpulmi.data import load_dataset


N, Q, D_NAV, D_SEARCH = 3000, 64, 32, 96


@pytest.fixture(scope="module")
def laion_fixture(tmp_path_factory):
    """SISAP-layout fixture: pca96v2 (nav) + clip768v2 (search) pairs."""
    rng = np.random.default_rng(5)
    data_dir = tmp_path_factory.mktemp("data")
    # clustered, like real CLIP embeddings (structureless gaussians are an
    # adversarial regime covered separately in test_hardmode.py)
    centers = rng.normal(size=(12, D_SEARCH)).astype(np.float32)
    assign = rng.integers(0, 12, size=N)
    q_assign = rng.integers(0, 12, size=Q)
    base = (centers[assign]
            + 0.35 * rng.normal(size=(N, D_SEARCH))).astype(np.float32)
    qbase = (centers[q_assign]
             + 0.35 * rng.normal(size=(Q, D_SEARCH))).astype(np.float32)
    proj = rng.normal(size=(D_SEARCH, D_NAV)).astype(np.float32)

    layouts = {
        ("pca96v2", "pca96"): (base @ proj, qbase @ proj),
        ("clip768v2", "emb"): (base, qbase),
    }
    for (kind, key), (data, queries) in layouts.items():
        d = data_dir / kind / "100K"
        os.makedirs(d)
        with h5py.File(d / "dataset.h5", "w") as f:
            f.create_dataset(key, data=data)
        with h5py.File(d / "query.h5", "w") as f:
            f.create_dataset(key, data=queries)
    return str(data_dir)


def test_load_dataset_normalize(laion_fixture):
    data, queries = load_dataset(
        "pca96v2", "pca96", "100K", laion_fixture, preprocess=True
    )
    assert data.shape == (N, D_NAV) and queries.shape == (Q, D_NAV)
    np.testing.assert_allclose(np.linalg.norm(data, axis=1), 1.0, atol=1e-5)


def test_cli_run_real_data_branch(laion_fixture, tmp_path):
    """Full non-synthetic cli.run: dual-space (nav + search) pipeline with
    the SISAP result file written."""
    result_dir = str(tmp_path / "result")
    cli.run(
        kind="pca96v2", key="pca96", size="100K", k=5,
        buckets_perc=(30,), n_categories=10, epochs=3, lr=0.003,
        model_type="MLP-5", preprocess=True,
        data_dir=laion_fixture, result_dir=result_dir,
    )
    out_dir = os.path.join(result_dir, "pca96v2", "100K")
    files = os.listdir(out_dir)
    assert len(files) == 1
    with h5py.File(os.path.join(out_dir, files[0]), "r") as f:
        knns = np.asarray(f["knns"])
        dists = np.asarray(f["dists"])
        assert knns.shape == (Q, 5) and dists.shape == (Q, 5)
        assert knns.min() >= 1 and knns.max() <= N   # 1-based SISAP ids
        assert f.attrs["algo"] == "Learned-index"
        assert f.attrs["size"] == "100K"
    # search-space recall vs the exact oracle over the clip768-analog view
    from tpulmi.baseline import Baseline
    from tpulmi.data import load_h5, normalize

    data = normalize(load_h5(
        os.path.join(laion_fixture, "clip768v2", "100K", "dataset.h5"), "emb"
    ))
    queries = normalize(load_h5(
        os.path.join(laion_fixture, "clip768v2", "100K", "query.h5"), "emb"
    ))
    _, gt, _ = Baseline().search(queries, data, k=5)
    recall = np.mean([
        len(set(knns[i]) & set(gt[i])) / 5 for i in range(Q)
    ])
    assert recall > 0.8
