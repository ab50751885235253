"""End-to-end: build + search recall vs the exact oracle, and checkpoint
round-trip — the integration test the reference runs in CI on real 300K data
(`.github/workflows/ci.yml:50-60`), here on synthetic clustered data."""

import numpy as np
import pytest

from tpulmi.baseline import Baseline
from tpulmi.index import LearnedIndex
from tpulmi.utils.config import IndexConfig


@pytest.fixture(scope="module")
def built(synthetic_small):
    cfg = IndexConfig(n_categories=24, epochs=8, lr=0.003, model_type="MLP-5")
    li = LearnedIndex(cfg)
    pred, build_t = li.build(
        synthetic_small["data_nav"], synthetic_small["data_search"]
    )
    return li, pred, build_t


@pytest.fixture(scope="module")
def ground_truth(synthetic_small):
    b = Baseline()
    dists, nns, _ = b.search(
        synthetic_small["queries_search"], synthetic_small["data_search"], k=10
    )
    return dists, nns


def _recall(ids, gt_ids, k=10):
    return np.mean(
        [len(set(ids[i, :k]) & set(gt_ids[i, :k])) / k for i in range(ids.shape[0])]
    )


def test_build_outputs(built, synthetic_small):
    li, pred, build_t = built
    assert pred.shape == (synthetic_small["data_nav"].shape[0],)
    assert pred.min() >= 0 and pred.max() < 24
    assert build_t > 0
    assert li.built is not None


def test_recall_multi_probe(built, ground_truth, synthetic_small):
    li, _, _ = built
    _, gt_ids = ground_truth
    dists, ids = li.search(
        synthetic_small["queries_nav"],
        synthetic_small["queries_search"],
        n_buckets=4,
        k=10,
    )
    assert ids.min() >= 1  # 1-based SISAP convention
    assert _recall(ids, gt_ids) > 0.9


def test_recall_single_probe(built, ground_truth, synthetic_small):
    li, _, _ = built
    _, gt_ids = ground_truth
    _, ids = li.search(
        synthetic_small["queries_nav"],
        synthetic_small["queries_search"],
        n_buckets=1,
        k=10,
    )
    r = _recall(ids, gt_ids)
    assert 0.5 < r <= 1.0


def test_more_probes_more_recall(built, ground_truth, synthetic_small):
    li, _, _ = built
    _, gt_ids = ground_truth
    recalls = []
    for nb in (1, 4, 12):
        _, ids = li.search(
            synthetic_small["queries_nav"],
            synthetic_small["queries_search"],
            n_buckets=nb,
            k=10,
        )
        recalls.append(_recall(ids, gt_ids))
    assert recalls[0] <= recalls[1] <= recalls[2]
    assert recalls[2] > 0.97


def test_search_unbuilt_raises():
    with pytest.raises(ValueError):
        LearnedIndex().search(np.zeros((1, 4), np.float32))


def test_save_load_roundtrip(built, synthetic_small, tmp_path_factory):
    li, _, _ = built
    path = tmp_path_factory.mktemp("ckpt") / "index"
    li.save(str(path))
    restored = LearnedIndex.load(str(path))

    d1, i1 = li.search(
        synthetic_small["queries_nav"], synthetic_small["queries_search"], n_buckets=4
    )
    d2, i2 = restored.search(
        synthetic_small["queries_nav"], synthetic_small["queries_search"], n_buckets=4
    )
    np.testing.assert_allclose(d1, d2, atol=1e-6)
    np.testing.assert_array_equal(i1, i2)
