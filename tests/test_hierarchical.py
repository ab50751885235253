"""Two-level hierarchical index vs the exact oracle and the flat index."""

import numpy as np
import pytest

from tpulmi.baseline import Baseline
from tpulmi.hierarchical import HierarchicalConfig, HierarchicalIndex
from tpulmi.utils.config import IndexConfig


@pytest.fixture(scope="module")
def built_hier(synthetic_small):
    cfg = HierarchicalConfig(
        n_groups=4,
        outer_epochs=6,
        outer_lr=0.003,
        inner=IndexConfig(n_categories=8, epochs=6, lr=0.003,
                          model_type="MLP-5", row_align=1),
    )
    hi = HierarchicalIndex(cfg)
    hi.build(synthetic_small["data_nav"], synthetic_small["data_search"])
    return hi


def test_hierarchical_recall(built_hier, synthetic_small):
    _, gt, _ = Baseline().search(
        synthetic_small["queries_search"], synthetic_small["data_search"], k=10
    )
    _, ids = built_hier.search(
        synthetic_small["queries_nav"], synthetic_small["queries_search"],
        n_groups=2, n_buckets=4, k=10,
    )
    assert ids.min() >= 1
    recall = np.mean([
        len(set(ids[i]) & set(gt[i])) / 10 for i in range(ids.shape[0])
    ])
    assert recall > 0.8


def test_hierarchical_more_groups_more_recall(built_hier, synthetic_small):
    _, gt, _ = Baseline().search(
        synthetic_small["queries_search"], synthetic_small["data_search"], k=10
    )

    def recall(n_groups):
        _, ids = built_hier.search(
            synthetic_small["queries_nav"], synthetic_small["queries_search"],
            n_groups=n_groups, n_buckets=8, k=10,
        )
        return np.mean([
            len(set(ids[i]) & set(gt[i])) / 10 for i in range(ids.shape[0])
        ])

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1 - 0.02
    assert r4 > 0.9


def test_no_duplicate_ids(built_hier, synthetic_small):
    _, ids = built_hier.search(
        synthetic_small["queries_nav"][:50], synthetic_small["queries_search"][:50],
        n_groups=3, n_buckets=4, k=10,
    )
    for row in ids:
        real = row[row >= 1]
        assert len(set(real)) == len(real)
