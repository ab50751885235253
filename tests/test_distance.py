"""Distance kernels vs numpy oracles (SURVEY.md §4: unit tests the reference lacks)."""

import numpy as np
import pytest

from tpulmi.ops.distance import exact_knn, l2_normalize, pairwise_cosine


def _np_cosine_dist(x, y):
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    yn = y / np.linalg.norm(y, axis=1, keepdims=True)
    return 1.0 - xn @ yn.T


def test_pairwise_cosine_matches_numpy(rng):
    x = rng.normal(size=(37, 19)).astype(np.float32)
    y = rng.normal(size=(53, 19)).astype(np.float32)
    got = np.asarray(pairwise_cosine(x, y))
    want = _np_cosine_dist(x, y)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pairwise_cosine_normalized_flag(rng):
    x = rng.normal(size=(8, 16)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    got = np.asarray(pairwise_cosine(x, x, normalized=True))
    np.testing.assert_allclose(np.diag(got), 0.0, atol=1e-5)


def test_l2_normalize(rng):
    x = rng.normal(size=(11, 7)).astype(np.float32) * 13.0
    norms = np.linalg.norm(np.asarray(l2_normalize(x)), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


@pytest.mark.parametrize("n,chunk", [(500, 128), (500, 500), (1000, 333)])
def test_exact_knn_matches_numpy(rng, n, chunk):
    d, q, k = 24, 40, 10
    data = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(q, d)).astype(np.float32)
    dists, ids = exact_knn(queries, data, k=k, chunk=chunk)
    dists, ids = np.asarray(dists), np.asarray(ids)

    want = _np_cosine_dist(queries, data)
    want_ids = np.argsort(want, axis=1, kind="stable")[:, :k]
    want_d = np.take_along_axis(want, want_ids, axis=1)
    np.testing.assert_allclose(dists, want_d, atol=1e-5)
    # ids may differ on exact ties; compare via distances of chosen ids
    chose_d = np.take_along_axis(want, ids, axis=1)
    np.testing.assert_allclose(chose_d, want_d, atol=1e-5)


def test_exact_knn_sorted_ascending(rng):
    data = rng.normal(size=(300, 16)).astype(np.float32)
    queries = rng.normal(size=(10, 16)).astype(np.float32)
    dists, _ = exact_knn(queries, data, k=7)
    dists = np.asarray(dists)
    assert (np.diff(dists, axis=1) >= -1e-6).all()
