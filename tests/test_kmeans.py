"""JAX k-means vs a numpy Lloyd oracle and the reference's small-data
fallbacks (`search/li/LearnedIndex.py:263-269`)."""

import numpy as np

from tpulmi.ops.kmeans import kmeans, kmeans_assign


def _blobs(rng, n=2000, d=8, k=5, std=0.05):
    centers = rng.normal(size=(k, d)).astype(np.float32)
    assign = rng.integers(0, k, size=n)
    return centers[assign] + std * rng.normal(size=(n, d)).astype(np.float32), assign


def test_kmeans_recovers_blobs():
    # dedicated generator: the shared session rng's state depends on test
    # ordering, and blob recovery needs a fixed, well-separated instance
    data, true_assign = _blobs(np.random.default_rng(42))
    centroids, labels = kmeans(data, 5, iters=25, seed=0)
    labels = np.asarray(labels)
    # Cluster homogeneity: every recovered cluster should be (nearly) pure.
    purity = 0
    for c in range(5):
        members = true_assign[labels == c]
        if members.size:
            purity += np.bincount(members).max()
    assert purity / data.shape[0] > 0.99


def test_kmeans_assign_is_nearest_centroid(rng):
    data = rng.normal(size=(500, 6)).astype(np.float32)
    centroids = rng.normal(size=(7, 6)).astype(np.float32)
    labels = np.asarray(kmeans_assign(data, centroids, chunk=128))
    d2 = ((data[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(labels, d2.argmin(1))


def test_kmeans_tiny_data_fallbacks(rng):
    # n < 2 → single zero label
    _, labels = kmeans(rng.normal(size=(1, 4)).astype(np.float32), 10)
    assert np.asarray(labels).shape == (1,)
    # n < k → k reduced to max(n//5, 2)
    data = rng.normal(size=(8, 4)).astype(np.float32)
    centroids, labels = kmeans(data, 100)
    assert centroids.shape[0] == 2
    assert np.asarray(labels).max() < 2


def test_kmeans_deterministic(rng):
    data = rng.normal(size=(1000, 8)).astype(np.float32)
    c1, l1 = kmeans(data, 6, seed=2023)
    c2, l2 = kmeans(data, 6, seed=2023)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2))
