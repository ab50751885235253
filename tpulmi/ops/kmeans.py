"""TPU-native k-means (Lloyd) for index partitioning.

Replaces `faiss.Kmeans` (`search/li/LearnedIndex.py:273-282`) with jitted
Lloyd iterations: the assignment step is one batched ``x @ c.T`` on the MXU
followed by argmin, the update step is ``jax.ops.segment_sum``. Matches the
faiss defaults the reference relies on: 25 iterations, training subsampled to
``max_points_per_centroid * k`` points (faiss Clustering defaults), squared-L2
assignment, fixed seed.

Empty clusters keep their previous centroid for the next iteration (faiss
instead splits the largest cluster; with sampled-point init on real data
empties are rare and transient).
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _sq_dists(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Squared L2 distances (up to a per-row constant): -2 x@cT + ||c||^2.
    The dropped ||x||^2 term does not change the argmin over centroids."""
    xc = jax.lax.dot_general(
        x, c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    c_sq = jnp.sum(c.astype(jnp.float32) ** 2, axis=1)
    return c_sq[None, :] - 2.0 * xc


@partial(jax.jit, static_argnames=("k", "iters"))
def _lloyd(x: jnp.ndarray, init_centroids: jnp.ndarray, k: int, iters: int):
    x = x.astype(jnp.float32)

    def step(c, _):
        d = _sq_dists(x, c)
        labels = jnp.argmin(d, axis=1)
        counts = jax.ops.segment_sum(
            jnp.ones((x.shape[0],), jnp.float32), labels, num_segments=k
        )
        sums = jax.ops.segment_sum(x, labels, num_segments=k)
        new_c = sums / jnp.maximum(counts, 1.0)[:, None]
        new_c = jnp.where(counts[:, None] > 0, new_c, c)
        return new_c, None

    centroids, _ = jax.lax.scan(step, init_centroids.astype(jnp.float32), None, length=iters)
    return centroids


@partial(jax.jit, static_argnames=("chunk",))
def _assign_chunked(x: jnp.ndarray, c: jnp.ndarray, chunk: int) -> jnp.ndarray:
    n, d = x.shape
    n_chunks = (n + chunk - 1) // chunk
    x_pad = jnp.pad(x, ((0, n_chunks * chunk - n), (0, 0)))

    def body(_, i):
        block = jax.lax.dynamic_slice(x_pad, (i * chunk, 0), (chunk, d))
        return None, jnp.argmin(_sq_dists(block, c), axis=1).astype(jnp.int32)

    _, labels = jax.lax.scan(body, None, jnp.arange(n_chunks))
    return labels.reshape(-1)[:n]


def kmeans_assign(x, centroids, chunk: int = 131072) -> jnp.ndarray:
    """Assign every row of `x` to its nearest centroid (squared L2).
    Streams `x` in chunks; returns int32 labels of shape (N,). Equivalent to
    `kmeans.index.search(X, 1)` in the reference (`search/li/LearnedIndex.py:282`)."""
    x = jnp.asarray(x)
    chunk = min(chunk, max(128, int(x.shape[0])))
    return _assign_chunked(x, jnp.asarray(centroids), chunk)


def kmeans(
    data,
    k: int,
    *,
    iters: int = 25,
    seed: int = 2023,
    max_points_per_centroid: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster `data` into `k` clusters; returns (centroids, labels) with
    labels for *all* rows of `data`.

    Mirrors the reference's cluster() contract (`search/li/LearnedIndex.py:242-282`)
    including its small-data fallbacks: fewer than 2 rows → single cluster;
    fewer rows than clusters → k reduced to max(n // 5, 2).
    """
    data = jnp.asarray(data)
    n = int(data.shape[0])

    if n < 2:
        return None, jnp.zeros((n,), dtype=jnp.int32)
    if n < k:
        k = max(n // 5, 2)

    key = jax.random.PRNGKey(seed)
    n_train = min(n, max_points_per_centroid * k)
    key, sub = jax.random.split(key)
    if n_train < n:
        train_idx = jax.random.choice(sub, n, shape=(n_train,), replace=False)
        train = data[train_idx]
    else:
        train = data

    key, sub = jax.random.split(key)
    init_idx = jax.random.choice(sub, n_train, shape=(k,), replace=False)
    init_centroids = train[init_idx]

    centroids = _lloyd(train, init_centroids, k, iters)
    labels = kmeans_assign(data, centroids)
    return centroids, labels
