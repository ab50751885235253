"""Cosine-distance kernels and exact k-NN.

Replaces the reference's sklearn `cosine_similarity` distance path
(`search/li/utils.py:10-11` — the GEMM inside every probe) with MXU matmuls:
on L2-normalized vectors, cosine distance is ``1 - q @ d.T``, a single
matrix multiply that XLA tiles onto the systolic array.

`exact_knn` is both the brute-force search oracle (the reference `Baseline`,
`search/li/Baseline.py:14-20`) and the recall ground-truth generator for the
test suite. It streams the database through HBM in chunks with a running
`lax.top_k` merge, so N is bounded by HBM, not by the (Q, N) distance matrix.
"""

from functools import partial

import jax
import jax.numpy as jnp

SENTINEL_DIST = 10_000.0  # matches the reference's pad/init sentinel
                          # (`search/li/LearnedIndex.py:138,190`)


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Row-wise L2 normalization on device."""
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, eps)


def pairwise_cosine(
    x: jnp.ndarray,
    y: jnp.ndarray,
    *,
    normalized: bool = False,
    compute_dtype=None,
) -> jnp.ndarray:
    """Dense cosine-distance matrix ``1 - cos(x_i, y_j)`` of shape (X, Y).

    With ``normalized=True`` the normalization is skipped (one fused matmul).
    ``compute_dtype`` (e.g. jnp.bfloat16) selects the MXU input precision;
    accumulation is always float32.
    """
    if not normalized:
        x = l2_normalize(x)
        y = l2_normalize(y)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        y = y.astype(compute_dtype)
    sims = jax.lax.dot_general(
        x,
        y,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return 1.0 - sims


def pairwise_cosine_threshold(
    x: jnp.ndarray,
    y: jnp.ndarray,
    threshold: jnp.ndarray,
    *,
    normalized: bool = False,
    compute_dtype=None,
) -> jnp.ndarray:
    """Cosine distances with per-row threshold pruning: entries at or above
    ``threshold[i]`` are replaced by the sentinel.

    API-parity port of the reference's `pairwise_cosine_threshold`
    (`search/li/utils.py:14-43`), which *compacts* the surviving columns to
    skip CPU work downstream. Dynamic compaction would force data-dependent
    shapes under XLA, so here pruning is masking: pruned entries become the
    sentinel and lose every downstream `top_k` — identical results, and on
    TPU the FLOP savings the reference chased are irrelevant next to MXU
    throughput (SURVEY.md §7 "threshold pruning without dynamic shapes").
    """
    dists = pairwise_cosine(
        x, y, normalized=normalized, compute_dtype=compute_dtype
    )
    threshold = jnp.asarray(threshold, jnp.float32).reshape(-1, 1)
    return jnp.where(dists < threshold, dists, SENTINEL_DIST)


@partial(jax.jit, static_argnames=("k", "chunk", "normalized"))
def _exact_knn_impl(queries, data, *, k: int, chunk: int, normalized: bool):
    nq = queries.shape[0]
    n = data.shape[0]
    n_chunks = (n + chunk - 1) // chunk
    n_pad = n_chunks * chunk

    if not normalized:
        queries = l2_normalize(queries)
        data = l2_normalize(data)

    data_pad = jnp.pad(data, ((0, n_pad - n), (0, 0)))

    init = (
        jnp.full((nq, k), SENTINEL_DIST, dtype=jnp.float32),
        jnp.zeros((nq, k), dtype=jnp.int32),
    )

    def body(carry, c):
        best_d, best_i = carry
        start = c * chunk
        block = jax.lax.dynamic_slice(data_pad, (start, 0), (chunk, data.shape[1]))
        sims = jax.lax.dot_general(
            queries,
            block,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dists = 1.0 - sims
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        dists = jnp.where(ids < n, dists, SENTINEL_DIST)
        cat_d = jnp.concatenate([best_d, dists], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(ids, (nq, chunk))], axis=1
        )
        neg_top, arg_top = jax.lax.top_k(-cat_d, k)
        return (-neg_top, jnp.take_along_axis(cat_i, arg_top, axis=1)), None

    (best_d, best_i), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return best_d, best_i


def exact_knn(queries, data, k: int = 10, *, chunk: int = 65536, normalized: bool = False):
    """Exact cosine k-NN: returns (dists, ids) of shape (Q, k), 0-based ids,
    sorted ascending by distance. Streaming over the database in `chunk`-row
    blocks with a running top-k merge."""
    chunk = min(chunk, max(128, int(data.shape[0])))
    return _exact_knn_impl(
        jnp.asarray(queries), jnp.asarray(data), k=k, chunk=chunk, normalized=normalized
    )
