"""Int8 row quantization for the bucket store (groundwork for >10M/chip).

A bf16 store holds ~10M 768-d rows in a v5e's 16 GB HBM (BENCH_10M.md); an
int8 store halves that again (~20M rows/chip). Symmetric per-row scales:

    q_i = round(x_i / s_i * 127),  s_i = max|x_i|
    cos(a, x_i) ≈ (a_int8 · q_i) * s_a * s_i / 127²

For L2-normalized 768-d vectors the per-element quantization error is
~0.4 % relative; errors average over the 768-term dot product, so the
cosine error lands around 1e-3 — below typical neighbor gaps. A final
bf16/f32 rerank of the top candidates removes even that (planned for the
kernel integration in a future round; this module provides the verified
numerics).
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.jit
def quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int8 quantization. Returns (q int8 (N,d),
    scales f32 (N,)) with x ≈ q * (scales/127)[:, None]."""
    x = x.astype(jnp.float32)
    scales = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-12)
    q = jnp.clip(jnp.round(x / scales[:, None] * 127.0), -127, 127)
    return q.astype(jnp.int8), scales


@jax.jit
def dequantize_rows(q: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    return q.astype(jnp.float32) * (scales / 127.0)[:, None]


@partial(jax.jit, static_argnames=())
def cosine_dists_int8(
    q_queries: jnp.ndarray,   # (Q, d) int8
    s_queries: jnp.ndarray,   # (Q,) f32
    q_data: jnp.ndarray,      # (N, d) int8
    s_data: jnp.ndarray,      # (N,) f32
) -> jnp.ndarray:
    """Cosine distances between quantized normalized vectors: the int8×int8
    dot runs on the MXU with int32 accumulation; scales apply afterwards."""
    acc = jax.lax.dot_general(
        q_queries, q_data,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    sims = acc * (s_queries[:, None] / 127.0) * (s_data[None, :] / 127.0)
    return 1.0 - sims
