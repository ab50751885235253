"""Int8 row quantization for the bucket store (>10M rows/chip).

A bf16 store holds ~10M 768-d rows in a v5e's 16 GB HBM (BENCH_10M.md); an
int8 store halves that again (~20M rows/chip). Symmetric per-row scales:

    q_i = round(x_i / s_i * 127),  s_i = max|x_i|
    cos(a, x_i) ≈ (a · q_i) * s_i / 127      (a kept in bf16/f32)

For L2-normalized 768-d vectors the per-element quantization error is
~0.4 % relative; errors average over the 768-term dot product, so the
cosine error lands around 1e-3 — below typical neighbor gaps. Both probe
backends (tpulmi/search.py, tpulmi/ops/pallas_topk.py) consume quantized
stores natively (codes dequantized in VMEM, per-row scales applied to the
similarity columns), and `LearnedIndex` can rerank the final candidates
against a host-resident full-precision corpus to erase even that error.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from tpulmi.buckets import BucketStore


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


def quantize_store(store: BucketStore) -> BucketStore:
    """Quantize a full-precision bucket store to int8 codes + per-row f32
    scales. Layout (ids, offsets, counts, alignment) is unchanged, so the
    quantized store drops into both probe backends. Padding rows (all-zero)
    get scale ~0 and code 0 — their similarity is 0, and the existing
    in-bucket masks drop them anyway."""
    if store.is_quantized:
        return store
    codes, scales = quantize_rows(store.data_sorted)
    return BucketStore(
        data_sorted=codes,
        ids_sorted=store.ids_sorted,
        offsets=store.offsets,
        counts=store.counts,
        n=store.n,
        pad_rows=store.pad_rows,
        row_align=store.row_align,
        scales=scales,
    )
