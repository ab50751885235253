"""Int8 / packed-int4 row quantization for the bucket store.

A bf16 store holds ~10M 768-d rows in a v5e's 16 GB HBM (BENCH_10M.md); an
int8 store halves that again (~20M rows/chip), and a packed int4 store
halves it once more (~40M rows/chip) — the probe kernel is HBM-bound at
big-corpus shapes (NOTES.md: a pure matmul stream over the store bytes
runs at the full measured HBM ceiling), so store bytes ARE probe time.
Symmetric per-row scales:

    q_i = round(x_i / s_i * L),  L = 127 (int8) or 7 (int4)
    cos(a, x_i) ≈ (a · q_i) * s_i / L        (a kept in bf16/f32/int8)

int8: s_i = max|x_i|. For L2-normalized 768-d vectors the per-element
error is ~0.4 % relative; errors average over the 768-term dot product,
so the cosine error lands around 1e-3 — below typical neighbor gaps.

int4: s_i = clip_i · max|x_i| with a PER-ROW clip factor chosen from a
small grid (`INT4_CLIP_GRID`) to minimize that row's actual squared
reconstruction error (values past the clip saturate to ±the range end).
Clipping trades rare large outlier errors for a uniformly finer step; the
best trade varies row to row with the outlier profile, and the adaptive
pick measurably beats any fixed factor — on the synthetic 768-d corpus,
top-10-in-top-30 candidate containment 0.9894 adaptive vs 0.9802 at the
best fixed clip (0.85) vs 0.954 at max-abs, i.e. the containment-miss
rate nearly halves for a 9-pass quantize-time cost and zero search-time
cost (only the scale VALUES change; kernels and layout are untouched).
The ~4e-3 cosine error is still an order above int8's, so int4 REQUIRES
the exact host rerank (`SearchConfig.rerank`) with a deeper candidate pool
(`rerank_extra` ≈ 20-40 instead of int8's 10).

int4 codes are PACKED two-per-byte into an (N, d/2) int8 array: byte j of
a row holds dim j in its low nibble and dim j + d/2 in its high nibble, so
the in-register unpack (`unpack_int4`) is two arithmetic shifts and one
concatenate — lane-aligned and cheap on the TPU VPU, with the unpacked
halves landing in original dim order.

Both probe backends (tpulmi/search.py, tpulmi/ops/pallas_topk.py) consume
quantized stores natively (codes dequantized — int4 unpacked — in
registers/VMEM, per-row scales applied to the similarity columns), and
`LearnedIndex` reranks the final candidates against a host-resident
full-precision corpus to erase the quantization error.
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


# int4 clip-factor grid (fraction of max|x| that maps to the top code).
# Each row gets the grid point minimizing ITS squared reconstruction
# error; 0.85 (the old fixed value, kept exported for the error-bound
# arithmetic in tests) is the single best fixed point on the synthetic
# 768-d corpus, but the per-row optimum spreads across the whole grid —
# see the module docstring for the measured containment win.
INT4_CLIP = 0.85
INT4_CLIP_GRID = (0.60, 0.65, 0.70, 0.75, 0.80, 0.85, 0.90, 0.95, 1.00)


@jax.jit
def quantize_rows_int4(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int4 quantization, PACKED two codes per byte,
    with the per-row clip factor picked from ``INT4_CLIP_GRID`` by actual
    reconstruction error. Returns (packed int8 (N, d/2), scales f32 (N,))
    with x ≈ unpack_int4(packed) * (scales/7)[:, None]. d must be even.

    The grid loop is unrolled (9 static passes); each pass is one
    round/clip/mul sweep, so quantize time stays trivial next to the
    build's k-means/MLP stages. Strict ``<`` keeps the FIRST grid point on
    ties (all-zero padding rows then deterministically take clip 0.6 with
    scale clamped to 1e-12, code 0 — same as before)."""
    x = x.astype(jnp.float32)
    maxabs = jnp.max(jnp.abs(x), axis=1)
    best_err = jnp.full(x.shape[:1], jnp.inf, jnp.float32)
    best_scale = jnp.zeros(x.shape[:1], jnp.float32)
    for clip in INT4_CLIP_GRID:
        s = jnp.maximum(maxabs * clip, 1e-12)
        q = jnp.clip(jnp.round(x / s[:, None] * 7.0), -8, 7)
        err = jnp.sum((q * (s / 7.0)[:, None] - x) ** 2, axis=1)
        upd = err < best_err
        best_err = jnp.where(upd, err, best_err)
        best_scale = jnp.where(upd, s, best_scale)
    scales = jnp.maximum(best_scale, 1e-12)
    q = jnp.clip(jnp.round(x / scales[:, None] * 7.0), -8, 7).astype(jnp.int8)
    return pack_int4(q), scales


def pack_int4(codes: jnp.ndarray) -> jnp.ndarray:
    """Pack int4 codes (N, d) in [-8, 7] into (N, d/2) int8: byte j holds
    dim j (low nibble) and dim j + d/2 (high nibble)."""
    d = codes.shape[-1]
    if d % 2:
        raise ValueError(f"int4 packing needs even d, got {d}")
    lo = codes[..., : d // 2].astype(jnp.uint8) & 0xF
    hi = codes[..., d // 2:].astype(jnp.uint8) & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Unpack (..., d/2) int8 bytes into (..., d) int4 codes as int8, in
    original dim order. Shifts run in int32 — `(b << 28) >> 28`
    sign-extends the low nibble, the arithmetic `>> 4` the high one —
    because the TPU kernel compiler (Mosaic) crashes outright on int8
    shifts (hardware-measured; interpret mode does not catch it). The
    int32 round-trip costs nothing next to the matmul that follows, and
    the same formulation serves XLA, Pallas, and numpy callers."""
    b = packed.astype(jnp.int32)
    lo = (b << 28) >> 28
    hi = b >> 4
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.int8)


def quantize_rows_int4_host(x: "np.ndarray"):
    """NumPy twin of `quantize_rows_int4` (same per-row adaptive clip, same
    op order) for the host layout path (tpulmi/hoststore.py). Returns
    (packed int8 (N, d/2), scales f32 (N,)).

    Codes match the device quantizer bit-for-bit on backends whose f32
    reduction order matches numpy's (the CPU test backend). On TPU the
    XLA error-sum reduction may accumulate in a different order, so a row
    whose two best grid points are within float rounding of each other can
    pick the neighboring clip — codes AND scale then differ for that row.
    Both picks are (near-)optimal reconstructions, the store contract only
    requires scales to match the codes they ship with, and the exact host
    rerank absorbs the sub-ulp score difference, so the divergence is
    harmless; just don't assert cross-backend bit-equality."""
    import numpy as np

    x = np.asarray(x, dtype=np.float32)
    n, d = x.shape
    out_codes = np.empty((n, d // 2), np.int8)
    out_scales = np.empty((n,), np.float32)
    # Block the grid sweep: the 9-point search allocates ~4 row-block-sized
    # f32 temporaries per grid point, and at the host layout's 1M-row
    # chunks that is a 12-15 GB transient — enough to OOM the 40M build,
    # whose steady state (61 GB corpus + 15.4 GB store + nav copies)
    # already rides the host-RAM ceiling (measured round-5: anon peaked
    # 114.6 GB and the kernel killed it). 128k-row blocks bound the
    # transient at ~1.6 GB for identical results (the sweep is row-wise).
    block = 131072
    for blo in range(0, n, block):
        bhi = min(blo + block, n)
        xb = x[blo:bhi]
        maxabs = np.abs(xb).max(axis=1)
        best_err = np.full(xb.shape[0], np.inf, np.float32)
        best_scale = np.zeros(xb.shape[0], np.float32)
        for clip in INT4_CLIP_GRID:
            s = np.maximum(maxabs * np.float32(clip), np.float32(1e-12))
            q = np.clip(np.rint(xb / s[:, None] * np.float32(7.0)), -8, 7)
            err = ((q * (s / np.float32(7.0))[:, None] - xb) ** 2).sum(
                axis=1, dtype=np.float32)
            upd = err < best_err
            best_err = np.where(upd, err, best_err)
            best_scale = np.where(upd, s, best_scale)
        scales = np.maximum(best_scale, np.float32(1e-12))
        q = np.clip(np.rint(xb / scales[:, None] * 7.0), -8, 7).astype(
            np.int8)
        lo = q[:, : d // 2].astype(np.uint8) & 0xF
        hi = q[:, d // 2:].astype(np.uint8) & 0xF
        out_codes[blo:bhi] = (lo | (hi << 4)).astype(np.int8)
        out_scales[blo:bhi] = scales
    return out_codes, out_scales


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


def quantize_store(store: BucketStore, bits: int = 8) -> BucketStore:
    """Quantize a full-precision bucket store to int8 (``bits=8``) or
    packed int4 (``bits=4``) codes + per-row f32 scales. Layout (ids,
    offsets, counts, alignment) is unchanged, so the quantized store drops
    into both probe backends. Padding rows (all-zero) get scale ~0 and
    code 0 — their similarity is 0, and the existing in-bucket masks drop
    them anyway."""
    if bits not in (8, 4):
        raise ValueError(f"quantize_store supports bits in (8, 4), got {bits}")
    if store.is_quantized:
        if store.quant_bits != bits:
            raise ValueError(
                f"store is already int{store.quant_bits}; re-quantizing to "
                f"int{bits} would compound the quantization error — rebuild "
                f"from the full-precision source instead")
        return store
    if bits == 4:
        codes, scales = quantize_rows_int4(store.data_sorted)
    else:
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
        quant_bits=bits,
    )
