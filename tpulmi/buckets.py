"""Bucket store: label-sorted CSR layout of the search-space vectors.

The reference keeps buckets as a pandas ``groupby('category')`` over a
DataFrame (`search/li/LearnedIndex.py:143-145`) and gathers each bucket's
rows with ``.loc`` per probe. Here the store is three device arrays:

- ``data_sorted``: the (normalized) search-space vectors permuted into
  bucket-contiguous order — each bucket is one contiguous row range, so a
  probe reads it with a ``dynamic_slice`` (static chunk size) instead of a
  ragged gather;
- ``ids_sorted``: the original 0-based row id of every sorted row;
- ``offsets``/``counts``: CSR bucket boundaries.

The arrays are padded by one chunk of sentinel rows so fixed-size chunked
slices near the tail never read out of bounds. No per-bucket padding is
stored — raggedness is handled at compute time by masking and by skipping
whole chunks with ``lax.cond`` (see tpulmi/search.py).
"""

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BucketStore:
    """Device-resident bucket layout. `n` and `pad_rows` are static pytree
    aux data so jitted consumers specialize on them."""

    data_sorted: jnp.ndarray  # (n + pad_rows, d) search vectors, bucket-sorted
    ids_sorted: jnp.ndarray   # (n + pad_rows,) int32 original row ids; -1 on padding
    offsets: jnp.ndarray      # (n_categories + 1,) int32 CSR offsets
    counts: jnp.ndarray       # (n_categories,) int32 bucket sizes
    n: int = field(metadata=dict(static=True), default=0)
    pad_rows: int = field(metadata=dict(static=True), default=0)
    # Alignment every bucket offset is a multiple of. The Pallas probe
    # kernel addresses whole (mc, d) blocks, so it requires
    # row_align % mc == 0; recording it statically lets consumers validate
    # that instead of inferring alignment from coincidental total sizes.
    row_align: int = field(metadata=dict(static=True), default=1)
    # Per-row int8 scales (shape (n + pad_rows,), f32) when the store is
    # quantized; None for full-precision stores. data_sorted rows then hold
    # int8 codes with x ≈ codes * (scales/q_levels)[:, None].
    scales: Optional[jnp.ndarray] = None
    # Quantized code width: 8 (one int8 code per dim) or 4 (two int4 codes
    # packed per int8 byte — data_sorted is then (rows, dim/2) and `dim`
    # reports the LOGICAL width). Meaningful only when scales is not None.
    quant_bits: int = field(metadata=dict(static=True), default=8)
    # Per-bucket pruning bounds (compute_bucket_bounds): unit centroid
    # (n_categories, d) f32, min over the bucket's rows of x̂·ĉ
    # (n_categories,) f32, and max row norm (n_categories,) f32. For any
    # unit query q and row x of bucket b:
    #   q·x ≤ max_norm_b · max(0, cos(max(0, θ_qc − r_b)))
    # with cos θ_qc = q·ĉ_b and cos r_b = bucket_cos_r[b] — the
    # spherical-cap bound behind the threshold tile-skip (the TPU-native
    # analog of the reference's running-threshold prune,
    # `search/li/LearnedIndex.py:149-163`, which compacts dynamically).
    bucket_centroids: Optional[jnp.ndarray] = None
    bucket_cos_r: Optional[jnp.ndarray] = None
    bucket_max_norm: Optional[jnp.ndarray] = None

    @property
    def is_quantized(self) -> bool:
        return self.scales is not None

    @property
    def packed(self) -> bool:
        """True for packed-int4 stores (two codes per stored byte)."""
        return self.is_quantized and self.quant_bits == 4

    @property
    def q_levels(self) -> float:
        """Dequantization divisor: x ≈ codes * (scales/q_levels)."""
        return 7.0 if self.quant_bits == 4 else 127.0

    @property
    def has_bounds(self) -> bool:
        return self.bucket_centroids is not None

    @property
    def n_categories(self) -> int:
        return int(self.counts.shape[0])

    @property
    def dim(self) -> int:
        """Logical vector width (packed int4 stores hold dim/2 bytes)."""
        d = int(self.data_sorted.shape[1])
        return d * 2 if self.packed else d


def build_bucket_store(
    labels,
    data_search,
    n_categories: int,
    pad_rows: int = 4096,
    row_align: int = 1,
) -> BucketStore:
    """Construct the store from per-row bucket labels (the *model's* argmax
    assignment, matching the reference which buckets by predicted category,
    not by the raw k-means labels — `search/li/LearnedIndex.py:67,240`).

    `row_align > 1` pads every bucket's row range to a multiple of
    `row_align` with sentinel rows (id -1) so each bucket starts on an
    aligned block boundary — required by the Pallas probe kernel, whose DMA
    block index maps address whole blocks. The store then occupies the
    static worst case `n + n_categories*row_align` rows.
    """
    labels = jnp.asarray(labels, jnp.int32)
    data_search = jnp.asarray(data_search)
    n, d = data_search.shape

    order = jnp.argsort(labels, stable=True).astype(jnp.int32)
    counts = jax.ops.segment_sum(
        jnp.ones((n,), jnp.int32), labels, num_segments=n_categories
    ).astype(jnp.int32)

    if row_align <= 1:
        data_sorted = jnp.take(data_search, order, axis=0)
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
        )
        data_sorted = jnp.pad(data_sorted, ((0, pad_rows), (0, 0)))
        ids_sorted = jnp.pad(order, (0, pad_rows), constant_values=-1)
    else:
        aligned = -(-counts // row_align) * row_align
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned).astype(jnp.int32)]
        )
        # static worst case, rounded so the total (incl. pad) stays a
        # multiple of row_align (the Pallas kernel reshapes rows into
        # fixed-size blocks)
        n_total = -(-(n + n_categories * row_align) // row_align) * row_align
        pad_rows = -(-pad_rows // row_align) * row_align
        raw_offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
        )
        sorted_labels = jnp.take(labels, order)
        rank = jnp.arange(n, dtype=jnp.int32) - jnp.take(raw_offsets, sorted_labels)
        pos = jnp.take(offsets, sorted_labels) + rank
        data_sorted = jnp.zeros((n_total + pad_rows, d), data_search.dtype)
        data_sorted = data_sorted.at[pos].set(jnp.take(data_search, order, axis=0))
        ids_sorted = jnp.full((n_total + pad_rows,), -1, jnp.int32)
        ids_sorted = ids_sorted.at[pos].set(order)

    return BucketStore(
        data_sorted=data_sorted,
        ids_sorted=ids_sorted,
        offsets=offsets,
        counts=counts,
        n=int(n),
        pad_rows=int(pad_rows),
        row_align=int(max(row_align, 1)),
    )


def compute_bucket_bounds(store: BucketStore, chunk: int = 65536) -> BucketStore:
    """Two streaming passes over the store computing per-bucket pruning
    bounds (unit centroid, min row-cosine to it, max row norm) — see the
    field docs on `BucketStore`. One jitted program, `lax.scan` over
    fixed-size row chunks, so it works at any store size that fits HBM
    (the ~400 MB f32 chunk intermediate is the only extra memory).

    Quantized stores are dequantized chunk-by-chunk so the bound holds for
    the exact distances the probe scan computes on the stored codes."""
    import math
    from dataclasses import replace

    rows_total = int(store.data_sorted.shape[0])
    chunk = min(chunk, rows_total)
    n_chunks = math.ceil(rows_total / chunk)
    n_cat = store.n_categories
    d = store.dim

    @jax.jit
    def bounds_fn(data, ids, offsets, scales):
        def load(j):
            nominal = j * chunk
            start = jnp.minimum(nominal, rows_total - chunk)
            rows = jax.lax.dynamic_slice(
                data, (start, 0), (chunk, int(data.shape[1])))
            if store.packed:
                from tpulmi.ops.quantize import unpack_int4

                rows = unpack_int4(rows)
            rows = rows.astype(jnp.float32)
            if scales is not None:
                s = jax.lax.dynamic_slice(scales, (start,), (chunk,))
                rows = rows * (s / store.q_levels)[:, None]
            rid = jax.lax.dynamic_slice(ids, (start,), (chunk,))
            gidx = start + jnp.arange(chunk, dtype=jnp.int32)
            # two-sided validity: real rows only, and never re-count the
            # overlap a clamped tail slice re-reads
            valid = (rid >= 0) & (gidx >= nominal)
            labels = jnp.clip(
                jnp.searchsorted(offsets, gidx, side="right") - 1,
                0, n_cat - 1,
            ).astype(jnp.int32)
            return rows, labels, valid

        def pass1(carry, j):
            acc_sum, acc_max = carry
            rows, labels, valid = load(j)
            w = valid.astype(jnp.float32)
            acc_sum = acc_sum + jax.ops.segment_sum(
                rows * w[:, None], labels, num_segments=n_cat)
            norms = jnp.linalg.norm(rows, axis=1) * w
            acc_max = jnp.maximum(acc_max, jax.ops.segment_max(
                norms, labels, num_segments=n_cat))
            return (acc_sum, acc_max), None

        (c_sum, max_norm), _ = jax.lax.scan(
            pass1,
            (jnp.zeros((n_cat, d), jnp.float32),
             jnp.zeros((n_cat,), jnp.float32)),
            jnp.arange(n_chunks),
        )
        c_norm = jnp.linalg.norm(c_sum, axis=1, keepdims=True)
        centroids = c_sum / jnp.maximum(c_norm, 1e-12)

        def pass2(acc_min, j):
            rows, labels, valid = load(j)
            rhat = rows / jnp.maximum(
                jnp.linalg.norm(rows, axis=1, keepdims=True), 1e-12)
            cosv = jnp.sum(rhat * jnp.take(centroids, labels, axis=0),
                           axis=1)
            cosv = jnp.where(valid, cosv, jnp.inf)
            acc_min = jnp.minimum(acc_min, jax.ops.segment_min(
                cosv, labels, num_segments=n_cat))
            return acc_min, None

        cos_r, _ = jax.lax.scan(
            pass2, jnp.full((n_cat,), jnp.inf, jnp.float32),
            jnp.arange(n_chunks),
        )
        # empty buckets: max_norm 0 makes the bound 1.0 (always prunable);
        # clamp cos_r into [-1, 1] for the downstream trig identity
        cos_r = jnp.clip(jnp.where(jnp.isfinite(cos_r), cos_r, 1.0),
                         -1.0, 1.0)
        return centroids, cos_r, max_norm

    centroids, cos_r, max_norm = bounds_fn(
        store.data_sorted, store.ids_sorted, store.offsets, store.scales)
    return replace(store, bucket_centroids=centroids, bucket_cos_r=cos_r,
                   bucket_max_norm=max_norm)


def bucket_stats(store: BucketStore) -> Tuple[int, int, float]:
    """(max, min, mean) bucket size — host sync; used for padding-class
    selection and logging."""
    counts = jax.device_get(store.counts)
    return int(counts.max()), int(counts.min()), float(counts.mean())
