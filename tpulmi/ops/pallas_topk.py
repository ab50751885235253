"""Pallas TPU kernel: fused cosine-distance + running top-k probe search.

This is the speed-of-light version of the probe phase (the XLA pipeline in
tpulmi/search.py is the portable reference implementation). One
``pallas_call`` walks a flat, statically-bounded worklist of
(query-block, data-block) tiles:

- the worklist is built **on device** with pure jnp (cumsum + searchsorted
  expansion), so no host round-trip depends on the routing result;
- query vectors are pre-gathered into bucket-grouped, block-aligned order,
  so every grid step DMAs one contiguous (QC, d) query tile and one
  contiguous (MC, d) data tile — BlockSpec index maps read the tile ids
  from a scalar-prefetch array;
- the MXU computes the (QC, MC) distance tile; a VMEM scratch accumulator
  keeps each query's best k (k min-extraction passes on the VPU per tile —
  ~1% of the matmul's work for k=10, MC=512);
- TPU grid steps run sequentially, so consecutive items of the same query
  block reuse the scratch accumulator; the output block (indexed by query
  block) is flushed every step and therefore ends holding the final merge.

The store must be built with ``row_align`` a multiple of the data block so
every bucket starts on a block boundary (tpulmi/buckets.py). No-op padding
items point at a dump output block and reset scratch via their `first` flag.

Replaces the per-bucket BLAS GEMM + argsort of the reference
(`search/li/LearnedIndex.py:143-193`, `search/li/utils.py:10-43`).
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpulmi.buckets import BucketStore
from tpulmi.ops.distance import SENTINEL_DIST

K_LANE = 128  # scratch/output lane width (hardware lane count)

# scalar-prefetch columns
_QBLK, _DBLK, _QLIM, _DLIM, _FIRST, _OUT = range(6)


def _kernel(s_ref, q_ref, d_ref, out_d_ref, out_i_ref,
            best_d, best_i, *, k: int, qc: int, mc: int):
    i = pl.program_id(0)
    first = s_ref[_FIRST, i]
    q_lim = s_ref[_QLIM, i]
    d_lim = s_ref[_DLIM, i]
    d_blk = s_ref[_DBLK, i]

    @pl.when(first == 1)
    def _():
        best_d[:] = jnp.full((qc, K_LANE), SENTINEL_DIST, jnp.float32)
        best_i[:] = jnp.full((qc, K_LANE), -1, jnp.int32)

    @pl.when(jnp.logical_and(q_lim > 0, d_lim > 0))
    def _():
        q = q_ref[:]            # (qc, d)
        blk = d_ref[:]          # (mc, d)
        sims = jax.lax.dot_general(
            q, blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dists = 1.0 - sims      # (qc, mc) f32

        col = jax.lax.broadcasted_iota(jnp.int32, (qc, mc), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (qc, mc), 0)
        global_row = d_blk * mc + col
        mask = jnp.logical_and(global_row < d_lim, row < q_lim)
        dists = jnp.where(mask, dists, SENTINEL_DIST)

        bd = best_d[:]
        bi = best_i[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (qc, K_LANE), 1)
        for _ in range(k):
            m = jnp.min(dists, axis=1)                      # (qc,)
            a = jnp.argmin(dists, axis=1).astype(jnp.int32)  # (qc,)
            sel = col == a[:, None]
            # "id" tracked in-kernel is the global STORE ROW; the original
            # dataset id is looked up outside via one (Q, k) gather
            m_id = d_blk * mc + a
            # replace the current worst scratch entry where the new
            # candidate improves on it
            worst = jnp.max(bd[:, :k], axis=1)
            wi = jnp.argmax(bd[:, :k], axis=1).astype(jnp.int32)
            better = m < worst
            hit = jnp.logical_and(lane == wi[:, None], better[:, None])
            bd = jnp.where(hit, m[:, None], bd)
            bi = jnp.where(hit, m_id[:, None], bi)
            # knock the extracted element out of this tile
            dists = jnp.where(sel, SENTINEL_DIST, dists)
        best_d[:] = bd
        best_i[:] = bi

    out_d_ref[:] = best_d[:]
    out_i_ref[:] = best_i[:]


def _build_worklist(slot_counts, store_offsets, store_counts,
                    aligned_slot_offsets, *, qc, mc, max_items, n_out_blocks):
    """Expand per-bucket (query-blocks × data-blocks) into a flat item list,
    fully on device. Invalid (padding) items get zero limits, first=1 and the
    dump output block."""
    nqb = -(-slot_counts // qc)
    ndb = -(-store_counts // mc)
    items = jnp.where(jnp.logical_and(nqb > 0, ndb > 0), nqb * ndb, 0)
    item_ends = jnp.cumsum(items)
    total = item_ends[-1]

    t = jnp.arange(max_items, dtype=jnp.int32)
    b = jnp.searchsorted(item_ends, t, side="right").astype(jnp.int32)
    valid = t < total
    bc = jnp.minimum(b, slot_counts.shape[0] - 1)
    item_starts = item_ends - items
    local = t - jnp.take(item_starts, bc)
    ndb_c = jnp.maximum(jnp.take(ndb, bc), 1)
    qb = local // ndb_c
    db = local % ndb_c

    q_block = jnp.take(aligned_slot_offsets, bc) // qc + qb
    d_block = jnp.take(store_offsets, bc) // mc + db
    q_lim = jnp.take(slot_counts, bc) - qb * qc
    d_lim = jnp.take(store_offsets, bc) + jnp.take(store_counts, bc)
    first = (db == 0).astype(jnp.int32)
    out_blk = q_block

    q_block = jnp.where(valid, q_block, 0)
    d_block = jnp.where(valid, d_block, 0)
    q_lim = jnp.where(valid, q_lim, 0)
    d_lim = jnp.where(valid, d_lim, 0)
    first = jnp.where(valid, first, 1)
    out_blk = jnp.where(valid, out_blk, n_out_blocks - 1)  # dump block

    # transposed (6, MAX_ITEMS): scalar-prefetch lives in SMEM, which pads
    # the trailing dim — row-major per-field layout keeps it tiny
    return jnp.stack(
        [q_block, d_block, q_lim, d_lim, first, out_blk], axis=0
    ).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=("k", "qc", "mc", "max_chunks", "compute_dtype", "interpret"),
)
def pallas_probe_search(
    probe_buckets: jnp.ndarray,   # (Q, P) int32
    queries_search: jnp.ndarray,  # (Q, d) normalized
    store: BucketStore,
    *,
    k: int = 10,
    qc: int = 256,
    mc: int = 512,
    max_chunks: int = 1,          # static ceil(max_bucket / mc)
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for tpulmi.search._probe_search_impl backed by the
    fused Pallas kernel. Returns (dists (Q,k), ids (Q,k), max_slots).

    Requires a store built with row_align % mc == 0 and d % 128 == 0."""
    q, p = probe_buckets.shape
    n_slots = q * p
    n_cat = store.n_categories
    d = store.dim
    if d % 128 != 0:
        raise ValueError(f"pallas path needs d%128==0, got {d}")
    if store.data_sorted.shape[0] % mc != 0:
        raise ValueError("store rows not a multiple of the data block; "
                         "build the store with row_align a multiple of mc")

    # ---- group slots by bucket, block-aligned ----
    slots = probe_buckets.reshape(n_slots)
    order = jnp.argsort(slots, stable=True).astype(jnp.int32)
    slot_counts = jax.ops.segment_sum(
        jnp.ones((n_slots,), jnp.int32), slots, num_segments=n_cat
    )
    raw_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(slot_counts).astype(jnp.int32)]
    )
    aligned_sc = -(-slot_counts // qc) * qc
    aligned_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned_sc).astype(jnp.int32)]
    )
    s_align = -(-(n_slots + n_cat * qc) // qc) * qc  # static worst case
    sorted_buckets = jnp.take(slots, order)
    rank = jnp.arange(n_slots, dtype=jnp.int32) - jnp.take(raw_off, sorted_buckets)
    pos = jnp.take(aligned_off, sorted_buckets) + rank

    slot_order_aligned = jnp.full((s_align,), n_slots, jnp.int32).at[pos].set(order)
    q_idx = jnp.minimum(slot_order_aligned // p, q - 1)
    qvecs = jnp.take(queries_search, q_idx, axis=0).astype(compute_dtype)

    data = store.data_sorted.astype(compute_dtype)

    n_out_blocks = s_align // qc + 1  # +1 dump block for padding items
    max_items = (n_slots // qc + n_cat) * max_chunks

    scalars = _build_worklist(
        slot_counts, store.offsets[:-1], store.counts, aligned_off[:-1],
        qc=qc, mc=mc, max_items=max_items, n_out_blocks=n_out_blocks,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(max_items,),
        in_specs=[
            pl.BlockSpec((qc, d), lambda i, s: (s[_QBLK, i], 0)),
            pl.BlockSpec((mc, d), lambda i, s: (s[_DBLK, i], 0)),
        ],
        out_specs=[
            pl.BlockSpec((qc, K_LANE), lambda i, s: (s[_OUT, i], 0)),
            pl.BlockSpec((qc, K_LANE), lambda i, s: (s[_OUT, i], 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((qc, K_LANE), jnp.float32),
            pltpu.VMEM((qc, K_LANE), jnp.int32),
        ],
    )
    out_d, out_i = pl.pallas_call(
        partial(_kernel, k=k, qc=qc, mc=mc),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_out_blocks * qc, K_LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_out_blocks * qc, K_LANE), jnp.int32),
        ],
        interpret=interpret,
    )(scalars, qvecs, data)

    # ---- per-slot top-k (scratch is unordered), scatter back, merge ranks ----
    neg_top, arg_top = jax.lax.top_k(-out_d, k)
    row_d = -neg_top
    row_i = jnp.take_along_axis(out_i, arg_top, axis=1)

    slot_d = jnp.full((n_slots + 1, k), SENTINEL_DIST, jnp.float32)
    slot_i = jnp.full((n_slots + 1, k), -1, jnp.int32)
    slot_ids = jnp.take(slot_order_aligned, jnp.arange(s_align))
    slot_d = slot_d.at[slot_ids].set(row_d[: s_align])
    slot_i = slot_i.at[slot_ids].set(row_i[: s_align])
    slot_d = slot_d[:n_slots].reshape(q, p * k)
    slot_i = slot_i[:n_slots].reshape(q, p * k)

    neg_top, arg_top = jax.lax.top_k(-slot_d, k)
    final_d = -neg_top
    final_rows = jnp.take_along_axis(slot_i, arg_top, axis=1)
    # store rows -> original dataset ids (one small gather)
    final_i = jnp.where(
        final_rows >= 0,
        jnp.take(store.ids_sorted, jnp.maximum(final_rows, 0)),
        -1,
    )
    return final_d, final_i, slot_counts.max()
