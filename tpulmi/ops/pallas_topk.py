"""Pallas TPU kernel: fused cosine-distance + running top-k probe search.

This is the speed-of-light version of the probe phase (the XLA pipeline in
tpulmi/search.py is the portable reference implementation). One
``pallas_call`` runs a 2-D grid over (query-block, data-chunk):

- query vectors are pre-gathered into bucket-grouped, block-aligned order,
  so every query block belongs to exactly ONE bucket and is DMA'd as one
  contiguous (QC, d) tile;
- per-query-block scalars (bucket's first data block, its chunk count, live
  slot count, row limit) are scalar-prefetched into SMEM — a few ints per
  block, independent of corpus size;
- the data-chunk index map clamps the chunk counter at the bucket's last
  block, so grid steps past the end re-address the same tile (no DMA) and
  `pl.when` skips their compute — bucket-size skew costs empty grid steps,
  not FLOPs or bandwidth;
- the MXU computes the (QC, MC) distance tile; a VMEM scratch accumulator
  keeps each query's best k. Top-k maintenance has three strategies
  (``extract_mode``): "scalar" runs threshold-gated min-extraction passes
  (one extracted element per full-tile sweep); "group" harvests the minima
  of all MC/128 lane-aligned column groups in one sweep and merges them on
  a 128-lane candidate tile (exact when no two improvers share a group —
  proven by candidate-count == element-count, both vs the pre-merge
  threshold; the rare collision falls back to the scalar loop with the
  harvested winners knocked out); "group2" is the same algorithm with two
  fewer full-tile VPU passes — the tile stays in SIMILARITY space (the
  1-sims conversion runs once per block at the output write) and the
  improver count, per-lane-group max, and winning-slab index come out of
  one fused sweep whose per-lane counts double as the collision test
  (any lane count > 1). TPU grid steps are sequential, so the accumulator
  carries across a block's chunks and the output tile (indexed by query
  block) ends holding the final merge.

The store must be built with ``row_align`` a multiple of the data block so
every bucket starts on a block boundary (tpulmi/buckets.py).

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

# Flat-worklist ceiling PER DISPATCH: the worklist is a scalar-prefetch
# operand and lives in SMEM, which is small. 2x17.6k int32 items (the flat
# 10M shape) crashed the backend with an INTERNAL error where 4.5k items
# (the 20M hierarchical shape) ran fine; the worklist is packed one int32
# per item and capped here. Above the cap the worklist is CHUNKED into
# block-aligned segments of <= WL_PAD_MAX items, one pallas_call each,
# chained through donated output buffers (every query block lives entirely
# in one segment, so each segment writes exactly its own output tiles and
# the rest pass through) — the SMEM envelope is per dispatch, not per
# search. WL_SEGMENTS_MAX bounds the chunking (16 segments ≈ 125k items
# covers the 40M x 16-probe shape's 61k at 3x margin); the dense 2-D grid
# remains the fallback past that.
WL_PAD_MAX = 8192
WL_SEGMENTS_MAX = 16


def wl_item_cap(steps_max: int) -> int:
    """Largest worklist total the kernel serves for a store whose longest
    bucket needs ``steps_max`` chunk-steps: one SMEM segment up to
    WL_PAD_MAX, else WL_SEGMENTS_MAX chunked segments whose per-segment
    budget reserves steps_max items so block-aligned assignment never
    overflows a segment."""
    if steps_max >= WL_PAD_MAX:
        return WL_PAD_MAX
    return max(WL_PAD_MAX, WL_SEGMENTS_MAX * (WL_PAD_MAX - steps_max))


# scalar-prefetch rows: first data block of the bucket, number of live data
# chunks, live slots in this query block, bucket row limit (offset+count)
_DSTART, _NDB, _QLIM, _DLIM = range(4)

# Mosaic's scoped-VMEM budget (bytes). A dispatch whose per-grid-step
# footprint exceeds it fails at REMOTE COMPILE time with a backend error
# that can wedge the whole process (NOTES.md rule 10) — observed live when
# the `pair` grid at the 300K bf16 shape wanted 18.40 MB of the 16 MB
# budget (BENCH_r04.json tail). `estimate_vmem_bytes` models the footprint
# host-side so callers decline or re-tile INSTEAD of dispatching a
# guaranteed crash.
VMEM_LIMIT = 16 * 2 ** 20
# The model under-counted that observed crash by ~6% (17.3 vs 18.4 MB —
# Mosaic scopes compiler temporaries the closed form cannot see); scale up
# so "fits" means fits with margin.
VMEM_MODEL_SLACK = 1.1


def estimate_vmem_bytes(*, qc: int, mc: int, d: int, d_stored: int,
                        q_itemsize: int, data_itemsize: int,
                        quantized: bool, pair: bool) -> int:
    """Estimated scoped-VMEM bytes of one kernel grid step (model, not
    oracle — calibrated against the one hardware-observed overflow and
    scaled by ``VMEM_MODEL_SLACK``). Terms:

    - input refs are double-buffered by the pipeline (×2): the (qc, d)
      query tile, 1+pair (mc, d_stored) data refs, and their scale tiles;
    - the (qc, w_mc) f32 similarity tile plus ~one masked working copy
      (the compiler keeps `vals`/`dists` live across the extraction loop);
    - the (qc, 128) f32+i32 output tiles and scratch accumulators."""
    n_refs = 2 if pair else 1
    w_mc = n_refs * mc
    buf = 2  # double-buffered DMA refs
    q_bytes = qc * d * q_itemsize * buf
    data_bytes = n_refs * mc * d_stored * data_itemsize * buf
    sc_bytes = n_refs * mc * 4 * buf if quantized else 0
    out_bytes = qc * K_LANE * (4 + 4)
    scratch_bytes = qc * K_LANE * (4 + 4)
    tile_bytes = 2 * qc * w_mc * 4
    est = (q_bytes + data_bytes + sc_bytes + out_bytes + scratch_bytes
           + tile_bytes)
    return int(est * VMEM_MODEL_SLACK)


def pick_pair_qc(qc: int, mc: int, d: int, d_stored: int,
                 q_itemsize: int, data_itemsize: int,
                 quantized: bool) -> int:
    """Largest query-block size ≤ qc (halving, floor 64) whose ``pair``
    footprint fits ``VMEM_LIMIT``, or 0 when none does (pair must be
    declined for this store/tile shape — e.g. f32 stores at mc=2048,
    where the two double-buffered refs alone overflow). The wide bf16
    shapes that crash at qc=512 fit at qc=256 (estimated 13.0 MB), so
    `pair` degrades to a smaller query block instead of a dead backend."""
    cand = qc
    while cand >= 64:
        if estimate_vmem_bytes(
                qc=cand, mc=mc, d=d, d_stored=d_stored,
                q_itemsize=q_itemsize, data_itemsize=data_itemsize,
                quantized=quantized, pair=True) <= VMEM_LIMIT:
            return cand
        cand //= 2
    return 0


def resolve_tiling(qc: int, mc: int, *, d: int, d_stored: int,
                   q_itemsize: int, data_itemsize: int, quantized: bool,
                   pair: bool) -> Tuple[bool, int]:
    """Resolve a requested (pair, qc) against the scoped-VMEM budget:
    returns the largest eligible qc ≤ the request (halving, floor 64) and
    whether ``pair`` survives — pair degrades to a smaller query block
    when one fits, and to the single-ref grid when none does. Search
    planning calls this so an ineligible request becomes a logged
    re-tiling instead of the backend crash `pallas_probe_search` would
    refuse with a ValueError."""
    if pair:
        qc2 = pick_pair_qc(qc, mc, d, d_stored, q_itemsize, data_itemsize,
                           quantized)
        if qc2:
            return True, qc2
        pair = False
    while qc > 64 and estimate_vmem_bytes(
            qc=qc, mc=mc, d=d, d_stored=d_stored, q_itemsize=q_itemsize,
            data_itemsize=data_itemsize, quantized=quantized,
            pair=False) > VMEM_LIMIT:
        qc //= 2
    return pair, qc


def _kernel(s_ref, q_ref, d_ref, *rest,
            k: int, qc: int, mc: int, quantized: bool = False,
            int8q: bool = False, sub: int = 64, mode: str = "scalar",
            packed: bool = False, pool: bool = False, pair: bool = False):
    # dense 2-D grid: (query block, chunk-step); bucket-size skew costs
    # empty grid steps (compute gated off, DMA elided by the clamped index
    # map). With ``pair`` each step covers TWO consecutive mc-row chunks.
    j = pl.program_id(0)   # query block
    c = pl.program_id(1)   # chunk step within the block's bucket
    last_c = pl.num_programs(1) - 1
    _kernel_core(j, c, last_c, s_ref, q_ref, d_ref, rest,
                 k=k, qc=qc, mc=mc, quantized=quantized, int8q=int8q,
                 sub=sub, mode=mode, packed=packed, pool=pool, pair=pair)


def _kernel_flat(s_ref, wl_ref, q_ref, d_ref, *rest,
                 k: int, qc: int, mc: int, cmax: int,
                 quantized: bool = False,
                 int8q: bool = False, sub: int = 64, mode: str = "scalar",
                 packed: bool = False, pool: bool = False,
                 pair: bool = False, chunked: bool = False):
    # flat worklist grid: one step per LIVE (query block, chunk) pair —
    # bucket-size skew costs nothing. wl_ref (wl_pad,) holds the
    # block-major worklist PACKED one int32 per item (j*cmax + c — SMEM is
    # the scarce resource, see WL_PAD_MAX). Padding semantics differ by
    # mode: the single-segment grid re-addresses the FINAL block with
    # c >= its chunk count (gates off, DMA elided); a chunked segment pads
    # with a dedicated TRASH block (j == n_qblocks, ndb = qlim = 0) whose
    # tile every padding item overwrites with the sentinel init — a
    # padding item must never flush an unwritten VMEM tile over another
    # segment's donated results.
    if chunked:
        # two donated pass-through in-refs (previous segments' outputs)
        # ride along for the input/output aliasing; the kernel never reads
        # them. rest tail is [prev_d, prev_i, out_d, out_i, best_d, best_i].
        rest = rest[:-6] + rest[-4:]
    i = pl.program_id(0)
    j = wl_ref[i] // cmax
    c = wl_ref[i] % cmax
    # a block's final item is its real last chunk-step (empty probed
    # buckets get one item so their output tile still gets the sentinel)
    ndb = s_ref[_NDB, j]
    nsteps = (ndb + 1) // 2 if pair else ndb
    last_c = jnp.maximum(nsteps, 1) - 1
    _kernel_core(j, c, last_c, s_ref, q_ref, d_ref, rest,
                 k=k, qc=qc, mc=mc, quantized=quantized, int8q=int8q,
                 sub=sub, mode=mode, packed=packed, pool=pool, pair=pair)


def _kernel_core(j, c, last_c, s_ref, q_ref, d_ref, rest,
                 *, k: int, qc: int, mc: int, quantized: bool,
                 int8q: bool, sub: int, mode: str, packed: bool = False,
                 pool: bool = False, pair: bool = False):
    # ``pool``: the scratch lanes [k, K_LANE) — untouched by the exact
    # top-k merge below — accumulate each 128-column residue class's
    # best-ever harvested candidate (one compare + two selects per
    # harvested chunk, NO serialized extraction). They are a best-effort
    # overflow pool: the exact rerank draws k_out > k candidates from the
    # scratch, so the kernel tracks a NARROW exact buffer (tight improver
    # threshold, ~min(cnt, k) extraction merges) instead of widening k to
    # the rerank depth (k + rerank_extra, up to 40 at int4 — every merge
    # pass and the improver count scale with that width).
    # ``pair``: two consecutive mc-row data refs per grid step form one
    # 2·mc-wide compute tile — mc=2048's per-step amortization (fewer merge
    # invocations + fixed costs; kbench 17.8 → 15.8 ms at the 20M replica)
    # WITHOUT mc=2048's row_align=2048 store padding, which pushed the real
    # 20M int8 store past HBM (BENCH_20M.md). The second ref clamps to the
    # bucket's last chunk on odd chunk counts; its duplicated columns sit
    # past d_lim and the column mask kills them.
    refs = list(rest)
    d2_ref = refs.pop(0) if pair else None
    sc_ref = refs.pop(0) if quantized else None
    sc2_ref = refs.pop(0) if (quantized and pair) else None
    out_d_ref, out_i_ref, best_d, best_i = refs
    w_mc = 2 * mc if pair else mc     # compute-tile width (columns)
    ndb = s_ref[_NDB, j]
    nsteps = (ndb + 1) // 2 if pair else ndb
    q_lim = s_ref[_QLIM, j]
    d_lim = s_ref[_DLIM, j]
    d_blk = s_ref[_DSTART, j] + jnp.minimum(
        2 * c if pair else c, jnp.maximum(ndb - 1, 0))
    row0 = d_blk * mc                 # first store row of this tile

    # "group2" keeps the scratch in SIMILARITY space (top-k = maxima): the
    # per-tile 1-sims conversion pass disappears and is paid once per block
    # at the output write. 1 - (1 - SENTINEL_DIST) == SENTINEL_DIST exactly
    # (both ends are integers well inside f32's exact range).
    SENT_SIM = 1.0 - SENTINEL_DIST
    sim_space = mode == "group2"

    @pl.when(c == 0)
    def _():
        best_d[:] = jnp.full((qc, K_LANE),
                             SENT_SIM if sim_space else SENTINEL_DIST,
                             jnp.float32)
        best_i[:] = jnp.full((qc, K_LANE), -1, jnp.int32)

    @pl.when(jnp.logical_and(c < nsteps, q_lim > 0))
    def _():
        q = q_ref[:]            # (qc, d); int8 codes when int8q

        def _load(ref):
            blk = ref[:]        # (mc, d); int8 codes when quantized;
            #                     (mc, d/2) packed nibbles when packed
            if packed:
                # int4 unpack in VMEM: the HBM read was half an int8
                # store's bytes; shifts sign-extend the nibbles and the
                # concat restores original dim order (byte j = dims
                # j, j+d/2 — tpulmi/ops/quantize.pack_int4). Shifts MUST
                # run in int32: Mosaic crashes on int8 shifts
                # (hardware-measured).
                b32 = blk.astype(jnp.int32)
                blk = jnp.concatenate(
                    [(b32 << 28) >> 28, b32 >> 4], axis=1).astype(jnp.int8)
            return blk

        blk = _load(d_ref)
        if pair:
            blk = jnp.concatenate([blk, _load(d2_ref)], axis=0)
        if int8q:
            # int8 x int8 -> int32 directly on the MXU: v5e runs int8
            # matmuls at 2x the bf16 rate (394 vs 197 TOPS peak), and the
            # VMEM dequant cast of the data tile disappears. The query's
            # own scale is a positive per-query constant, so it cannot
            # change any per-query ranking or the threshold count — it is
            # applied OUTSIDE the kernel to the final top-k only.
            sims = jax.lax.dot_general(
                q, blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            if quantized:
                # dequantize in VMEM (the HBM read was 1 byte/elem); the
                # per-row scale applies to the columns after the matmul
                blk = blk.astype(q.dtype)
            sims = jax.lax.dot_general(
                q, blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if quantized:
            # per-row scales/127 arrive (mc/128, 128)-tiled (TPU blocks need
            # ≥(8,128) tiles); row-major reshape restores scalar row order
            sc = sc_ref[:].reshape(1, mc)
            if pair:
                sc = jnp.concatenate([sc, sc2_ref[:].reshape(1, mc)], axis=1)
            sims = sims * sc

        if sim_space:
            # --- "group2": the "group" harvest algorithm, restructured to
            # cut full-tile VPU passes. (a) The tile stays in sim space —
            # no 1-sims pass; distances materialize once per block at the
            # output write. (b) The full-tile improver COUNT pass and the
            # gated 3-op harvest sweep fuse into ONE 5-op sweep that also
            # yields PER-LANE improver counts, so the collision test is
            # `any(count_lane > 1)` (a lane-group holds 2+ improvers ⇔
            # its count exceeds 1 ⇔ exactly the candidate-vs-element count
            # inequality "group" detects) with no extra pass. The pre-gate
            # this drops almost never fired at production shapes: with
            # ~164 live queries per block a tile is improver-free only
            # when ALL of them are, measured <1% of tiles at the 20M
            # replica. Exactness argument is "group"'s: the merge extracts
            # candidate maxima in descending order, so after min(ccnt, k)
            # merges every unmerged candidate is provably outside the
            # top-k; collisions fall back to the scalar loop on the tile
            # with the harvested winners knocked out.
            width = w_mc // K_LANE
            col = jax.lax.broadcasted_iota(jnp.int32, (qc, w_mc), 1)
            live_cols = d_lim - row0
            vals = jnp.where(col < live_cols, sims, SENT_SIM)
            qrow = jax.lax.broadcasted_iota(jnp.int32, (qc, 1), 0)[:, 0]
            qmask = qrow < q_lim
            bs0 = best_d[:]
            worst0 = jnp.min(bs0[:, :k], axis=1)               # (qc,)
            SUB = min(sub, qc)
            sub_lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, K_LANE), 1)
            for g in range(qc // SUB):
                lo = g * SUB
                qm_sub = qmask[lo:lo + SUB]
                worst0_sub = worst0[lo:lo + SUB]
                vv = vals[lo:lo + SUB]
                # fused sweep: per-lane-group max, winning slab, per-lane
                # improver count — 5 ops/element, one pass over the tile
                m = vv[:, :K_LANE]
                la = jnp.zeros((SUB, K_LANE), jnp.int32)
                cl = (m > worst0_sub[:, None]).astype(jnp.int32)
                for w in range(1, width):
                    sl = vv[:, w * K_LANE:(w + 1) * K_LANE]
                    cl = cl + (sl > worst0_sub[:, None]).astype(jnp.int32)
                    upd = sl > m
                    m = jnp.where(upd, sl, m)
                    la = jnp.where(upd, w, la)
                cl = jnp.where(qm_sub[:, None], cl, 0)
                ccnt = jnp.sum((cl > 0).astype(jnp.int32), axis=1)  # (SUB,)
                n_small = jnp.max(jnp.minimum(ccnt, k))

                @pl.when(n_small > 0)
                def _(lo=lo, m=m, la=la, vv=vv, cl=cl, qm_sub=qm_sub,
                      n_small=n_small):
                    cg = la * K_LANE + sub_lane        # within-chunk column

                    def small(_, st):
                        mm, bd_, bi_ = st
                        v = jnp.max(mm, axis=1)                   # (SUB,)
                        a = jnp.argmax(mm, axis=1).astype(jnp.int32)
                        sel = sub_lane == a[:, None]
                        cid = jnp.sum(jnp.where(sel, cg, 0), axis=1)
                        m_id = row0 + cid
                        worst_ = jnp.min(bd_[:, :k], axis=1)
                        wi = jnp.argmin(
                            bd_[:, :k], axis=1).astype(jnp.int32)
                        better = v > worst_
                        hit = jnp.logical_and(
                            sub_lane == wi[:, None], better[:, None])
                        bd_ = jnp.where(hit, v[:, None], bd_)
                        bi_ = jnp.where(hit, m_id[:, None], bi_)
                        mm = jnp.where(sel, SENT_SIM, mm)
                        return mm, bd_, bi_

                    st_bd = bs0[lo:lo + SUB]
                    st_bi = best_i[lo:lo + SUB]
                    if pool:
                        # sim-space residue-class pool (see _kernel_core)
                        p_upd = jnp.logical_and(m > st_bd, sub_lane >= k)
                        st_bd = jnp.where(p_upd, m, st_bd)
                        st_bi = jnp.where(p_upd, row0 + cg, st_bi)
                    _, bd, bi = jax.lax.fori_loop(
                        0, n_small, small, (m, st_bd, st_bi))
                    best_d[lo:lo + SUB] = bd
                    best_i[lo:lo + SUB] = bi

                    # collision (2+ improvers share a lane group): scalar
                    # fallback on the tile with the lane maxima knocked out
                    # (strict `>` kept the first slab on ties, so a tied
                    # duplicate survives for the fallback)
                    @pl.when(jnp.any(cl > 1))
                    def _(lo=lo, la=la, vv=vv, bd=bd, bi=bi, qm_sub=qm_sub):
                        vv2 = jnp.concatenate(
                            [jnp.where(la == w, SENT_SIM,
                                       vv[:, w * K_LANE:(w + 1) * K_LANE])
                             for w in range(width)], axis=1)
                        worst1 = jnp.min(bd[:, :k], axis=1)
                        cnt2 = jnp.sum(
                            (vv2 > worst1[:, None]).astype(jnp.int32),
                            axis=1)
                        cnt2 = jnp.where(qm_sub, jnp.minimum(cnt2, k), 0)

                        def extract(_, state):
                            vv_, bd_, bi_ = state
                            mv = jnp.max(vv_, axis=1)
                            a = jnp.argmax(vv_, axis=1).astype(jnp.int32)
                            m_id = row0 + a
                            worst_ = jnp.min(bd_[:, :k], axis=1)
                            wi = jnp.argmin(
                                bd_[:, :k], axis=1).astype(jnp.int32)
                            better = mv > worst_
                            hit = jnp.logical_and(
                                sub_lane == wi[:, None], better[:, None])
                            bd_ = jnp.where(hit, mv[:, None], bd_)
                            bi_ = jnp.where(hit, m_id[:, None], bi_)
                            vv_ = jnp.where(
                                jax.lax.broadcasted_iota(
                                    jnp.int32, (SUB, w_mc), 1) == a[:, None],
                                SENT_SIM, vv_)
                            return vv_, bd_, bi_

                        _, bd2, bi2 = jax.lax.fori_loop(
                            0, jnp.max(cnt2), extract, (vv2, bd, bi))
                        best_d[lo:lo + SUB] = bd2
                        best_i[lo:lo + SUB] = bi2
            return

        dists = 1.0 - sims      # (qc, mc) f32

        # Column mask only: knock out rows past the bucket's end (live only
        # on the bucket's LAST chunk, but one iota+compare+select is cheap
        # enough to run unconditionally — an A/B that gated it behind
        # `lax.cond(live_cols >= mc, ...)` measured ~5% SLOWER at the 20M
        # replica shape: the per-tile branch costs more than the pass).
        # Padded QUERY rows are NOT masked here — their outputs are
        # discarded at scatter time, and the only way they could cost
        # anything is by inflating the extraction iteration count, which
        # the (qc,)-shaped mask on `cnt` below prevents for the price of
        # one tiny 1-D select instead of a full (qc, mc) row-iota + and +
        # where every tile.
        col = jax.lax.broadcasted_iota(jnp.int32, (qc, w_mc), 1)
        live_cols = d_lim - row0   # may exceed mc on interior chunks
        dists = jnp.where(col < live_cols, dists, SENTINEL_DIST)

        # Threshold-gated top-k maintenance. A fixed k min-extraction passes
        # per tile makes the VPU — not the MXU — the bottleneck (~4% MFU in
        # round-1 profiling): at qc=256/mc=512/k=10 those passes cost more
        # than the tile's matmul. Instead, ONE cheap pass counts how many
        # candidates beat the running k-th best, and extraction runs in
        # independent SUB-row groups: the iteration count is max-over-rows,
        # so smaller groups pay for their own improvements instead of the
        # whole block's worst case (the coupling inflates a ~0.5 per-query
        # mean into a ~5 per-block max at qc=512).
        bd0 = best_d[:]
        worst0 = jnp.max(bd0[:, :k], axis=1)               # (qc,)
        cnt_raw = jnp.sum(
            (dists < worst0[:, None]).astype(jnp.int32), axis=1
        )                                                  # (qc,)
        # padded query rows (the slot tail of the bucket's last block) must
        # never drive the extraction iteration count: zero their counts.
        # Their scratch rows may fill with garbage candidates — harmless,
        # the scatter after the kernel drops non-live slots.
        qrow = jax.lax.broadcasted_iota(jnp.int32, (qc, 1), 0)[:, 0]
        cnt_raw = jnp.where(qrow < q_lim, cnt_raw, 0)
        # per query only its k smallest improvers can enter the buffer, and
        # extraction removes per-query minima in ascending order, so
        # max_q min(cnt_q, k) passes per group are exact (not approximate)
        cnt = jnp.minimum(cnt_raw, k)

        SUB = min(sub, qc)
        sub_lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, K_LANE), 1)
        if mode == "group":
            # Group-harvest extraction: the scalar mode below pays ~3
            # full-(SUB, mc) passes (min, argmin, knockout) per EXTRACTED
            # element — at k=10 the VPU, not HBM, floors the kernel (the
            # k=1 ablation measured 33% of kernel time in these passes,
            # NOTES.md round-3 facts). Here one sweep harvests the minimum
            # of every 128-lane column group simultaneously: slice the tile
            # into mc/128 lane-aligned (SUB, 128) slabs, track the running
            # per-lane min and WHICH slab won (one compare + two selects per
            # slab — ~1 tile pass total), knock all winners out (one select
            # pass), then merge the 128 candidates into the running top-k on
            # a 128-lane tile where each pass costs mc/128× less than a
            # full-tile pass. The harvest is provably complete when no two
            # improvers share a group (candidate-improver count equals the
            # tile-improver count, both vs the pre-merge threshold); the
            # rare collision (k=10 improvers spread over 128 groups) falls
            # back to the scalar extraction loop below with the harvested
            # winners knocked out.
            width = w_mc // K_LANE
            qmask = qrow < q_lim                               # (qc,)
            for g in range(qc // SUB):
                lo = g * SUB
                n_iter = jnp.max(cnt[lo:lo + SUB])
                qm_sub = qmask[lo:lo + SUB]
                raw_sub = cnt_raw[lo:lo + SUB]

                @pl.when(n_iter > 0)
                def _(g=g, lo=lo, n_iter=n_iter, qm_sub=qm_sub,
                      raw_sub=raw_sub):
                    dd = dists[lo:lo + SUB]
                    # sweep: per-lane-group min + winning slab index
                    m = dd[:, :K_LANE]
                    la = jnp.zeros((SUB, K_LANE), jnp.int32)
                    for w in range(1, width):
                        sl = dd[:, w * K_LANE:(w + 1) * K_LANE]
                        upd = sl < m
                        m = jnp.where(upd, sl, m)
                        la = jnp.where(upd, w, la)
                    cg = la * K_LANE + sub_lane         # within-chunk column
                    worst0_sub = worst0[lo:lo + SUB]
                    ccnt_raw = jnp.where(
                        qm_sub,
                        jnp.sum((m < worst0_sub[:, None]).astype(jnp.int32),
                                axis=1),
                        0)
                    n_small = jnp.max(jnp.minimum(ccnt_raw, k))

                    def small(_, st):
                        mm, bd_, bi_ = st
                        v = jnp.min(mm, axis=1)                  # (SUB,)
                        a = jnp.argmin(mm, axis=1).astype(jnp.int32)
                        sel = sub_lane == a[:, None]
                        cid = jnp.sum(jnp.where(sel, cg, 0), axis=1)
                        m_id = row0 + cid
                        worst_ = jnp.max(bd_[:, :k], axis=1)
                        wi = jnp.argmax(
                            bd_[:, :k], axis=1).astype(jnp.int32)
                        better = v < worst_
                        hit = jnp.logical_and(
                            sub_lane == wi[:, None], better[:, None])
                        bd_ = jnp.where(hit, v[:, None], bd_)
                        bi_ = jnp.where(hit, m_id[:, None], bi_)
                        mm = jnp.where(sel, SENTINEL_DIST, mm)
                        return mm, bd_, bi_

                    st_bd = bd0[lo:lo + SUB]
                    st_bi = best_i[lo:lo + SUB]
                    if pool:
                        # residue-class pool: lanes >= k keep the best
                        # candidate their 128-column class has harvested
                        # (m is pre-knockout, so extracted winners may
                        # also land here — the host rerank dedupes)
                        p_upd = jnp.logical_and(m < st_bd, sub_lane >= k)
                        st_bd = jnp.where(p_upd, m, st_bd)
                        st_bi = jnp.where(p_upd, row0 + cg, st_bi)
                    _, bd, bi = jax.lax.fori_loop(
                        0, n_small, small, (m, st_bd, st_bi))
                    best_d[lo:lo + SUB] = bd
                    best_i[lo:lo + SUB] = bi

                    # Completeness: ccnt_raw counts improver-CONTAINING
                    # groups (vs worst0 — the buffer is un-merged at sweep
                    # time) while raw_sub counts improver ELEMENTS — equal
                    # iff no two improvers share a group, i.e. the harvest
                    # held ALL of them and the ascending merge above is
                    # exactly the scalar algorithm on the full improver
                    # set. Collisions (rare: k=10 candidates over 128
                    # groups) fall back to the scalar extraction loop on
                    # the tile with the harvested minima knocked out.
                    @pl.when(jnp.any(ccnt_raw != raw_sub))
                    def _(dd=dd, la=la, bd=bd, bi=bi, lo=lo, qm_sub=qm_sub):
                        # la uniquely addresses one element per (row, lane);
                        # strict `<` kept the first slab on value ties, so a
                        # tied duplicate survives for the fallback
                        dd = jnp.concatenate(
                            [jnp.where(la == w, SENTINEL_DIST,
                                       dd[:, w * K_LANE:(w + 1) * K_LANE])
                             for w in range(width)], axis=1)
                        worst1 = jnp.max(bd[:, :k], axis=1)
                        cnt2 = jnp.sum(
                            (dd < worst1[:, None]).astype(jnp.int32), axis=1)
                        cnt2 = jnp.where(qm_sub, jnp.minimum(cnt2, k), 0)

                        def extract(_, state):
                            dd_, bd_, bi_ = state
                            mv = jnp.min(dd_, axis=1)
                            a = jnp.argmin(dd_, axis=1).astype(jnp.int32)
                            m_id = row0 + a
                            worst_ = jnp.max(bd_[:, :k], axis=1)
                            wi = jnp.argmax(
                                bd_[:, :k], axis=1).astype(jnp.int32)
                            better = mv < worst_
                            hit = jnp.logical_and(
                                sub_lane == wi[:, None], better[:, None])
                            bd_ = jnp.where(hit, mv[:, None], bd_)
                            bi_ = jnp.where(hit, m_id[:, None], bi_)
                            dd_ = jnp.where(
                                jax.lax.broadcasted_iota(
                                    jnp.int32, (SUB, w_mc), 1) == a[:, None],
                                SENTINEL_DIST, dd_)
                            return dd_, bd_, bi_

                        _, bd, bi = jax.lax.fori_loop(
                            0, jnp.max(cnt2), extract, (dd, bd, bi))
                        best_d[lo:lo + SUB] = bd
                        best_i[lo:lo + SUB] = bi
            return

        sub_col = jax.lax.broadcasted_iota(jnp.int32, (SUB, w_mc), 1)
        for g in range(qc // SUB):
            lo = g * SUB
            n_iter = jnp.max(cnt[lo:lo + SUB])

            @pl.when(n_iter > 0)
            def _(g=g, lo=lo, n_iter=n_iter):
                def extract(_, state):
                    dd, bd, bi = state
                    m = jnp.min(dd, axis=1)                       # (SUB,)
                    a = jnp.argmin(dd, axis=1).astype(jnp.int32)  # (SUB,)
                    # "id" tracked in-kernel is the global STORE ROW; the
                    # original dataset id is looked up outside via a gather
                    m_id = row0 + a
                    # replace the current worst scratch entry where the
                    # new candidate improves on it
                    worst = jnp.max(bd[:, :k], axis=1)
                    wi = jnp.argmax(bd[:, :k], axis=1).astype(jnp.int32)
                    better = m < worst
                    hit = jnp.logical_and(
                        sub_lane == wi[:, None], better[:, None]
                    )
                    bd = jnp.where(hit, m[:, None], bd)
                    bi = jnp.where(hit, m_id[:, None], bi)
                    # knock the extracted element out of this tile
                    dd = jnp.where(sub_col == a[:, None], SENTINEL_DIST, dd)
                    return dd, bd, bi

                _, bd, bi = jax.lax.fori_loop(
                    0, n_iter, extract,
                    (dists[lo:lo + SUB], bd0[lo:lo + SUB],
                     best_i[lo:lo + SUB]),
                )
                best_d[lo:lo + SUB] = bd
                best_i[lo:lo + SUB] = bi

    # the output tile is indexed by the query block alone; write it once, on
    # the block's final step, instead of copying scratch every chunk
    # ("group2" converts its sim-space scratch to distances here — the one
    # place the per-tile 1-sims pass of the other modes is actually needed)
    @pl.when(c == last_c)
    def _():
        bd, bi = best_d[:], best_i[:]
        if pool:
            # a pool lane can hold a row the exact top-k also extracted
            # (the pool merges the pre-knockout harvest); a duplicate
            # surviving to the final top-k_out would displace a true
            # member from the exact k-prefix. Knock duplicates out once
            # per block: k lane-compares against the tight lanes.
            lane = jax.lax.broadcasted_iota(jnp.int32, (qc, K_LANE), 1)
            dup = jnp.zeros((qc, K_LANE), jnp.bool_)
            for t in range(k):
                dup = jnp.logical_or(dup, bi == bi[:, t:t + 1])
            dup = jnp.logical_and(dup, lane >= k)
            bd = jnp.where(dup, SENT_SIM if sim_space else SENTINEL_DIST,
                           bd)
            bi = jnp.where(dup, -1, bi)
        out_d_ref[:] = 1.0 - bd if sim_space else bd
        out_i_ref[:] = bi


@partial(
    jax.jit,
    static_argnames=("k", "qc", "mc", "max_chunks", "compute_dtype",
                     "int8_queries", "extract_sub", "extract_mode", "wl_pad",
                     "interpret", "k_out", "pair"),
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
    int8_queries: bool = False,
    extract_sub: int = 0,         # extraction sub-group rows; 0 = per-mode
                                  # optimum (min(qc, 256) for "group" — the
                                  # collision coupling is a rare fallback
                                  # there, so near-block groups win: kbench
                                  # 19.3 ms @ qc192/sub192, 25.3 @ qc512/
                                  # sub256, vs 33.2 @ qc512/sub512; 64 for
                                  # "scalar", the round-3 kbench A/B)
    extract_mode: str = "scalar",  # "scalar" | "group" top-k maintenance
    wl_pad: int = 0,              # flat-worklist grid length (0 = 2-D grid)
    interpret: bool = False,
    k_out: int = 0,               # candidates returned per query (0 = k);
                                  # k_out > k draws the extra rows from the
                                  # kernel's residue-class pool lanes —
                                  # rows [k, k_out) are BEST-EFFORT rerank
                                  # candidates, not the exact (k, k_out]
                                  # order statistics (group/group2 only)
    pair: bool = False,           # two mc-row DMA refs per grid step → one
                                  # 2·mc-wide compute tile: mc=2048's
                                  # per-step amortization at row_align=mc
                                  # (kbench 17.8 → 15.8 ms at the 20M
                                  # replica, where a real row_align=2048
                                  # store pads past HBM)
) -> Tuple[jnp.ndarray, ...]:
    """Drop-in replacement for tpulmi.search._probe_search_impl backed by the
    fused Pallas kernel. Returns (dists (Q,k), ids (Q,k), max_slots); with
    ``wl_pad > 0`` a 4th element, the TRUE worklist total, is appended.

    ``wl_pad`` switches the grid from dense 2-D (query-block × max_chunks —
    bucket-size skew pays one empty grid step per missing chunk; measured
    ~2.5× probe-phase inflation at the skewed 10M shape, BENCH_10M.md) to a
    flat worklist of live (block, chunk) pairs built on device. wl_pad is a
    STATIC length; callers size it like qpb_pad (estimate from the routed
    slot counts, cache, re-run larger if the returned total exceeds it —
    results are INVALID on overflow since trailing work items are dropped).

    Requires a store built with row_align % mc == 0 and d % 128 == 0.

    ``int8_queries`` (int8 stores only): symmetrically quantize the gathered
    query tiles too, so the distance matmul runs int8 x int8 -> int32 on the
    MXU at 2x the bf16 rate with no VMEM dequant of the data tile. The
    query's positive per-query scale factors out of every per-query
    comparison inside the kernel and is re-applied to the final top-k
    distances here, so ranking is exact w.r.t. the quantized scores; the
    ~0.5% query-quantization noise lands inside the rerank margin the int8
    store already budgets for (SearchConfig.rerank)."""
    q, p = probe_buckets.shape
    n_slots = q * p
    n_cat = store.n_categories
    d = store.dim                                # logical vector width
    d_stored = int(store.data_sorted.shape[1])   # d/2 for packed int4
    if d % 128 != 0:
        raise ValueError(f"pallas path needs d%128==0, got {d}")
    if store.packed and d_stored % 128 != 0:
        raise ValueError(
            f"pallas int4 path needs packed width d/2 % 128 == 0 (d % 256 "
            f"== 0), got d={d}")
    if k > K_LANE:
        raise ValueError(
            f"pallas path tracks top-k in a {K_LANE}-lane scratch; k={k} "
            f"exceeds it (use the XLA backend for k > {K_LANE})"
        )
    ko = k_out if k_out else k
    pool = ko > k
    if ko > K_LANE:
        raise ValueError(f"k_out={ko} exceeds the {K_LANE}-lane scratch")
    if pool and extract_mode not in ("group", "group2"):
        raise ValueError(
            "the rerank pool (k_out > k) needs a harvesting extract_mode "
            "('group'/'group2') — 'scalar' never materializes the per-class "
            "minima the pool accumulates")
    # Every bucket offset must be a multiple of the data block, or the
    # block index map floors into the preceding bucket (tail rows silently
    # unscored, foreign rows leaking in). The recorded static row_align is
    # the guarantee; a coincidentally-divisible total size is not.
    if store.row_align % mc != 0:
        raise ValueError(
            f"pallas path needs row_align % mc == 0; store has "
            f"row_align={store.row_align}, mc={mc} — rebuild the store with "
            f"row_align a multiple of mc"
        )
    if store.data_sorted.shape[0] % mc != 0:
        raise ValueError("store rows not a multiple of the data block; "
                         "build the store with row_align a multiple of mc")
    if extract_sub == 0:
        if extract_mode in ("group", "group2"):
            # largest divisor of qc that fits the measured ≤256 optimum
            extract_sub = (qc if qc <= 256 else
                           max(s for s in range(8, 257) if qc % s == 0))
        else:
            extract_sub = 64
    if qc % min(extract_sub, qc) != 0:
        raise ValueError(
            f"qc={qc} must be divisible by extract_sub={extract_sub}"
        )
    if extract_mode not in ("scalar", "group", "group2"):
        raise ValueError(f"unknown extract_mode {extract_mode!r}")
    if extract_mode in ("group", "group2") and mc % K_LANE != 0:
        raise ValueError(
            f"extract_mode={extract_mode!r} needs mc % {K_LANE} == 0, "
            f"got mc={mc}"
        )
    if not interpret:
        # scoped-VMEM eligibility: a dispatch past the budget fails at
        # remote compile with a backend error that can wedge the process
        # (NOTES.md rule 10) — refuse it here, at trace time, with the
        # actionable knobs in the message. Interpret mode has no VMEM.
        _q_isz = 1 if int8_queries and store.is_quantized else (
            jnp.dtype(compute_dtype).itemsize)
        _d_isz = (1 if store.is_quantized
                  else jnp.dtype(compute_dtype).itemsize)
        _est = estimate_vmem_bytes(
            qc=qc, mc=mc, d=d, d_stored=d_stored, q_itemsize=_q_isz,
            data_itemsize=_d_isz, quantized=store.is_quantized, pair=pair)
        if _est > VMEM_LIMIT:
            raise ValueError(
                f"kernel tile (qc={qc}, mc={mc}, d={d}, pair={pair}, "
                f"dtype={'int8' if store.is_quantized else str(compute_dtype)}"
                f") wants ~{_est / 2**20:.1f} MB of the {VMEM_LIMIT // 2**20}"
                f" MB scoped-VMEM budget — the dispatch would crash the "
                f"backend (NOTES.md rule 10). Halve qc"
                + (" or disable pair" if pair else "") + ".")

    # ---- group slots by bucket, block-aligned: every query block belongs
    # to exactly one bucket ----
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
    n_qblocks = s_align // qc
    sorted_buckets = jnp.take(slots, order)
    rank = jnp.arange(n_slots, dtype=jnp.int32) - jnp.take(raw_off, sorted_buckets)
    pos = jnp.take(aligned_off, sorted_buckets) + rank

    # Dumped slots (probe_mass truncation points them at bucket id == n_cat)
    # must NOT enter the block layout: their positions sit past every live
    # bucket's aligned region, in blocks the flat worklist gives ZERO grid
    # steps — those output tiles are never written, and scattering them back
    # would copy uninitialized memory into real (query, probe) slots
    # (measured at 300K: probe_mass + worklist collapsed recall to 0.05).
    # Mapping them to the discard row n_slots keeps their merge rows at the
    # sentinel init, identical to the dense grid's empty-block semantics.
    slot_order_aligned = jnp.full((s_align,), n_slots, jnp.int32).at[pos].set(
        jnp.where(sorted_buckets < n_cat, order, n_slots))
    q_idx = jnp.minimum(slot_order_aligned // p, q - 1)
    quantized = store.is_quantized
    int8q = bool(int8_queries) and quantized
    qvecs = jnp.take(queries_search, q_idx, axis=0)
    if int8q:
        qf = qvecs.astype(jnp.float32)
        q_scale = jnp.maximum(jnp.max(jnp.abs(qf), axis=1), 1e-12)  # (s_align,)
        qvecs = jnp.clip(
            jnp.round(qf / q_scale[:, None] * 127.0), -127, 127
        ).astype(jnp.int8)
        q_scaled127 = q_scale / 127.0
    else:
        qvecs = qvecs.astype(compute_dtype)
    if quantized:
        if (mc // 128) % 8 != 0:
            raise ValueError(
                f"pallas int8 path needs mc % 1024 == 0 (scales tile is "
                f"(mc/128, 128) and TPU blocks need ≥8 sublanes); got mc={mc}"
            )
        data = store.data_sorted  # int8/packed-int4 codes, dequantized in-kernel
        sc_blocks = (
            (store.scales / store.q_levels).astype(jnp.float32).reshape(-1, 128)
        )
    else:
        data = store.data_sorted.astype(compute_dtype)

    # ---- per-query-block scalars ----
    # bucket of block j: position aligned_off[b] // qc .. ; invert via
    # searchsorted over the aligned offsets
    blk_start_slots = jnp.arange(n_qblocks, dtype=jnp.int32) * qc
    blk_bucket = (
        jnp.searchsorted(aligned_off[1:], blk_start_slots, side="right")
        .astype(jnp.int32)
    )
    blk_bucket = jnp.minimum(blk_bucket, n_cat - 1)
    # live slots in this block: bucket's count minus the block's offset
    # inside the bucket (≤0 for alignment-padding blocks past the tail)
    in_bucket_off = blk_start_slots - jnp.take(aligned_off, blk_bucket)
    blk_qlim = jnp.take(slot_counts, blk_bucket) - in_bucket_off
    blk_dstart = jnp.take(store.offsets, blk_bucket) // mc
    blk_ndb = -(-jnp.take(store.counts, blk_bucket) // mc)
    blk_dlim = (jnp.take(store.offsets, blk_bucket)
                + jnp.take(store.counts, blk_bucket))
    scalars = jnp.stack(
        [blk_dstart, blk_ndb, blk_qlim, blk_dlim], axis=0
    ).astype(jnp.int32)

    scratch = [
        pltpu.VMEM((qc, K_LANE), jnp.float32),
        pltpu.VMEM((qc, K_LANE), jnp.int32),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_qblocks * qc, K_LANE), jnp.float32),
        jax.ShapeDtypeStruct((n_qblocks * qc, K_LANE), jnp.int32),
    ]
    wl_total = None
    # ``pair``: grid steps advance TWO mc-row chunks at a time (two data
    # refs); all step math below is in pair units while the scalars stay in
    # block units (the kernel derives pair counts from _NDB itself).
    steps_max = -(-max_chunks // 2) if pair else max_chunks

    def _block_of(step, r, s, j):
        # store block of the step's r-th ref (r=0/1), clamped to the
        # bucket's last chunk (odd counts re-read it; column mask kills it)
        chunk = 2 * step + r if pair else step
        return s[_DSTART, j] + jnp.minimum(chunk,
                                           jnp.maximum(s[_NDB, j] - 1, 0))

    out_precomputed = None
    if wl_pad > 0:
        # flat worklist: one grid step per live (block, chunk-step) pair,
        # block-major so the scratch accumulator carries within a block.
        # Empty probed buckets keep ONE item (their output tile must get
        # the sentinel init); dead alignment-tail blocks get none.
        # Packed one int32 per item (j*cmax + c) to halve SMEM traffic.
        cmax = steps_max + 1
        live = blk_qlim > 0
        blk_steps = (blk_ndb + 1) // 2 if pair else blk_ndb
        ndb_wl = jnp.where(live, jnp.maximum(blk_steps, 1), 0).astype(
            jnp.int32)
        cum = jnp.cumsum(ndb_wl).astype(jnp.int32)
        wl_total = cum[n_qblocks - 1]
        ex = cum - ndb_wl

        def data_index_flat(i, s, w, r=0):
            j = w[i] // cmax
            return (_block_of(w[i] % cmax, r, s, j), 0)

        def _wl_specs():
            specs = [
                pl.BlockSpec((qc, d), lambda i, s, w: (w[i] // cmax, 0)),
                pl.BlockSpec((mc, d_stored), data_index_flat),
            ]
            if pair:
                specs.append(pl.BlockSpec(
                    (mc, d_stored), partial(data_index_flat, r=1)))
            if quantized:
                specs.append(
                    pl.BlockSpec((mc // 128, 128), data_index_flat))
                if pair:
                    specs.append(pl.BlockSpec(
                        (mc // 128, 128), partial(data_index_flat, r=1)))
            return specs

        def _wl_inputs(scal, wl_arr, qv):
            ins = [scal, wl_arr, qv, data]
            if pair:
                ins.append(data)
            if quantized:
                ins.append(sc_blocks)
                if pair:
                    ins.append(sc_blocks)
            return ins

        out_map = [
            pl.BlockSpec((qc, K_LANE), lambda i, s, w: (w[i] // cmax, 0)),
            pl.BlockSpec((qc, K_LANE), lambda i, s, w: (w[i] // cmax, 0)),
        ]
        if wl_pad <= WL_PAD_MAX:
            # single segment: padding items re-address the FINAL block
            # with c >= its chunk count (gates off, DMA elided)
            ii = jnp.arange(wl_pad, dtype=jnp.int32)
            wl_j = jnp.minimum(
                jnp.searchsorted(cum, ii, side="right").astype(jnp.int32),
                n_qblocks - 1,
            )
            wl_c = jnp.minimum(ii - jnp.take(ex, wl_j), steps_max)
            wl = wl_j * cmax + wl_c
            inputs = [*_wl_inputs(scalars, wl, qvecs)]
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(wl_pad,),
                in_specs=_wl_specs(),
                out_specs=out_map,
                scratch_shapes=scratch,
            )
            kernel = partial(_kernel_flat, k=k, qc=qc, mc=mc, cmax=cmax,
                             quantized=quantized, int8q=int8q,
                             sub=extract_sub, mode=extract_mode,
                             packed=store.packed, pool=pool, pair=pair)
        else:
            # ---- chunked worklist: S block-aligned segments of at most
            # WL_PAD_MAX items, one pallas_call each, chained through
            # DONATED output buffers. Every query block's items land in
            # exactly one segment (segment of block j = ex[j] // B with
            # B = WL_PAD_MAX - steps_max, so a block starting before a
            # boundary still ends within the segment), hence each segment
            # fully writes its own output tiles and never touches
            # another's — the donated buffers pass the rest through.
            # Padding items address a dedicated TRASH block (j ==
            # n_qblocks) whose tile they overwrite with the sentinel init;
            # re-addressing a real block would flush an unwritten VMEM
            # tile over donated results.
            if steps_max >= WL_PAD_MAX:
                raise ValueError(
                    f"a single bucket needs {steps_max} chunk-steps — more "
                    f"than one worklist segment holds ({WL_PAD_MAX}); use "
                    f"the dense grid for this shape")
            seg_budget = WL_PAD_MAX - steps_max
            n_seg = -(-wl_pad // seg_budget)
            if n_seg > WL_SEGMENTS_MAX:
                raise ValueError(
                    f"wl_pad={wl_pad} needs {n_seg} worklist segments "
                    f"(> WL_SEGMENTS_MAX={WL_SEGMENTS_MAX}); use the dense "
                    f"grid for this shape")
            cap = n_seg * seg_budget
            seg_of_block = jnp.minimum(ex // seg_budget, n_seg - 1)
            seg_first = jnp.full((n_seg,), jnp.iinfo(jnp.int32).max,
                                 jnp.int32).at[seg_of_block].min(ex)
            trash = n_qblocks * cmax
            ii = jnp.arange(cap, dtype=jnp.int32)
            wl_j = jnp.minimum(
                jnp.searchsorted(cum, ii, side="right").astype(jnp.int32),
                n_qblocks - 1,
            )
            wl_c = jnp.minimum(ii - jnp.take(ex, wl_j), steps_max)
            items = wl_j * cmax + wl_c
            seg = jnp.take(seg_of_block, wl_j)
            pos = jnp.clip(ii - jnp.take(seg_first, seg), 0, WL_PAD_MAX - 1)
            valid = ii < wl_total
            wl_segs = jnp.full((n_seg + 1, WL_PAD_MAX), trash, jnp.int32)
            wl_segs = wl_segs.at[
                jnp.where(valid, seg, n_seg), pos
            ].set(jnp.where(valid, items, trash), mode="drop")[:n_seg]

            # trash-block scalars (ndb = qlim = 0: compute gated off, the
            # c == last_c write emits the sentinel init) + one zero query
            # block backing its query-tile DMA
            scalars_ck = jnp.concatenate(
                [scalars, jnp.zeros((scalars.shape[0], 1), jnp.int32)],
                axis=1)
            qvecs_ck = jnp.concatenate(
                [qvecs, jnp.zeros((qc, qvecs.shape[1]), qvecs.dtype)],
                axis=0)
            n_rows_ck = (n_qblocks + 1) * qc
            in_specs = _wl_specs() + [
                pl.BlockSpec((qc, K_LANE), lambda i, s, w: (w[i] // cmax, 0)),
                pl.BlockSpec((qc, K_LANE), lambda i, s, w: (w[i] // cmax, 0)),
            ]
            out_shape_ck = [
                jax.ShapeDtypeStruct((n_rows_ck, K_LANE), jnp.float32),
                jax.ShapeDtypeStruct((n_rows_ck, K_LANE), jnp.int32),
            ]
            grid_spec_ck = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(WL_PAD_MAX,),
                in_specs=in_specs,
                out_specs=out_map,
                scratch_shapes=scratch,
            )
            kernel_ck = partial(_kernel_flat, k=k, qc=qc, mc=mc, cmax=cmax,
                                quantized=quantized, int8q=int8q,
                                sub=extract_sub, mode=extract_mode,
                                packed=store.packed, pool=pool, pair=pair,
                                chunked=True)
            acc_d = jnp.full((n_rows_ck, K_LANE), SENTINEL_DIST, jnp.float32)
            acc_i = jnp.full((n_rows_ck, K_LANE), -1, jnp.int32)
            base = _wl_inputs(scalars_ck, wl_segs[0], qvecs_ck)
            n_in = len(base) + 2
            for s_i in range(n_seg):
                base[1] = wl_segs[s_i]
                acc_d, acc_i = pl.pallas_call(
                    kernel_ck,
                    grid_spec=grid_spec_ck,
                    out_shape=out_shape_ck,
                    input_output_aliases={n_in - 2: 0, n_in - 1: 1},
                    interpret=interpret,
                )(*base, acc_d, acc_i)
            # drop the trash block's rows before the slot scatter
            out_precomputed = (acc_d[: n_qblocks * qc],
                               acc_i[: n_qblocks * qc])
    if out_precomputed is None and wl_pad == 0:
        def data_block_index(j, c, s, r=0):
            return (_block_of(c, r, s, j), 0)

        in_specs = [
            pl.BlockSpec((qc, d), lambda j, c, s: (j, 0)),
            pl.BlockSpec((mc, d_stored), data_block_index),
        ]
        inputs = [scalars, qvecs, data]
        if pair:
            in_specs.append(pl.BlockSpec(
                (mc, d_stored), partial(data_block_index, r=1)))
            inputs.append(data)
        if quantized:
            in_specs.append(pl.BlockSpec((mc // 128, 128), data_block_index))
            inputs.append(sc_blocks)
            if pair:
                in_specs.append(pl.BlockSpec(
                    (mc // 128, 128), partial(data_block_index, r=1)))
                inputs.append(sc_blocks)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_qblocks, steps_max),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((qc, K_LANE), lambda j, c, s: (j, 0)),
                pl.BlockSpec((qc, K_LANE), lambda j, c, s: (j, 0)),
            ],
            scratch_shapes=scratch,
        )
        kernel = partial(_kernel, k=k, qc=qc, mc=mc, quantized=quantized,
                         int8q=int8q, sub=extract_sub, mode=extract_mode,
                         packed=store.packed, pool=pool, pair=pair)
    if out_precomputed is not None:
        out_d, out_i = out_precomputed
    else:
        out_d, out_i = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*inputs)

    # ---- per-slot top-k_out (scratch is unordered; with the pool, lanes
    # beyond k hold the best-effort extras), scatter back, merge ranks ----
    neg_top, arg_top = jax.lax.top_k(-out_d, ko)
    row_d = -neg_top
    row_i = jnp.take_along_axis(out_i, arg_top, axis=1)
    if int8q:
        # re-apply the per-query scale the kernel factored out:
        # raw = 1 - int_dot*(rowscale/127); true = 1 - int_dot*(rowscale/127)
        # * (qscale/127). Monotone per query, so the top-k picked above is
        # already the right SET in the right order.
        row_d = jnp.where(
            row_i >= 0,
            1.0 - (1.0 - row_d) * q_scaled127[:, None],
            SENTINEL_DIST,
        )

    slot_d = jnp.full((n_slots + 1, ko), SENTINEL_DIST, jnp.float32)
    slot_i = jnp.full((n_slots + 1, ko), -1, jnp.int32)
    slot_d = slot_d.at[slot_order_aligned].set(row_d)
    slot_i = slot_i.at[slot_order_aligned].set(row_i)
    slot_d = slot_d[:n_slots].reshape(q, p * ko)
    slot_i = slot_i[:n_slots].reshape(q, p * ko)

    neg_top, arg_top = jax.lax.top_k(-slot_d, ko)
    final_d = -neg_top
    final_rows = jnp.take_along_axis(slot_i, arg_top, axis=1)
    # store rows -> original dataset ids (one small gather)
    final_i = jnp.where(
        final_rows >= 0,
        jnp.take(store.ids_sorted, jnp.maximum(final_rows, 0)),
        -1,
    )
    if wl_total is not None:
        return final_d, final_i, slot_counts.max(), wl_total
    return final_d, final_i, slot_counts.max()
