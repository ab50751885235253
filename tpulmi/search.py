"""Fully batched probe search: routing → bucket-grouped exact rerank → merge.

This replaces the reference's entire multi-bucket search path — the probe
loop over bucket ranks (`search/li/LearnedIndex.py:70-97`), the per-bucket
pandas groupby + BLAS GEMM inner loop (`search_single`,
`search/li/LearnedIndex.py:143-193`), and the hstack + stable-argsort merge
(`:88-97`) — with one jitted program:

1. Every (query, probe-rank) pair is a *slot*. Slots are sorted by their
   probed bucket id (`argsort`, stable), which inverts the loop exactly the
   way the reference's groupby does: each bucket's candidate rows are read
   once and scored against *all* slots probing it, whatever their rank.
2. A sequential `lax.map` over buckets slices the bucket's contiguous row
   range from the store in fixed-size chunks (`dynamic_slice`), computes
   cosine distances on the MXU, and keeps a running per-slot `lax.top_k`.
   Chunks past a bucket's end are skipped with `lax.cond` — no FLOPs are
   paid for bucket-size raggedness beyond one chunk of granularity.
3. Per-slot results scatter back to (query, rank) positions and a final
   `lax.top_k` over rank-major concatenated candidates reproduces the
   reference's stable merge semantics (earlier probes win distance ties).

The reference's threshold pruning (`pairwise_cosine_threshold`,
`search/li/utils.py:14-43`) exists to skip BLAS work on the CPU via dynamic
compaction; it cannot change results (candidates at distance ≥ the running
k-th best lose the merge regardless). On TPU dynamic shapes would defeat XLA,
so pruning is intentionally absent; the chunk-skip in step 2 plays the
equivalent FLOP-saving role for ragged buckets.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from tpulmi.buckets import BucketStore
from tpulmi.ops.distance import SENTINEL_DIST


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def size_class(x: int, minimum: int = 128) -> int:
    """Round up to the next power of two (≥ minimum) so that data-dependent
    padding produces only a handful of distinct compiled shapes."""
    c = minimum
    while c < x:
        c *= 2
    return c


def _probe_search_core(
    probe_buckets: jnp.ndarray,   # (Q, P) int32 bucket id per probe rank
    queries_search: jnp.ndarray,  # (Q, d) normalized search-space queries
    store: BucketStore,
    thresholds,                   # (Q,) f32 running kth-best per query, or
    #                               None → no pruning (scan everything)
    *,
    k: int,
    qpb_pad: int,       # static pad for max slots per bucket
    data_chunk: int,    # rows per inner chunk
    max_chunks: int,    # static ceil(max_bucket_size / data_chunk)
    query_chunk: int = 512,
    compute_dtype=None,  # e.g. jnp.bfloat16; accumulation is always f32
    prune_eps: float = 0.0,
):
    """Shared probe pipeline. With `thresholds` (and bucket bounds on the
    store) a whole (query-chunk × bucket) scan is skipped by `lax.cond`
    when the spherical-cap lower bound proves EVERY slot's candidates lie
    beyond that slot's running kth-best — the TPU-native analog of the
    reference's threshold prune (`search/li/utils.py:14-43`), saving real
    FLOPs/bandwidth with static shapes (no dynamic compaction). `prune_eps`
    is subtracted from the bound to absorb compute-dtype rounding, so
    pruned results are bit-identical to the unpruned pipeline.

    Returns (dists, ids, max_slots, scanned_rows, nominal_rows) where
    scanned_rows counts store rows actually streamed (chunk-granular) and
    nominal_rows counts the rows an unpruned scan would have streamed."""
    prune = thresholds is not None
    if prune and not store.has_bounds:
        raise ValueError("threshold pruning needs compute_bucket_bounds")
    q, p = probe_buckets.shape
    n_slots = q * p
    n_cat = store.n_categories
    d = store.dim
    mc = data_chunk
    qc = min(query_chunk, qpb_pad)
    n_qchunks = qpb_pad // qc

    quantized = store.is_quantized
    data = store.data_sorted
    queries = queries_search
    if compute_dtype is not None:
        if not quantized:
            data = data.astype(compute_dtype)
        queries = queries.astype(compute_dtype)
    # int8/int4 stores: codes stay packed in HBM (half / quarter the
    # bandwidth of bf16); each chunk is dequantized (int4: nibble-unpacked)
    # in registers and the per-row scale applied to the similarity columns:
    # sims = (q · codes_j) * s_j / q_levels
    scaled127 = ((store.scales / store.q_levels).astype(jnp.float32)
                 if quantized else None)
    d_stored = int(store.data_sorted.shape[1])  # dim/2 for packed int4

    # --- group slots by bucket ------------------------------------------------
    slots = probe_buckets.reshape(n_slots)
    order = jnp.argsort(slots, stable=True).astype(jnp.int32)
    slot_counts = jax.ops.segment_sum(
        jnp.ones((n_slots,), jnp.int32), slots, num_segments=n_cat
    )
    slot_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(slot_counts).astype(jnp.int32)]
    )
    # sorted slot ids, padded so fixed-size slices never run off the end;
    # padding points at a dump slot (= n_slots).
    order_pad = jnp.pad(order, (0, qpb_pad), constant_values=n_slots)

    if prune:
        bounds_c = store.bucket_centroids.astype(jnp.float32)
        bounds_cr = store.bucket_cos_r.astype(jnp.float32)
        bounds_mn = store.bucket_max_norm.astype(jnp.float32)
        thresholds = thresholds.astype(jnp.float32)

    def per_bucket(c):
        qstart = slot_offsets[c]
        qcnt = slot_counts[c]
        dstart = store.offsets[c]
        dcnt = store.counts[c]
        # chunk-granular rows this bucket streams if scanned
        rows_if_scanned = ((dcnt + mc - 1) // mc) * mc

        def per_query_chunk(_, qj):
            # slots [qstart + qj*qc, +qc) of this bucket, masked past qcnt
            s0 = qstart + qj * qc
            slot_idx = jax.lax.dynamic_slice(order_pad, (s0,), (qc,))
            valid_q = (qj * qc + jnp.arange(qc, dtype=jnp.int32)) < qcnt
            slot_idx = jnp.where(valid_q, slot_idx, n_slots)
            q_idx = jnp.minimum(slot_idx // p, q - 1)

            init = (
                jnp.full((qc, k), SENTINEL_DIST, jnp.float32),
                jnp.full((qc, k), -1, jnp.int32),
            )

            def inactive(qvecs):
                return init

            def active(qvecs):
                if qvecs is None:
                    qvecs = jnp.take(queries, q_idx, axis=0)  # (qc, d)

                def chunk_step(carry, j):
                    def compute(carry):
                        best_d, best_i = carry
                        # clamp the slice start so a tail bucket of a store
                        # with little/no pad slack never lets dynamic_slice
                        # shift the block silently; the two-sided mask below
                        # then drops any rows pulled in from before dstart
                        start = jnp.minimum(
                            dstart + j * mc,
                            jnp.int32(max(data.shape[0] - mc, 0)),
                        )
                        block = jax.lax.dynamic_slice(
                            data, (start, 0), (mc, d_stored))
                        block_ids = jax.lax.dynamic_slice(
                            store.ids_sorted, (start,), (mc,)
                        )
                        if quantized:
                            if store.packed:
                                from tpulmi.ops.quantize import unpack_int4

                                block = unpack_int4(block)
                            block = block.astype(qvecs.dtype)
                        sims = jax.lax.dot_general(
                            qvecs, block,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        if quantized:
                            s_blk = jax.lax.dynamic_slice(
                                scaled127, (start,), (mc,)
                            )
                            sims = sims * s_blk[None, :]
                        dists = 1.0 - sims  # (qc, mc) f32
                        row = start + jax.lax.broadcasted_iota(jnp.int32, (1, mc), 1)
                        # lower bound is the chunk's NOMINAL start, not the
                        # bucket start: a clamped tail slice re-covers rows
                        # of earlier chunks, and a bucket-level bound would
                        # let those duplicates into the running top-k
                        in_chunk = jnp.logical_and(
                            row >= dstart + j * mc, row < (dstart + dcnt)
                        )
                        dists = jnp.where(in_chunk, dists, SENTINEL_DIST)
                        cat_d = jnp.concatenate([best_d, dists], axis=1)
                        cat_i = jnp.concatenate(
                            [best_i,
                             jnp.broadcast_to(block_ids[None, :], (qc, mc))],
                            axis=1,
                        )
                        neg_top, arg_top = jax.lax.top_k(-cat_d, k)
                        return -neg_top, jnp.take_along_axis(cat_i, arg_top, axis=1)

                    needed = j * mc < dcnt
                    carry = jax.lax.cond(needed, compute, lambda cr: cr, carry)
                    return carry, None

                (best_d, best_i), _ = jax.lax.scan(
                    chunk_step, init, jnp.arange(max_chunks)
                )
                return (best_d, best_i)

            occupied = qj * qc < qcnt
            if prune:
                # nested conds: empty query chunks skip even the bound
                # computation; occupied ones compute the spherical-cap
                # lower bound per slot and skip the whole (query-chunk ×
                # bucket) scan when no slot's bound can beat its running
                # kth-best
                def when_occupied(_):
                    qvecs = jnp.take(queries, q_idx, axis=0)
                    cq = jnp.clip(
                        qvecs.astype(jnp.float32) @ bounds_c[c], -1.0, 1.0)
                    cr = bounds_cr[c]
                    cos_delta = jnp.where(
                        cq >= cr, 1.0,
                        cq * cr
                        + jnp.sqrt(jnp.maximum(1.0 - cq * cq, 0.0))
                        * jnp.sqrt(jnp.maximum(1.0 - cr * cr, 0.0)),
                    )
                    bound = (1.0
                             - bounds_mn[c] * jnp.maximum(cos_delta, 0.0))
                    thr = jnp.take(thresholds, q_idx)
                    needed = valid_q & ((bound - prune_eps) <= thr)
                    ran = jnp.any(needed)
                    return jax.lax.cond(ran, active, inactive, qvecs), ran

                out, run = jax.lax.cond(
                    occupied, when_occupied,
                    lambda _: (init, jnp.bool_(False)), None)
            else:
                run = occupied
                out = jax.lax.cond(run, active, inactive, None)
            rows_scanned = jnp.where(run, rows_if_scanned, 0)
            rows_nominal = jnp.where(occupied, rows_if_scanned, 0)
            return None, (out, slot_idx, rows_scanned, rows_nominal)

        _, ((best_d, best_i), slot_idx, rows_scanned, rows_nominal) = (
            jax.lax.scan(per_query_chunk, None, jnp.arange(n_qchunks))
        )
        # (n_qchunks, qc, ...) -> (qpb_pad, ...)
        return (
            best_d.reshape(qpb_pad, k),
            best_i.reshape(qpb_pad, k),
            slot_idx.reshape(qpb_pad),
            rows_scanned.sum(),
            rows_nominal.sum(),
        )

    bucket_d, bucket_i, bucket_slots, bucket_rows, bucket_nominal = (
        jax.lax.map(per_bucket, jnp.arange(n_cat)))
    # bucket_d/i: (n_cat, qpb_pad, k); bucket_slots: (n_cat, qpb_pad)

    # --- scatter per-slot results back to (query, rank) ----------------------
    flat_slots = bucket_slots.reshape(-1)
    slot_d = jnp.full((n_slots + 1, k), SENTINEL_DIST, jnp.float32)
    slot_i = jnp.full((n_slots + 1, k), -1, jnp.int32)
    slot_d = slot_d.at[flat_slots].set(bucket_d.reshape(-1, k))
    slot_i = slot_i.at[flat_slots].set(bucket_i.reshape(-1, k))
    slot_d = slot_d[:n_slots].reshape(q, p * k)  # rank-major: earlier ranks first
    slot_i = slot_i[:n_slots].reshape(q, p * k)

    # --- final merge (stable: ties go to the earlier probe rank, like the
    # reference's argsort(kind='stable') merge) -------------------------------
    neg_top, arg_top = jax.lax.top_k(-slot_d, k)
    final_d = -neg_top
    final_i = jnp.take_along_axis(slot_i, arg_top, axis=1)
    # max slots routed to any bucket this batch — lets callers validate a
    # reused qpb_pad without an extra round trip (overflow → re-pad & rerun)
    return (final_d, final_i, slot_counts.max(), bucket_rows.sum(),
            bucket_nominal.sum())


@partial(
    jax.jit,
    static_argnames=("k", "qpb_pad", "data_chunk", "max_chunks",
                     "query_chunk", "compute_dtype"),
)
def _probe_search_impl(
    probe_buckets: jnp.ndarray,
    queries_search: jnp.ndarray,
    store: BucketStore,
    *,
    k: int,
    qpb_pad: int,
    data_chunk: int,
    max_chunks: int,
    query_chunk: int = 512,
    compute_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Unpruned probe pipeline (scan every routed bucket); see
    `_probe_search_core`. Returns (dists, ids, max_slots)."""
    d, i, mx, _, _ = _probe_search_core(
        probe_buckets, queries_search, store, None,
        k=k, qpb_pad=qpb_pad, data_chunk=data_chunk, max_chunks=max_chunks,
        query_chunk=query_chunk, compute_dtype=compute_dtype,
    )
    return d, i, mx


@partial(
    jax.jit,
    static_argnames=("k", "qpb_pad", "data_chunk", "max_chunks",
                     "query_chunk", "compute_dtype", "prune_eps"),
)
def _probe_search_pruned(
    probe_buckets: jnp.ndarray,
    queries_search: jnp.ndarray,
    store: BucketStore,
    thresholds: jnp.ndarray,
    *,
    k: int,
    qpb_pad: int,
    data_chunk: int,
    max_chunks: int,
    query_chunk: int = 512,
    compute_dtype=None,
    prune_eps: float = 0.0,
):
    """Threshold-pruned probe pipeline; see `_probe_search_core`. Returns
    (dists, ids, max_slots, scanned_rows, nominal_rows)."""
    return _probe_search_core(
        probe_buckets, queries_search, store, thresholds,
        k=k, qpb_pad=qpb_pad, data_chunk=data_chunk, max_chunks=max_chunks,
        query_chunk=query_chunk, compute_dtype=compute_dtype,
        prune_eps=prune_eps,
    )


def route_probes(logits, n_buckets: int, *, probe_mass=None, dump_id=None,
                 mass_logits=None):
    """Rank buckets by routed score and (optionally) truncate each query's
    probe list at the ``probe_mass`` crossing: every rank up to and
    including the one where cumulative routed mass first reaches the budget
    is kept; later slots are replaced by ``dump_id``.

    ``mass_logits``: log-probabilities to DRAW THE MASS FROM when they
    differ from the ranking score. A calibrated joint router ranks by
    ``w·logP(g|q) + logP(b|q,g)`` whose softmax is NOT a probability (its
    mass concentrates artificially — measured at 20M: truncation cut to ~3
    probes and recall 0.94→0.52); the true joint ``logP(g)+logP(b|g)`` IS
    one, so rank by the calibrated score and accumulate the true mass of
    the ranked buckets. With ``mass_logits=None`` the ranking softmax is
    the mass (the flat router's probability).

    ``dump_id`` must fall outside every live bucket range the *caller's*
    scan will see — the single-chip pipeline uses ``store.n_categories``
    (segment ops drop out-of-range ids), while the sharded program uses
    ``-1``: a global id that some shard legitimately owns (such as the
    global bucket count, which lands INSIDE a ragged last shard's padded
    local range) would turn every truncated slot into a live local slot and
    inflate that shard's slot counts. One helper, one semantics — the probe
    selection of `make_search_program` and `make_sharded_search_program`
    must never diverge.

    Returns (Q, n_buckets) int32 probe ids."""
    if probe_mass is None:
        _, probes = jax.lax.top_k(logits, n_buckets)
    else:
        _, probes = jax.lax.top_k(logits, n_buckets)
        probs = jax.nn.softmax(
            logits if mass_logits is None else mass_logits, axis=-1)
        p_top = jnp.take_along_axis(probs, probes, axis=1)
        cum = jnp.cumsum(p_top, axis=1)
        # keep every rank up to and including the mass crossing
        keep = (cum - p_top) < probe_mass
        probes = jnp.where(keep, probes, dump_id)
    return probes.astype(jnp.int32)


def routing_logits(model, params, queries_nav, *, need_mass: bool):
    """Apply the routing model; when truncating (`probe_mass`) on a model
    carrying a fitted ``mass_temp`` (`JointRouter`), also return the
    temperature-flattened logits as the mass source for `route_probes`.
    Ranking is untouched; only the truncation mass is softmax(rank/temp).
    Both the raw joint and the calibrated score produce OVERCONFIDENT
    softmaxes at scale (measured 20M: truncating on either cut to ~1-3
    probes, recall 0.91 -> 0.50); `calibrate_outer_weight` fits the
    smallest temp whose cumulative mass before the true bucket's rank
    delivers the containment the mass promises. Returns
    (ranking_logits, mass_logits_or_None)."""
    logits = model.apply({"params": params}, queries_nav)
    if need_mass:
        mt = float(getattr(model, "mass_temp", 1.0))
        if mt != 1.0:
            return logits, logits / mt
    return logits, None


def make_search_program(
    model,
    *,
    k: int,
    n_buckets: int,
    qpb_pad: int,
    data_chunk: int,
    max_chunks: int,
    query_chunk: int = 512,
    compute_dtype=None,
    backend: str = "xla",
    pallas_qc: int = 256,
    pallas_mc: int = 512,
    pallas_max_chunks: int = 1,
    pallas_int8_queries: bool = False,
    pallas_extract: str = "scalar",
    pallas_wl_pad: int = 0,
    pallas_pool_k: int = 0,
    pallas_pair: bool = False,
    prune_after: int = 0,
    prune_eps: float = 0.0,
    probe_mass=None,
    fetch_dtype=None,
):
    """One jitted end-to-end search program: MLP routing (top-k of logits —
    softmax is monotone so it is skipped, unlike the reference which
    materializes the full softmax ranking, `search/li/model.py:226-227`),
    query normalization, and the batched probe pipeline. A single dispatch
    per search call; returns (dists, ids, max_slots) where max_slots lets the
    caller validate the static qpb_pad without an extra round trip.

    ``prune_after=t0 > 0`` (XLA backend, store with bucket bounds) runs the
    two-phase threshold prune: probe ranks [0, t0) scan normally, the
    per-query kth-best distance becomes the running threshold, and ranks
    [t0, P) skip every (query-chunk × bucket) scan the spherical-cap bound
    proves fruitless — the reference's probe-0 threshold semantics
    (`search/li/LearnedIndex.py:71-74,149-163`) with static shapes. The
    program then returns (dists, ids, max_slots, scanned_rows, nominal)
    with identical (dists, ids) to the unpruned pipeline.

    ``probe_mass`` truncates each query's probe list at the
    routed-probability crossing (`SearchConfig.probe_mass`): dropped slots
    point at an out-of-range dump bucket and never reach the scan — on the
    XLA pipeline they are segment-dropped; on the Pallas kernel they land
    in alignment-padding query blocks whose live-slot count is ≤0, which
    `pl.when` skips. The XLA pipeline additionally returns the 5-tuple
    with scan counters when pruning or truncating.

    ``pallas_wl_pad > 0`` (Pallas backend) runs the kernel on the flat
    worklist grid — one grid step per live (query-block, chunk) pair
    instead of the dense (blocks × max_chunks) grid whose empty steps
    bucket-size skew pays for. The program then returns a 4th element,
    the true worklist total; callers must re-run with a larger pad if it
    exceeds ``pallas_wl_pad`` (trailing work is dropped on overflow).

    ``fetch_dtype`` casts the final (Q, k) distances to a narrower dtype
    as the program's last op — ids and ranking are computed in f32 and are
    bit-identical; only the REPORTED distance values round (f16: ~5e-4
    relative). On a host-link-bound serving path (this environment's relay
    moves ~8-25 MB/s) the distance leaf is half of every fetched batch, so
    halving it is a direct cut to per-batch fetch latency."""
    from tpulmi.ops.distance import l2_normalize

    t0 = min(prune_after, n_buckets - 1) if prune_after > 0 else 0
    pruning = backend == "xla" and t0 > 0
    truncating = probe_mass is not None

    def _cast_dists(res):
        # narrow only the distance leaf (element 0) for the fetch; every
        # other leaf (ids, counters) keeps its exact dtype
        if fetch_dtype is None:
            return res
        return (res[0].astype(jnp.dtype(fetch_dtype)),) + tuple(res[1:])

    @jax.jit
    def search_program(params, queries_nav, queries_search, store):
        logits, mass_logits = routing_logits(
            model, params, queries_nav, need_mass=truncating)
        probes = route_probes(logits, n_buckets, probe_mass=probe_mass,
                              dump_id=store.n_categories,
                              mass_logits=mass_logits)
        qs = l2_normalize(queries_search.astype(jnp.float32))
        if backend == "pallas":
            from tpulmi.ops.pallas_topk import pallas_probe_search

            return _cast_dists(pallas_probe_search(
                probes,
                qs,
                store,
                # pallas_pool_k > 0: the kernel maintains an exact
                # pallas_pool_k-wide buffer and fills rows [pool_k, k)
                # from its residue-class pool — best-effort rerank
                # candidates at a fraction of the extraction cost of
                # tracking the full rerank depth exactly
                k=pallas_pool_k or k,
                k_out=k if pallas_pool_k else 0,
                qc=pallas_qc,
                mc=pallas_mc,
                max_chunks=pallas_max_chunks,
                compute_dtype=compute_dtype or jnp.float32,
                int8_queries=pallas_int8_queries,
                extract_mode=pallas_extract,
                wl_pad=pallas_wl_pad,
                pair=pallas_pair,
                # trace-time constant: Mosaic has no CPU target, so the
                # explicit pallas backend falls back to interpret mode
                # there (tests; "auto" never picks pallas on CPU)
                interpret=jax.default_backend() == "cpu",
            ))
        if pruning:
            d1, i1, m1, rows1, nom1 = _probe_search_core(
                probes[:, :t0], qs, store, None,
                k=k, qpb_pad=qpb_pad, data_chunk=data_chunk,
                max_chunks=max_chunks, query_chunk=query_chunk,
                compute_dtype=compute_dtype,
            )
            tau = d1[:, k - 1]  # running kth-best after the first t0 ranks
            d2, i2, m2, rows2, nom2 = _probe_search_core(
                probes[:, t0:], qs, store, tau,
                k=k, qpb_pad=qpb_pad, data_chunk=data_chunk,
                max_chunks=max_chunks, query_chunk=query_chunk,
                compute_dtype=compute_dtype, prune_eps=prune_eps,
            )
            # rank-major merge: phase-1 candidates precede phase-2, so
            # distance ties resolve to the earlier probe rank exactly like
            # the single-phase pipeline (and the reference's stable merge)
            cat_d = jnp.concatenate([d1, d2], axis=1)
            cat_i = jnp.concatenate([i1, i2], axis=1)
            neg_top, arg_top = jax.lax.top_k(-cat_d, k)
            return _cast_dists(
                (-neg_top, jnp.take_along_axis(cat_i, arg_top, axis=1),
                 jnp.maximum(m1, m2), rows1 + rows2, nom1 + nom2))
        if truncating:
            # report scan counters so callers can measure the truncation
            return _cast_dists(_probe_search_core(
                probes, qs, store, None,
                k=k, qpb_pad=qpb_pad, data_chunk=data_chunk,
                max_chunks=max_chunks, query_chunk=query_chunk,
                compute_dtype=compute_dtype,
            ))
        return _cast_dists(_probe_search_impl(
            probes,
            qs,
            store,
            k=k,
            qpb_pad=qpb_pad,
            data_chunk=data_chunk,
            max_chunks=max_chunks,
            query_chunk=query_chunk,
            compute_dtype=compute_dtype,
        ))

    return search_program


def probe_search(
    probe_buckets,
    queries_search,
    store: BucketStore,
    k: int = 10,
    data_chunk: int = 2048,
    qpb_pad: int = None,
    query_chunk: int = 512,
    compute_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Search the probed buckets for each query's k nearest neighbors.

    Returns (dists, ids): (Q, k) float32 cosine distances ascending and
    (Q, k) int32 **0-based** original row ids (-1 where fewer than k real
    candidates exist in the probed buckets).

    One host sync happens per call (not per query): the maximum
    slots-per-bucket and max bucket size are read to choose static padding
    classes, so the jitted pipeline compiles only once per size class.
    """
    probe_buckets = jnp.asarray(probe_buckets, jnp.int32)
    queries_search = jnp.asarray(queries_search)

    slots = probe_buckets.reshape(-1)
    slot_counts = jax.ops.segment_sum(
        jnp.ones_like(slots), slots, num_segments=store.n_categories
    )
    max_slots = int(jax.device_get(slot_counts.max()))
    max_bucket = int(jax.device_get(store.counts.max()))

    # chunk may not exceed the store itself (dynamic_slice size bound); the
    # clamped-start + two-sided mask in the pipeline handles tail buckets
    # regardless of pad_rows slack
    data_chunk = min(data_chunk, size_class(max(max_bucket, 1)),
                     int(store.data_sorted.shape[0]))
    if qpb_pad is None:
        qpb_pad = size_class(max(max_slots, 1))
    query_chunk = min(query_chunk, qpb_pad)
    qpb_pad = -(-qpb_pad // query_chunk) * query_chunk
    max_chunks = max(-(-max_bucket // data_chunk), 1)

    dists, ids, _ = _probe_search_impl(
        probe_buckets,
        queries_search,
        store,
        k=k,
        qpb_pad=qpb_pad,
        data_chunk=data_chunk,
        max_chunks=max_chunks,
        query_chunk=query_chunk,
        compute_dtype=compute_dtype,
    )
    return dists, ids
