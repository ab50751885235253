"""Multi-chip execution: bucket-sharded search and data-parallel training.

The reference's only parallelism is a PBS hyperparameter sweep
(`search/run-multiple.sh:11-34`); there is no distributed search or training
(SURVEY.md §2.3). Here:

**Bucket-sharded search** (the expert-parallel analog — the MLP is the
router, buckets are the experts): the bucket store is partitioned into
contiguous bucket ranges, one per mesh slice along the ``"buckets"`` axis.
Queries and probe assignments are replicated. Under ``shard_map`` each chip
remaps global probe bucket ids into its local range (non-local probes fall
out of range and are dropped by the pipeline's segment ops), runs the same
single-chip probe pipeline on its shard, and contributes a partial top-k;
an ``all_gather`` over the axis followed by one more ``lax.top_k`` merges
per-chip candidates into the global answer. All collectives ride ICI.

**Data-parallel training**: one jitted Adam step with the batch sharded
along ``"data"`` and parameters replicated; XLA inserts the gradient psum.
"""

from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpulmi.buckets import BucketStore
from tpulmi.search import (_probe_search_impl, route_probes,
                           routing_logits, size_class)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ShardedBucketStore:
    """Bucket store partitioned over contiguous bucket ranges; the leading
    axis of every array is the shard axis (length n_shards)."""

    data_sorted: jnp.ndarray    # (S, rows_pad, d)
    ids_sorted: jnp.ndarray     # (S, rows_pad) int32 global ids; -1 padding
    offsets: jnp.ndarray        # (S, cat_pad + 1) int32 local CSR
    counts: jnp.ndarray         # (S, cat_pad) int32
    bucket_start: jnp.ndarray   # (S, 1) int32 first global bucket id of shard
    n_shards: int = field(metadata=dict(static=True), default=1)
    cat_pad: int = field(metadata=dict(static=True), default=0)
    rows: int = field(metadata=dict(static=True), default=0)
    pad_rows: int = field(metadata=dict(static=True), default=0)
    row_align: int = field(metadata=dict(static=True), default=1)
    scales: Optional[jnp.ndarray] = None   # (S, rows_pad) f32 for int8 shards
    # quantized code width per BucketStore.quant_bits (8=int8, 4=packed int4
    # where data_sorted holds (S, rows_pad, d/2) nibble-packed bytes)
    quant_bits: int = field(metadata=dict(static=True), default=8)


def shard_store(store: BucketStore, n_shards: int) -> ShardedBucketStore:
    """Partition a built store into `n_shards` contiguous bucket ranges.

    Contiguous ranges keep the remap trivial (local = global − start); the
    per-shard row counts are padded to the max so the stacked array is
    rectangular. Bucket-size skew across shards costs only HBM padding, not
    FLOPs (empty tail buckets have count 0 and are skipped).
    """
    n_cat = store.n_categories
    cat_pad = -(-n_cat // n_shards)  # buckets per shard (last may be short)

    offsets = np.asarray(jax.device_get(store.offsets))
    counts = np.asarray(jax.device_get(store.counts))
    data_sorted = store.data_sorted
    ids_sorted = store.ids_sorted
    d = int(data_sorted.shape[1])  # STORED width (dim/2 for packed int4)

    shard_rows = []
    for s in range(n_shards):
        lo = min(s * cat_pad, n_cat)
        hi = min((s + 1) * cat_pad, n_cat)
        shard_rows.append(int(offsets[hi] - offsets[lo]))
    rows = max(max(shard_rows), 1)
    pad_rows = store.pad_rows
    rows_pad = rows + pad_rows

    data_shards = np.zeros((n_shards, rows_pad, d), dtype=np.asarray(
        jax.device_get(data_sorted[:1])).dtype)
    ids_shards = np.full((n_shards, rows_pad), -1, dtype=np.int32)
    off_shards = np.zeros((n_shards, cat_pad + 1), dtype=np.int32)
    cnt_shards = np.zeros((n_shards, cat_pad), dtype=np.int32)
    starts = np.zeros((n_shards, 1), dtype=np.int32)

    data_host = np.asarray(jax.device_get(data_sorted))
    ids_host = np.asarray(jax.device_get(ids_sorted))
    scales_host = (np.asarray(jax.device_get(store.scales))
                   if store.is_quantized else None)
    scales_shards = (np.zeros((n_shards, rows_pad), np.float32)
                     if store.is_quantized else None)

    for s in range(n_shards):
        lo = min(s * cat_pad, n_cat)
        hi = min((s + 1) * cat_pad, n_cat)
        row_lo, row_hi = int(offsets[lo]), int(offsets[hi])
        nrows = row_hi - row_lo
        data_shards[s, :nrows] = data_host[row_lo:row_hi]
        ids_shards[s, :nrows] = ids_host[row_lo:row_hi]
        if scales_shards is not None:
            scales_shards[s, :nrows] = scales_host[row_lo:row_hi]
        cnt_shards[s, : hi - lo] = counts[lo:hi]
        # local offsets = the source's (possibly row_align-padded) offsets
        # rebased to the shard start — NOT cumsum(counts), which would lose
        # the alignment gaps of row_align>1 stores
        off_shards[s, : hi - lo + 1] = offsets[lo: hi + 1] - offsets[lo]
        off_shards[s, hi - lo + 1:] = off_shards[s, hi - lo]
        starts[s, 0] = lo

    return ShardedBucketStore(
        data_sorted=jnp.asarray(data_shards),
        ids_sorted=jnp.asarray(ids_shards),
        offsets=jnp.asarray(off_shards),
        counts=jnp.asarray(cnt_shards),
        bucket_start=jnp.asarray(starts),
        n_shards=n_shards,
        cat_pad=cat_pad,
        rows=rows,
        pad_rows=pad_rows,
        row_align=store.row_align,
        scales=(jnp.asarray(scales_shards) if scales_shards is not None
                else None),
        quant_bits=store.quant_bits,
    )


def _alloc_on_device(shape, dtype, device):
    """Allocate a zero buffer directly ON `device` — no host staging of a
    near-HBM array (jnp.zeros + device_put would build it host-side first)."""
    from jax.sharding import SingleDeviceSharding

    return jax.jit(
        lambda: jnp.zeros(shape, dtype),
        out_shardings=SingleDeviceSharding(device),
    )()


def shard_store_from_host(arrays, mesh: Mesh,
                          slab_rows: int = 262_144) -> ShardedBucketStore:
    """Build a bucket-sharded store straight from HOST layout arrays
    (`tpulmi.hoststore.HostStoreArrays`), uploading each shard's rows
    slab-by-slab to its own device. The flat store is **never resident on
    any single device** — the requirement for corpora whose store exceeds
    one chip's HBM (the 100M/v5e-8 configuration, BASELINE.md;
    SURVEY.md §7 stage 9). Contrast `shard_store`, which starts from a
    one-device store and round-trips all of it through the host.

    Shard s owns the contiguous global bucket range
    [s*cat_pad, (s+1)*cat_pad); its rows are the host arrays'
    [offsets[lo], offsets[hi]) range — a zero-copy view, so host RAM holds
    only the flat layout plus one slab in flight. Each per-device buffer is
    written with the donated `dynamic_update_slice` loop of
    `tpulmi.hoststore` (bounded host staging, true barrier per slab), then
    the global (S, rows_pad, d) array is assembled with
    `jax.make_array_from_single_device_arrays` over the mesh axis.
    """
    axis = mesh.axis_names[0]
    devices = list(mesh.devices.flat)
    n_shards = len(devices)
    offsets = np.asarray(arrays.offsets)
    counts = np.asarray(arrays.counts)
    n_cat = int(counts.shape[0])
    cat_pad = -(-n_cat // n_shards)
    d = int(arrays.data_sorted.shape[1])
    pad_rows = int(arrays.pad_rows)

    bounds = []
    for s in range(n_shards):
        lo = min(s * cat_pad, n_cat)
        hi = min((s + 1) * cat_pad, n_cat)
        bounds.append((lo, hi, int(offsets[lo]), int(offsets[hi])))
    rows = max(max(b[3] - b[2] for b in bounds), 1)
    rows_pad = rows + pad_rows
    sharding = NamedSharding(mesh, P(axis))
    dtype = jnp.asarray(arrays.data_sorted[:1]).dtype
    multihost = jax.process_count() > 1

    if multihost:
        # multi-host mesh: every process runs this with the SAME host
        # layout; each materializes only its own processes' shards via the
        # callback (non-addressable shards are never touched locally)
        def data_cb(index):
            s = index[0].start or 0
            _, _, row_lo, row_hi = bounds[s]
            buf = np.zeros((1, rows_pad, d), arrays.data_sorted.dtype)
            buf[0, : row_hi - row_lo] = arrays.data_sorted[row_lo:row_hi]
            return buf

        data_global = jax.make_array_from_callback(
            (n_shards, rows_pad, d), sharding, data_cb)
    else:
        from tpulmi.hoststore import _slab_write

        local_bufs = []
        for s, dev in enumerate(devices):
            _, _, row_lo, row_hi = bounds[s]
            buf = _alloc_on_device((1, rows_pad, d), dtype, dev)
            # shared donated slab loop (barrier per slab — NOTES.md 7/8);
            # the host row-slice is a view, so no host copy materializes
            local_bufs.append(_slab_write(
                buf, arrays.data_sorted[row_lo:row_hi], slab_rows,
                device=dev))
        data_global = jax.make_array_from_single_device_arrays(
            (n_shards, rows_pad, d), sharding, local_bufs)

    # small per-shard metadata: stacked on host, sharded by device_put
    ids_shards = np.full((n_shards, rows_pad), -1, dtype=np.int32)
    off_shards = np.zeros((n_shards, cat_pad + 1), dtype=np.int32)
    cnt_shards = np.zeros((n_shards, cat_pad), dtype=np.int32)
    starts = np.zeros((n_shards, 1), dtype=np.int32)
    quantized = arrays.scales is not None
    scales_shards = (np.zeros((n_shards, rows_pad), np.float32)
                     if quantized else None)
    for s, (lo, hi, row_lo, row_hi) in enumerate(bounds):
        nrows = row_hi - row_lo
        ids_shards[s, :nrows] = arrays.ids_sorted[row_lo:row_hi]
        if quantized:
            scales_shards[s, :nrows] = arrays.scales[row_lo:row_hi]
        cnt_shards[s, : hi - lo] = counts[lo:hi]
        # rebased (alignment-preserving) offsets, exactly like shard_store
        off_shards[s, : hi - lo + 1] = offsets[lo: hi + 1] - offsets[lo]
        off_shards[s, hi - lo + 1:] = off_shards[s, hi - lo]
        starts[s, 0] = lo

    def put_meta(host):
        if multihost:
            return jax.make_array_from_callback(
                host.shape, sharding, lambda idx: host[idx])
        return jax.device_put(host, sharding)

    return ShardedBucketStore(
        data_sorted=data_global,
        ids_sorted=put_meta(ids_shards),
        offsets=put_meta(off_shards),
        counts=put_meta(cnt_shards),
        bucket_start=put_meta(starts),
        n_shards=n_shards,
        cat_pad=cat_pad,
        rows=rows,
        pad_rows=pad_rows,
        row_align=arrays.row_align,
        scales=(put_meta(scales_shards) if quantized else None),
        quant_bits=arrays.quant_bits,
    )


# Compiled sharded-search programs keyed on (mesh, static padding classes).
# A fresh shard_map + jit closure per call would recompile every call
# (identical HLO, new Python identity); this cache is the multi-chip
# counterpart of LearnedIndex._search_programs.
_SHARDED_PROGRAMS = {}


def _get_sharded_program(mesh: Mesh, *, k: int, qpb_pad: int, data_chunk: int,
                         max_chunks: int, cat_pad: int, rows: int,
                         pad_rows: int):
    axis = mesh.axis_names[0]
    key = (mesh, axis, k, qpb_pad, data_chunk, max_chunks, cat_pad, rows,
           pad_rows)
    prog = _SHARDED_PROGRAMS.get(key)
    if prog is not None:
        return prog

    def local_search(probes, queries, data_s, ids_s, offs, cnts, start):
        # remap global bucket ids into this shard's local range; non-local
        # probes fall outside [0, cat_pad) and are dropped by the pipeline's
        # segment ops (out-of-range scatter indices drop; see tests).
        local = probes - start[0, 0]
        local = jnp.where((local >= 0) & (local < cat_pad), local, cat_pad)
        local_store = BucketStore(
            data_sorted=data_s[0],
            ids_sorted=ids_s[0],
            offsets=offs[0],
            counts=cnts[0],
            n=rows,
            pad_rows=pad_rows,
        )
        part_d, part_i, _ = _probe_search_impl(
            local,
            queries,
            local_store,
            k=k,
            qpb_pad=qpb_pad,
            data_chunk=data_chunk,
            max_chunks=max_chunks,
        )
        # (Q, k) partial per chip → gather all chips' candidates and merge.
        all_d = jax.lax.all_gather(part_d, axis)  # (S, Q, k)
        all_i = jax.lax.all_gather(part_i, axis)
        s, q, _ = all_d.shape
        cat_d = jnp.moveaxis(all_d, 0, 1).reshape(q, s * k)
        cat_i = jnp.moveaxis(all_i, 0, 1).reshape(q, s * k)
        neg_top, arg_top = jax.lax.top_k(-cat_d, k)
        return -neg_top, jnp.take_along_axis(cat_i, arg_top, axis=1)

    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=(
            P(),            # probes replicated
            P(),            # queries replicated
            P(axis),        # store shards
            P(axis),
            P(axis),
            P(axis),
            P(axis),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    prog = jax.jit(fn)
    _SHARDED_PROGRAMS[key] = prog
    return prog


def sharded_probe_search(
    probe_buckets,
    queries_search,
    sstore: ShardedBucketStore,
    mesh: Mesh,
    k: int = 10,
    data_chunk: int = 2048,
    qpb_pad: int = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bucket-sharded probe search over `mesh` (1-D, axis "buckets").

    Returns (dists, ids) like `tpulmi.search.probe_search` (0-based ids).
    Each chip searches only its bucket range; partial top-k candidates are
    all-gathered and re-merged. The final merge breaks distance ties by
    shard-then-rank order instead of pure probe-rank order — the k-set is
    identical, the tie order may differ from single-chip.
    """
    probe_buckets = jnp.asarray(probe_buckets, jnp.int32)
    queries_search = jnp.asarray(queries_search)

    # static padding classes (one host sync per call, like probe_search)
    n_cat_total = sstore.cat_pad * sstore.n_shards
    slots = probe_buckets.reshape(-1)
    slot_counts = jax.ops.segment_sum(
        jnp.ones_like(slots), slots, num_segments=n_cat_total
    )
    max_slots = int(jax.device_get(slot_counts.max()))
    max_bucket = int(jax.device_get(sstore.counts.max()))
    # chunk bounded by the per-shard store size (dynamic_slice size bound);
    # tail correctness comes from the pipeline's clamped-start + mask, so
    # pad_rows slack is not required (it may legitimately be 0)
    data_chunk = min(data_chunk, size_class(max(max_bucket, 1)),
                     int(sstore.data_sorted.shape[1]))
    if qpb_pad is None:
        qpb_pad = size_class(max(max_slots, 1))
    max_chunks = max(-(-max_bucket // data_chunk), 1)

    program = _get_sharded_program(
        mesh, k=k, qpb_pad=qpb_pad, data_chunk=data_chunk,
        max_chunks=max_chunks, cat_pad=sstore.cat_pad, rows=sstore.rows,
        pad_rows=sstore.pad_rows,
    )
    if jax.process_count() > 1:
        # multi-host: replicated inputs must be GLOBAL arrays (every
        # process holds the same host values — standard SPMD contract)
        rep = NamedSharding(mesh, P())
        pb_host = np.asarray(jax.device_get(probe_buckets))
        qs_host = np.asarray(jax.device_get(queries_search))
        probe_buckets = jax.make_array_from_callback(
            pb_host.shape, rep, lambda idx: pb_host[idx])
        queries_search = jax.make_array_from_callback(
            qs_host.shape, rep, lambda idx: qs_host[idx])
    return program(
        probe_buckets,
        queries_search,
        sstore.data_sorted,
        sstore.ids_sorted,
        sstore.offsets,
        sstore.counts,
        sstore.bucket_start,
    )


def make_sharded_search_program(
    model,
    mesh: Mesh,
    *,
    k: int,
    n_buckets: int,
    qpb_pad: int,
    data_chunk: int,
    max_chunks: int,
    cat_pad: int,
    rows: int,
    pad_rows: int,
    quantized: bool = False,
    compute_dtype=None,
    probe_mass=None,
    quant_bits: int = 8,
    backend: str = "xla",
    row_align: int = 1,
    pallas_qc: int = 256,
    pallas_mc: int = 512,
    pallas_max_chunks: int = 1,
    pallas_int8_queries: bool = False,
    pallas_extract: str = "scalar",
    pallas_pair: bool = False,
):
    """ONE jitted multi-chip search program: replicated MLP routing +
    bucket-sharded probe search + all-gather top-k merge. The multi-chip
    counterpart of tpulmi.search.make_search_program — same contract
    (returns (dists, ids, max_slots) so the caller can validate its static
    qpb_pad without an extra round trip). With `quantized` the per-shard
    int8 codes + scales are searched natively. ``probe_mass`` truncates
    each query's probes at the routed-mass crossing (`route_probes`); dump
    ids are -1, which falls outside every shard's local range — including a
    ragged last shard's — and is dropped by the same remap that drops
    non-local probes.

    ``backend="pallas"`` runs the fused Pallas probe kernel on each shard's
    local store (dense grid) instead of the XLA chunk pipeline — measured
    3.3x faster single-chip at 300K (NOTES.md), and the per-shard store
    inherits the flat store's ``row_align`` so the kernel's block-DMA
    alignment precondition holds per shard. Dumped/non-local probes remap
    to local id ``cat_pad`` == the local store's n_categories — exactly the
    single-chip kernel's dump-bucket semantics (discard row, sentinel
    output). The kernel's per-query-block bucket layout is computed per
    shard inside shard_map, so each chip sizes its own blocks from the
    probes it actually owns."""
    from tpulmi.ops.distance import l2_normalize

    axis = mesh.axis_names[0]
    interpret = jax.default_backend() == "cpu"  # Mosaic has no CPU target

    def local_search(params, queries_nav, queries_search,
                     data_s, ids_s, offs, cnts, start, *scales_s):
        logits, mass_logits = routing_logits(
            model, params, queries_nav, need_mass=probe_mass is not None)
        # dump_id=-1: stays below every shard's local range, so the remap
        # below sends truncated slots to the dropped bucket `cat_pad` on
        # EVERY shard. (The global bucket count would land inside a ragged
        # last shard's padded local range and count truncated slots live.)
        probes = route_probes(logits, n_buckets, probe_mass=probe_mass,
                              dump_id=-1, mass_logits=mass_logits)
        qs = l2_normalize(queries_search.astype(jnp.float32))
        local = probes - start[0, 0]
        local = jnp.where((local >= 0) & (local < cat_pad), local, cat_pad)
        local_store = BucketStore(
            data_sorted=data_s[0], ids_sorted=ids_s[0],
            offsets=offs[0], counts=cnts[0], n=rows, pad_rows=pad_rows,
            row_align=row_align,
            scales=scales_s[0][0] if quantized else None,
            quant_bits=quant_bits,
        )
        if backend == "pallas":
            from tpulmi.ops.pallas_topk import pallas_probe_search

            part_d, part_i, max_slots = pallas_probe_search(
                local, qs, local_store, k=k,
                qc=pallas_qc, mc=pallas_mc, max_chunks=pallas_max_chunks,
                compute_dtype=compute_dtype or jnp.float32,
                int8_queries=pallas_int8_queries,
                extract_mode=pallas_extract,
                pair=pallas_pair,
                interpret=interpret,
            )
        else:
            part_d, part_i, max_slots = _probe_search_impl(
                local, qs, local_store, k=k, qpb_pad=qpb_pad,
                data_chunk=data_chunk, max_chunks=max_chunks,
                compute_dtype=compute_dtype,
            )
        all_d = jax.lax.all_gather(part_d, axis)  # (S, Q, k)
        all_i = jax.lax.all_gather(part_i, axis)
        s, q, _ = all_d.shape
        cat_d = jnp.moveaxis(all_d, 0, 1).reshape(q, s * k)
        cat_i = jnp.moveaxis(all_i, 0, 1).reshape(q, s * k)
        neg_top, arg_top = jax.lax.top_k(-cat_d, k)
        return (-neg_top, jnp.take_along_axis(cat_i, arg_top, axis=1),
                jax.lax.pmax(max_slots, axis))

    specs = [P(), P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis)]
    if quantized:
        specs.append(P(axis))
    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=tuple(specs),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def make_dp_train_step(model, tx: optax.GradientTransformation, mesh: Mesh):
    """Build a jitted data-parallel train step: batch sharded along the mesh
    axis, params/opt-state replicated, gradient psum inserted by XLA."""
    axis = mesh.axis_names[0]
    batch_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def loss_fn(params, xb, yb):
        logits = model.apply({"params": params}, xb)
        return optax.softmax_cross_entropy_with_integer_labels(logits, yb).mean()

    @partial(
        jax.jit,
        in_shardings=(repl, repl, batch_sharding, batch_sharding),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
    def step(params, opt_state, xb, yb):
        loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
