"""Host-side bucket-store layout for corpora larger than device memory.

Builds the bucket-sorted, `row_align`-aligned store arrays in host buffers
(bf16/f32/int8 + per-row scales) so the only device cost is one upload —
the device-side layout in tpulmi/build.py needs a second in-HBM copy for
the sort, which a >half-HBM corpus cannot afford.

Used by `LearnedIndex.build_with_host_store` (10M single-level) and
`HierarchicalIndex.build_with_host_store` (20M+ two-level). The scatter
loop is the
single-core bottleneck of the 10M build (346 s in round-1 BENCH_10M.md), so
the row gather/scatter runs in the native C++ kernel (tpulmi/native) when
available, with a NumPy fallback.

Replaces the pandas groupby bucket formation of the reference
(`search/li/LearnedIndex.py:143-145`) at scales pandas cannot reach.
"""

import os
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np

from tpulmi.utils.logging import get_logger

log = get_logger("tpulmi.hoststore")


def _mem_total_bytes():
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return int(line.split()[1]) * 1024
    except (OSError, ValueError, IndexError):
        pass
    return None


def ensure_in_ram(arr, max_frac: float = None):
    """Materialize a (possibly memory-mapped) corpus in RAM with ONE
    sequential read. Random-access gathers over a disk memmap are an
    IO-bound storm (429 s vs ~40 s in RAM for the 10M store layout; the
    same pathology hits the per-query rerank gather).

    Refuses (returns the memmap unchanged) when the copy alone would
    exceed ``max_frac`` of total host RAM (default
    ``TPULMI_MATERIALIZE_MAX_FRAC`` or 0.45): the 40M build's steady
    state — 61 GB corpus copy + 15.4 GB store + nav copies + relay-client
    staging — OOM'd a 125 GB host twice (round-5, anon peak 114.6 GB).
    `layout_host_store` detects the still-mapped corpus and switches to
    source-sequential scatter, which never needs the RAM copy."""
    base = getattr(arr, "base", None)
    if not (isinstance(arr, np.memmap) or isinstance(base, np.memmap)):
        return arr
    if max_frac is None:
        max_frac = float(os.environ.get("TPULMI_MATERIALIZE_MAX_FRAC",
                                        "0.45"))
    total = _mem_total_bytes()
    if total is not None and arr.nbytes > max_frac * total:
        log.info(
            "corpus stays memory-mapped: %.1f GB copy > %.0f%% of %.1f GB "
            "host RAM", arr.nbytes / 1e9, max_frac * 100, total / 1e9)
        return arr
    log.info("materializing memory-mapped corpus in RAM (%s)", arr.shape)
    return np.array(arr)


@dataclass
class HostStoreArrays:
    """The BucketStore contents as host arrays, ready for one device_put."""

    data_sorted: np.ndarray          # (n_total + pad_rows, d) store dtype
    #                                  (d/2 packed bytes for int4)
    ids_sorted: np.ndarray           # (n_total + pad_rows,) int32
    offsets: np.ndarray              # (n_categories + 1,) int32
    counts: np.ndarray               # (n_categories,) int32
    scales: Optional[np.ndarray]     # (n_total + pad_rows,) f32 or None
    n: int
    pad_rows: int
    row_align: int
    quant_bits: int = 8              # 8 (int8) or 4 (packed int4)


def layout_host_store(
    pred: np.ndarray,
    data_search_host,
    n_categories: int,
    *,
    row_align: int = 1,
    store_dtype: str = "bfloat16",
    normalized: bool = False,
    pad_rows: int = 4096,
    chunk: int = 1_000_000,
    progress_cb=None,
    on_alloc=None,
) -> HostStoreArrays:
    """Lay `data_search_host` out in bucket-sorted aligned order on the host.

    `pred` is the (n,) int bucket label per row. `store_dtype` is
    "bfloat16", "float32", "int8", or "int4" (the quantized dtypes add
    per-row scales; int4 packs two codes per byte into a (rows, d/2) int8
    array — `tpulmi/ops/quantize.pack_int4` layout).

    `progress_cb(final_rows)`, if given, is called after each source chunk
    with a store-row watermark: rows `[0, final_rows)` of `data_sorted` are
    final and will never be written again (destination positions are
    strictly increasing because the stable label sort makes `pos`
    monotone). This is what lets an uploader pipeline slabs of the store
    to the device while the tail is still being laid out. `on_alloc(
    store_host, total_rows)` fires once, right after the store buffer is
    allocated (before any scatter), so the consumer can size its device
    buffer."""
    import ml_dtypes

    align = max(row_align, 1)
    quantized = store_dtype in ("int8", "int4")
    packed4 = store_dtype == "int4"
    if quantized:
        dtype = np.int8
    elif store_dtype == "bfloat16":
        dtype = ml_dtypes.bfloat16
    else:
        dtype = np.dtype(store_dtype)

    n = int(pred.shape[0])
    d = int(np.asarray(data_search_host[:1]).shape[1])
    t0 = time.perf_counter()
    data_search_host = ensure_in_ram(data_search_host)
    counts = np.bincount(pred, minlength=n_categories).astype(np.int32)
    aligned = -(-counts // align) * align
    offsets = np.concatenate([[0], np.cumsum(aligned)]).astype(np.int32)
    pad_rows = -(-pad_rows // align) * align
    n_total = int(-(-(n + n_categories * align) // align) * align)

    order = np.argsort(pred, kind="stable").astype(np.int32)
    d_stored = d // 2 if packed4 else d
    if packed4 and d % 2:
        raise ValueError(f"int4 store needs even d, got {d}")
    store_host = np.zeros((n_total + pad_rows, d_stored), dtype=dtype)
    ids_host = np.full((n_total + pad_rows,), -1, dtype=np.int32)
    scales_host = (
        np.zeros((n_total + pad_rows,), dtype=np.float32) if quantized else None
    )
    raw_offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    sorted_labels = pred[order]
    rank = np.arange(n, dtype=np.int64) - raw_offsets[sorted_labels]
    pos = offsets[sorted_labels].astype(np.int64) + rank
    if on_alloc is not None:
        on_alloc(store_host, n_total + pad_rows)

    still_mapped = isinstance(data_search_host, np.memmap) or isinstance(
        getattr(data_search_host, "base", None), np.memmap)
    if still_mapped:
        # Source-sequential scatter for corpora too big to materialize
        # (ensure_in_ram declined above): read the memmap in SEQUENTIAL
        # chunks (page-cache friendly; the gather path's random memmap
        # reads are an IO storm) and scatter-write into the RAM store.
        # dst[i] = store position of source row i. Watermarks for the
        # overlap uploader come from the suffix-min of per-chunk dst
        # minima: after chunk c, no later chunk writes below
        # min(dst mins of chunks > c), so that prefix is final. (Source
        # rows spread across all buckets, so watermarks mostly release at
        # the tail — the upload loses its overlap but stays correct.)
        dst = np.empty(n, np.int64)
        dst[order] = pos
        starts = list(range(0, n, chunk))
        cmins = np.array(
            [dst[lo:min(lo + chunk, n)].min() for lo in starts], np.int64)
        suffix = np.empty(len(starts) + 1, np.int64)
        suffix[-1] = n_total
        for i in range(len(starts) - 1, -1, -1):
            suffix[i] = min(suffix[i + 1], cmins[i])
        log.info("host layout: source-sequential scatter over %d chunks "
                 "(corpus stays on disk)", len(starts))
        for ci, lo in enumerate(starts):
            hi = min(lo + chunk, n)
            rows = np.asarray(data_search_host[lo:hi], dtype=np.float32)
            if not normalized:
                rows /= np.maximum(
                    np.linalg.norm(rows, axis=1, keepdims=True), 1e-12)
            d_chunk = dst[lo:hi]
            if packed4:
                from tpulmi.ops.quantize import quantize_rows_int4_host

                codes, s = quantize_rows_int4_host(rows)
                store_host[d_chunk] = codes
                scales_host[d_chunk] = s
            elif quantized:
                s = np.maximum(np.abs(rows).max(axis=1), 1e-12)
                store_host[d_chunk] = np.clip(
                    np.rint(rows / s[:, None] * 127.0), -127, 127
                ).astype(np.int8)
                scales_host[d_chunk] = s
            else:
                store_host[d_chunk] = rows.astype(dtype)
            ids_host[d_chunk] = np.arange(lo, hi, dtype=np.int32)
            if progress_cb is not None:
                progress_cb(int(suffix[ci + 1]))
        log.info("host layout: %d rows -> %d aligned (+%d pad) in %.1fs",
                 n, n_total, pad_rows, time.perf_counter() - t0)
        if progress_cb is not None:
            progress_cb(n_total + pad_rows)
        return HostStoreArrays(
            data_sorted=store_host,
            ids_sorted=ids_host,
            offsets=offsets,
            counts=counts,
            scales=scales_host,
            n=n,
            pad_rows=pad_rows,
            row_align=align,
            quant_bits=4 if packed4 else 8,
        )

    from tpulmi.native import native_layout

    native_ok = (
        native_layout.available()
        and not packed4
        and not isinstance(data_search_host, (list, tuple))
        # the C++ kernel handles f32/f16/bf16 sources and bf16/f32/int8
        # stores; anything else (e.g. float64 corpora) takes the NumPy path
        and str(np.asarray(data_search_host[:1]).dtype)
        in ("float32", "float16", "bfloat16")
        and str(store_host.dtype) in ("float32", "bfloat16", "int8")
    )
    if native_ok:
        progressed = False
        try:
            for lo in range(0, n, chunk):
                hi = min(lo + chunk, n)
                native_layout.scatter_rows(
                    data_search_host, order[lo:hi], pos[lo:hi], store_host,
                    scales_host, normalized=normalized,
                )
                ids_host[pos[lo:hi]] = order[lo:hi]
                if progress_cb is not None:
                    progress_cb(int(pos[hi - 1]) + 1)
                    progressed = True
        except (ValueError, RuntimeError) as e:
            if progressed:
                # watermarks were already consumed (slabs may be uploaded);
                # a from-scratch fallback could disagree bit-for-bit with
                # them (native int8 rounding != numpy's) — fail loudly
                raise
            log.info("native layout rejected inputs (%s); NumPy fallback", e)
            native_ok = False
    if not native_ok:
        direct = (not quantized and normalized
                  and np.asarray(data_search_host[:1]).dtype == dtype)
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            if direct:
                store_host[pos[lo:hi]] = data_search_host[order[lo:hi]]
            else:
                rows = np.asarray(
                    data_search_host[order[lo:hi]], dtype=np.float32
                )
                if not normalized:
                    rows /= np.maximum(
                        np.linalg.norm(rows, axis=1, keepdims=True), 1e-12
                    )
                if packed4:
                    from tpulmi.ops.quantize import quantize_rows_int4_host

                    codes, s = quantize_rows_int4_host(rows)
                    store_host[pos[lo:hi]] = codes
                    scales_host[pos[lo:hi]] = s
                elif quantized:
                    s = np.maximum(np.abs(rows).max(axis=1), 1e-12)
                    codes = np.rint(rows / s[:, None] * 127.0)
                    store_host[pos[lo:hi]] = np.clip(
                        codes, -127, 127
                    ).astype(np.int8)
                    scales_host[pos[lo:hi]] = s
                else:
                    store_host[pos[lo:hi]] = rows.astype(dtype)
            ids_host[pos[lo:hi]] = order[lo:hi]
            if progress_cb is not None:
                progress_cb(int(pos[hi - 1]) + 1)

    log.info("host layout: %d rows -> %d aligned (+%d pad) in %.1fs",
             n, n_total, pad_rows, time.perf_counter() - t0)
    if progress_cb is not None:
        progress_cb(n_total + pad_rows)  # alignment gaps + tail pad are final
    return HostStoreArrays(
        data_sorted=store_host,
        ids_sorted=ids_host,
        offsets=offsets,
        counts=counts,
        scales=scales_host,
        n=n,
        pad_rows=pad_rows,
        row_align=align,
        quant_bits=4 if packed4 else 8,
    )




def _slab_write(buf, host_rows, slab_rows: int, device=None):
    """Core slab loop shared by the single-device upload fallback and the
    per-shard uploader (`parallel.shard_store_from_host`): a donated
    `dynamic_update_slice` of ≤`slab_rows` host rows at a time into `buf`,
    with a true `device_get` barrier per slab — bounded host staging and
    synchronized streams (NOTES.md rules 7/8; a whole-array `device_put`
    of a near-HBM array stages multiple host copies and OOMs the host).

    `buf` is the caller-allocated destination, either (n, d) or the
    per-shard (1, rows_pad, d) layout (one extra leading singleton axis);
    `host_rows` lands at row offset 0. Returns the final buffer."""
    import jax
    import jax.numpy as jnp

    slab_rows = max(int(slab_rows), 1)
    lead = buf.ndim == host_rows.ndim + 1
    idx = ((lambda lo: (jnp.int32(0), lo, jnp.int32(0))) if lead
           else (lambda lo: (lo, jnp.int32(0))))
    put = jax.jit(
        lambda b, s, lo: jax.lax.dynamic_update_slice(b, s, idx(lo)),
        donate_argnums=0,
    )
    n = host_rows.shape[0]
    for lo in range(0, n, slab_rows):
        hi = min(lo + slab_rows, n)
        slab = host_rows[lo:hi][None] if lead else host_rows[lo:hi]
        slab = jax.device_put(slab, device)
        buf = put(buf, slab, jnp.int32(lo))
        del slab
        jax.device_get(buf[..., -1, :1])
    return buf


def _slab_upload_serial(store_host, slab_rows: int):
    """Blocking slab-by-slab upload of a host array into a device buffer
    (the same donated `dynamic_update_slice` loop the overlapped uploader
    runs, inline); see `_slab_write` for the staging/barrier contract."""
    import jax.numpy as jnp

    buf = jnp.zeros(store_host.shape, jnp.asarray(store_host[:1]).dtype)
    return _slab_write(buf, store_host, slab_rows)


def layout_and_upload(
    pred: np.ndarray,
    data_search_host,
    n_categories: int,
    *,
    row_align: int = 1,
    store_dtype: str = "bfloat16",
    normalized: bool = False,
    pad_rows: int = 4096,
    chunk: int = 1_000_000,
    overlap: bool = True,
    slab_rows: int = 262_144,
):
    """`layout_host_store` plus the big `data_sorted` device upload, with
    the two pipelined: an uploader thread streams finalized slabs of the
    store to the device (in-place `dynamic_update_slice` into a donated
    device buffer) while the host scatter is still laying out the tail.
    Safe because store positions are strictly increasing during layout
    (see `layout_host_store`); on a slow host↔device link the upload
    dominates, so overlapping hides the layout wall time entirely.

    Returns `(arrays, data_sorted_dev)` — the host arrays (whose small
    ids/offsets/counts/scales the caller still device_puts) and the
    fully-uploaded device copy of `data_sorted`.

    `overlap=False`, or any uploader failure, falls back to the serial
    path: full host layout, then one blocking `device_put`."""
    import queue
    import threading

    import jax
    import jax.numpy as jnp

    # Above this, a single blocking device_put is unsafe on the remote
    # backend: the client stages multiple host-RAM copies of the whole
    # array (observed host-OOM at 15.7 GB) — use the serial slab loop.
    big_bytes = 2 << 30

    if overlap:
        slab_rows = max(int(slab_rows), 1)
        marks: "queue.Queue" = queue.Queue()
        state = {"err": None, "buf": None}

        def uploader():
            try:
                put = jax.jit(
                    lambda b, s, lo: jax.lax.dynamic_update_slice(
                        b, s, (lo, jnp.int32(0))),
                    donate_argnums=0,
                )
                buf = None
                uploaded = 0
                while True:
                    item = marks.get()
                    if item is None:  # layout aborted
                        return
                    kind, payload = item
                    if kind == "alloc":
                        store_host, total = payload
                        buf = jnp.zeros(
                            (total, store_host.shape[1]),
                            jnp.asarray(store_host[:1]).dtype)
                        continue
                    rows_done = payload
                    done = rows_done >= store_host.shape[0]
                    target = (store_host.shape[0] if done
                              else (rows_done // slab_rows) * slab_rows)
                    while uploaded < target:
                        hi = min(uploaded + slab_rows, target)
                        slab = jax.device_put(store_host[uploaded:hi])
                        buf = put(buf, slab, jnp.int32(uploaded))
                        del slab  # free before staging the next slab: buf
                        # fills most of HBM, so even two live slabs matter
                        # true barrier per slab: unsynchronized async
                        # transfers pile up in host RAM and can wedge the
                        # remote transfer stream (NOTES.md rule 7/8)
                        jax.device_get(buf[-1, :1])
                        uploaded = hi
                    if done:
                        jax.device_get(buf[-1, :1])  # commit
                        state["buf"] = buf
                        return
            except Exception as e:  # noqa: BLE001 — surfaced to caller
                state["err"] = e

        th = threading.Thread(target=uploader, name="store-upload",
                              daemon=True)
        th.start()
        try:
            arrays = layout_host_store(
                pred, data_search_host, n_categories, row_align=row_align,
                store_dtype=store_dtype, normalized=normalized,
                pad_rows=pad_rows, chunk=chunk,
                on_alloc=lambda store, total: marks.put(
                    ("alloc", (store, total))),
                progress_cb=lambda rows: marks.put(("rows", rows)),
            )
        except BaseException:
            marks.put(None)
            th.join()
            raise
        th.join()
        if state["buf"] is not None:
            log.info("overlapped store upload completed in-stream")
            return arrays, state["buf"]
        if "RESOURCE_EXHAUSTED" in str(state["err"]):
            # device OOM: a blocking device_put of the same array can only
            # fail the same way (after staging the whole transfer in host
            # RAM) — surface it instead
            raise state["err"]
        log.info("overlapped store upload unavailable (%s); serial upload",
                 state["err"])
        if arrays.data_sorted.nbytes > big_bytes:
            # NOT one whole-array device_put: for near-HBM stores the
            # remote client stages ~5x host copies of it and the OOM
            # killer ends the process instead of an exception
            return arrays, _slab_upload_serial(arrays.data_sorted, slab_rows)
        return arrays, jax.device_put(arrays.data_sorted)

    arrays = layout_host_store(
        pred, data_search_host, n_categories, row_align=row_align,
        store_dtype=store_dtype, normalized=normalized,
        pad_rows=pad_rows, chunk=chunk,
    )
    if arrays.data_sorted.nbytes > big_bytes:
        return arrays, _slab_upload_serial(arrays.data_sorted,
                                           max(int(slab_rows), 1))
    return arrays, jax.device_put(arrays.data_sorted)
