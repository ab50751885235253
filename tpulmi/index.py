"""LearnedIndex facade: build / search / save / load.

The TPU-native equivalent of the reference's ``LearnedIndex``
(`search/li/LearnedIndex.py:17-282`) with the same three-stage contract:

- ``build(data_nav, data_search)``: k-means-partition the navigation
  vectors, train the MLP bucket classifier on the partition, assign every
  row to its *predicted* bucket (model argmax, exactly like the reference —
  `search/li/LearnedIndex.py:67,240`), and lay the search-space vectors out
  in the bucket-sorted device store.
- ``search(queries_nav, queries_search, n_buckets, k)``: softmax-route each
  query to its top-`n_buckets` buckets and run the batched exact rerank.
- ``save(path)`` / ``load(path)``: orbax checkpoint of the whole built
  index — a capability the reference only half has (pickle save with no
  load path; `search/li/utils.py:46-60`, SURVEY.md §5).

External ids are 1-based (SISAP convention, reference `search/search.py:72`);
everything internal is 0-based.
"""

import json
import os
import time
from collections import deque
from dataclasses import dataclass
from pathlib import Path
from types import SimpleNamespace
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpulmi.buckets import BucketStore, build_bucket_store, bucket_stats
from tpulmi.models.train import BucketClassifier
from tpulmi.ops.distance import l2_normalize
from tpulmi.ops.kmeans import kmeans
from tpulmi.search import make_search_program, size_class
from tpulmi.utils.config import IndexConfig, SearchConfig
from tpulmi.utils.logging import get_logger

log = get_logger("tpulmi.index")


def _host_mem_available():
    """Host MemAvailable in bytes, or None where /proc/meminfo is absent."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return None


@dataclass
class BuiltIndex:
    """Everything the query path needs, device-resident."""

    centroids: jnp.ndarray
    classifier: BucketClassifier
    store: BucketStore
    pred_categories: jnp.ndarray  # (N,) int32 model-argmax bucket per row
    config: IndexConfig
    max_bucket: int = 0           # largest bucket size (static search padding)


class _materialize_async:
    """Run `ensure_in_ram` on a background thread so the one-time
    memmap→RAM corpus copy overlaps the (device-bound) navigation stages
    of a host-store build instead of serializing after them."""

    def __init__(self, arr):
        import threading

        from tpulmi.hoststore import ensure_in_ram

        self._out = {}

        def run():
            try:
                self._out["arr"] = ensure_in_ram(arr)
            except BaseException as e:  # noqa: BLE001 — re-raised in result
                self._out["err"] = e

        self._th = threading.Thread(target=run, name="corpus-mat",
                                    daemon=True)
        self._th.start()

    def result(self):
        self._th.join()
        if "err" in self._out:
            raise self._out["err"]
        return self._out["arr"]


class LearnedIndex:
    def __init__(self, config: IndexConfig = IndexConfig()):
        self.config = config
        self.built: Optional[BuiltIndex] = None
        self._search_programs = {}   # static-config -> jitted program
        self._qpb_pads = {}          # (Q, n_buckets) -> validated qpb_pad
        self._wl_pads = {}           # (Q, n_buckets) -> pallas worklist pad
        self._vmem_warned = set()    # configs whose VMEM re-tile was logged
        # optional host-resident full-precision corpus (rows by original
        # 0-based id) + normalized flag; enables the exact rerank on
        # quantized stores
        self._host_corpus = None
        # rerank contract restored from a checkpoint (fingerprint etc.)
        self._rerank_meta = None
        # multi-chip mode: (ShardedBucketStore, Mesh) after .shard()
        self._sharded = None
        self._sharded_programs = {}

    # ------------------------------------------------------------------ build
    def build(
        self,
        data_nav,
        data_search=None,
        n_categories: Optional[int] = None,
        epochs: Optional[int] = None,
        lr: Optional[float] = None,
        model_type: Optional[str] = None,
    ) -> Tuple[np.ndarray, float]:
        """Build the index. Returns (pred_categories, build_seconds) like the
        reference's ``build`` (`search/li/LearnedIndex.py:197-240`).

        `data_nav` is the navigation space (e.g. pca96); `data_search` the
        rerank space (e.g. clip768), defaulting to `data_nav` when the two
        coincide (reference `search/search.py:91-93`).
        """
        cfg = self.config
        n_categories = n_categories or cfg.n_categories
        epochs = epochs or cfg.epochs
        lr = lr or cfg.lr
        model_type = model_type or cfg.model_type

        n = int(np.asarray(data_nav).shape[0])
        if cfg.fused_build and n >= 2:
            # small-data fallbacks, mirroring the reference's cluster()
            # (`search/li/LearnedIndex.py:263-269`)
            if n < n_categories:
                n_categories = max(n // 5, 2)
            return self._build_fused(
                data_nav, data_search, n_categories, epochs, lr, model_type
            )

        start = time.perf_counter()
        data_nav = jax.device_put(jnp.asarray(data_nav, jnp.float32))

        # ---- 1. partition (k-means on the MXU) ----
        centroids, labels = kmeans(
            data_nav,
            n_categories,
            iters=cfg.kmeans_iters,
            seed=cfg.seed,
            max_points_per_centroid=cfg.kmeans_max_points_per_centroid,
        )
        n_categories = int(centroids.shape[0]) if centroids is not None else 1
        # value fetch = true sync (block_until_ready does not synchronize on
        # the remote-execution backend of this environment)
        jax.device_get(labels[-1])
        t_cluster = time.perf_counter() - start
        log.info("k-means: %d clusters in %.3fs", n_categories, t_cluster)

        # ---- 2. learn the partition ----
        classifier = BucketClassifier(
            input_dim=int(data_nav.shape[1]),
            n_classes=n_categories,
            lr=lr,
            model_type=model_type,
            seed=cfg.seed,
        )
        losses = classifier.train(
            data_nav,
            labels,
            epochs=epochs,
            batch_size=cfg.batch_size,
            reference_step_semantics=cfg.reference_step_semantics,
            max_train_steps=cfg.max_train_steps,
        )
        losses = jax.device_get(losses)  # true sync, see above
        t_train = time.perf_counter() - start - t_cluster
        log.info(
            "training: %d epochs in %.3fs (final loss %.4f)",
            epochs, t_train, float(losses[-1]),
        )

        # ---- 3. bucket the search space by the model's own predictions ----
        pred_categories = classifier.predict(data_nav)
        jax.device_get(pred_categories[-1])
        t_predict = time.perf_counter() - start - t_cluster - t_train
        log.info("predict: %d rows in %.3fs", int(data_nav.shape[0]), t_predict)
        if data_search is None:
            data_search = data_nav
        data_search = l2_normalize(
            jax.device_put(jnp.asarray(data_search, jnp.float32))
        )
        store = build_bucket_store(
            pred_categories, data_search, n_categories,
            row_align=cfg.row_align,
        )
        # Value fetches, not just block_until_ready: on the remote-execution
        # backend of this environment only a fetch truly synchronizes, and
        # build time must not leak into the first search call.
        jax.device_get(store.data_sorted[-1, :1])
        jax.device_get(store.ids_sorted[-1])
        build_time = time.perf_counter() - start
        mx, mn, mean = bucket_stats(store)
        log.info(
            "store: N=%d buckets=%d size max/mean/min=%d/%.0f/%d; build %.3fs",
            store.n, n_categories, mx, mean, mn, build_time,
        )

        self.built = BuiltIndex(
            centroids=centroids,
            classifier=classifier,
            store=store,
            pred_categories=pred_categories,
            config=cfg,
            max_bucket=mx,
        )
        return np.asarray(jax.device_get(pred_categories)), build_time

    def _build_fused(
        self, data_nav, data_search, n_categories, epochs, lr, model_type
    ) -> Tuple[np.ndarray, float]:
        """Build via the single fused XLA program (tpulmi/build.py): one
        compile, one dispatch, no host round-trips between stages."""
        from tpulmi.build import get_build_program

        cfg = self.config
        start = time.perf_counter()
        data_nav = jax.device_put(jnp.asarray(data_nav, jnp.float32))
        if data_search is None:
            data_search = data_nav
        data_search = jax.device_put(jnp.asarray(data_search, jnp.float32))
        n = int(data_nav.shape[0])

        classifier = BucketClassifier(
            input_dim=int(data_nav.shape[1]),
            n_classes=n_categories,
            lr=lr,
            model_type=model_type,
            seed=cfg.seed,
            initialize=False,
        )
        program = get_build_program(
            model_type=model_type,
            lr=lr,
            n=n,
            d_nav=int(data_nav.shape[1]),
            n_categories=n_categories,
            kmeans_iters=cfg.kmeans_iters,
            kmeans_train_points=cfg.kmeans_max_points_per_centroid * n_categories,
            epochs=epochs,
            batch_size=cfg.batch_size,
            row_align=cfg.row_align,
            reference_step_semantics=cfg.reference_step_semantics,
            max_train_steps=cfg.max_train_steps,
        )
        result = program(data_nav, data_search, jax.random.PRNGKey(cfg.seed))
        # value fetches = true sync on the remote-execution backend
        losses = jax.device_get(result.losses)
        pred_categories = result.pred_categories
        jax.device_get(result.data_sorted[-1, :1])
        build_time = time.perf_counter() - start

        classifier.params = result.params
        # guaranteed tail slack past offsets[-1] (build.py pads with 4096
        # sentinel rows, rounded up to the bucket alignment)
        pad_rows = 4096
        if cfg.row_align > 1:
            pad_rows = -(-pad_rows // cfg.row_align) * cfg.row_align
        store = BucketStore(
            data_sorted=result.data_sorted,
            ids_sorted=result.ids_sorted,
            offsets=result.offsets,
            counts=result.counts,
            n=n,
            pad_rows=pad_rows,
            row_align=max(cfg.row_align, 1),
        )
        mx, mn, mean = bucket_stats(store)
        log.info(
            "fused build: N=%d buckets=%d size max/mean/min=%d/%.0f/%d; "
            "final loss %.4f; build %.3fs",
            n, n_categories, mx, mean, mn, float(losses[-1]), build_time,
        )
        self.built = BuiltIndex(
            centroids=result.centroids,
            classifier=classifier,
            store=store,
            pred_categories=pred_categories,
            config=cfg,
            max_bucket=mx,
        )
        return np.asarray(jax.device_get(pred_categories)), build_time

    # ------------------------------------------------------ build (host store)
    def build_with_host_store(
        self,
        data_nav,
        data_search_host,
        normalized: bool = False,
        store_dtype: str = "bfloat16",
        overlap_upload: bool = False,
        mesh=None,
    ) -> Tuple[np.ndarray, float]:
        """Large-scale build: navigation stages (k-means, MLP, predict) run
        on device, but the search-space store is laid out on the HOST and
        uploaded once — for corpora whose store plus source copy exceed HBM
        (e.g. 10M x 768: a 15.4 GB bf16 store on a 16 GB v5e leaves no room
        for the device-side sort's second copy).

        ``mesh`` (a 1-D device mesh) builds the store **sharded**: the host
        layout is uploaded per-shard straight to each device
        (`tpulmi.parallel.sharded.shard_store_from_host`), so the flat
        store is never resident on any single device — the only viable
        path for corpora whose store exceeds one chip's HBM (100M int8 ≈
        77 GB on 16 GB/chip v5e-8, BASELINE.md). Subsequent `search` calls
        transparently run the one-program multi-chip path.

        `data_search_host` stays a host array (float16/32/bf16). The store
        is written in bucket-sorted, `row_align`-aligned order directly into
        a host buffer of the target dtype, so peak device memory is just the
        final store.

        ``store_dtype="int8"`` lays out int8 row codes plus per-row f32
        scales (tpulmi/ops/quantize.py): half the upload bytes and HBM of
        bf16 (~20M x 768 rows/chip), searched natively by both probe
        backends; `search` reranks the final candidates against
        `data_search_host` to erase the ~1e-3 quantization error.

        ``overlap_upload=True`` pipelines the store upload with the host
        layout (`tpulmi.hoststore.layout_and_upload`): finalized slabs
        stream to the device while the scatter is still writing the tail,
        hiding the layout wall time behind the transfer."""
        cfg = self.config
        start = time.perf_counter()
        n_categories = cfg.n_categories
        # overlap the one-time corpus materialization (memmap -> RAM, ~340 s
        # at 10M) with the nav stages: both are serial phases otherwise, and
        # the copy is IO/memcpy-bound while nav waits on the device
        mat_thread = _materialize_async(data_search_host)
        # upload nav in its source precision (callers may pass bf16 to halve
        # the relay-bound transfer); the build program casts to f32 on device
        data_nav = jax.device_put(jnp.asarray(data_nav))
        n, d_nav = int(data_nav.shape[0]), int(data_nav.shape[1])
        if n < n_categories:
            n_categories = max(n // 5, 2)

        from tpulmi.build import get_build_program

        classifier = BucketClassifier(
            input_dim=d_nav, n_classes=n_categories, lr=cfg.lr,
            model_type=cfg.model_type, seed=cfg.seed, initialize=False,
        )
        program = get_build_program(
            model_type=cfg.model_type, lr=cfg.lr, n=n, d_nav=d_nav,
            n_categories=n_categories, kmeans_iters=cfg.kmeans_iters,
            kmeans_train_points=cfg.kmeans_max_points_per_centroid * n_categories,
            epochs=cfg.epochs, batch_size=cfg.batch_size,
            row_align=cfg.row_align,
            reference_step_semantics=cfg.reference_step_semantics,
            include_store=False,
            max_train_steps=cfg.max_train_steps,
        )
        result = program(
            data_nav, jnp.zeros((0, 1), jnp.float32), jax.random.PRNGKey(cfg.seed)
        )
        classifier.params = result.params
        pred = np.asarray(jax.device_get(result.pred_categories))
        losses = jax.device_get(result.losses)
        centroids = result.centroids
        t_nav = time.perf_counter() - start
        log.info("host-store build: nav stages %.1fs (final loss %.4f)",
                 t_nav, float(losses[-1]))
        # free the device-side navigation data and nav-build outputs NOW —
        # the store upload below needs nearly all of HBM (15.5 GB at 10M)
        del data_nav, result
        import gc

        gc.collect()
        # park the remaining small nav outputs on the HOST too: a
        # near-HBM-sized store needs one contiguous region, and params/
        # centroids sitting mid-heap fragment it (re-uploaded after the
        # store lands)
        classifier.params = jax.device_get(classifier.params)
        centroids = np.asarray(jax.device_get(centroids))

        # ---- host-side bucket-sorted aligned layout (native kernel when
        # the toolchain allows, NumPy otherwise — tpulmi/hoststore.py) ----
        data_search_host = mat_thread.result()
        store, arrays, data_search_host = self._host_store_to_built(
            pred, data_search_host, n_categories, store_dtype=store_dtype,
            normalized=normalized, overlap_upload=overlap_upload, mesh=mesh,
        )
        t_layout = time.perf_counter() - start - t_nav
        log.info("host-store build: layout+upload %.1fs", t_layout)
        # restore the router to the device (parked on host above)
        classifier.params = jax.device_put(classifier.params)
        build_time = time.perf_counter() - start
        log.info("host-store build: total %.1fs", build_time)
        self.built = BuiltIndex(
            centroids=centroids,
            classifier=classifier,
            store=store,
            pred_categories=jnp.asarray(pred),
            config=cfg,
            max_bucket=int(arrays.counts.max()) if arrays.counts.size else 0,
        )
        # keep the host corpus for the exact rerank of quantized results.
        # If the layout ran source-sequential (corpus too big to hold in
        # RAM alongside the build's own peak), retry the RAM copy NOW: the
        # store/nav/staging copies are gone, so the rerank budget is wider
        # (0.6 of RAM vs the build-time 0.45) — the per-query rerank
        # gather over a disk memmap is the 429 s-vs-40 s pathology.
        from tpulmi.hoststore import ensure_in_ram as _eir

        data_search_host = _eir(data_search_host, max_frac=float(
            os.environ.get("TPULMI_RERANK_MATERIALIZE_MAX_FRAC", "0.6")))
        self._host_corpus = (data_search_host, normalized)
        return pred, build_time

    def _host_store_to_built(self, pred, data_search_host, n_categories, *,
                             store_dtype, normalized, overlap_upload, mesh):
        """Land the host-laid-out store on device(s).

        Single-chip (``mesh=None``): `layout_and_upload` (optionally
        slab-pipelined with the layout) produces one device-resident flat
        store. NOTE: the upload is bounded by this environment's
        host<->device relay (~20-30 MB/s measured) — ~13 min for a 10M
        bf16 store; on directly-attached TPU hosts it runs at link speed.

        Multi-chip (``mesh``): the layout is uploaded shard-by-shard
        straight to each device (`shard_store_from_host`) and the sharded
        search path is armed; ``built.store`` then holds the HOST layout
        arrays — metadata + checkpoint source only, NEVER a one-device
        copy (the whole point: a >HBM store has no single-device home).

        Returns (store, arrays, data_search_host)."""
        from tpulmi.hoststore import (
            ensure_in_ram,
            layout_and_upload,
            layout_host_store,
        )

        cfg = self.config
        data_search_host = ensure_in_ram(data_search_host)
        if mesh is not None:
            from tpulmi.parallel.sharded import shard_store_from_host

            arrays = layout_host_store(
                pred, data_search_host, n_categories,
                row_align=cfg.row_align, store_dtype=store_dtype,
                normalized=normalized,
            )
            sstore = shard_store_from_host(arrays, mesh)
            store = BucketStore(
                data_sorted=arrays.data_sorted,   # host-resident (see doc)
                ids_sorted=arrays.ids_sorted,
                offsets=arrays.offsets,
                counts=arrays.counts,
                n=arrays.n,
                pad_rows=arrays.pad_rows,
                row_align=arrays.row_align,
                scales=arrays.scales,
                quant_bits=arrays.quant_bits,
            )
            self._sharded = (sstore, mesh)
            self._sharded_programs = {}
            return store, arrays, data_search_host

        arrays, data_sorted_dev = layout_and_upload(
            pred, data_search_host, n_categories,
            row_align=cfg.row_align, store_dtype=store_dtype,
            normalized=normalized, overlap=overlap_upload,
        )
        store = BucketStore(
            data_sorted=data_sorted_dev,
            ids_sorted=jax.device_put(arrays.ids_sorted),
            offsets=jax.device_put(jnp.asarray(arrays.offsets)),
            counts=jax.device_put(jnp.asarray(arrays.counts)),
            n=arrays.n,
            pad_rows=arrays.pad_rows,
            row_align=arrays.row_align,
            scales=(jax.device_put(arrays.scales)
                    if arrays.scales is not None else None),
            quant_bits=arrays.quant_bits,
        )
        jax.device_get(store.data_sorted[-1, :1])
        return store, arrays, data_search_host

    def compute_bounds(self, chunk: int = 65536) -> None:
        """Precompute per-bucket pruning bounds (unit centroid, cap radius,
        max row norm — `tpulmi.buckets.compute_bucket_bounds`) enabling the
        threshold tile-skip (`SearchConfig.prune_after`): probe ranks past
        the first skip every (query-chunk × bucket) scan provably beyond
        the running kth-best. One streaming pass over the store (two reads
        of HBM); call once after build/quantize/load. The TPU-native analog
        of the reference's running-threshold prune
        (`search/li/LearnedIndex.py:149-163`) — saving real scan work, not
        just masking."""
        if self.built is None:
            raise ValueError("Index is not built, call `build` first.")
        from dataclasses import replace as dc_replace

        from tpulmi.buckets import compute_bucket_bounds

        store = compute_bucket_bounds(self.built.store, chunk=chunk)
        jax.device_get(store.bucket_cos_r[-1])  # true sync (remote backend)
        self.built = dc_replace(self.built, store=store)
        self._search_programs = {}

    def quantize(self, host_corpus=None, normalized: bool = False,
                 bits: int = 8) -> None:
        """Convert the built store to int8 (``bits=8``) or packed int4
        (``bits=4``) codes + per-row scales in place (half / quarter the
        HBM; ~1e-3 / ~4e-3 cosine error). Optionally attach a
        host-resident full-precision corpus so `search` reranks the final
        candidates exactly — int4 effectively requires it (with a deeper
        `SearchConfig.rerank_extra` pool, ~20-40)."""
        if self.built is None:
            raise ValueError("Index is not built, call `build` first.")
        from tpulmi.ops.quantize import quantize_store

        self.built = BuiltIndex(
            centroids=self.built.centroids,
            classifier=self.built.classifier,
            store=quantize_store(self.built.store, bits=bits),
            pred_categories=self.built.pred_categories,
            config=self.built.config,
            max_bucket=self.built.max_bucket,
        )
        self._search_programs = {}
        if self._sharded is not None:
            # re-shard from the quantized store: keeping the stale
            # full-precision shards would silently search them (and hold
            # both copies in HBM)
            _, mesh = self._sharded
            self.shard(mesh)
        if host_corpus is not None:
            self._host_corpus = (host_corpus, normalized)

    def _resolve_rerank_extra(self, scfg) -> int:
        """Dtype-aware rerank depth: `SearchConfig.rerank_extra=None`
        resolves to 30 for packed int4 stores (whose ~4e-3 cosine noise
        otherwise drops true neighbors from the candidate cut — see the
        config field's measurements), 10 for int8/bf16."""
        if scfg.rerank_extra is not None:
            return scfg.rerank_extra
        store = self.built.store if self.built is not None else None
        return 30 if getattr(store, "quant_bits", 8) == 4 else 10

    def _rerank_host(self, dists, ids, queries_search, k: int,
                     host_queries=None, rerank_dtype: str = "float32"):
        # `dists` is intentionally unused (and may be None): every kept
        # candidate's distance is recomputed exactly from the host corpus,
        # which is why the caller never downloads the quantized ones.
        """Exact top-k over the quantized candidates: gather the candidate
        rows from the host corpus, recompute full-precision cosine
        distances, reorder, truncate to k. ids are 0-based, -1 = empty.

        ``host_queries``: host-side mirror of ``queries_search``. Without
        it the queries are fetched from device — on the relay backend that
        download (30 MB at 10k queries) can dominate the whole rerank.

        ``rerank_dtype="float16"`` gathers from a cached f16 shadow of the
        corpus: half the random-gather bytes on the (single-core) host for
        ~4e-4 relative distance error — an order of magnitude below the
        int8 error the rerank exists to erase."""
        corpus, normalized = self._host_corpus
        q, k_eff = ids.shape
        d = int(np.asarray(corpus[:1]).shape[1])
        # the kernel's rerank pool (SearchConfig.pallas_pool) may hand the
        # same row twice per query (a candidate can sit in both the exact
        # top-k and its residue-class pool lane): mark repeats empty so the
        # exact reorder can never return one row twice. Vectorized per-row
        # dedupe; a no-op for the exact (duplicate-free) paths.
        sort_idx = np.argsort(ids, axis=1, kind="stable")
        sorted_ids = np.take_along_axis(ids, sort_idx, axis=1)
        dup_sorted = np.zeros(ids.shape, dtype=bool)
        dup_sorted[:, 1:] = ((sorted_ids[:, 1:] == sorted_ids[:, :-1])
                             & (sorted_ids[:, 1:] >= 0))
        if dup_sorted.any():
            dup = np.zeros(ids.shape, dtype=bool)
            np.put_along_axis(dup, sort_idx, dup_sorted, axis=1)
            ids = np.where(dup, -1, ids)
        if host_queries is not None:
            qs = np.array(host_queries, np.float32)  # writable copy
        else:
            qs = np.array(jax.device_get(queries_search), np.float32)
        qs /= np.maximum(np.linalg.norm(qs, axis=1, keepdims=True), 1e-12)
        if rerank_dtype == "float16":
            shadow = getattr(self, "_rerank_shadow", None)
            if shadow is None or shadow[0] is not corpus:
                # The shadow is a full-size f16 copy of the corpus. At 40M
                # rows that is ~61 GB on top of the resident corpus — past
                # available host RAM the allocation would not raise, the
                # kernel OOM killer would SIGKILL the process mid-benchmark.
                # Refuse with a catchable error instead.
                need = 2 * int(np.prod(np.asarray(corpus[:1]).shape)) * len(
                    corpus)
                avail = _host_mem_available()
                if avail is not None and need > avail - (8 << 30):
                    raise RuntimeError(
                        f"f16 rerank shadow needs {need / 2**30:.1f} GiB but "
                        f"only {avail / 2**30:.1f} GiB host RAM is available"
                        " — skipping would OOM-kill the process")
                shadow = (corpus, np.asarray(corpus, np.float16))
                self._rerank_shadow = shadow
            src = shadow[1]
        else:
            src = corpus if isinstance(corpus, np.ndarray) else None

        # fused native path: each candidate row is read once and dotted
        # against its query in C++ (F16C/FMA), skipping the (Q, K, d)
        # gathered block and the batched-matmul pass entirely
        sims = None
        if (src is not None
                and str(src.dtype) in ("float32", "float16", "bfloat16")
                and src.flags["C_CONTIGUOUS"]):
            from tpulmi.native import native_layout

            if native_layout.available():
                try:
                    sims = native_layout.rerank_dot(
                        src, ids, qs, normalized=normalized)
                except Exception as e:  # noqa: BLE001 — fall back to bmm
                    log.info("native rerank_dot failed (%s); bmm path", e)
        if sims is not None:
            exact = 1.0 - sims
            from tpulmi.ops.distance import SENTINEL_DIST

            exact = np.where(ids < 0, SENTINEL_DIST, exact)
            order = np.argsort(exact, axis=1, kind="stable")[:, :k]
            return (
                np.take_along_axis(exact, order, axis=1).astype(np.float32),
                np.take_along_axis(ids, order, axis=1),
            )

        if rerank_dtype == "float16":
            # keep the gathered rows in f16: numpy's f16->f32 astype of the
            # 600 MB candidate block costs MORE than the halved gather
            # saves (measured 0.6 s vs 0.16 s at 10k x 20 x 768); torch's
            # CPU half bmm accumulates in f32 (measured max err 6e-5, 20x
            # below the int8 error), so no upcast is needed on that path
            rows = shadow[1][np.maximum(ids, 0).reshape(-1)].reshape(
                q, k_eff, d)
        else:
            rows = np.asarray(
                corpus[np.maximum(ids, 0).reshape(-1)], np.float32
            ).reshape(q, k_eff, d)
        if not normalized and rows.dtype != np.float32:
            rows = np.asarray(rows, np.float32)
        if not normalized:
            rows /= np.maximum(
                np.linalg.norm(rows, axis=2, keepdims=True), 1e-12
            )
        try:
            # torch's batched matmul beats numpy's per-batch GEMV loop on
            # this path (and is the only fast f16 route on the host)
            import torch

            qcol = (torch.from_numpy(qs.astype(rows.dtype)).unsqueeze(2)
                    if rows.dtype == np.float16
                    else torch.from_numpy(qs).unsqueeze(2))
            sims = torch.bmm(
                torch.from_numpy(rows), qcol,
            ).float().numpy()[:, :, 0]
        except ImportError:
            if rows.dtype != np.float32:
                rows = np.asarray(rows, np.float32)
            sims = np.matmul(rows, qs[:, :, None])[:, :, 0]
        exact = 1.0 - sims
        from tpulmi.ops.distance import SENTINEL_DIST

        exact = np.where(ids < 0, SENTINEL_DIST, exact)
        order = np.argsort(exact, axis=1, kind="stable")[:, :k]
        return (
            np.take_along_axis(exact, order, axis=1).astype(np.float32),
            np.take_along_axis(ids, order, axis=1),
        )

    # ------------------------------------------------------------ multi-chip
    def build_distributed(
        self,
        data_nav,
        data_search=None,
        mesh=None,
        shard_after: bool = True,
    ) -> Tuple[np.ndarray, float]:
        """Multi-chip build: every navigation stage (k-means subsample +
        Lloyd, assignment, DP MLP training with pmean'd grads, predict) runs
        data-parallel over `mesh` in ONE shard_map'd program
        (tpulmi/parallel/dist_build.py); the store is then laid out and, by
        default, bucket-sharded across the same mesh so `search` runs
        multi-chip too."""
        import optax

        from tpulmi.models.mlp import make_model
        from tpulmi.parallel.dist_build import (
            get_dist_nav_program,
            shard_rows,
        )
        from tpulmi.parallel.mesh import make_mesh

        cfg = self.config
        start = time.perf_counter()
        if mesh is None:
            mesh = make_mesh(axis_names=("data",))
        data_nav = np.asarray(data_nav, np.float32)
        n, d_nav = data_nav.shape
        n_categories = cfg.n_categories if n >= cfg.n_categories else max(
            n // 5, 2
        )
        data_sharded, n_local = shard_rows(data_nav, mesh)

        model = make_model(cfg.model_type, n_categories)
        tx = optax.adam(cfg.lr)
        program = get_dist_nav_program(
            model, tx, mesh, n_local=n_local, d_nav=d_nav,
            n_categories=n_categories, kmeans_iters=cfg.kmeans_iters,
            kmeans_train_points=cfg.kmeans_max_points_per_centroid
            * n_categories,
            epochs=cfg.epochs, batch_size=cfg.batch_size,
            max_train_steps=cfg.max_train_steps,
        )
        result = program(data_sharded, jax.random.PRNGKey(cfg.seed))
        pred = np.asarray(jax.device_get(result.pred))[:n]  # drop row padding
        losses = jax.device_get(result.losses)
        log.info("distributed build (%d chips): nav stages %.1fs, "
                 "final loss %.4f", int(mesh.devices.size),
                 time.perf_counter() - start, float(losses[-1]))

        classifier = BucketClassifier(
            input_dim=d_nav, n_classes=n_categories, lr=cfg.lr,
            model_type=cfg.model_type, seed=cfg.seed, initialize=False,
        )
        classifier.params = jax.device_get(result.params)
        if data_search is None:
            data_search = data_nav
        store = build_bucket_store(
            jnp.asarray(pred),
            l2_normalize(jnp.asarray(np.asarray(data_search, np.float32))),
            n_categories, row_align=cfg.row_align,
        )
        jax.device_get(store.data_sorted[-1, :1])
        build_time = time.perf_counter() - start
        mx, mn, mean = bucket_stats(store)
        log.info(
            "distributed build: N=%d buckets=%d size max/mean/min=%d/%.0f/%d; "
            "%.1fs", store.n, n_categories, mx, mean, mn, build_time,
        )
        self.built = BuiltIndex(
            centroids=result.centroids,
            classifier=classifier,
            store=store,
            pred_categories=jnp.asarray(pred),
            config=cfg,
            max_bucket=mx,
        )
        if shard_after:
            from tpulmi.parallel.mesh import make_mesh as _mm

            self.shard(_mm(int(mesh.devices.size), ("buckets",),
                           devices=list(mesh.devices.flat)))
        return pred, build_time

    def shard(self, mesh=None, n_shards: Optional[int] = None) -> None:
        """Partition the built store into contiguous bucket ranges across a
        mesh (axis "buckets"); subsequent `search` calls transparently run
        the one-program multi-chip path (replicated routing, per-chip probe,
        all-gather top-k merge over ICI). Pass a 1-D mesh or a shard count."""
        if self.built is None:
            raise ValueError("Index is not built, call `build` first.")
        from tpulmi.parallel.mesh import make_mesh
        from tpulmi.parallel.sharded import shard_store

        if mesh is None:
            mesh = make_mesh(n_shards, ("buckets",))
        sstore = shard_store(self.built.store, int(mesh.devices.size))
        self._sharded = (sstore, mesh)
        self._sharded_programs = {}

    def unshard(self) -> None:
        """Return to single-chip search (the flat store is still resident)."""
        self._sharded = None
        self._sharded_programs = {}

    def _plan_sharded(self, queries_nav, n_buckets: int, k: int,
                      scfg: SearchConfig):
        """Sharded counterpart of `_plan_search`: resolve the static
        decisions of one multi-chip dispatch (backend, rerank depth, padding
        classes) into a mutable plan shared by `_search_sharded` and the
        dispatch-ahead loop in `search_stream`."""
        built = self.built
        sstore, _ = self._sharded
        rerank = (scfg.rerank and built.store.is_quantized
                  and self._host_corpus is not None)
        k_eff = k + self._resolve_rerank_extra(scfg) if rerank else k
        q = int(queries_nav.shape[0])
        n_slots = q * n_buckets
        data_chunk = min(scfg.data_chunk,
                         size_class(max(built.max_bucket, 1)),
                         int(sstore.data_sorted.shape[1]))
        max_chunks = max(-(-built.max_bucket // data_chunk), 1)
        # backend: same eligibility rule as the flat path, evaluated on the
        # PER-SHARD store geometry (each shard inherits the flat store's
        # row_align, so the kernel's block alignment holds shard-wise)
        quantized = sstore.scales is not None
        dim = int(sstore.data_sorted.shape[-1]) * (
            2 if (quantized and sstore.quant_bits == 4) else 1)
        backend = scfg.backend
        if backend == "auto":
            pallas_ok = (
                dim % 128 == 0
                and sstore.row_align % scfg.pallas_mc == 0
                and int(sstore.data_sorted.shape[1]) % scfg.pallas_mc == 0
                and k_eff <= 128
                and (not quantized or scfg.pallas_mc % 1024 == 0)
                and jax.devices()[0].platform != "cpu"
            )
            backend = "pallas" if pallas_ok else "xla"
        qpb_pad = scfg.queries_per_bucket_pad or self._qpb_pads.get(
            ("sharded", q, n_buckets),
            size_class(min(n_slots,
                           max(4 * n_slots // built.store.n_categories, 128))),
        )
        # per-shard kernel tiles obey the same scoped-VMEM budget as the
        # flat path (each chip dispatches the identical kernel shape)
        pallas_pair, pallas_qc = scfg.pallas_pair, scfg.pallas_qc
        if backend == "pallas":
            pallas_pair, pallas_qc = self._resolve_pallas_tiling(
                scfg, d=dim, d_stored=int(sstore.data_sorted.shape[-1]),
                quantized=quantized)
        return SimpleNamespace(
            q=q, backend=backend, rerank=rerank, k_eff=k_eff,
            compute_dtype=(jnp.dtype(scfg.compute_dtype)
                           if scfg.compute_dtype else None),
            data_chunk=data_chunk, max_chunks=max_chunks, qpb_pad=qpb_pad,
            wl_pad=0, want_stats=False,
            pallas_max_chunks=max(-(-built.max_bucket // scfg.pallas_mc), 1),
            pallas_pair=pallas_pair, pallas_qc=pallas_qc,
        )

    def _dispatch_sharded(self, plan, n_buckets: int, scfg: SearchConfig):
        """Build (or fetch) the jitted multi-chip program for the plan's
        static configuration; rounds qpb_pad to query-chunk granularity."""
        from tpulmi.parallel.sharded import make_sharded_search_program

        built = self.built
        sstore, mesh = self._sharded
        # the probe pipeline reshapes (n_qchunks, qc) -> qpb_pad rows, so
        # the pad must be a whole number of query chunks (512 inside the
        # sharded program) — same rounding as the flat path
        plan.qpb_pad = (-(-plan.qpb_pad // min(512, plan.qpb_pad))
                        * min(512, plan.qpb_pad))
        prog_key = (plan.backend, n_buckets, plan.k_eff, plan.qpb_pad,
                    plan.data_chunk, plan.max_chunks,
                    scfg.compute_dtype, scfg.probe_mass, scfg.int8_queries,
                    scfg.pallas_extract, plan.pallas_qc, scfg.pallas_mc,
                    plan.pallas_pair)
        program = self._sharded_programs.get(prog_key)
        if program is None:
            program = make_sharded_search_program(
                built.classifier.model, mesh,
                k=plan.k_eff, n_buckets=n_buckets, qpb_pad=plan.qpb_pad,
                data_chunk=plan.data_chunk, max_chunks=plan.max_chunks,
                cat_pad=sstore.cat_pad, rows=sstore.rows,
                pad_rows=sstore.pad_rows,
                quantized=sstore.scales is not None,
                compute_dtype=plan.compute_dtype,
                probe_mass=scfg.probe_mass,
                quant_bits=sstore.quant_bits,
                backend=plan.backend,
                row_align=sstore.row_align,
                pallas_qc=plan.pallas_qc,
                pallas_mc=scfg.pallas_mc,
                pallas_max_chunks=plan.pallas_max_chunks,
                pallas_int8_queries=scfg.int8_queries,
                pallas_extract=scfg.pallas_extract,
                pallas_pair=plan.pallas_pair,
            )
            self._sharded_programs[prog_key] = program
        return program

    def _sharded_args(self, queries_nav, queries_search):
        sstore, _ = self._sharded
        args = [self.built.classifier.params, queries_nav, queries_search,
                sstore.data_sorted, sstore.ids_sorted, sstore.offsets,
                sstore.counts, sstore.bucket_start]
        if sstore.scales is not None:
            args.append(sstore.scales)
        return args

    def _absorb_sharded(self, plan, n_buckets: int, got):
        """Unpack one fetched multi-chip result against the plan; "retry"
        grows the overflowed qpb_pad (the Pallas kernel block-pads its
        layout internally, so overflow cannot occur there)."""
        dists, ids, max_slots = got
        if plan.backend == "pallas" or int(max_slots) <= plan.qpb_pad:
            self._qpb_pads[("sharded", plan.q, n_buckets)] = plan.qpb_pad
            return dists, ids
        plan.qpb_pad = size_class(int(max_slots))
        return "retry"

    def _search_sharded(self, queries_nav, queries_search, n_buckets: int,
                        k: int, scfg,
                        host_queries=None) -> Tuple[np.ndarray, np.ndarray]:
        plan = self._plan_sharded(queries_nav, n_buckets, k, scfg)
        while True:
            program = self._dispatch_sharded(plan, n_buckets, scfg)
            out = program(*self._sharded_args(queries_nav, queries_search))
            status = self._absorb_sharded(
                plan, n_buckets, self._fetch_result(out, plan))
            if status != "retry":
                dists, ids = status
                break
        return self._finalize(dists, ids, plan, k, scfg, queries_search,
                              host_queries)

    # ----------------------------------------------------------------- search
    def search(
        self,
        queries_nav,
        queries_search=None,
        n_buckets: int = 4,
        k: int = 10,
        search_config: Optional[SearchConfig] = None,
        queries_search_host=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """k-NN search probing the top-`n_buckets` routed buckets per query.
        Returns (dists, anns) with **1-based** `anns`, shapes (Q, k) — the
        reference's `search` contract (`search/li/LearnedIndex.py:22-101`).
        `n_buckets=1` is the reference's `search_single` fast path.

        ``queries_search_host``: optional host-side (numpy) mirror of
        ``queries_search``, used by the quantized-store rerank so it never
        downloads the query batch from device. When ``queries_search`` is
        already a host array the mirror is captured automatically."""
        if self.built is None:
            raise ValueError("Index is not built, call `build` first.")
        scfg = search_config or SearchConfig(k=k, n_buckets=n_buckets)
        built = self.built
        # Scan counters are per-call state: reset up front so paths that
        # never count (sharded, pallas) can't leak a previous flat pruned
        # search's totals — the batched loop below SUMS whatever it reads.
        self.last_scan_rows = self.last_nominal_rows = None

        queries_nav = jnp.asarray(queries_nav, jnp.float32)
        if queries_search is None:
            queries_search = queries_nav
        if queries_search_host is None and isinstance(
                queries_search, np.ndarray):
            queries_search_host = queries_search
        queries_search = jnp.asarray(queries_search, jnp.float32)

        # very large query sets: split into fixed batches (bounds the device
        # working set and reuses one compiled program per batch shape)
        bq = scfg.batch_queries
        if bq and queries_nav.shape[0] > bq:
            parts = []
            scan_tot = nom_tot = 0
            any_stats = False
            for lo in range(0, queries_nav.shape[0], bq):
                parts.append(self.search(
                    queries_nav[lo:lo + bq], queries_search[lo:lo + bq],
                    n_buckets=n_buckets, k=k, search_config=scfg,
                    queries_search_host=(
                        queries_search_host[lo:lo + bq]
                        if queries_search_host is not None else None)))
                if getattr(self, "last_scan_rows", None) is not None:
                    any_stats = True
                    scan_tot += self.last_scan_rows
                    nom_tot += self.last_nominal_rows
            self.last_scan_rows = scan_tot if any_stats else None
            self.last_nominal_rows = nom_tot if any_stats else None
            return (np.concatenate([p[0] for p in parts]),
                    np.concatenate([p[1] for p in parts]))

        n_buckets = min(n_buckets, built.store.n_categories)
        if self._sharded is not None:
            return self._search_sharded(
                queries_nav, queries_search, n_buckets, k, scfg,
                host_queries=queries_search_host,
            )
        plan = self._plan_search(queries_nav, n_buckets, k, scfg)
        while True:
            program = self._dispatch_program(plan, n_buckets, scfg)
            out = program(
                built.classifier.params, queries_nav, queries_search, built.store
            )
            got = self._fetch_result(out, plan)
            status = self._absorb_result(plan, n_buckets, got)
            if status == "retry":
                continue
            dists, ids = status
            break
        return self._finalize(dists, ids, plan, k, scfg, queries_search,
                              queries_search_host)

    def _plan_search(self, queries_nav, n_buckets: int, k: int,
                     scfg: SearchConfig):
        """Resolve every static decision one probe-search dispatch needs —
        backend, rerank depth, padding classes, pruning flags — into a
        mutable plan shared by `search` (with its overflow-retry loop) and
        `search_stream` (which dispatches ahead of synchronization)."""
        built = self.built
        compute_dtype = (
            jnp.dtype(scfg.compute_dtype) if scfg.compute_dtype else None
        )

        # quantized stores with a host corpus attached: fetch extra
        # candidates and rerank them at full precision on the host
        rerank = (scfg.rerank and built.store.is_quantized
                  and self._host_corpus is not None)
        k_eff = k + self._resolve_rerank_extra(scfg) if rerank else k

        # backend: the fused Pallas kernel needs lane-aligned dims and a
        # block-aligned store; "auto" uses it off-CPU whenever it applies
        backend = scfg.backend
        if backend == "auto":
            pallas_ok = (
                built.store.dim % 128 == 0
                and built.store.row_align % scfg.pallas_mc == 0
                and built.store.data_sorted.shape[0] % scfg.pallas_mc == 0
                and k_eff <= 128
                # int8 scales arrive in (mc/128, 128) tiles: mc % 1024 == 0
                and (not built.store.is_quantized
                     or scfg.pallas_mc % 1024 == 0)
                and jax.devices()[0].platform != "cpu"
            )
            backend = "pallas" if pallas_ok else "xla"

        # scoped-VMEM eligibility: re-tile (or decline pair) instead of
        # dispatching a guaranteed backend crash (ops/pallas_topk.py).
        # Resolved BEFORE the worklist pad, whose step count halves under
        # the paired grid.
        pallas_pair, pallas_qc = scfg.pallas_pair, scfg.pallas_qc
        if backend == "pallas":
            pallas_pair, pallas_qc = self._resolve_pallas_tiling(
                scfg, d=built.store.dim,
                d_stored=int(built.store.data_sorted.shape[1]),
                quantized=built.store.is_quantized)

        q = int(queries_nav.shape[0])
        n_slots = q * n_buckets
        # Static padding classes. data_chunk/max_chunks depend only on the
        # store (known since build); qpb_pad depends on how skewed the
        # routing of THIS query batch is — start from a 4x-mean guess (or a
        # previously validated value) and let the program report the true
        # max so an overflow triggers one re-padded rerun. No per-call host
        # sync is needed on the steady-state path.
        data_chunk = min(scfg.data_chunk, size_class(max(built.max_bucket, 1)),
                         int(built.store.data_sorted.shape[0]))
        max_chunks = max(-(-built.max_bucket // data_chunk), 1)
        qpb_pad = scfg.queries_per_bucket_pad or self._qpb_pads.get(
            (q, n_buckets),
            size_class(min(n_slots,
                           max(4 * n_slots // built.store.n_categories, 128))),
        )

        # flat-worklist grid for the Pallas kernel: sized from this batch's
        # actual routing on first use (one extra routing dispatch), cached,
        # and re-run once larger if a later batch's true total overflows it.
        # Cached -1 = disabled for this shape (would exceed the SMEM cap).
        wl_pad = 0
        if backend == "pallas" and scfg.pallas_worklist:
            wl_pad = self._wl_pads.get((q, n_buckets))
            if wl_pad is None:
                wl_pad = self._estimate_wl_pad(queries_nav, n_buckets, scfg,
                                               pair=pallas_pair)
                self._wl_pads[(q, n_buckets)] = wl_pad or -1
            elif wl_pad < 0:
                wl_pad = 0

        # threshold pruning: only meaningful past the first probe ranks, on
        # the XLA pipeline, with bounds precomputed (compute_bounds())
        pruning = (scfg.prune_after > 0 and backend == "xla"
                   and built.store.has_bounds
                   and n_buckets > scfg.prune_after)
        truncating = scfg.probe_mass is not None
        # scan counters exist only on the XLA pipeline (the Pallas kernel
        # returns its 3-tuple; truncation still applies inside it)
        want_stats = pruning or (truncating and backend == "xla")
        if scfg.prune_eps is not None:
            prune_eps = float(scfg.prune_eps)
        elif scfg.compute_dtype == "bfloat16":
            prune_eps = 5e-3   # bf16 matmul inputs round sims by ~2e-3
        else:
            prune_eps = 1e-4

        # rerank pool: kernel tracks exact top-k, pool lanes supply the
        # rerank extras (group-harvest modes only — scalar never
        # materializes the per-class minima)
        pallas_pool_k = (k if (scfg.pallas_pool and backend == "pallas"
                               and rerank and k_eff > k
                               and scfg.pallas_extract in ("group", "group2"))
                         else 0)

        return SimpleNamespace(
            q=q, backend=backend, rerank=rerank, k_eff=k_eff,
            compute_dtype=compute_dtype, data_chunk=data_chunk,
            max_chunks=max_chunks, qpb_pad=qpb_pad, wl_pad=wl_pad,
            pruning=pruning, prune_eps=prune_eps, want_stats=want_stats,
            pallas_max_chunks=max(-(-built.max_bucket // scfg.pallas_mc), 1),
            pallas_pool_k=pallas_pool_k,
            pallas_pair=pallas_pair, pallas_qc=pallas_qc,
        )

    def _resolve_pallas_tiling(self, scfg: SearchConfig, *, d: int,
                               d_stored: int, quantized: bool):
        """Apply the kernel's scoped-VMEM model to the requested
        (pallas_pair, pallas_qc): pair degrades to a smaller query block
        when one fits the budget and to the single-ref grid when none does
        (each logged once per config). The paired bf16 grid at the default
        qc=512 tiles is the hardware-observed crash this absorbs
        (BENCH_r04.json tail: Mosaic scoped-VMEM 18.40M > 16.00M)."""
        from tpulmi.ops.pallas_topk import resolve_tiling

        cd = (jnp.dtype(scfg.compute_dtype) if scfg.compute_dtype
              else jnp.dtype(jnp.float32))
        q_isz = 1 if (scfg.int8_queries and quantized) else cd.itemsize
        d_isz = 1 if quantized else cd.itemsize
        pair, qc = resolve_tiling(
            scfg.pallas_qc, scfg.pallas_mc, d=d, d_stored=d_stored,
            q_itemsize=q_isz, data_itemsize=d_isz, quantized=quantized,
            pair=scfg.pallas_pair)
        key = (scfg.pallas_pair, scfg.pallas_qc, scfg.pallas_mc, cd.str,
               quantized, scfg.int8_queries)
        if ((pair, qc) != (scfg.pallas_pair, scfg.pallas_qc)
                and key not in self._vmem_warned):
            self._vmem_warned.add(key)
            if scfg.pallas_pair and not pair:
                log.warning(
                    "pallas_pair declined: the paired grid exceeds the "
                    "scoped-VMEM budget at every query-block size for "
                    "mc=%d, d=%d, %s store — running the single-ref grid",
                    scfg.pallas_mc, d, "int8" if quantized else cd.name)
            else:
                log.info(
                    "pallas tiling: qc %d -> %d to fit the scoped-VMEM "
                    "budget (mc=%d, d=%d, pair=%s)",
                    scfg.pallas_qc, qc, scfg.pallas_mc, d, pair)
        return pair, qc

    def _dispatch_program(self, plan, n_buckets: int, scfg: SearchConfig):
        """Build (or fetch from the per-index cache) the jitted search
        program for the plan's current static configuration. Rounds the
        plan's qpb_pad up to the query-chunk granularity in place."""
        built = self.built
        query_chunk = min(scfg.query_chunk, plan.qpb_pad)
        plan.qpb_pad = -(-plan.qpb_pad // query_chunk) * query_chunk
        prog_key = (plan.backend, n_buckets, plan.k_eff, plan.qpb_pad,
                    plan.data_chunk, plan.max_chunks, query_chunk,
                    scfg.compute_dtype,
                    (scfg.prune_after, plan.prune_eps) if plan.pruning
                    else None,
                    scfg.probe_mass, scfg.int8_queries, scfg.pallas_extract,
                    plan.wl_pad, scfg.fetch_dtype, plan.pallas_pool_k,
                    plan.pallas_pair, plan.pallas_qc)
        program = self._search_programs.get(prog_key)
        if program is None:
            program = make_search_program(
                built.classifier.model,
                k=plan.k_eff,
                n_buckets=n_buckets,
                qpb_pad=plan.qpb_pad,
                data_chunk=plan.data_chunk,
                max_chunks=plan.max_chunks,
                query_chunk=query_chunk,
                compute_dtype=plan.compute_dtype,
                backend=plan.backend,
                pallas_qc=plan.pallas_qc,
                pallas_mc=scfg.pallas_mc,
                pallas_max_chunks=plan.pallas_max_chunks,
                pallas_int8_queries=scfg.int8_queries,
                pallas_extract=scfg.pallas_extract,
                pallas_wl_pad=plan.wl_pad,
                pallas_pool_k=plan.pallas_pool_k,
                pallas_pair=plan.pallas_pair,
                prune_after=scfg.prune_after if plan.pruning else 0,
                prune_eps=plan.prune_eps,
                probe_mass=scfg.probe_mass,
                fetch_dtype=scfg.fetch_dtype,
            )
            self._search_programs[prog_key] = program
        return program

    def _fetch_result(self, out, plan):
        """Fetch a search program's result tuple from device. When the plan
        reranks, the quantized device distances are dead weight — the host
        rerank recomputes every kept candidate's distance exactly — so their
        download (Q x k_eff f32, the largest leaf, e.g. 800 KB at 10k x 20;
        ~65 ms at this environment's relay rates) is skipped entirely."""
        if plan.rerank:
            return (None,) + tuple(jax.device_get(out[1:]))
        return jax.device_get(out)

    def _absorb_result(self, plan, n_buckets: int, got):
        """Unpack one fetched program result against the plan. Returns
        (dists, ids) on success, or "retry" after growing the plan's
        overflowed pad (worklist or queries-per-bucket) for a re-dispatch."""
        if plan.wl_pad:
            dists, ids, max_slots, wl_total = got
            if int(wl_total) > plan.wl_pad:
                # worklist overflow drops trailing work: re-run larger —
                # or fall back to the dense grid past the chunked ceiling
                steps_max = (-(-plan.pallas_max_chunks // 2)
                             if plan.pallas_pair else plan.pallas_max_chunks)
                from tpulmi.ops.pallas_topk import wl_item_cap
                cap = wl_item_cap(steps_max)
                grown = max(
                    -(-int(int(wl_total) * 1.15) // 1024) * 1024, 1024)
                plan.wl_pad = grown if grown <= cap else 0
                self._wl_pads[(plan.q, n_buckets)] = plan.wl_pad or -1
                return "retry"
        elif plan.want_stats:
            dists, ids, max_slots, scanned, nominal = got
            self.last_scan_rows = int(scanned)
            self.last_nominal_rows = int(nominal)
        else:
            dists, ids, max_slots = got
        if plan.backend == "pallas" or int(max_slots) <= plan.qpb_pad:
            # the pallas worklist is per-bucket block-padded internally —
            # qpb_pad overflow cannot occur there
            self._qpb_pads[(plan.q, n_buckets)] = plan.qpb_pad
            return dists, ids
        plan.qpb_pad = size_class(int(max_slots))  # overflow: re-pad, rerun
        return "retry"

    def _finalize(self, dists, ids, plan, k: int, scfg: SearchConfig,
                  queries_search, queries_search_host):
        """Host post-processing shared by `search` and `search_stream`:
        optional exact rerank, sentinel clamping, 1-based ids."""
        if plan.rerank:
            # dists may be None here: _fetch_result skips the quantized
            # device distances (the rerank recomputes every kept one)
            dists, ids = self._rerank_host(
                None, np.asarray(ids), queries_search, k,
                host_queries=queries_search_host,
                rerank_dtype=scfg.rerank_dtype,
            )
        # empty result slots (id -1) keep the sentinel distance; clamp the id
        # into range the way the reference edge-pads sub-k buckets
        # (`search/li/LearnedIndex.py:174-190`).
        ids = np.where(ids < 0, 0, ids)
        # fetch_dtype narrows only the wire format: upcast on host so the
        # public API dtype is stable (values keep the narrow rounding)
        return (np.asarray(dists, np.float32),
                np.asarray(ids).astype(np.int64) + 1)

    def search_stream(
        self,
        batches: Iterable,
        *,
        n_buckets: int = 10,
        k: int = 10,
        search_config: Optional[SearchConfig] = None,
        depth: int = 2,
        overlap_finalize: bool = True,
    ):
        """Pipelined serving loop: a generator yielding `search`'s exact
        (dists, 1-based anns) per input batch, in order, with up to
        ``depth`` device dispatches in flight.

        `search` synchronizes every call (dispatch → fetch → host
        post-process), so per-call host↔device latency and the host-side
        rerank serialize with device compute. Here batch *i+1* is enqueued
        BEFORE batch *i*'s results are fetched — XLA's async dispatch keeps
        the device busy while the host fetches, reranks, and yields — the
        double-buffered pattern TPU serving loops use. On this repo's
        relay-attached environment the per-dispatch round trip (~65 ms,
        NOTES.md) dominates small-batch searches; production-adjacent
        sustained throughput is this loop's steady rate, reported by
        bench.py alongside the single-call latency.

        ``batches`` yields ``(queries_nav, queries_search)`` or
        ``(queries_nav, queries_search, queries_search_host)`` tuples
        (the 3rd element as in `search`). Fixed batch shapes reuse one
        compiled program; a new shape pays its compile at first use.

        The first batch of each (Q, n_buckets) shape routes through
        `search` to validate padding classes; later batches dispatch ahead
        and fall back to a synchronous `search` only on a (rare) pad
        overflow. Scan counters (`last_scan_rows`) are not maintained
        across in-flight batches. Sharded indexes (`shard`) pipeline the
        same way through the multi-chip program (plan → dispatch → absorb
        mirror the flat path's).

        ``overlap_finalize`` moves the host post-process — most
        importantly the exact rerank, a 0.3-0.5 s single-core wall per
        10k-query batch at 10M+ (BENCH_10M.md) — into a single worker
        thread, so batch *i*'s rerank (CPU) runs concurrently with batch
        *i+1*'s device fetch (network wait on the relay, GIL released):
        the per-batch wall becomes max(fetch, rerank) instead of their
        sum. Dispatch, fetch, and the (rare) pad-overflow retry stay on
        the caller's thread; only `_finalize` — pure host numpy/torch on
        already-fetched arrays — crosses threads, and the single worker
        preserves result order."""
        if self.built is None:
            raise ValueError("Index is not built, call `build` first.")
        scfg = search_config or SearchConfig(k=k, n_buckets=n_buckets)
        built = self.built
        nb = min(n_buckets, built.store.n_categories)
        pending = deque()   # dispatched device work, ≤ depth in flight
        results = deque()   # ordered finalize futures, ≤ 2 in flight
        executor = None
        if overlap_finalize:
            from concurrent.futures import ThreadPoolExecutor

            executor = ThreadPoolExecutor(max_workers=1)

        def unpack(batch):
            if len(batch) == 3:
                qn, qs, qh = batch
            else:
                qn, qs = batch
                qh = None
            if qs is None:
                qs = qn
            if qh is None and isinstance(qs, np.ndarray):
                qh = qs
            return (jnp.asarray(qn, jnp.float32),
                    jnp.asarray(qs, jnp.float32), qh)

        def sync_one():
            """Fetch + absorb the oldest in-flight batch; hand its host
            post-process to the worker. Returns a future."""
            qn, qs, qh, out, plan, sharded = pending.popleft()
            absorb = self._absorb_sharded if sharded else self._absorb_result
            status = absorb(plan, nb, self._fetch_result(out, plan))
            if status == "retry":
                # pad overflow: the plan (and its cache) already grew;
                # redo just this batch synchronously on this thread (a
                # re-dispatch must not race the main dispatch loop)
                got = self.search(qn, qs, n_buckets=nb, k=k,
                                  search_config=scfg,
                                  queries_search_host=qh)
                return _done(got)
            if executor is not None:
                return executor.submit(self._finalize, status[0], status[1],
                                       plan, k, scfg, qs, qh)
            return _done(self._finalize(status[0], status[1], plan, k, scfg,
                                        qs, qh))

        def _done(value):
            from concurrent.futures import Future

            f = Future()
            f.set_result(value)
            return f

        try:
            for batch in batches:
                qn, qs, qh = unpack(batch)
                q = int(qn.shape[0])
                sharded = self._sharded is not None
                pad_key = ("sharded", q, nb) if sharded else (q, nb)
                if ((scfg.batch_queries and q > scfg.batch_queries)
                        or pad_key not in self._qpb_pads):
                    # drain in-flight work so results stay ordered, then
                    # take the synchronous path (validates pads / compiles
                    # programs for a first-seen shape; handles oversized)
                    while pending:
                        results.append(sync_one())
                    while results:
                        yield results.popleft().result()
                    yield self.search(qn, qs, n_buckets=nb, k=k,
                                      search_config=scfg,
                                      queries_search_host=qh)
                    continue
                if sharded:
                    plan = self._plan_sharded(qn, nb, k, scfg)
                    program = self._dispatch_sharded(plan, nb, scfg)
                    out = program(*self._sharded_args(qn, qs))
                else:
                    plan = self._plan_search(qn, nb, k, scfg)
                    program = self._dispatch_program(plan, nb, scfg)
                    out = program(built.classifier.params, qn, qs,
                                  built.store)
                pending.append((qn, qs, qh, out, plan, sharded))
                if len(pending) >= depth:
                    results.append(sync_one())
                # keep one finalize in flight: yielding the OLDER future
                # lets the newest rerank overlap the next batch's fetch
                while len(results) > 1:
                    yield results.popleft().result()
            while pending:
                results.append(sync_one())
            while results:
                yield results.popleft().result()
        finally:
            if executor is not None:
                executor.shutdown(wait=False)

    def _estimate_wl_pad(self, queries_nav, n_buckets: int,
                         scfg: SearchConfig, pair: bool = False) -> int:
        """Size the Pallas flat-worklist grid from this batch's ACTUAL
        routing: W = Σ_b ceil(slots_b/qc) · max(ceil(rows_b/mc), 1) over
        probed buckets — the closed form of the kernel's block-major
        worklist (`ops/pallas_topk.py`). One extra routing dispatch, paid
        once per (Q, n_buckets) shape; 15% headroom absorbs routing
        variance across later batches (overflow re-runs once, larger).

        Returns 0 — keep the dense grid — when the padded worklist would
        exceed the chunked ceiling (`wl_item_cap`: WL_SEGMENTS_MAX
        block-aligned SMEM segments of WL_PAD_MAX items each,
        ops/pallas_topk.py)."""
        from tpulmi.search import route_probes, routing_logits

        built = self.built
        clf = built.classifier
        logits, mass = routing_logits(
            clf.model, clf.params, queries_nav,
            need_mass=scfg.probe_mass is not None)
        probes = route_probes(
            logits, n_buckets, probe_mass=scfg.probe_mass,
            dump_id=built.store.n_categories, mass_logits=mass)
        n_cat = built.store.n_categories
        pb = np.asarray(jax.device_get(probes)).reshape(-1)
        sc = np.bincount(pb[pb < n_cat], minlength=n_cat)
        counts = np.asarray(jax.device_get(built.store.counts))
        qc, mc = scfg.pallas_qc, scfg.pallas_mc
        ndb = -(-counts // mc)
        if pair:  # grid steps advance two chunks at a time
            ndb = -(-ndb // 2)
        ndb = np.maximum(ndb, 1)
        w = int(np.sum((-(-sc // qc)) * ndb * (sc > 0)))
        pad = max(-(-int(w * 1.15) // 1024) * 1024, 1024)
        from tpulmi.ops.pallas_topk import wl_item_cap
        cap = wl_item_cap(int(ndb.max()) if ndb.size else 1)
        if pad > cap:
            log.info(
                "flat worklist would need %d items (> the %d-item chunked "
                "ceiling); keeping the dense grid for this shape", pad, cap)
            return 0
        return pad

    def search_single(
        self,
        queries_nav,
        queries_search=None,
        k: int = 10,
        search_config: Optional[SearchConfig] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Probe only each query's single most-likely bucket — the
        reference's `search_single` fast path (`search/li/LearnedIndex.py:103`,
        used when bp resolves to one bucket, `search/search.py:129-140`)."""
        return self.search(
            queries_nav, queries_search, n_buckets=1, k=k,
            search_config=search_config,
        )

    def cluster(self, data, n_clusters: int):
        """Cluster `data` with the TPU k-means; returns (centroids, labels) —
        the reference's `cluster()` contract (`search/li/LearnedIndex.py:242-282`,
        faiss.Kmeans replaced by MXU Lloyd iterations)."""
        return kmeans(
            jnp.asarray(data, jnp.float32),
            n_clusters,
            iters=self.config.kmeans_iters,
            seed=self.config.seed,
            max_points_per_centroid=self.config.kmeans_max_points_per_centroid,
        )

    # ------------------------------------------------------------ checkpoint
    @staticmethod
    def _corpus_fingerprint(corpus) -> dict:
        """Cheap identity for a host rerank corpus: shape + a hash of three
        sampled rows. Enough to catch attaching the wrong corpus without
        reading all of it."""
        import hashlib

        n, d = int(corpus.shape[0]), int(corpus.shape[1])
        h = hashlib.sha1()
        for i in (0, n // 2, n - 1):
            h.update(np.ascontiguousarray(
                np.asarray(corpus[i], np.float32)).tobytes())
        return {"n": n, "d": d, "rows_sha1": h.hexdigest()}

    def attach_host_corpus(self, corpus, normalized: bool = False) -> None:
        """Attach (or re-attach) the host-resident full-precision corpus
        used for the exact rerank of quantized search results. Validated
        against the checkpoint's fingerprint when one was restored."""
        meta = getattr(self, "_rerank_meta", None)
        if meta is not None:
            fp = self._corpus_fingerprint(corpus)
            if fp != meta.get("fingerprint", fp):
                raise ValueError(
                    "host corpus does not match the checkpointed rerank "
                    f"fingerprint: got {fp}, expected {meta['fingerprint']}"
                )
            normalized = bool(meta.get("normalized", normalized))
        self._host_corpus = (corpus, normalized)

    def save(self, path: str, include_corpus: bool = False) -> None:
        """Checkpoint the built index (centroids, classifier params, bucket
        store) with orbax. Unlike the reference's pickle-only save
        (`search/li/utils.py:46-60`), this round-trips via `load`.

        Quantized indexes carry a host rerank corpus; its *contract*
        (fingerprint + source path when the corpus is a memmap) is always
        recorded so `load` can reattach it or warn. `include_corpus=True`
        additionally copies the corpus into the checkpoint (corpus.npy) for
        a fully self-contained restore."""
        if self.built is None:
            raise ValueError("Nothing to save, call `build` first.")
        import orbax.checkpoint as ocp

        path = Path(path).absolute()
        built = self.built
        state = {
            "centroids": built.centroids,
            "params": built.classifier.params,
            "pred_categories": built.pred_categories,
            "store": {
                "data_sorted": built.store.data_sorted,
                "ids_sorted": built.store.ids_sorted,
                "offsets": built.store.offsets,
                "counts": built.store.counts,
                **({"scales": built.store.scales}
                   if built.store.scales is not None else {}),
                **({"bucket_centroids": built.store.bucket_centroids,
                    "bucket_cos_r": built.store.bucket_cos_r,
                    "bucket_max_norm": built.store.bucket_max_norm}
                   if built.store.has_bounds else {}),
            },
        }
        meta = {
            "config": built.config.to_dict(),
            "input_dim": built.classifier.input_dim,
            "n_classes": built.classifier.n_classes,
            "model_type": built.classifier.model_type,
            "store_n": built.store.n,
            "store_pad_rows": built.store.pad_rows,
            "store_row_align": built.store.row_align,
            "store_quant_bits": built.store.quant_bits,
            "version": 2,
        }
        if self._host_corpus is not None:
            corpus, normalized = self._host_corpus
            src = getattr(corpus, "filename", None)
            meta["rerank"] = {
                "normalized": bool(normalized),
                "fingerprint": self._corpus_fingerprint(corpus),
                "corpus_path": str(src) if src else None,
            }
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(path / "state", state, force=True)
        ckpt.wait_until_finished()
        if include_corpus and self._host_corpus is not None:
            np.save(path / "corpus.npy", np.asarray(self._host_corpus[0]))
        with open(path / "meta.json", "w") as f:
            json.dump(meta, f)

    @staticmethod
    def _load_state(path: Path):
        """Restore the orbax state + JSON metadata (shared by the flat and
        hierarchical load paths)."""
        import orbax.checkpoint as ocp

        with open(path / "meta.json") as f:
            meta = json.load(f)
        ckpt = ocp.StandardCheckpointer()
        try:
            state = ckpt.restore(path / "state")
        except ValueError:
            # Checkpoint written on a different backend (e.g. built on TPU,
            # restored on CPU): orbax replays the saved device sharding and
            # fails. Rebuild the target from metadata with local-device
            # sharding instead.
            from jax.sharding import SingleDeviceSharding

            dev = jax.devices()[0]
            meta_tree = ckpt.metadata(path / "state").item_metadata
            target = jax.tree_util.tree_map(
                lambda m: jax.ShapeDtypeStruct(
                    m.shape, m.dtype, sharding=SingleDeviceSharding(dev)
                ),
                dict(meta_tree.tree) if hasattr(meta_tree, "tree") else meta_tree,
            )
            state = ckpt.restore(path / "state", target)
        return meta, state

    @staticmethod
    def _restore_rerank(index: "LearnedIndex", meta: dict, path: Path) -> None:
        """Reattach the host rerank corpus of a quantized checkpoint, or
        warn LOUDLY that restored searches will be quantized-only. Tries,
        in order: corpus.npy inside the checkpoint (written by
        ``save(include_corpus=True)``), then the recorded source path of a
        memmap corpus. Fingerprint-validated either way."""
        rer = meta.get("rerank")
        if not rer:
            return
        index._rerank_meta = rer
        candidates = [path / "corpus.npy"]
        if rer.get("corpus_path"):
            candidates.append(Path(rer["corpus_path"]))
        for cand in candidates:
            if not cand.exists():
                continue
            try:
                corpus = np.load(cand, mmap_mode="r")
                index.attach_host_corpus(corpus)
                log.info("rerank corpus reattached from %s", cand)
                return
            except (ValueError, OSError) as e:
                log.warning("rerank corpus at %s rejected: %s", cand, e)
        log.warning(
            "QUANTIZED index restored WITHOUT its rerank corpus: searches "
            "will run on int8 codes only (recall drops ~1e-3 distance "
            "error). Call attach_host_corpus(corpus) to restore the exact "
            "rerank (expected corpus: %s).", rer.get("fingerprint"),
        )

    @classmethod
    def load(cls, path: str) -> "LearnedIndex":
        """Restore a saved index — the resume path the reference lacks."""
        path = Path(path).absolute()
        meta, state = cls._load_state(path)

        cfg = IndexConfig(**meta["config"])
        index = LearnedIndex(cfg)
        classifier = BucketClassifier(
            input_dim=meta["input_dim"],
            n_classes=meta["n_classes"],
            lr=cfg.lr,
            model_type=meta["model_type"],
            seed=cfg.seed,
        )
        classifier.params = jax.device_put(state["params"])
        store = BucketStore(
            data_sorted=jnp.asarray(state["store"]["data_sorted"]),
            ids_sorted=jnp.asarray(state["store"]["ids_sorted"]),
            offsets=jnp.asarray(state["store"]["offsets"]),
            counts=jnp.asarray(state["store"]["counts"]),
            n=int(meta["store_n"]),
            pad_rows=int(meta["store_pad_rows"]),
            # older round-1 checkpoints predate the recorded alignment;
            # row_align=1 conservatively routes them to the XLA backend
            row_align=int(meta.get("store_row_align", 1)),
            scales=(jnp.asarray(state["store"]["scales"])
                    if "scales" in state.get("store", {}) else None),
            quant_bits=int(meta.get("store_quant_bits", 8)),
            **{f: jnp.asarray(state["store"][f])
               for f in ("bucket_centroids", "bucket_cos_r",
                         "bucket_max_norm")
               if f in state.get("store", {})},
        )
        index.built = BuiltIndex(
            centroids=jnp.asarray(state["centroids"]),
            classifier=classifier,
            store=store,
            pred_categories=jnp.asarray(state["pred_categories"]),
            config=cfg,
            max_bucket=int(jax.device_get(store.counts.max())),
        )
        cls._restore_rerank(index, meta, path)
        return index
