"""tpulmi benchmark — the reference's 300K headline workload shape on TPU.

Reference numbers (`/root/reference/README.md:33-35`, BASELINE.md): LAION-300K,
122 leaves, MLP(256,128), bp=6 → 7 probed buckets, 10k queries, k=10 on one
EPYC core: search 22.08 s (453 QPS), build 789.06 s, recall@10 91.1 %.

This benchmark runs the identical workload shape — 300K corpus, 96-d
navigation + 768-d search embeddings, 122 buckets, 7 probes, 10k queries —
on synthetic clustered data (the real LAION subsets need S3 access; this
environment has no egress). Difficulty is calibrated so the learned index
operates in the same recall regime (~0.9+ @ 7/122 probes). Recall is
measured against the exact brute-force oracle on the same data and is
printed alongside; a run that fails the recall gate reports vs_baseline=0.

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "queries/s", "vs_baseline": x vs 453 QPS, ...}
"""

import json
import os
import sys
import time

import numpy as np

# Persistent compilation cache: the remote-compile path of this environment
# costs 10-40 s per program; the cache drops warm-process compiles to ~0.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
# The remote compile is asynchronous, so measured compile times can read ~0;
# a nonzero threshold would silently skip persisting the expensive programs.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from tpulmi.data import synthetic_dataset  # noqa: E402
from tpulmi.index import LearnedIndex  # noqa: E402
from tpulmi.ops.distance import exact_knn  # noqa: E402
from tpulmi.utils.config import IndexConfig  # noqa: E402

# ---- reference workload shape (300K config) ----
N = 300_000
N_QUERIES = 10_000
D_NAV = 96
D_SEARCH = 768
N_CATEGORIES = 122
N_PROBES = 7          # reference bp=6 → int(0.06*122) = 7 probed buckets
K = 10
SEED = 2023

REF_SEARCH_S = 22.08  # reference search wall-clock for the same workload
REF_QPS = N_QUERIES / REF_SEARCH_S
REF_BUILD_S = 789.06
RECALL_GATE = 0.90


def _ground_truth(ds, cache_dir=".bench_cache"):
    """Exact oracle k-NN, cached on disk (deterministic synthetic data)."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(
        cache_dir, f"gt_n{N}_q{N_QUERIES}_d{D_SEARCH}_s{SEED}_k{K}.npz"
    )
    if os.path.exists(path):
        z = np.load(path)
        return z["ids"]
    _, ids = exact_knn(ds["queries_search"], ds["data_search"], k=K,
                       normalized=True)
    ids = np.asarray(jax.device_get(ids)) + 1  # 1-based like the index output
    np.savez_compressed(path, ids=ids)
    return ids


def main():
    from tpulmi.utils.backend_retry import ensure_backend
    ensure_backend()
    t_gen = time.perf_counter()
    ds = synthetic_dataset(
        n=N, n_queries=N_QUERIES, d_nav=D_NAV, d_search=D_SEARCH,
        n_clusters=N_CATEGORIES, seed=SEED,
    )
    t_gen = time.perf_counter() - t_gen

    cfg = IndexConfig(
        n_categories=N_CATEGORIES, epochs=12, lr=0.003, model_type="MLP-5",
        batch_size=1024, seed=SEED,
    )
    li = LearnedIndex(cfg)
    t_build_cold = time.perf_counter()
    li.build(ds["data_nav"], ds["data_search"])
    t_build_cold = time.perf_counter() - t_build_cold
    # Steady-state build: the remote-TPU path of this environment charges
    # minutes of per-process compile/dispatch setup that a resident service
    # amortizes; the second build reuses the compiled program and measures
    # the actual device work (the reference's 789 s contains no compile).
    t_build = time.perf_counter()
    li.build(ds["data_nav"], ds["data_search"])
    t_build = time.perf_counter() - t_build

    # stage queries on device once (the reference also has queries in RAM
    # before its timed search, `search/search.py:49,115`)
    import jax.numpy as jnp
    q_nav = jax.device_put(jnp.asarray(ds["queries_nav"]))
    q_search = jax.device_put(jnp.asarray(ds["queries_search"]))
    jax.device_get(q_search[-1, :1])

    # warmup: pays any remaining compiles
    li.search(q_nav, q_search, n_buckets=N_PROBES, k=K)

    times = []
    for _ in range(3):
        start = time.perf_counter()
        dists, ids = li.search(q_nav, q_search, n_buckets=N_PROBES, k=K)
        times.append(time.perf_counter() - start)
    t_search = min(times)
    qps = N_QUERIES / t_search

    # Sustained serving throughput: the double-buffered pipeline
    # (`search_stream`) keeps the device busy while the host fetches and
    # post-processes the previous batch, so the per-dispatch host<->device
    # round trip (~65 ms on this relay-attached chip — the majority of the
    # single-call wall above) amortizes away. Every batch's results are
    # fetched to host and post-processed inside the timed window; this is
    # the steady rate a resident service sustains, and the headline metric.
    STREAM_BATCHES = 8
    batches = [(q_nav, q_search)] * STREAM_BATCHES
    stream_ids = None
    for _ in range(2):  # second pass is the warm/steady measurement
        start = time.perf_counter()
        for _, s_ids in li.search_stream(batches, n_buckets=N_PROBES, k=K):
            stream_ids = s_ids
        t_stream = time.perf_counter() - start
    sustained_qps = STREAM_BATCHES * N_QUERIES / t_stream

    gt_ids = _ground_truth(ds)
    recall = float(np.mean([
        len(set(ids[i]) & set(gt_ids[i])) / K for i in range(N_QUERIES)
    ]))
    if not np.array_equal(stream_ids, ids):
        # the pipeline must be a pure reordering of `search`
        print("# WARNING: search_stream results differ from search; "
              "sustained number discarded", file=sys.stderr)
        sustained_qps = qps

    # ---- work model: FLOPs and HBM bytes the probe phase must move, and
    # utilization vs the MEASURED chip ceilings (scripts/calib.py: this
    # environment sustains ~82 bf16 TFLOPS / ~196 GB/s, far below v5e paper
    # specs — see NOTES.md) ----
    MEASURED_PEAK_FLOPS, MEASURED_PEAK_BW = 82e12, 196e9
    built = li.built
    from tpulmi.utils.config import SearchConfig as _SC
    from tpulmi.utils.profiling import probe_work_model

    qc, mc = _SC().pallas_qc, _SC().pallas_mc
    logits = built.classifier.model.apply(
        {"params": built.classifier.params}, q_nav)
    _, probes = jax.lax.top_k(logits, N_PROBES)
    slot_counts = np.bincount(
        np.asarray(jax.device_get(probes)).reshape(-1),
        minlength=built.store.n_categories,
    )
    counts = np.asarray(jax.device_get(built.store.counts))
    flops, bytes_hbm = probe_work_model(
        slot_counts, counts, D_SEARCH, qc, mc,
        built.store.data_sorted.dtype.itemsize,
    )

    ok = recall >= RECALL_GATE
    result = {
        "metric": "sustained_search_qps_300K_bp6_recall>=0.90",
        "value": round(sustained_qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(sustained_qps / REF_QPS, 2) if ok else 0.0,
        "recall_at_10": round(recall, 4),
        "single_call_qps": round(qps, 1),
        "search_s_10k_queries": round(t_search, 4),
        "stream_batches": STREAM_BATCHES,
        "build_s": round(t_build, 2),
        "build_s_cold_incl_compile": round(t_build_cold, 2),
        "build_vs_baseline": round(REF_BUILD_S / t_build, 2),
        "ref_search_s": REF_SEARCH_S,
        "ref_build_s": REF_BUILD_S,
        "datagen_s": round(t_gen, 1),
        # probe-phase work model vs measured chip ceilings (NOTES.md)
        "probe_tflop": round(flops / 1e12, 3),
        "probe_gb": round(bytes_hbm / 1e9, 3),
        "mfu_vs_measured_peak": round(flops / t_search / MEASURED_PEAK_FLOPS, 3),
        "hbm_vs_measured_peak": round(bytes_hbm / t_search / MEASURED_PEAK_BW, 3),
        # same work model against the sustained per-batch wall: utilization
        # once the pipeline hides the per-dispatch round trip
        "mfu_sustained": round(
            flops * STREAM_BATCHES / t_stream / MEASURED_PEAK_FLOPS, 3),
        "hbm_sustained": round(
            bytes_hbm * STREAM_BATCHES / t_stream / MEASURED_PEAK_BW, 3),
    }
    print(json.dumps(result))
    sys.stdout.flush()
    return 0 if ok else 1


if __name__ == "__main__":
    # Hard-exit BOTH paths: the remote-backend's atexit teardown can hang
    # for minutes after the result is printed — and equally after an
    # uncaught exception, which would stall an unattended driver run.
    try:
        code = main()
    except BaseException:  # noqa: BLE001
        import traceback
        traceback.print_exc()
        sys.stderr.flush()
        os._exit(1)
    os._exit(code)
