"""tpulmi benchmark — the reference's 300K headline workload shape on TPU.

Reference numbers (`/root/reference/README.md:33-35`, BASELINE.md): LAION-300K,
122 leaves, MLP(256,128), bp=6 → 7 probed buckets, 10k queries, k=10 on one
EPYC core: search 22.08 s (453 QPS), build 789.06 s, recall@10 91.1 %.

This benchmark runs the identical workload shape — 300K corpus, 96-d
navigation + 768-d search embeddings, 122 buckets, 10k queries — on
synthetic clustered data (the real LAION subsets need S3 access; this
environment has no egress). Difficulty is calibrated so the learned index
operates in the same recall regime (~0.9+ @ 7/122 probes). Recall is
measured against the exact brute-force oracle on the same data and is
printed alongside; a run that fails the recall gate reports vs_baseline=0.

The probe budget is swept ascending and the headline runs at the first
budget clearing the 0.90 recall gate (the reference's own recall economics:
its published 300K number is 0.911), followed by serving-loop A/Bs
(f16 distance fetch, flat-worklist kernel grid, probe-mass truncation),
each adopted only when it keeps the gate and wins wall time. The
reference's exact operating shape (bp=6 → 7 probes) is always measured and
reported in `ref_shape_bp6`.

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
REF_PROBES = 7        # reference bp=6 → int(0.06*122) = 7 probed buckets
# Probe budgets swept ascending; the headline runs at the FIRST budget that
# clears the recall gate (time grows monotonically with probes, so the first
# gated budget is the fastest gated one). The reference's own operating
# point (bp=6 → 7 probes, recall 0.911 on real LAION) is measured and
# reported alongside regardless of which budget wins.
PROBE_SWEEP = (1, 2, 3, 4, REF_PROBES)
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

    gt_ids = _ground_truth(ds)

    def _recall(ids):
        return float(np.mean([
            len(set(ids[i]) & set(gt_ids[i])) / K for i in range(N_QUERIES)
        ]))

    from tpulmi.utils.config import SearchConfig

    def run_once(probes, fetch_dtype=None, probe_mass=None, worklist=False,
                 pair=False, warm=False):
        scfg = SearchConfig(k=K, n_buckets=probes, fetch_dtype=fetch_dtype,
                            probe_mass=probe_mass, pallas_worklist=worklist,
                            pallas_pair=pair)
        if warm:  # pays the budget's compile before the timed run
            li.search(q_nav, q_search, n_buckets=probes, k=K,
                      search_config=scfg)
        start = time.perf_counter()
        dists, ids = li.search(q_nav, q_search, n_buckets=probes, k=K,
                               search_config=scfg)
        return time.perf_counter() - start, ids

    # ---- recall-gated probe sweep (ascending: first gated = fastest) ----
    sweep = []
    probes_used = t_search = recall = ids = None
    recall_base = None
    ref_point = None  # the reference's own 7-probe operating shape
    for probes in PROBE_SWEEP:
        t, p_ids = run_once(probes, warm=True)
        for _ in range(2):
            t2, _ = run_once(probes)
            t = min(t, t2)
        r = _recall(p_ids)
        sweep.append({"probes": probes, "search_s": round(t, 4),
                      "recall_at_10": round(r, 4)})
        print(f"# probes={probes}: {t:.4f}s recall {r:.4f}",
              file=sys.stderr, flush=True)
        if probes == REF_PROBES:
            ref_point = {"probes": REF_PROBES, "search_s": round(t, 4),
                         "qps": round(N_QUERIES / t, 1),
                         "recall_at_10": round(r, 4)}
        if probes_used is None and r >= RECALL_GATE:
            probes_used, t_search, recall, ids = probes, t, r, p_ids
            if ref_point is not None:
                break
    if probes_used is None:  # nothing cleared the gate: report the deepest
        probes_used, t_search = REF_PROBES, sweep[-1]["search_s"]
        recall, ids = sweep[-1]["recall_at_10"], p_ids
    recall_base = recall
    qps = N_QUERIES / t_search

    # Sustained serving throughput: the double-buffered pipeline
    # (`search_stream`) keeps the device busy while the host fetches and
    # post-processes the previous batch, so the per-dispatch host<->device
    # round trip (~65 ms on this relay-attached chip — the majority of the
    # single-call wall above) amortizes away. Every batch's results are
    # fetched to host and post-processed inside the timed window; this is
    # the steady rate a resident service sustains, and the headline metric.
    STREAM_BATCHES = 16  # deep enough that startup/drain edges amortize
    STREAM_DEPTH = 3

    def run_stream(fetch_dtype=None, probe_mass=None, worklist=False,
                   pair=False):
        scfg = SearchConfig(k=K, n_buckets=probes_used,
                            fetch_dtype=fetch_dtype, probe_mass=probe_mass,
                            pallas_worklist=worklist, pallas_pair=pair)
        batches = [(q_nav, q_search)] * STREAM_BATCHES
        s_ids = None
        for _ in range(2):  # second pass is the warm/steady measurement
            start = time.perf_counter()
            for _, s_ids in li.search_stream(
                    batches, n_buckets=probes_used, k=K, search_config=scfg,
                    depth=STREAM_DEPTH):
                pass
            t = time.perf_counter() - start
        return t / STREAM_BATCHES, s_ids

    t_batch, stream_ids = run_stream()
    if not np.array_equal(stream_ids, ids):
        # the pipeline must be a pure reordering of `search`
        print("# WARNING: search_stream results differ from search; "
              "sustained number discarded", file=sys.stderr)
        t_batch = t_search
    print(f"# stream base: {t_batch:.4f}s/batch", file=sys.stderr, flush=True)

    # Serving-loop A/Bs at the gated budget, each adopted only when it keeps
    # the recall gate and wins wall time:
    #  - fetch_dtype=f16 halves the fetched distance leaf (ids bit-identical
    #    by construction — asserted);
    #  - pallas_worklist removes the dense grid's skew steps;
    #  - probe_mass lets routed-mass-confident queries drop tail probes (the
    #    flat router's softmax IS a probability here).
    fetch_used, mass_used, wl_used, pair_used = None, None, False, False
    for name, kw in (
        ("fetch_f16", {"fetch_dtype": "float16"}),
        ("worklist", {"worklist": True}),
        ("pair", {"pair": True}),
        ("probe_mass", {"probe_mass": 0.95}),
    ):
        trial = {"fetch_dtype": fetch_used, "probe_mass": mass_used,
                 "worklist": wl_used, "pair": pair_used, **kw}
        try:
            tb, s_ids = run_stream(**trial)
        except Exception as e:  # noqa: BLE001 — A/Bs are best-effort
            print(f"# {name} failed: {e}", file=sys.stderr, flush=True)
            continue
        r = _recall(s_ids)
        print(f"# {name}: {tb:.4f}s/batch recall {r:.4f}",
              file=sys.stderr, flush=True)
        if name == "fetch_f16" and not np.array_equal(s_ids, stream_ids):
            print("# fetch_f16 changed ids — rejected", file=sys.stderr)
            continue
        if r >= RECALL_GATE and tb < t_batch:
            t_batch = tb
            fetch_used = trial["fetch_dtype"]
            mass_used = trial["probe_mass"]
            wl_used = trial["worklist"]
            pair_used = trial["pair"]
            recall = r
    sustained_qps = N_QUERIES / t_batch

    # The single-call and sustained rows each carry their own best
    # recall-gated config. The adopt-on-win loop above optimizes SUSTAINED
    # wall; round 4 then re-measured the single call at that adopted
    # config and reported it even when it lost (152.0k -> 113.5k QPS,
    # BENCH_r03 vs r04) — here the sweep's base-config single call stands
    # unless the adopted config beats it at the gate.
    single_fetch, single_mass, single_wl, single_pair = None, None, False, \
        False
    single_recall = recall_base
    if fetch_used or mass_used or wl_used or pair_used:
        t_try, ids_try = run_once(probes_used, fetch_dtype=fetch_used,
                                  probe_mass=mass_used, worklist=wl_used,
                                  pair=pair_used, warm=True)
        t2, _ = run_once(probes_used, fetch_dtype=fetch_used,
                         probe_mass=mass_used, worklist=wl_used,
                         pair=pair_used)
        t_try = min(t_try, t2)
        r_try = _recall(ids_try)
        print(f"# single-call at sustained config: {t_try:.4f}s recall "
              f"{r_try:.4f} (base {t_search:.4f}s)", file=sys.stderr,
              flush=True)
        if r_try >= RECALL_GATE and t_try < t_search:
            t_search, ids, single_recall = t_try, ids_try, r_try
            single_fetch, single_mass = fetch_used, mass_used
            single_wl, single_pair = wl_used, pair_used
            qps = N_QUERIES / t_search
    if sustained_qps < qps:
        sustained_qps = qps  # pipeline failed to help; keep single-call
        recall = single_recall

    # ---- device-only probe time (kbench-style): dispatch the compiled
    # search program back-to-back so the relay round trip amortizes over
    # the rep count; the per-rep wall is the DEVICE compute of one batch.
    # This decomposes the sustained wall into device work vs relay/host
    # residual — on this environment the ~65 ms round trip dominates a
    # 300K search, and the driver-recorded mfu/hbm fractions were mostly
    # measuring the relay (BENCH_r03 weak #4).
    device_probe_s = None
    try:
        scfg_dev = SearchConfig(k=K, n_buckets=probes_used,
                                fetch_dtype=fetch_used,
                                probe_mass=mass_used,
                                pallas_worklist=wl_used,
                                pallas_pair=pair_used)
        plan_dev = li._plan_search(q_nav, probes_used, K, scfg_dev)
        program_dev = li._dispatch_program(plan_dev, probes_used, scfg_dev)
        args_dev = (li.built.classifier.params, q_nav, q_search,
                    li.built.store)
        out = program_dev(*args_dev)  # warm (compile + pad validation)
        jax.device_get(out[1][0, :1])
        reps = 16
        start = time.perf_counter()
        for _ in range(reps):
            out = program_dev(*args_dev)
        jax.device_get(out[1][0, :1])  # one true barrier at the end
        device_probe_s = (time.perf_counter() - start) / reps
        print(f"# device-only probe: {device_probe_s * 1e3:.1f} ms/batch",
              file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001 — decomposition is best-effort
        print(f"# device-only probe failed: {e}", file=sys.stderr,
              flush=True)

    # ---- work model: FLOPs and HBM bytes the probe phase must move, and
    # utilization vs the MEASURED chip ceilings (scripts/calib.py: this
    # environment sustains ~82 bf16 TFLOPS / ~196 GB/s, far below v5e paper
    # specs — see NOTES.md) ----
    MEASURED_PEAK_FLOPS, MEASURED_PEAK_BW = 82e12, 196e9
    built = li.built
    from tpulmi.utils.config import SearchConfig as _SC
    from tpulmi.utils.profiling import probe_work_model

    qc, mc = _SC().pallas_qc, _SC().pallas_mc
    # replicate the final config's routing (incl. probe-mass truncation, so
    # the work model counts the slots the kernel actually scans)
    from tpulmi.search import route_probes, routing_logits
    logits, mass_logits = routing_logits(
        built.classifier.model, built.classifier.params, q_nav,
        need_mass=mass_used is not None)
    probes = route_probes(logits, probes_used, probe_mass=mass_used,
                          dump_id=built.store.n_categories,
                          mass_logits=mass_logits)
    slot_counts = np.bincount(
        np.asarray(jax.device_get(probes)).reshape(-1),
        minlength=built.store.n_categories + 1,
    )[:built.store.n_categories]  # drop truncation's dump bucket
    counts = np.asarray(jax.device_get(built.store.counts))
    flops, bytes_hbm = probe_work_model(
        slot_counts, counts, D_SEARCH, qc, mc,
        built.store.data_sorted.dtype.itemsize,
    )

    ok = recall >= RECALL_GATE
    result = {
        "metric": "sustained_search_qps_300K_recall>=0.90",
        "value": round(sustained_qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(sustained_qps / REF_QPS, 2) if ok else 0.0,
        "recall_at_10": round(recall, 4),
        "single_call_qps": round(qps, 1),
        "single_call_recall": round(single_recall, 4),
        "search_s_10k_queries": round(t_search, 4),
        "n_probes": probes_used,
        "probe_sweep": sweep,
        "ref_shape_bp6": ref_point,
        # sustained-row config (the adopt-on-win loop's winner) ...
        "fetch_dtype": fetch_used,
        "probe_mass": mass_used,
        "pallas_worklist": wl_used,
        "pallas_pair": pair_used,
        # ... and the single-call row's own config (decoupled; round-4's
        # shared config cost the single-call row 26%)
        "single_call_config": {
            "fetch_dtype": single_fetch, "probe_mass": single_mass,
            "pallas_worklist": single_wl, "pallas_pair": single_pair},
        "stream_batches": STREAM_BATCHES,
        "stream_depth": STREAM_DEPTH,
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
            flops / t_batch / MEASURED_PEAK_FLOPS, 3),
        "hbm_sustained": round(
            bytes_hbm / t_batch / MEASURED_PEAK_BW, 3),
        # decomposition: device compute of one batch (back-to-back
        # dispatches, relay amortized) vs the sustained wall — the gap is
        # relay/host residual that no kernel work can remove
        "device_probe_s": (round(device_probe_s, 4)
                           if device_probe_s else None),
        "mfu_device": (round(
            flops / device_probe_s / MEASURED_PEAK_FLOPS, 3)
            if device_probe_s else None),
        "hbm_device": (round(
            bytes_hbm / device_probe_s / MEASURED_PEAK_BW, 3)
            if device_probe_s else None),
        "relay_residual_s_per_batch": (round(t_batch - device_probe_s, 4)
                                       if device_probe_s else None),
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
