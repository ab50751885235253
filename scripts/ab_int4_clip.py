"""int4 quantizer A/B on the real chip: per-row adaptive clip vs fixed 0.85.

Builds the SAME 1M-row / 120-bucket index (fixed seed — routing identical),
quantizes the store to packed int4 with the variant's clip policy, and
measures recall@10 against the exact oracle over a (probes x rerank_extra)
grid. The CPU-measured containment win (NOTES.md: top-10-in-top-30
containment 0.9802 -> 0.9894) should surface end-to-end as higher recall at
a FIXED rerank depth — i.e. int4's depth requirement relaxes.

The fixed variant shrinks `INT4_CLIP_GRID` to (0.85,) BEFORE any quantize
call (the jitted device quantizer reads the grid at trace time, so each
variant runs in its own process).

Usage: python scripts/ab_int4_clip.py {adaptive|fixed}
Prints one JSON line per run; run both and diff the grids.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))

import jax  # noqa: E402

# AB4_CPU=1 runs on the CPU backend (smoke tests). NOTE: the env var
# JAX_PLATFORMS=cpu is NOT sufficient in this environment — sitecustomize
# force-selects the TPU via jax.config (NOTES.md rule 6), and a "CPU"
# smoke test silently claiming the TPU wedges any running bench (rule 8,
# observed 2026-08-20). Only an in-process jax.config override works.
if os.environ.get("AB4_CPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402

N = int(os.environ.get("AB4_N", 1_000_000))
N_QUERIES = int(os.environ.get("AB4_Q", 2000))
K = 10
N_CAT = 120
SEED = 2023
CACHE = ".bench_cache"
PROBES = (4, 8, 16)
EXTRAS = (10, 20, 30, 60)


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "adaptive"
    if variant not in ("adaptive", "fixed"):
        raise SystemExit(f"unknown variant {variant!r}")
    import tpulmi.ops.quantize as qz
    if variant == "fixed":
        qz.INT4_CLIP_GRID = (qz.INT4_CLIP,)

    from tpulmi.data import synthetic_dataset
    from tpulmi.index import LearnedIndex
    from tpulmi.ops.distance import exact_knn
    from tpulmi.utils.backend_retry import ensure_backend
    from tpulmi.utils.config import IndexConfig, SearchConfig

    ensure_backend()
    ds = synthetic_dataset(n=N, n_queries=N_QUERIES, n_clusters=122,
                           seed=SEED)

    gt_path = os.path.join(CACHE, f"gt_ab1m_n{N}_q{N_QUERIES}_k{K}.npz")
    if os.path.exists(gt_path):
        gt = np.load(gt_path)["ids"]
    else:
        t0 = time.perf_counter()
        _, gt = exact_knn(ds["queries_search"], ds["data_search"], k=K)
        gt = np.asarray(gt) + 1  # facade returns 1-based ids
        print(f"# oracle in {time.perf_counter()-t0:.0f}s", file=sys.stderr,
              flush=True)
        os.makedirs(CACHE, exist_ok=True)
        np.savez_compressed(gt_path, ids=gt)

    # row_align=1024 keeps the store Pallas-eligible (backend="auto" then
    # runs the fused kernel on TPU — the serving configuration); ~6%
    # padding at 120 buckets. AB4_POOL=1 adds the kernel rerank-pool rung
    # (pallas_pool): at 40M it was 26% faster but depth-capped below the
    # OLD quantizer's needs (recall 0.8773, BENCH_40M.md) — the adaptive
    # clip may put it back over the gate.
    pool_ab = bool(os.environ.get("AB4_POOL"))
    li = LearnedIndex(IndexConfig(
        n_categories=N_CAT, epochs=8, lr=0.003, model_type="MLP-5",
        batch_size=4096, seed=SEED, row_align=1024))
    t0 = time.perf_counter()
    li.build(ds["data_nav"], ds["data_search"])
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    li.quantize(host_corpus=ds["data_search"], normalized=True, bits=4)
    t_quant = time.perf_counter() - t0
    print(f"# build {t_build:.0f}s quantize({variant}) {t_quant:.1f}s",
          file=sys.stderr, flush=True)

    q_host = np.ascontiguousarray(ds["queries_search"], np.float32)
    grid = {}

    def run(probes, extra, pool=False):
        scfg = SearchConfig(k=K, n_buckets=probes, rerank_extra=extra,
                            pallas_pool=pool)
        _, ids = li.search(ds["queries_nav"], ds["queries_search"],
                           n_buckets=probes, k=K, search_config=scfg,
                           queries_search_host=q_host)
        recall = float(np.mean([
            len(set(ids[i]) & set(gt[i])) / K
            for i in range(ids.shape[0])
        ]))
        tag = f"p{probes}_x{extra}" + ("_pool" if pool else "")
        grid[tag] = round(recall, 4)
        print(f"# probes={probes} extra={extra} pool={pool} "
              f"recall={recall:.4f}", file=sys.stderr, flush=True)

    for probes in PROBES:
        for extra in EXTRAS:
            run(probes, extra)
    if pool_ab:
        for extra in EXTRAS[:3]:
            run(PROBES[-1], extra, pool=True)

    print(json.dumps({
        "variant": variant, "n": N, "queries": N_QUERIES,
        "clip_grid": list(qz.INT4_CLIP_GRID),
        "build_s": round(t_build, 1), "quantize_s": round(t_quant, 2),
        "recall": grid,
    }), flush=True)
    return 0


if __name__ == "__main__":
    code = main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(code)
