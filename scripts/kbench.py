"""Probe-kernel microbenchmark: device-time roofline for the Pallas kernel.

Generates a bucket store ON DEVICE (no relay upload), runs the fused Pallas
probe kernel and the XLA pipeline across (qc, mc) tilings, and reports
per-config wall time, achieved TFLOPS, MFU vs the chip's bf16 peak, and HBM
roofline utilization. Loops ITERS dispatches back-to-back inside one timing
window so the ~65 ms per-dispatch relay latency of this environment
amortizes away and the number approaches true device time.

Usage: PYTHONPATH=. python scripts/kbench.py [N_ROWS] [--xla] [--int8]
       [--int4] [--int8q]

Env knobs (so one script covers every workload shape): KB_C buckets,
KB_P probes/query, KB_Q queries, KB_ITERS timing iters. E.g. the 20M
bench's kernel shape (488 buckets x 40,960 rows, 8 probes, ~164
queries/bucket) replicated at device-fittable scale:
  KB_C=61 KB_P=8 KB_Q=1250 python scripts/kbench.py 2500000 --int8
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402
import numpy as np              # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from tpulmi.buckets import BucketStore           # noqa: E402
from tpulmi.ops.pallas_topk import pallas_probe_search   # noqa: E402
from tpulmi.ops.quantize import quantize_store   # noqa: E402
from tpulmi.search import _probe_search_impl     # noqa: E402

# v5e peaks (one chip): 197 bf16 TFLOPS / 394 int8 TOPS, 819 GB/s HBM
PEAK_BF16 = 197e12
PEAK_HBM = 819e9
# measured ceilings for THIS environment's chip (scripts/calib.py, NOTES.md)
MEAS_BF16 = 82e12
MEAS_HBM = 196e9

N = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 2_000_000
Q, P, K = (int(os.environ.get("KB_Q", 10_000)),
           int(os.environ.get("KB_P", 7)),
           int(os.environ.get("KB_K", 10)))
D = 768
C = int(os.environ.get("KB_C", 122))
ITERS = int(os.environ.get("KB_ITERS", 8))
SEED = 0


def make_store(n, c, d, align, dtype=jnp.bfloat16, skew=0.0):
    """Block-aligned buckets of unit rows, generated on device (n is
    rounded to `align` granularity per bucket). ``skew > 0`` draws bucket
    sizes from a power law (size_i ∝ 1/i^skew) — the production regime
    where popular k-means buckets dwarf the mean (BENCH_10M.md measures
    ~2.5× probe inflation from exactly this on the dense grid)."""
    if skew > 0:
        w = 1.0 / np.arange(1, c + 1, dtype=np.float64) ** skew
        w /= w.sum()
        rows = np.maximum((w * n / align).astype(np.int64), 1) * align
    else:
        rows = np.full((c,), max(n // c // align, 1) * align, np.int64)
    n = int(rows.sum())

    @jax.jit
    def gen(key):
        x = jax.random.normal(key, (n, d), jnp.bfloat16).astype(jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return x.astype(dtype)

    data = gen(jax.random.PRNGKey(SEED))
    pad = align
    data = jnp.concatenate([data, jnp.zeros((pad, d), dtype)])
    ids = jnp.concatenate([
        jnp.arange(n, dtype=jnp.int32),
        jnp.full((pad,), -1, jnp.int32),
    ])
    counts = jnp.asarray(rows, jnp.int32)
    offsets = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(counts).astype(jnp.int32),
    ])
    return BucketStore(data_sorted=data, ids_sorted=ids, offsets=offsets,
                       counts=counts, n=n, pad_rows=pad, row_align=align)


def work_model(store, probes, qc, mc):
    """FLOPs and HBM bytes the kernel must move for this workload."""
    from tpulmi.utils.profiling import probe_work_model

    counts = np.asarray(jax.device_get(store.counts))
    slots = np.bincount(np.asarray(probes).reshape(-1),
                        minlength=store.n_categories)
    # effective bytes per logical element (0.5 for packed int4 stores)
    elem_bytes = (store.data_sorted.dtype.itemsize
                  * int(store.data_sorted.shape[1]) / store.dim)
    return probe_work_model(slots, counts, store.dim, qc, mc, elem_bytes)


def _stream_time(store, qc, mc, int8q):
    """Pure matmul stream at the kernel's exact tile shape and dtypes: scan
    (qc,d)x(d,mc) over the store's blocks, nothing else. Mirrors each kernel
    variant's MXU path — int8 x int8 -> int32 when int8q, VMEM-dequant bf16
    for a quantized store otherwise, plain bf16 else. Returns (best seconds,
    bytes streamed)."""
    d = store.dim
    d_stored = int(store.data_sorted.shape[1])  # d/2 for packed int4
    rows = (int(store.data_sorted.shape[0]) // mc) * mc
    data3 = store.data_sorted[:rows].reshape(-1, mc, d_stored)
    quantized = store.data_sorted.dtype == jnp.int8

    # random q and a per-row MAX accumulator: a constant q (or a full sum,
    # which factors through the contraction) could let XLA algebraically
    # collapse the matmul into a matvec and fake the measurement
    kq = jax.random.PRNGKey(7)
    packed = quantized and getattr(store, "packed", False)
    if packed:
        from tpulmi.ops.quantize import unpack_int4
    if int8q and quantized:
        q = jax.random.randint(kq, (qc, d), -127, 128, jnp.int32).astype(
            jnp.int8)

        def body(acc, blk):
            if packed:
                blk = unpack_int4(blk)
            s = jax.lax.dot_general(
                q, blk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            return jnp.maximum(acc, jnp.max(s, axis=1)), None

        init = jnp.full((qc,), jnp.iinfo(jnp.int32).min, jnp.int32)
    else:
        q = jax.random.normal(kq, (qc, d), jnp.bfloat16)

        def body(acc, blk):
            if packed:
                blk = unpack_int4(blk)
            b = blk.astype(jnp.bfloat16) if quantized else blk
            s = jax.lax.dot_general(
                q, b, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.maximum(acc, jnp.max(s, axis=1)), None

        init = jnp.full((qc,), -jnp.inf, jnp.float32)

    @jax.jit
    def stream(data3):
        acc, _ = jax.lax.scan(body, init, data3)
        return acc

    t = bench(lambda: (stream(data3),), [])
    return t, rows * d_stored * store.data_sorted.dtype.itemsize


def bench(fn, out_holder):
    # warmup/compile
    out = fn()
    jax.device_get(out[0].ravel()[-1:])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn()
        jax.device_get(out[0].ravel()[-1:])
        best = min(best, (time.perf_counter() - t0) / ITERS)
    out_holder.append(out)
    return best


def main():
    # the axon plugin's registration fails transiently (bursty, minutes
    # after another TPU process exits — NOTES.md rule 9); re-exec instead
    # of dying, same as the big benches
    from tpulmi.utils.backend_retry import ensure_backend
    ensure_backend()
    args = set(sys.argv[2:]) | ({sys.argv[1]} if len(sys.argv) > 1 else set())
    align = int(os.environ.get("KB_ALIGN", 1024))
    skew = float(os.environ.get("KB_SKEW", 0.0))
    store = make_store(N, C, D, align, skew=skew)
    n_actual = store.n
    counts_host = np.asarray(jax.device_get(store.counts))
    max_bucket = int(counts_host.max())
    if skew:
        print(f"# skew={skew}: bucket rows max/mean/min = "
              f"{counts_host.max()}/{counts_host.mean():.0f}/"
              f"{counts_host.min()}", file=sys.stderr)
    if "--int4" in args:
        store = quantize_store(store, bits=4)
        jax.device_get(store.data_sorted[-1, :1])
    elif "--int8" in args:
        store = quantize_store(store)
        jax.device_get(store.data_sorted[-1, :1])

    rng = np.random.default_rng(SEED)
    if skew:
        # production correlation: popular buckets are also the big ones —
        # probe probability proportional to bucket size, no replacement
        pw = counts_host.astype(np.float64) / counts_host.sum()
        probes_np = np.stack([
            rng.choice(C, size=P, replace=False, p=pw) for _ in range(Q)
        ]).astype(np.int32)
    else:
        probes_np = np.stack(
            [rng.permutation(C)[:P] for _ in range(Q)]
        ).astype(np.int32)
    probes = jnp.asarray(probes_np)
    queries = jax.random.normal(jax.random.PRNGKey(1), (Q, D), jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)
    jax.device_get(queries[-1, :1])

    results = {}
    outs = []
    configs = [(256, 512), (512, 512), (256, 1024), (512, 1024), (512, 2048),
               (768, 1024), (256, 2048), (384, 2048), (128, 2048),
               (192, 1024), (128, 1024)]
    # KB_CONFIGS="512x1024,192x1024" restricts the sweep (A/B runs, quick
    # re-measures); --abq benches every selected config with int8 query
    # tiles OFF and ON in one process (same session, same relay mood).
    if os.environ.get("KB_CONFIGS"):
        configs = [tuple(int(v) for v in c.split("x"))
                   for c in os.environ["KB_CONFIGS"].split(",")]
    q_variants = ([False, True] if "--abq" in args
                  else ["--int8q" in args])
    # --abm benches the top-k maintenance strategies per config in one
    # process (same session, same relay); KB_MODES=group,group2 picks an
    # explicit comparison list (base config first — measure it before any
    # experimental variant, NOTES.md)
    if os.environ.get("KB_MODES"):
        m_variants = os.environ["KB_MODES"].split(",")
    elif "--abm" in args:
        m_variants = ["scalar", "group", "group2"]
    else:
        m_variants = [os.environ.get("KB_MODE", "scalar")]
    # KB_SUBS=64,128 sweeps extraction sub-group sizes (else KB_SUB once;
    # 0 = the kernel's per-mode default)
    sub_variants = [int(s) for s in os.environ.get(
        "KB_SUBS", os.environ.get("KB_SUB", "0")).split(",")]
    elem = store.data_sorted.dtype.itemsize
    for qc, mc in configs:
        if align % mc:
            continue
        # VMEM guess: double-buffered data tile + q tile + dists (f32, twice
        # for the loop state) + scratch; skip configs that cannot fit
        vmem = (2 * mc * D * elem + qc * D * 2
                + 2 * qc * mc * 4 + qc * 128 * 8)
        if vmem > 14 * 2 ** 20:
            continue
        flops, bytes_hbm = work_model(store, probes, qc, mc)

        # --wl A/Bs the flat-worklist grid against the dense 2-D grid at
        # every selected tiling; the pad is the exact closed-form total
        # for this fixed probe set (tpulmi/ops/pallas_topk.py docstring)
        wl_variants = [0, 1] if "--wl" in args else [0]
        for int8q in q_variants:
         for mode in m_variants:
          for sub in sub_variants:
           if sub and qc % min(sub, qc):  # 0 = the kernel's per-mode default
               continue
           for use_wl in wl_variants:
            if use_wl:
                sc = np.bincount(probes_np.reshape(-1), minlength=C)
                ndb = np.maximum(-(-counts_host // mc), 1)
                wl_pad = int(np.sum((-(-sc // qc)) * ndb * (sc > 0)))
            else:
                wl_pad = 0

            # KB_KOUT > K A/Bs the rerank pool: exact top-K tracked, the
            # extras drawn from the residue-class pool lanes — against a
            # KB_K=KOUT run this isolates the narrow-buffer extraction win
            kout = int(os.environ.get("KB_KOUT", 0))
            # KB_PAIR=1: two mc-row refs per grid step (2·mc-wide compute
            # tile at row_align=mc — mc=2048 amortization without its
            # store padding)
            kb_pair = os.environ.get("KB_PAIR") == "1"

            def run(qc=qc, mc=mc, int8q=int8q, wl_pad=wl_pad, mode=mode,
                    sub=sub, kout=kout, kb_pair=kb_pair):
                return pallas_probe_search(
                    probes, queries, store, k=K, qc=qc, mc=mc,
                    max_chunks=-(-max_bucket // mc),
                    compute_dtype=jnp.bfloat16,
                    int8_queries=int8q,
                    extract_sub=sub,
                    extract_mode=mode,
                    wl_pad=wl_pad,
                    k_out=kout,
                    pair=kb_pair,
                )

            try:
                t = bench(run, outs)
            except Exception as e:  # noqa: BLE001 - VMEM OOM etc: skip config
                print(f"# {qc}/{mc} wl={wl_pad} mode={mode} failed: "
                      f"{str(e)[:120]}", file=sys.stderr)
                continue
            key = (f"pallas_qc{qc}_mc{mc}" + ("_int8q" if int8q else "")
                   + (f"_{mode}" if mode != "scalar" else "")
                   + (f"_sub{sub}" if len(sub_variants) > 1 else "")
                   + ("_pair" if kb_pair else "")
                   + ("_wl" if use_wl else ""))
            results[key] = {
                "s": round(t, 4),
                "tflops": round(flops / t / 1e12, 1),
                "mfu": round(flops / t / PEAK_BF16, 3),
                "hbm_frac": round(bytes_hbm / t / PEAK_HBM, 3),
                "mfu_meas": round(flops / t / MEAS_BF16, 3),
                "hbm_meas": round(bytes_hbm / t / MEAS_HBM, 3),
            }
            if use_wl:
                results[key]["wl_items"] = wl_pad
            if "--stream" in args:
                # Shape-specific speed-of-light floor: a pure (qc,d)x(d,mc)
                # matmul stream over the SAME store bytes and dtypes — the
                # kernel minus top-k/masking/grid bookkeeping. Its achieved
                # rate bounds what ANY correct probe kernel at this tiling
                # can do (it is compute-floored below the HBM line when the
                # per-tile matmul outweighs the per-tile DMA, exactly the
                # qc>=192 int8 regime), so vs_floor = kernel rate / stream
                # rate is the honest utilization number.
                try:
                    ts, stream_bytes = _stream_time(store, qc, mc, int8q)
                    rate = stream_bytes / ts
                    results[key]["stream_gbps"] = round(rate / 1e9, 1)
                    results[key]["vs_floor"] = round(
                        (bytes_hbm / t) / rate, 3)
                    print(json.dumps({key: results[key]}), flush=True)
                    continue
                except Exception as e:  # noqa: BLE001
                    print(f"# stream {qc}/{mc} failed: {str(e)[:120]}",
                          file=sys.stderr)
            print(json.dumps({key: results[key]}), flush=True)

    if "--xla" in args:
        flops, bytes_hbm = work_model(store, probes, 512, 2048)

        def run_xla():
            return _probe_search_impl(
                probes, queries, store, k=K,
                qpb_pad=1024, data_chunk=2048,
                max_chunks=-(-max_bucket // 2048), query_chunk=512,
                compute_dtype=jnp.bfloat16,
            )

        t = bench(run_xla, outs)
        results["xla"] = {
            "s": round(t, 4),
            "tflops": round(flops / t / 1e12, 1),
            "mfu": round(flops / t / PEAK_BF16, 3),
            "mfu_meas": round(flops / t / MEAS_BF16, 3),
            "hbm_meas": round(bytes_hbm / t / MEAS_HBM, 3),
        }
        print(json.dumps({"xla": results["xla"]}), flush=True)

    # agreement check across configs
    d0 = np.asarray(jax.device_get(outs[0][0]))
    for o in outs[1:]:
        di = np.asarray(jax.device_get(o[0]))
        if not np.allclose(d0, di, atol=2e-3):
            print(f"# WARNING: config results differ (max {np.abs(d0-di).max()})",
                  file=sys.stderr)
    print(json.dumps({"n": n_actual, "results": results}), flush=True)


if __name__ == "__main__":
    # hard-exit on BOTH paths: normal interpreter exit can hang in remote
    # backend teardown (NOTES.md rule 4), and a failed axon register leaves
    # an exception whose default teardown hangs the same way.
    try:
        main()
    except BaseException:  # noqa: BLE001
        import traceback
        traceback.print_exc()
        sys.stderr.flush()
        os._exit(1)
    os._exit(0)
