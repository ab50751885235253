"""Kernel diagnostics: separate relay dispatch cost from device time, and
calibrate the chip's achievable matmul rate for the probe-kernel shapes.

Experiments (one TPU process, sequential):
  1. ITERS sweep on the best kernel config — per-iter time vs batch size of
     back-to-back dispatches separates fixed (relay round-trip) cost from
     marginal (device) cost.
  2. Pure-matmul calibration at the kernel's tile shapes, both contraction
     layouts: q @ blk.T (what the kernel does today — RHS needs an
     in-kernel transpose) vs q @ blkT (pre-transposed store layout).
  3. k=1 kernel — bounds the extraction-loop cost.
"""

import json
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402
import numpy as np              # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.kbench import make_store, work_model  # noqa: E402
from tpulmi.ops.pallas_topk import pallas_probe_search  # noqa: E402

Q, P, K, D, C = 10_000, 7, 10, 768, 122
SEED = 0


def timed(fn, iters, repeats=3):
    out = fn()
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[-1:])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[-1:])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    store = make_store(2_000_000, C, D, 1024)
    rng = np.random.default_rng(SEED)
    probes = jnp.asarray(np.stack(
        [rng.permutation(C)[:P] for _ in range(Q)]
    ).astype(np.int32))
    queries = jax.random.normal(jax.random.PRNGKey(1), (Q, D), jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)
    jax.device_get(queries[-1, :1])
    max_bucket = store.n // C
    qc, mc = 256, 1024
    flops, bytes_hbm = work_model(store, probes, qc, mc)

    def run(k=K):
        return pallas_probe_search(
            probes, queries, store, k=k, qc=qc, mc=mc,
            max_chunks=-(-max_bucket // mc), compute_dtype=jnp.bfloat16,
        )

    # 1. dispatch-cost separation
    for iters in (1, 8, 32):
        t = timed(run, iters)
        print(json.dumps({"exp": "iters", "iters": iters, "s_per_iter": round(t, 4),
                          "tflops": round(flops / t / 1e12, 1)}), flush=True)

    # 3. k=1 (same compile family, small extraction loop)
    t = timed(partial(run, k=1), 8)
    print(json.dumps({"exp": "k1", "s_per_iter": round(t, 4),
                      "tflops": round(flops / t / 1e12, 1)}), flush=True)

    # 2. matmul calibration at kernel shapes — both layouts, XLA-jitted
    #    scan over blocks so one dispatch covers the same FLOP volume
    n_blk = store.data_sorted.shape[0] // mc
    data = store.data_sorted  # (n_blk*mc, d) bf16
    qtile = jax.device_put(
        jnp.asarray(rng.normal(size=(qc, D)), jnp.bfloat16))

    @jax.jit
    def mm_qbt(qtile, data):
        blocks = data.reshape(n_blk, mc, D)

        def body(acc, blk):
            s = jax.lax.dot_general(
                qtile, blk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc + jnp.sum(s), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), blocks)
        return acc

    dataT = jnp.swapaxes(data.reshape(n_blk, mc, D), 1, 2)  # (n_blk, D, mc)
    jax.device_get(dataT[-1, -1, -1:])

    @jax.jit
    def mm_qb(qtile, dataT):
        def body(acc, blkT):
            s = jax.lax.dot_general(
                qtile, blkT, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc + jnp.sum(s), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), dataT)
        return acc

    mm_flops = 2.0 * qc * D * n_blk * mc
    for name, fn, arg in (("mm_q_blkT", mm_qbt, data), ("mm_q_blk", mm_qb, dataT)):
        t = timed(lambda fn=fn, arg=arg: fn(qtile, arg), 4)
        print(json.dumps({"exp": name, "s_per_iter": round(t, 4),
                          "tflops": round(mm_flops / t / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
