"""Chip calibration: what this TPU actually sustains.

1. Large square bf16 matmul (compute-bound)  -> achievable TFLOPS
2. Big-array reduction (memory-bound)        -> achievable HBM GB/s
3. Kernel-shaped matmul streams at several query-tile heights
   -> the realistic ceiling for the probe kernel's tiles

These numbers anchor the MFU figures reported by scripts/kbench.py.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def timed(fn, iters=8, repeats=3):
    out = fn()
    jax.device_get(out.ravel()[-1:])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.device_get(out.ravel()[-1:])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    key = jax.random.PRNGKey(0)

    # 1. compute-bound: 4096^3 bf16 matmul chain (stays in HBM, 8 chained)
    m = 4096
    a = jax.random.normal(key, (m, m), jnp.bfloat16)
    b = jax.random.normal(key, (m, m), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        x = a
        for _ in range(8):
            x = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
        return x.astype(jnp.float32)

    t = timed(lambda: chain(a, b), iters=4)
    flops = 8 * 2.0 * m ** 3
    print(json.dumps({"exp": "mm4096_bf16", "s": round(t, 4),
                      "tflops": round(flops / t / 1e12, 1)}), flush=True)

    # 2. memory-bound: reduce 2 GB bf16
    big = jax.random.normal(key, (1_000_000_000,), jnp.bfloat16)

    @jax.jit
    def red(x):
        return jnp.sum(x.astype(jnp.float32)).reshape(1)

    t = timed(lambda: red(big), iters=4)
    print(json.dumps({"exp": "reduce2GB", "s": round(t, 4),
                      "gbps": round(2e9 / t / 1e9, 1)}), flush=True)

    # 3. kernel-shaped streams: (qc,768) x (768,mc) over ~3 GB of blocks
    d, mc, n_blk = 768, 1024, 1953
    data = jax.random.normal(key, (n_blk, mc, d), jnp.bfloat16)
    dataT = jnp.swapaxes(data, 1, 2)
    jax.device_get(dataT[-1, -1, -1:])
    for qc in (256, 512, 1024):
        q = jax.random.normal(key, (qc, d), jnp.bfloat16)

        @jax.jit
        def stream(q, dataT):
            def body(acc, blkT):
                s = jax.lax.dot_general(
                    q, blkT, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return acc + jnp.sum(s), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), dataT)
            return acc.reshape(1)

        t = timed(lambda s=stream, q=q: s(q, dataT), iters=4)
        flops = 2.0 * qc * d * n_blk * mc
        bytes_ = n_blk * mc * d * 2.0
        print(json.dumps({
            "exp": f"stream_qc{qc}", "s": round(t, 4),
            "tflops": round(flops / t / 1e12, 1),
            "gbps": round(bytes_ / t / 1e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
