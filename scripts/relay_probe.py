"""Quick TPU session probe: device presence + relay bandwidth estimate.

Run before a big-corpus benchmark to know this session's relay rate
(NOTES.md rule 7: 8-30 MB/s session-dependent — ETAs must be re-measured).
One short-lived process; hard-exits to dodge remote teardown hangs.
"""
import os
import sys
import time

import numpy as np


def main():
    from tpulmi.utils.backend_retry import ensure_backend
    ensure_backend()
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    devs = jax.devices()
    print(f"devices: {devs} ({time.perf_counter()-t0:.1f}s)", flush=True)

    # first fetch can stall minutes on a fresh process — time it separately
    x = jnp.ones((8, 8), jnp.float32)
    t0 = time.perf_counter()
    jax.device_get(x)
    print(f"first device_get: {time.perf_counter()-t0:.1f}s", flush=True)

    mb = int(os.environ.get("PROBE_MB", "96"))
    host = np.random.default_rng(0).standard_normal(
        (mb * 1024 * 1024 // 4,)).astype(np.float32)
    t0 = time.perf_counter()
    dev = jax.device_put(host)
    jax.device_get(dev[-1:])
    up = time.perf_counter() - t0
    print(f"upload {mb} MB: {up:.1f}s = {mb/up:.1f} MB/s", flush=True)

    t0 = time.perf_counter()
    _ = jax.device_get(dev[: len(host) // 4])
    down = time.perf_counter() - t0
    print(f"download {mb/4:.0f} MB: {down:.1f}s = {mb/4/down:.1f} MB/s",
          flush=True)
    return 0


if __name__ == "__main__":
    try:
        code = main()
    except BaseException:  # noqa: BLE001 — teardown hangs after errors
        import traceback
        traceback.print_exc()
        sys.stderr.flush()
        os._exit(1)
    os._exit(code)
