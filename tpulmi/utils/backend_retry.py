"""Recover from transient remote-backend registration failures.

This environment's TPU is reached through a PJRT plugin that registers at
interpreter startup from sitecustomize; a transient relay error during
that import is swallowed (so every python process still gets an
interpreter) and leaves the backend unregistered. The first
``jax.devices()`` then raises ``RuntimeError: Unable to initialize
backend 'axon': Backend 'axon' is not in the list of known backends``.

JAX cannot re-register a plugin in-process, so the only recovery is a
fresh interpreter: ``ensure_backend`` re-execs the current script with a
retry counter carried in the environment. Observed failure mode is
bursty (a claim-release window after another TPU process exits), so the
sleep between attempts is generous.
"""

import os
import sys
import time

_ENV = "TPULMI_BACKEND_RETRY"


def ensure_backend(max_retries: int = 4, sleep_s: float = 45.0) -> None:
    """Touch the JAX backend; on the unregistered-plugin failure, re-exec
    this script up to ``max_retries`` times. Any other error propagates."""
    import jax

    try:
        jax.devices()
        os.environ.pop(_ENV, None)
        return
    except RuntimeError as e:
        # Two observed transient modes (NOTES.md rule 9): the plugin never
        # registered ("not in the list of known backends"), and the plugin
        # registered but init hit the claim-release window of a previous
        # TPU process ("UNAVAILABLE: TPU backend setup/compile error" —
        # observed to hang ~25 min then fail). Both need a fresh
        # interpreter: jax caches the failed-init state for the process.
        transient = ("not in the list of known backends" in str(e)
                     or "UNAVAILABLE" in str(e))
        if not transient:
            raise
        n = int(os.environ.get(_ENV, "0"))
        if n >= max_retries:
            raise
        os.environ[_ENV] = str(n + 1)
        # Exponential backoff: a failed init in hang mode (UNAVAILABLE
        # after ~30 min) may itself leave a half-open claim that wedges an
        # immediate retry — observed 2026-08-18 when an instant relaunch
        # after a clean exit chained three 30-min hang/fail cycles.
        delay = sleep_s * (2 ** n)
        print(f"# backend init failed (attempt {n + 1}/{max_retries}: "
              f"{str(e)[:80]}), re-exec in {delay:.0f}s",
              file=sys.stderr, flush=True)
        time.sleep(delay)
        os.execv(sys.executable, [sys.executable] + sys.argv)
