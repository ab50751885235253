"""Tracing and profiling utilities.

The reference's only instrumentation is wall-clock `time.time()` pairs
(`search/li/LearnedIndex.py:218,240`, `search/search.py:69,103-105`) and a
separately-timed GEMM that the caller discards (`search/li/utils.py:18-20`).
Here:

- `sync(tree)`: a TRUE synchronization point. On the remote-execution
  backend of this environment, `jax.block_until_ready` returns before the
  computation finishes — only a value fetch synchronizes — so every timing
  helper here fetches one element per leaf.
- `phase_timer`: context manager timing a phase with a sync at exit.
- `trace`: wraps `jax.profiler.trace` to capture a TensorBoard-viewable
  device trace of any region.
- `timeit`: best-of-N timing of a jitted callable with warmup.
"""

import time
from contextlib import contextmanager
from typing import Callable

import jax

from tpulmi.utils.logging import get_logger

log = get_logger("tpulmi.profiling")


def sync(tree) -> None:
    """Force completion of every array in the pytree via value fetches
    (one element per leaf — tiny transfers, real barriers)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ndim"):
            jax.device_get(leaf.ravel()[-1:] if leaf.ndim else leaf)


@contextmanager
def phase_timer(phase: str, result_holder: dict = None):
    """Time a phase; call `mark(tree)` inside to register arrays that must
    complete before the clock stops."""
    pending = []

    def mark(tree):
        pending.append(tree)
        return tree

    start = time.perf_counter()
    yield mark
    sync(pending)
    elapsed = time.perf_counter() - start
    log.info("%s: %.3fs", phase, elapsed)
    if result_holder is not None:
        result_holder[phase] = elapsed


@contextmanager
def trace(log_dir: str = "/tmp/tpulmi_trace"):
    """Capture a device profile of the region (view with TensorBoard or
    xprof). Usage: ``with trace('/tmp/t'): run(); sync(out)``"""
    with jax.profiler.trace(log_dir):
        yield
    log.info("profiler trace written to %s", log_dir)


def probe_work_model(slot_counts, bucket_counts, d: int, qc: int, mc: int,
                     elem_bytes: int):
    """FLOPs and HBM bytes the probe phase must move for a workload:
    per bucket, ceil(slots/qc) query blocks each scan the bucket's
    mc-padded rows. The single source of truth for the kernel
    microbenchmarks (scripts/kbench.py) and the bench JSON's MFU fields."""
    import numpy as np

    qblocks = np.ceil(np.asarray(slot_counts, np.float64) / qc)
    rows_pad = np.ceil(np.asarray(bucket_counts, np.float64) / mc) * mc
    flops = float(np.sum(qblocks * qc * rows_pad) * d * 2)
    bytes_hbm = float(np.sum(qblocks * rows_pad) * d * elem_bytes)
    return flops, bytes_hbm


def timeit(fn: Callable, *args, repeats: int = 3, warmup: int = 1, **kwargs):
    """Best-of-N wall time of `fn(*args)` with true syncs; returns
    (best_seconds, last_result)."""
    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
        sync(result)
    best = float("inf")
    for _ in range(repeats):
        start = time.perf_counter()
        result = fn(*args, **kwargs)
        sync(result)
        best = min(best, time.perf_counter() - start)
    return best, result
