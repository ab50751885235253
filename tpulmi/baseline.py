"""Exact brute-force k-NN baseline — the test oracle.

Mirrors the reference's ``Baseline`` (`search/li/Baseline.py:7-25`): an exact
full-scan cosine k-NN "used for testing purposes with data volume < 1M". Here
it is the streaming MXU scan from ``tpulmi.ops.distance.exact_knn``, so it
also handles multi-million-row data (it is the same kernel family the probe
rerank uses).
"""

import os
import time
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpulmi.ops.distance import SENTINEL_DIST, exact_knn
from tpulmi.utils.logging import get_logger

log = get_logger("tpulmi.baseline")


@partial(jax.jit, static_argnames=("k",))
def _merge_chunk(best_d, best_i, queries, block, base, valid, *, k):
    sims = jax.lax.dot_general(
        queries, block,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dists = 1.0 - sims
    ids = base + jax.lax.broadcasted_iota(jnp.int32, (1, block.shape[0]), 1)
    dists = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, block.shape[0]), 1) < valid,
        dists, SENTINEL_DIST,
    )
    cat_d = jnp.concatenate([best_d, dists], axis=1)
    cat_i = jnp.concatenate(
        [best_i, jnp.broadcast_to(ids, (queries.shape[0], block.shape[0]))],
        axis=1,
    )
    neg_top, arg_top = jax.lax.top_k(-cat_d, k)
    return -neg_top, jnp.take_along_axis(cat_i, arg_top, axis=1)


def exact_knn_streamed(
    queries,
    host_data,
    k: int = 10,
    chunk: int = 262144,
    compute_dtype=jnp.bfloat16,
    normalized: bool = True,
    resume_path: str = None,
    checkpoint_every: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact cosine k-NN over a corpus that lives in HOST memory: data blocks
    stream to the device chunk by chunk with a running top-k merge, so the
    device never holds more than one block. For corpora larger than HBM
    (e.g. ground-truth generation at 10M x 768).

    ``resume_path`` makes the scan crash-resumable: every
    ``checkpoint_every`` chunks the running (best_d, best_i, next_lo) state
    — ~800 KB at 10k queries — is written atomically, and a rerun continues
    from the last checkpoint instead of re-streaming the corpus (the 40M
    ground-truth pass moves 61 GB through the relay over ~an hour; the
    backend can wedge mid-stream — NOTES.md rules 7-9). The checkpoint is
    validated against (n, q, k, chunk) and a query checksum; any mismatch
    starts fresh. The caller owns deleting the file once the final result
    is cached."""
    q = queries.shape[0]
    q_host = np.asarray(queries, np.float32)
    queries_d = jnp.asarray(q_host)
    if not normalized:
        from tpulmi.ops.distance import l2_normalize

        queries_d = l2_normalize(queries_d)
    queries_d = queries_d.astype(compute_dtype)
    best_d = jnp.full((q, k), SENTINEL_DIST, jnp.float32)
    best_i = jnp.zeros((q, k), jnp.int32)
    n = host_data.shape[0]
    start_lo = 0
    q_sum = float(np.float64(q_host.sum()))
    if resume_path:
        if os.path.exists(resume_path):
            try:
                z = np.load(resume_path)
                ok = (int(z["n"]) == n and int(z["k"]) == k
                      and int(z["chunk"]) == chunk
                      and z["best_d"].shape == (q, k)
                      and abs(float(z["q_sum"]) - q_sum) <= 1e-3)
            except Exception:  # noqa: BLE001 — torn/stale file: start fresh
                ok = False
            if ok:
                start_lo = int(z["lo"])
                best_d = jnp.asarray(z["best_d"])
                best_i = jnp.asarray(z["best_i"])
                log.info("exact_knn_streamed: resuming at %d/%d rows",
                         start_lo, n)
            else:
                log.warning("exact_knn_streamed: stale checkpoint at %s "
                            "ignored", resume_path)
    for lo in range(start_lo, n, chunk):
        hi = min(lo + chunk, n)
        block = np.zeros((chunk, host_data.shape[1]), dtype=np.asarray(
            host_data[:1]).dtype)
        block[: hi - lo] = host_data[lo:hi]
        block_d = jnp.asarray(block).astype(compute_dtype)
        best_d, best_i = _merge_chunk(
            best_d, best_i, queries_d, block_d,
            jnp.int32(lo), jnp.int32(hi - lo), k=k,
        )
        # Backpressure: without a true barrier (device_get — NOTES.md: the
        # remote backend's block_until_ready is a no-op) this loop enqueues
        # the ENTIRE corpus as pending async transfers; tens of GB of
        # buffered futures wedge the transfer stream outright and hold
        # every staged block in host RAM. Barrier EVERY chunk: the round-5
        # 40M session measured repeated multi-minute stream wedges at the
        # old every-4th cadence (three stalls in 40 chunks) — the same
        # failure the slab-pipelined store upload already barriers per slab
        # for (NOTES.md: "unsynced streams wedge"). One ~65 ms roundtrip
        # per 400 MB chunk is noise against the relay transfer itself.
        jax.device_get(best_d[-1:, :1])
        if lo // chunk % 8 == 0:
            log.info("exact_knn_streamed: %d/%d rows", hi, n)
        if (resume_path and hi < n
                and lo // chunk % checkpoint_every == checkpoint_every - 1):
            # np.savez appends .npz to extension-less names — write the
            # tmp with it, then atomically rename over resume_path
            tmp = resume_path + ".tmp.npz"
            np.savez(tmp,
                     best_d=np.asarray(jax.device_get(best_d)),
                     best_i=np.asarray(jax.device_get(best_i)),
                     lo=hi, n=n, k=k, chunk=chunk, q_sum=q_sum)
            os.replace(tmp, resume_path)
    return np.asarray(jax.device_get(best_d)), np.asarray(jax.device_get(best_i))


class Baseline:
    """Exact cosine k-NN with the reference's external contract: 1-based
    ids, (dists, nns, seconds) return."""

    def __init__(self):
        self._data = None

    def build(self, data) -> float:
        """No index to build — device_put the data once (reference logs
        'No build method implemented for baseline', `search/li/Baseline.py:22-25`)."""
        start = time.perf_counter()
        self._data = jax.device_put(np.asarray(data, dtype=np.float32))
        jax.block_until_ready(self._data)
        return time.perf_counter() - start

    def search(self, queries, data=None, k: int = 10) -> Tuple[np.ndarray, np.ndarray, float]:
        """Exact k nearest neighbors. Returns (dists, nns, seconds); `nns`
        is 1-based like the reference (`search/li/Baseline.py:18`)."""
        if data is None:
            data = self._data
        if data is None:
            raise ValueError("No data: call build() or pass data explicitly.")
        start = time.perf_counter()
        dists, ids = exact_knn(queries, data, k=k)
        dists, ids = jax.device_get((dists, ids))
        elapsed = time.perf_counter() - start
        return dists, ids.astype(np.int64) + 1, elapsed
