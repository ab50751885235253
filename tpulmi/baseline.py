"""Exact brute-force k-NN baseline — the test oracle.

Mirrors the reference's ``Baseline`` (`search/li/Baseline.py:7-25`): an exact
full-scan cosine k-NN "used for testing purposes with data volume < 1M". Here
it is the streaming MXU scan from ``tpulmi.ops.distance.exact_knn``, so it
also handles multi-million-row data (it is the same kernel family the probe
rerank uses).
"""

import time
from typing import Tuple

import jax
import numpy as np

from tpulmi.ops.distance import exact_knn
from tpulmi.utils.logging import get_logger

log = get_logger("tpulmi.baseline")


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
