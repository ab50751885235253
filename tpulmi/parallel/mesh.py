"""Device-mesh helpers.

The reference has no distributed runtime at all (single process, 1 CPU core
— `README.md:20-23`; SURVEY.md §2.3). Here scale-out is native: a 1-D
``jax.sharding.Mesh`` whose axes carry

- ``"buckets"`` — expert-parallel analog: the bucket store is sharded
  across chips, queries are replicated, per-chip partial top-k results are
  merged with an all-gather (see tpulmi/parallel/sharded.py);
- ``"data"`` — data parallel: training batches and k-means rows sharded
  over chips, gradients/statistics reduced by XLA-inserted psums.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("buckets",),
    devices=None,
) -> Mesh:
    """Create a 1-D mesh over the first `n_devices` devices (all by default)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if len(axis_names) != 1:
        raise ValueError("make_mesh builds 1-D meshes; got axes " + str(axis_names))
    return Mesh(np.asarray(devices), axis_names)
