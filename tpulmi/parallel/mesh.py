"""Device-mesh helpers and the multi-process entry point.

The reference has no distributed runtime at all (single process, 1 CPU core
— `README.md:20-23`; SURVEY.md §2.3). Here scale-out is native: a
``jax.sharding.Mesh`` whose axes carry

- ``"buckets"`` — expert-parallel analog: the bucket store is sharded
  across chips, queries are replicated, per-chip partial top-k results are
  merged with an all-gather (see tpulmi/parallel/sharded.py);
- ``"data"`` — data parallel: training batches and k-means rows sharded
  over chips, gradients/statistics reduced by XLA-inserted psums.

Multi-host: call `init_distributed()` once per process before any JAX op;
`make_mesh` then spans every chip in the slice (ICI) / across slices (DCN).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize the JAX distributed runtime for multi-host execution
    (one call per process, before any device use). Arguments default to the
    cluster-environment auto-detection (`jax.distributed.initialize`
    resolves TPU pod metadata itself); returns this process's index.

    Single-process environments may skip this entirely — every mesh helper
    works on the local devices without it."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("buckets",),
    devices=None,
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Create a mesh over the first `n_devices` devices (all by default).

    1-D by default. For multi-axis meshes pass `shape`, one extent per axis
    (e.g. ``make_mesh(8, ("data", "buckets"), shape=(2, 4))``); the device
    count must equal the product."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    devices = np.asarray(devices)
    if shape is None:
        if len(axis_names) != 1:
            raise ValueError(
                f"{len(axis_names)} axes need an explicit `shape`"
            )
        shape = (len(devices),)
    if len(shape) != len(axis_names):
        raise ValueError(f"shape {shape} does not match axes {axis_names}")
    if int(np.prod(shape)) != len(devices):
        raise ValueError(
            f"shape {tuple(shape)} needs {int(np.prod(shape))} devices, "
            f"have {len(devices)}"
        )
    return Mesh(devices.reshape(shape), tuple(axis_names))
