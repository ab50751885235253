"""Worker process for the 2-process CPU multi-host test (run by
tests/test_multihost.py, one invocation per process).

Exercises the real multi-host runtime path end-to-end: `init_distributed`
(jax.distributed + Gloo CPU collectives), a global mesh spanning both
processes, the data-parallel train step (cross-process gradient pmean),
and the bucket-sharded probe search over a store built with
`shard_store_from_host` on the global mesh — each process materializes
only its own shards. SURVEY.md §2.3 comm-backend plan; VERDICT r2
missing #3 (init_distributed was dead code)."""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    from tpulmi.parallel.mesh import init_distributed, make_mesh

    idx = init_distributed(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
    assert idx == pid
    assert jax.process_count() == nproc
    n_dev = len(jax.devices())
    assert n_dev == nproc * len(jax.local_devices())

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpulmi.hoststore import layout_host_store
    from tpulmi.models.mlp import make_model
    from tpulmi.parallel.sharded import (
        make_dp_train_step,
        shard_store_from_host,
        sharded_probe_search,
    )

    rng = np.random.default_rng(0)  # identical on every process (SPMD)

    # ---- 1. data-parallel training across processes ----
    mesh = make_mesh(axis_names=("data",))
    model = make_model("MLP-5", n_classes=6)
    tx = optax.adam(1e-2)
    params = jax.device_get(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)))["params"])
    opt_state = jax.device_get(tx.init(params))
    step = make_dp_train_step(model, tx, mesh)
    xb = rng.normal(size=(4 * n_dev, 8)).astype(np.float32)
    yb = rng.integers(0, 6, size=4 * n_dev).astype(np.int32)
    bsh = NamedSharding(mesh, P("data"))
    xb_g = jax.make_array_from_callback(xb.shape, bsh, lambda i: xb[i])
    yb_g = jax.make_array_from_callback(yb.shape, bsh, lambda i: yb[i])
    params, opt_state, loss = step(params, opt_state, xb_g, yb_g)
    loss = float(jax.device_get(loss))
    # grads were pmean'd: the replicated params must be identical across
    # processes — print a parameter fingerprint for the parent to compare
    fp = float(sum(np.abs(np.asarray(jax.device_get(v))).sum()
                   for v in jax.tree_util.tree_leaves(params)))

    # ---- 2. bucket-sharded search over a store built on the global mesh
    # (each process touches only its own shards) ----
    n, d, n_cat, q, k = 2000, 16, 2 * n_dev, 24, 5
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    labels = rng.integers(0, n_cat, size=n).astype(np.int32)
    arrays = layout_host_store(labels, data, n_cat, row_align=1,
                               store_dtype="float32", normalized=True,
                               pad_rows=64)
    mesh_ep = make_mesh(axis_names=("buckets",))
    sstore = shard_store_from_host(arrays, mesh_ep)
    # every process only materialized its local shards
    assert all(s.data.shape[0] == 1
               for s in sstore.data_sorted.addressable_shards)
    assert (len(sstore.data_sorted.addressable_shards)
            == len(jax.local_devices()))

    queries = rng.normal(size=(q, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    probes = np.stack([rng.permutation(n_cat)[:3] for _ in range(q)]
                      ).astype(np.int32)
    dists, ids = sharded_probe_search(probes, queries, sstore, mesh_ep, k=k)
    dists = np.asarray(jax.device_get(dists))
    ids = np.asarray(jax.device_get(ids))

    # exact expectation computed on the host from the same inputs
    want = np.empty((q, k), np.float32)
    for i in range(q):
        mask = np.isin(labels, probes[i])
        dd = 1.0 - data[mask] @ queries[i]
        want[i] = np.sort(dd)[:k]
    np.testing.assert_allclose(dists, want, atol=1e-5)

    print(f"MHOK pid={pid} loss={loss:.6f} fp={fp:.6f}", flush=True)


if __name__ == "__main__":
    main()
