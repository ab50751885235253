"""100M-density rehearsal on the virtual 8-device mesh.

The v5e-8 100M story (docs/SCALING.md §4) rests on two measured rungs —
20M/40M on one real chip — plus `dryrun_multichip` (1024 rows) and the
round-4 1M/120-bucket rehearsal. Round 4's gap (VERDICT missing #2): that
rehearsal ran ~8.3k rows/bucket while 100M/976 is ~102k rows/bucket — an
order of magnitude off in every per-shard shape. This script closes it by
rehearsing the topology at the TRUE densities, scaled down in bucket COUNT
instead of bucket SIZE:

- ~102k rows/bucket and ~205k rows/cluster (100M: 976 buckets over 488
  natural clusters; here N/102k buckets over N/205k clusters — the same
  2 buckets/cluster geometry the measured 40M rung uses);
- hierarchical router, one contiguous group-range per mesh device,
  per-shard packed-int4 host-store upload, calibrated outer weight, exact
  host rerank — the exact v5e-8 serving stack;
- the sharded Pallas kernel (interpret mode on CPU) validated at the
  100k-row bucket shape (≈100 chunk-steps per query block — the deepest
  accumulator carry any rung exercises) against the XLA sharded backend;
- the dispatch-ahead sharded `search_stream` checked for result parity;
- a per-shard byte audit anchored to the measured 40M single-chip store,
  extrapolated to the 100M/8-shard configuration.

Gated at the same recall >= 0.90 the real-chip benches use. Mirrors the
reference's recall evaluation contract
(`/root/reference/search/search.py:144-167`) on the multi-chip path the
reference does not have. Run:

    python scripts/rehearse_mesh.py           # ~1-1.5 h on one CPU core

(forces JAX_PLATFORMS=cpu + 8 virtual host devices internally; safe to run
while a real-chip bench owns the TPU tunnel — but it is CPU-hungry, so
don't overlap it with a bench's TIMED phases on a one-core host).
"""
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # sitecustomize force-selects axon

import numpy as np  # noqa: E402

N = int(os.environ.get("RM_N", 4_000_000))
N_QUERIES = int(os.environ.get("RM_Q", 1000))
K = 10
N_GROUPS = 8              # one group-range per mesh device, as at 100M
# 100M-density scaling: ~102k rows/bucket (100M/976), ~205k rows/cluster
# (100M/488) — identical per-bucket and per-cluster sizes to the target,
# fewer of them. 4M -> 40 buckets (8 groups x 5) over 20 clusters.
ROWS_PER_BUCKET = int(os.environ.get("RM_RPB", 102_000))
ROWS_PER_CLUSTER = int(os.environ.get("RM_RPC", 205_000))
N_CAT_INNER = max(N // ROWS_PER_BUCKET // N_GROUPS, 2)
N_CLUSTERS = max(N // ROWS_PER_CLUSTER, 4)
SEED = 2023
CACHE = os.environ.get("RM_CACHE", ".bench_cache")
RECALL_GATE = 0.90
# measured single-chip 40M anchor (BENCH_40M.md): packed-int4 store +
# scales + ids for 40.9M padded rows on one 16 GB chip
ANCHOR_40M_ROWS = 40_000_000


def main():
    import ml_dtypes

    from tpulmi.baseline import exact_knn_streamed
    from tpulmi.hierarchical import HierarchicalConfig, HierarchicalIndex
    from tpulmi.parallel.mesh import make_mesh
    from tpulmi.utils.config import IndexConfig, SearchConfig
    from tpulmi.data import synthetic_dataset_big

    assert len(jax.devices()) == 8, jax.devices()
    n_buckets_global = N_GROUPS * N_CAT_INNER
    print(f"# topology: {N} rows, {N_GROUPS}x{N_CAT_INNER} = "
          f"{n_buckets_global} buckets (~{N // n_buckets_global} rows each) "
          f"over {N_CLUSTERS} clusters", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    ds = synthetic_dataset_big(
        n=N, n_queries=max(N_QUERIES, 1000), d_nav=96, d_search=768,
        n_clusters=N_CLUSTERS, seed=SEED, cache_dir=CACHE,
    )
    qn = np.asarray(ds["queries_nav"][:N_QUERIES], np.float32)
    qs = np.asarray(ds["queries_search"][:N_QUERIES], np.float32)
    t_gen = time.perf_counter() - t0

    gt_path = os.path.join(
        CACHE, f"gt_rehearse_n{N}_c{N_CLUSTERS}_q{N_QUERIES}.npz")
    if os.path.exists(gt_path):
        gt_ids = np.load(gt_path)["ids"]
    else:
        _, gt_ids = exact_knn_streamed(qs, ds["data_search"], k=K,
                                       resume_path=gt_path + ".part")
        gt_ids = gt_ids + 1  # 1-based, as the facade returns
        np.savez_compressed(gt_path, ids=gt_ids)
        if os.path.exists(gt_path + ".part"):
            os.remove(gt_path + ".part")

    mesh = make_mesh(8, ("buckets",))
    # Checkpoint the built index: the 4M build is ~1.5 h of single-core
    # CPU — a depth/probe re-sweep must not pay it again (the corpus stays
    # a disk memmap, so the checkpoint records its path instead of bytes).
    ckpt = os.path.join(os.path.abspath(CACHE),
                        f"rehearse_ckpt_n{N}_g{N_GROUPS}x{N_CAT_INNER}")
    if os.path.isdir(ckpt):
        t_build = time.perf_counter()
        hi = HierarchicalIndex.load(ckpt)
        hi.shard(mesh)
        t_build = time.perf_counter() - t_build
        calib = {"best": float(getattr(hi.built.classifier.model,
                                       "outer_weight", 1.0))}
        print(f"# loaded checkpoint in {t_build:.0f}s (outer_weight="
              f"{calib['best']})", file=sys.stderr, flush=True)
    else:
        hi = HierarchicalIndex(HierarchicalConfig(
            n_groups=N_GROUPS,
            outer_epochs=6,
            outer_lr=0.003,
            calibrate_budget=0,
            router_restarts=int(os.environ.get("RM_RESTARTS", 1)),
            inner=IndexConfig(
                n_categories=N_CAT_INNER, epochs=8, lr=0.003,
                model_type="MLP-5",
                batch_size=4096, seed=SEED,
                # the real kernel alignment (Pallas data block): ~1% padding
                # at 100k-row buckets, and it keeps every per-shard store
                # kernel-eligible exactly as the 40M rung is
                row_align=1024,
            ),
        ))
        t_build = time.perf_counter()
        hi.build_with_host_store(
            ds["data_nav"].astype(ml_dtypes.bfloat16), ds["data_search"],
            normalized=True, store_dtype="int4", mesh=mesh,
        )
        t_build = time.perf_counter() - t_build
        calib = hi.calibrate_outer_weight(ds["data_nav"][:], probe_budget=8)
        print(f"# build {t_build:.0f}s calib {calib}", file=sys.stderr,
              flush=True)
        hi.save(ckpt)

    import jax.numpy as jnp
    qn_d = jnp.asarray(qn)
    qs_d = jnp.asarray(qs)
    q_host = np.ascontiguousarray(qs, np.float32)

    # ---- per-shard byte audit (the 100M capacity claim, measured) ----
    sstore, _ = hi._sharded
    rows_shard = int(sstore.data_sorted.shape[1])
    d_stored = int(sstore.data_sorted.shape[2])
    store_b = rows_shard * d_stored          # packed int4 codes
    scales_b = int(np.prod(sstore.scales.shape[1:])) * 4
    ids_b = rows_shard * 4
    per_shard_bytes = store_b + scales_b + ids_b
    bytes_per_row = per_shard_bytes / rows_shard
    # 100M on v5e-8: 12.5M rows/shard at the same bytes/row, vs the
    # measured 40M single-chip point at identical layout
    shard_100m_gb = 100e6 / 8 * bytes_per_row / 1e9
    anchor_40m_gb = ANCHOR_40M_ROWS * bytes_per_row / 1e9
    print(f"# per-shard: {rows_shard} rows, {per_shard_bytes/1e9:.3f} GB "
          f"({bytes_per_row:.1f} B/row) -> 100M/8 = {shard_100m_gb:.2f} GB/"
          f"shard; 40M single-chip anchor = {anchor_40m_gb:.2f} GB",
          file=sys.stderr, flush=True)

    # ---- recall sweep on the sharded XLA backend (full query set) ----
    # The candidate-cut plateau scales with BUCKET depth: at 102k-row
    # buckets the int4 default rerank depth (30) saturates under the gate
    # with router containment ~0.95 (first 4M run: 0.8859 @ 12 probes) —
    # the same probe-independent signature the 40M chip rung measured at
    # 41k-row buckets. Mirror the bench's RR_UP ladder: when the probe
    # sweep saturates, escalate the exact-rerank depth at the deepest
    # budget, then walk probes back down while the gate holds.
    def run_probe(probes, extra=None):
        scfg = SearchConfig(k=K, n_buckets=probes, backend="xla",
                            rerank_extra=extra)
        t = time.perf_counter()
        _, ids = hi.search(qn_d, qs_d, n_buckets=probes, k=K,
                           search_config=scfg, queries_search_host=q_host)
        t = time.perf_counter() - t
        recall = float(np.mean([
            len(set(ids[i]) & set(gt_ids[i])) / K for i in range(N_QUERIES)
        ]))
        print(f"# probes={probes} extra={extra or 'default'}: recall "
              f"{recall:.4f} ({t:.1f}s cpu)", file=sys.stderr, flush=True)
        return recall

    sweep = []
    headline = None
    extra_used = None
    for probes in (2, 4, 6, 8, 12):
        recall = run_probe(probes)
        sweep.append({"probes": probes, "recall_at_10": round(recall, 4)})
        if recall >= RECALL_GATE and headline is None:
            headline = (probes, recall)
            break  # CPU minutes per budget; the gate point is the result
    if headline is None:
        deepest = sweep[-1]["probes"]
        for extra in (60, 100):
            recall = run_probe(deepest, extra)
            sweep.append({"probes": deepest, "rerank_extra": extra,
                          "recall_at_10": round(recall, 4)})
            if recall >= RECALL_GATE:
                headline, extra_used = (deepest, recall), extra
                break
        if headline is not None:
            for probes in (8, 6, 4):  # cheapest gate point at the depth
                recall = run_probe(probes, extra_used)
                sweep.append({"probes": probes, "rerank_extra": extra_used,
                              "recall_at_10": round(recall, 4)})
                if recall >= RECALL_GATE:
                    headline = (probes, recall)
                else:
                    break
    ok = headline is not None
    gate_probes = headline[0] if ok else sweep[-1]["probes"]

    # ---- dispatch-ahead sharded stream: result parity with search ----
    stream_ok = None
    try:
        scfg = SearchConfig(k=K, n_buckets=gate_probes, backend="xla",
                            rerank_extra=extra_used)
        _, want = hi.search(qn_d, qs_d, n_buckets=gate_probes, k=K,
                            search_config=scfg, queries_search_host=q_host)
        got = None
        for _, got in hi.search_stream(
                [(qn_d, qs_d, q_host)] * 2, n_buckets=gate_probes, k=K,
                search_config=scfg, depth=2):
            pass
        stream_ok = bool(np.array_equal(got, want))
    except Exception as e:  # noqa: BLE001
        print(f"# stream parity failed: {e}", file=sys.stderr, flush=True)
        stream_ok = False
    print(f"# dispatch-ahead stream parity: {stream_ok}", file=sys.stderr,
          flush=True)

    # ---- sharded Pallas kernel at the 100k-row bucket shape ----
    # interpret mode on CPU is slow, so a micro query batch: what matters
    # is the kernel running the TRUE per-shard geometry — ~100 chunk-steps
    # per query block (102k-row buckets / mc=1024), int8 query tiles,
    # packed int4 unpack — and agreeing with the XLA sharded backend.
    pallas_ok = None
    wl_40m_items = qpb_pad_used = None
    try:
        mq = int(os.environ.get("RM_PALLAS_Q", 32))
        scfg_p = SearchConfig(k=K, n_buckets=2, backend="pallas",
                              pallas_qc=96, pallas_mc=1024,
                              int8_queries=True)
        scfg_x = SearchConfig(k=K, n_buckets=2, backend="xla")
        t0p = time.perf_counter()
        _, ids_p = hi.search(qn_d[:mq], qs_d[:mq], n_buckets=2, k=K,
                             search_config=scfg_p,
                             queries_search_host=q_host[:mq])
        t_pal = time.perf_counter() - t0p
        _, ids_x = hi.search(qn_d[:mq], qs_d[:mq], n_buckets=2, k=K,
                             search_config=scfg_x,
                             queries_search_host=q_host[:mq])
        agree = float(np.mean([
            len(set(ids_p[i]) & set(ids_x[i])) / K for i in range(mq)
        ]))
        # int8 query tiles shift near-ties; the exact rerank re-orders both
        # candidate pools, so demand near-total agreement, not bit equality
        pallas_ok = agree >= 0.95
        print(f"# sharded pallas (interpret, {mq} queries, "
              f"{t_pal:.0f}s): agreement {agree:.3f}", file=sys.stderr,
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"# sharded pallas micro-dispatch failed: {e}",
              file=sys.stderr, flush=True)
        pallas_ok = False

    # ---- pad arithmetic at the TRUE 100M serving shape ----
    # 10k queries x 16/976 probes on 8 shards: per-shard slots, query
    # blocks, and the single-chip 40M worklist the chunked kernel must
    # cover — every term from this rehearsal's measured bucket stats.
    counts = np.asarray(jax.device_get(hi.built.store.counts))
    rpb_mean = float(counts.mean())
    steps_per_bucket = int(np.ceil(counts.max() / 1024))
    slots_100m = 10_000 * 16
    slots_per_shard = slots_100m // 8
    buckets_per_shard = 976 // 8
    blocks_per_shard = int(np.ceil(slots_per_shard / 96)) + buckets_per_shard
    wl_shard_items = blocks_per_shard * steps_per_bucket
    # single-chip 40M (16 probes, 976 buckets, 41k-row buckets -> 41 steps)
    wl_40m_items = (int(np.ceil(slots_100m / 96)) + 976) * int(
        np.ceil(41_000 / 1024))
    from tpulmi.ops.pallas_topk import WL_PAD_MAX, wl_item_cap
    qpb_pad_used = hi._qpb_pads.get((N_QUERIES, gate_probes))

    result = {
        "metric": "rehearsal_recall_100Mdensity_int4_8dev_virtual_mesh",
        "value": round(headline[1], 4) if ok else sweep[-1]["recall_at_10"],
        "unit": "recall@10",
        "n_rows": N,
        "n_queries": N_QUERIES,
        "probes": headline[0] if ok else None,
        "rerank_extra": extra_used,
        "n_global_buckets": n_buckets_global,
        "rows_per_bucket_mean": round(rpb_mean),
        "rows_per_bucket_max": int(counts.max()),
        "n_clusters": N_CLUSTERS,
        "store": "int4+rerank, one group-range per device",
        "outer_weight": calib["best"],
        "sweep": sweep,
        "build_s": round(t_build, 1),
        "datagen_s": round(t_gen, 1),
        "stream_parity": stream_ok,
        "sharded_pallas_ok": pallas_ok,
        # capacity + pad audit, every term measured here or at 40M
        "per_shard_bytes": per_shard_bytes,
        "bytes_per_row": round(bytes_per_row, 2),
        "shard_100m_gb": round(shard_100m_gb, 2),
        "anchor_40m_gb": round(anchor_40m_gb, 2),
        "qpb_pad_used": qpb_pad_used,
        "wl_100m_per_shard_items": wl_shard_items,
        "wl_40m_single_chip_items": wl_40m_items,
        "wl_chunked_cap": wl_item_cap(steps_per_bucket),
        "wl_smem_cap_per_dispatch": WL_PAD_MAX,
        "ok": bool(ok and stream_ok and pallas_ok),
    }
    print(json.dumps(result))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
