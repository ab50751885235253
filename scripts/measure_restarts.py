"""Measure best-of-R router selection vs single-build seed variance (CPU).

Builds the 300K-replica hierarchical shape from scratch under S distinct
seeds (restarts=1 each), records every candidate's pseudo-query containment
and its measured recall@10 at a fixed probe budget, then checks that the
containment ranking is a usable selector: the candidate the restarts
machinery would pick (max containment) should land in the upper half of the
recall distribution. This is the evidence behind
`HierarchicalConfig.router_restarts` (NOTES.md round-4: a 20M rebuild
landed 0.8993 where round 3 measured 0.9105 at the same budget — seed
variance, not a regression).

Runs on the CPU backend (no TPU claim): JAX_PLATFORMS handled in-process.
Usage: python scripts/measure_restarts.py [n_seeds] [n_rows]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    from tpulmi.baseline import Baseline
    from tpulmi.data import synthetic_dataset
    from tpulmi.hierarchical import HierarchicalConfig, HierarchicalIndex
    from tpulmi.utils.config import IndexConfig

    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    budget, k = 8, 10

    ds = synthetic_dataset(n=n, n_queries=2000, n_clusters=122, seed=7)
    _, gt, _ = Baseline().search(ds["queries_search"], ds["data_search"],
                                 k=k)

    rows = []
    for s in range(n_seeds):
        cfg = HierarchicalConfig(
            n_groups=4, outer_epochs=6, outer_lr=0.003,
            calibrate_budget=budget, seed=2023 + 1000 * s,
            inner=IndexConfig(n_categories=30, epochs=8, lr=0.003,
                              model_type="MLP-5", batch_size=1024,
                              row_align=1),
        )
        hi = HierarchicalIndex(cfg)
        t0 = time.perf_counter()
        hi.build(ds["data_nav"], ds["data_search"])
        t_build = time.perf_counter() - t0
        # score the as-built stack exactly as the restarts selector would
        qidx, nng = hi._nn_pseudo_queries(
            np.asarray(ds["data_nav"], np.float32), seed=2023 + 311)
        score, _ = hi._containment_score(
            hi.built.classifier, np.asarray(ds["data_nav"], np.float32),
            qidx, nng, budget)
        _, ids = hi.search(ds["queries_nav"], ds["queries_search"],
                           n_buckets=budget, k=k)
        recall = float(np.mean([
            len(set(ids[i]) & set(gt[i])) / k for i in range(ids.shape[0])
        ]))
        rows.append({"seed": cfg.seed, "containment": round(score, 4),
                     "recall": round(recall, 4),
                     "build_s": round(t_build, 1)})
        print(f"# seed {cfg.seed}: containment@{budget}={score:.4f} "
              f"recall@{k}={recall:.4f} ({t_build:.0f}s)", file=sys.stderr,
              flush=True)

    recalls = [r["recall"] for r in rows]
    scores = [r["containment"] for r in rows]
    picked = rows[int(np.argmax(scores))]
    # rank correlation between the selector and the measured recall
    rank_s = np.argsort(np.argsort(scores))
    rank_r = np.argsort(np.argsort(recalls))
    # zero variance on either side makes corrcoef NaN (invalid JSON) —
    # report None instead
    degenerate = np.std(scores) == 0 or np.std(recalls) == 0
    tau = (float(np.corrcoef(rank_s, rank_r)[0, 1])
           if n_seeds > 2 and not degenerate else None)
    out = {
        "n": n, "budget": budget, "seeds": n_seeds,
        "candidates": rows,
        "recall_min": min(recalls), "recall_max": max(recalls),
        "recall_spread": round(max(recalls) - min(recalls), 4),
        "picked_recall": picked["recall"],
        "picked_is_top_half": picked["recall"]
        >= float(np.median(recalls)),
        "rank_corr": None if tau is None else round(tau, 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    code = main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(code)
