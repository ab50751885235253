"""Hyperparameter sweep driver.

The reference parallelizes its hyperparameter search as one PBS job per
combination (`search/run-multiple.sh:11-34` qsub-ing `run-single.sh` with
env-var overrides). On TPU the economics invert: a build takes seconds, so a
single process sweeps the grid sequentially on one chip, reusing the data on
device and reusing compiled programs whenever shapes repeat.

Grid semantics mirror the reference's loops: preprocess × dataset ×
learning rate × model type × epochs × n_categories, plus probe budgets.

For learning-rate-only grids the training stage can additionally be
batched into ONE vmapped program across configs
(`tpulmi.models.train.train_lr_sweep`) — the per-config matmuls ride the
MXU along the vmap axis instead of running one job per combo.
"""

import itertools
import time
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from tpulmi.baseline import Baseline
from tpulmi.index import LearnedIndex
from tpulmi.utils.config import IndexConfig, n_buckets_from_percentage
from tpulmi.utils.logging import get_logger

log = get_logger("tpulmi.sweep")


@dataclass
class SweepGrid:
    """Default values = the reference sweep's grid shape
    (`search/run-multiple.sh:5-12`), trimmed to sensible TPU budgets."""

    lrs: Sequence[float] = (0.009,)
    model_types: Sequence[str] = ("MLP-5",)
    epochs: Sequence[int] = (12,)
    n_categories: Sequence[int] = (122,)
    buckets_perc: Sequence[int] = (4,)

    def combos(self):
        return itertools.product(
            self.lrs, self.model_types, self.epochs, self.n_categories
        )


@dataclass
class SweepResult:
    lr: float
    model_type: str
    epochs: int
    n_categories: int
    n_buckets: int
    build_s: float
    search_s: float
    recall: float


def _load_done(resume_path: str):
    """Completed (lr, model, epochs, n_cat, n_buckets) keys from a prior
    (possibly crashed) sweep's incremental CSV."""
    import csv
    import os

    done = set()
    if resume_path and os.path.exists(resume_path):
        with open(resume_path, newline="") as f:
            for row in csv.DictReader(f):
                done.add((float(row["lr"]), row["model_type"],
                          int(row["epochs"]), int(row["n_categories"]),
                          int(row["n_buckets"])))
    return done


def run_sweep(
    data_nav,
    queries_nav,
    data_search=None,
    queries_search=None,
    grid: SweepGrid = SweepGrid(),
    k: int = 10,
    gt_ids: Optional[np.ndarray] = None,
    resume_path: Optional[str] = None,
) -> List[SweepResult]:
    """Sweep the grid; returns one row per (combo, probe budget).

    `gt_ids` (1-based, (Q, ≥k)) enables recall scoring; if omitted it is
    computed once with the exact oracle.

    `resume_path` makes the sweep crash-resumable: each completed row is
    appended (and flushed) to the CSV immediately, and a restarted sweep
    skips every combination already recorded — the failure-recovery story
    the reference's fire-and-forget PBS fan-out lacks entirely
    (`search/run-multiple.sh`, jobs restart from zero)."""
    import csv
    import os

    if data_search is None:
        data_search = data_nav
    if queries_search is None:
        queries_search = queries_nav
    if gt_ids is None:
        log.info("computing exact ground truth (%d queries)", len(queries_search))
        _, gt_ids, _ = Baseline().search(queries_search, data_search, k=k)

    done = _load_done(resume_path)
    writer = None
    if resume_path:
        new_file = not os.path.exists(resume_path)
        fh = open(resume_path, "a", newline="")
        writer = csv.writer(fh)
        if new_file:
            writer.writerow(
                ["lr", "model_type", "epochs", "n_categories", "n_buckets",
                 "build_s", "search_s", "recall"])
            fh.flush()
        if done:
            log.info("resuming sweep: %d rows already complete", len(done))

    results = []
    for lr, model_type, epochs, n_cat in grid.combos():
        probe_budgets = [
            b for b in n_buckets_from_percentage(list(grid.buckets_perc), n_cat)
            if (float(lr), model_type, int(epochs), int(n_cat), b) not in done
        ]
        if not probe_budgets:
            continue
        cfg = IndexConfig(
            n_categories=n_cat, epochs=epochs, lr=lr, model_type=model_type
        )
        li = LearnedIndex(cfg)
        t0 = time.perf_counter()
        li.build(data_nav, data_search)
        build_s = time.perf_counter() - t0
        for n_buckets in probe_budgets:
            t0 = time.perf_counter()
            _, ids = li.search(
                queries_nav, queries_search, n_buckets=n_buckets, k=k
            )
            search_s = time.perf_counter() - t0
            recall = float(np.mean([
                len(set(ids[i, :k]) & set(gt_ids[i, :k])) / k
                for i in range(ids.shape[0])
            ]))
            row = SweepResult(lr, model_type, epochs, n_cat, n_buckets,
                              build_s, search_s, recall)
            results.append(row)
            if writer is not None:
                writer.writerow([lr, model_type, epochs, n_cat, n_buckets,
                                 f"{build_s:.2f}", f"{search_s:.3f}",
                                 f"{recall:.4f}"])
                fh.flush()
            log.info(
                "lr=%g model=%s ep=%d cat=%d probes=%d: build %.1fs "
                "search %.2fs recall %.4f",
                lr, model_type, epochs, n_cat, n_buckets,
                build_s, search_s, recall,
            )
    if writer is not None:
        fh.close()
    return results


def results_to_csv(results: List[SweepResult], path: str = "sweep.csv") -> None:
    import csv

    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["lr", "model_type", "epochs", "n_categories", "n_buckets",
                    "build_s", "search_s", "recall"])
        for r in results:
            w.writerow([r.lr, r.model_type, r.epochs, r.n_categories,
                        r.n_buckets, f"{r.build_s:.2f}", f"{r.search_s:.3f}",
                        f"{r.recall:.4f}"])
    log.info("wrote %s (%d rows)", path, len(results))
