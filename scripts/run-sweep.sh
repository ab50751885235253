#!/usr/bin/env bash
# Hyperparameter grid sweep — replaces the reference's qsub fan-out
# (search/run-multiple.sh): on TPU a build takes seconds, so one process
# sweeps the grid sequentially (tpulmi/sweep.py) instead of one cluster job
# per combination.
set -euo pipefail
cd "$(dirname "$0")/.."
python - "$@" <<'PY'
import sys
from tpulmi.data import synthetic_dataset
from tpulmi.sweep import SweepGrid, results_to_csv, run_sweep

n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
ds = synthetic_dataset(n=n, n_queries=max(n // 30, 100))
grid = SweepGrid(
    lrs=(0.001, 0.003, 0.009),
    model_types=("MLP-5", "MLP-3"),
    epochs=(8,),
    n_categories=(122,),
    buckets_perc=(4, 6, 10),
)
results_to_csv(run_sweep(ds["data_nav"], ds["queries_nav"],
                         ds["data_search"], ds["queries_search"], grid=grid))
PY
