"""Sweep driver + evaluation module, end to end on tiny data."""

import numpy as np
import pytest

from tpulmi.data import synthetic_dataset
from tpulmi.evaluate import recall_at_k
from tpulmi.sweep import SweepGrid, results_to_csv, run_sweep
from tpulmi.utils.profiling import phase_timer, sync, timeit


def test_run_sweep_tiny(tmp_path):
    ds = synthetic_dataset(n=5000, n_queries=50, d_nav=16, d_search=64,
                           n_clusters=8, seed=3)
    grid = SweepGrid(lrs=(0.003,), model_types=("MLP",), epochs=(4,),
                     n_categories=(8,), buckets_perc=(25, 50))
    results = run_sweep(ds["data_nav"], ds["queries_nav"],
                        ds["data_search"], ds["queries_search"], grid=grid)
    assert len(results) == 2  # 25% -> 2 buckets, 50% -> 4 buckets
    assert {r.n_buckets for r in results} == {2, 4}
    by_buckets = {r.n_buckets: r.recall for r in results}
    assert by_buckets[4] >= by_buckets[2] - 0.05
    assert all(r.build_s > 0 and r.search_s > 0 for r in results)

    csv_path = tmp_path / "sweep.csv"
    results_to_csv(results, str(csv_path))
    lines = csv_path.read_text().strip().splitlines()
    assert len(lines) == 3 and lines[0].startswith("lr,")


def test_plot_results(tmp_path):
    pytest.importorskip("matplotlib")
    from tpulmi.evaluate import EvalRow, plot_results

    rows = [EvalRow("A", "p1", "d", "s", 1.0, 0.5, 0.91, 2000.0),
            EvalRow("A", "p2", "d", "s", 1.0, 0.2, 0.85, 5000.0)]
    out = tmp_path / "pareto.png"
    plot_results(rows, str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_recall_at_k():
    gt = np.array([[1, 2, 3], [4, 5, 6]])
    res = np.array([[3, 2, 9], [4, 5, 6]])
    assert recall_at_k(res, gt, k=3) == (2 + 3) / 6


def test_profiling_helpers():
    import jax.numpy as jnp

    x = jnp.ones((64, 64))
    sync(x)
    timings = {}
    with phase_timer("mm", timings) as mark:
        mark(x @ x)
    assert timings["mm"] > 0

    best, result = timeit(lambda a: a @ a, x, repeats=2)
    assert best > 0 and result.shape == (64, 64)


def test_sweep_crash_resume(synthetic_small, tmp_path):
    """A sweep interrupted mid-grid resumes from its incremental CSV:
    completed combinations are skipped, the final file covers the grid."""
    from tpulmi.sweep import SweepGrid, run_sweep, _load_done

    path = str(tmp_path / "sweep.csv")
    grid = SweepGrid(lrs=(0.003, 0.01), epochs=(3,), n_categories=(8,),
                     buckets_perc=(30,))
    # "crashed" first attempt: only the first combo ran
    partial = SweepGrid(lrs=(0.003,), epochs=(3,), n_categories=(8,),
                        buckets_perc=(30,))
    run_sweep(synthetic_small["data_nav"][:5000],
              synthetic_small["queries_nav"][:50],
              synthetic_small["data_search"][:5000],
              synthetic_small["queries_search"][:50],
              grid=partial, k=5, resume_path=path)
    assert len(_load_done(path)) == 1

    # resume with the full grid: only the missing combo runs
    results = run_sweep(synthetic_small["data_nav"][:5000],
                        synthetic_small["queries_nav"][:50],
                        synthetic_small["data_search"][:5000],
                        synthetic_small["queries_search"][:50],
                        grid=grid, k=5, resume_path=path)
    assert len(results) == 1          # one new row, not two
    assert results[0].lr == 0.01
    assert len(_load_done(path)) == 2  # file now covers the grid
