"""CLI driver: flag semantics and the synthetic end-to-end path."""

import os

import numpy as np
import pytest

from tpulmi.cli import _str2bool, main, run
from tpulmi.utils.config import n_buckets_from_percentage


def test_str2bool():
    assert _str2bool("True") and _str2bool("true") and _str2bool("1")
    # the reference's `type=bool` parses "False" as True
    # (`search/search.py:219-230`); ours doesn't
    assert not _str2bool("False") and not _str2bool("0") and not _str2bool("no")


def test_bp_percent_semantics():
    # reference: bp=4 of 122 -> 4 buckets; bp=6 -> 7; zeros dropped; deduped
    assert n_buckets_from_percentage([4], 122) == [4]
    assert n_buckets_from_percentage([6], 122) == [7]
    assert n_buckets_from_percentage([1], 24) == []
    assert n_buckets_from_percentage([25, 26], 24) == [6]


def test_cli_synthetic_end_to_end(tmp_path):
    run(
        synthetic=8000,
        n_categories=12,
        epochs=4,
        lr=0.003,
        buckets_perc=[20],
        size="100K",
        result_dir=str(tmp_path / "result"),
    )
    import glob
    import h5py

    files = glob.glob(str(tmp_path / "result" / "**" / "*.h5"), recursive=True)
    assert len(files) == 1
    with h5py.File(files[0], "r") as f:
        assert f["knns"].shape[1] == 10
        assert f["knns"][:].min() >= 1
        assert f.attrs["buildtime"] > 0 and f.attrs["querytime"] > 0


def test_cli_baseline_path(tmp_path):
    run(
        synthetic=3000,
        n_categories=8,
        index_type="baseline",
        buckets_perc=[25],
        size="100K",
        result_dir=str(tmp_path / "result"),
    )
    import glob

    assert glob.glob(str(tmp_path / "result" / "**" / "li-baseline.h5"),
                     recursive=True)


def test_cli_arg_parsing(tmp_path, monkeypatch):
    main([
        "--synthetic", "3000", "--n-categories", "8", "--epochs", "2",
        "-bp", "25", "--size", "100K",
        "--result-dir", str(tmp_path / "r"),
    ])
    import glob

    assert glob.glob(str(tmp_path / "r" / "**" / "*.h5"), recursive=True)


def test_cli_hierarchical_int8_shard(tmp_path):
    """CLI end-to-end with the round-2 features: two-level index, int8
    store + rerank, sharded search."""
    from tpulmi import cli

    cli.run(
        synthetic=8000, n_categories=6, epochs=3, lr=0.003, k=5,
        buckets_perc=(50,), size="100K",
        hierarchical_groups=3, store_dtype="int8", shard=4,
        result_dir=str(tmp_path),
    )
    import glob
    files = glob.glob(str(tmp_path) + "/**/*.h5", recursive=True)
    assert len(files) == 1


def test_cli_calibrate_prune_probe_mass(tmp_path):
    """CLI end-to-end with the round-3 knobs: router calibration, exact
    threshold prune, probe-mass truncation."""
    from tpulmi import cli

    cli.run(
        synthetic=8000, n_categories=6, epochs=3, lr=0.003, k=5,
        buckets_perc=(40,), size="100K",
        hierarchical_groups=3, calibrate=True, prune=True, probe_mass=0.98,
        result_dir=str(tmp_path),
    )
    import glob
    files = glob.glob(str(tmp_path) + "/**/*.h5", recursive=True)
    assert len(files) == 1


def test_cli_pallas_worklist_flag(tmp_path):
    """--pallas-worklist plumbs SearchConfig.pallas_worklist through the
    driver (on CPU the auto backend resolves to xla, where the knob is
    inert — the kernel-level equivalence lives in test_pallas_topk.py)."""
    main([
        "--synthetic", "6000", "--n-categories", "8", "--epochs", "3",
        "-bp", "25", "--size", "100K", "--k", "5",
        "--pallas-worklist", "true",
        "--result-dir", str(tmp_path / "r"),
    ])
    import glob
    files = glob.glob(str(tmp_path) + "/**/*.h5", recursive=True)
    assert len(files) == 1


def test_cli_int8_f16_rerank(tmp_path):
    """CLI end-to-end with an int8 store reranked from the f16 shadow
    corpus (--rerank-dtype float16)."""
    main([
        "--synthetic", "6000", "--n-categories", "8", "--epochs", "3",
        "-bp", "25", "--size", "100K", "--k", "5",
        "--store-dtype", "int8", "--rerank-dtype", "float16",
        "--result-dir", str(tmp_path / "r"),
    ])
    import glob

    import h5py

    files = glob.glob(str(tmp_path / "r" / "**" / "*.h5"), recursive=True)
    assert len(files) == 1
    with h5py.File(files[0], "r") as f:
        assert f["knns"][:].min() >= 1
