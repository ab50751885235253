"""Config semantics: the training schedule derivation and its documented cap
(VERDICT r1 item 7 / ADVICE r1: `epochs` must mean what the docs say)."""

import numpy as np

from tpulmi.models.train import train_plan
from tpulmi.utils.config import IndexConfig


def test_train_plan_per_batch_semantics():
    # default: a step per batch, n // batch_size steps per epoch
    epochs, spe, total = train_plan(300_000, 12, 1024)
    assert spe == 300_000 // 1024 == 292
    assert epochs == 12
    assert total == 12 * 292


def test_train_plan_reference_semantics():
    # reference_step_semantics: ONE step per epoch (the reference's
    # last-batch-only loop, `search/li/model.py:186-198`)
    epochs, spe, total = train_plan(
        300_000, 205, 256, reference_step_semantics=True
    )
    assert spe == 1 and epochs == 205 and total == 205


def test_train_plan_cap_truncates_to_whole_epochs():
    # 10M rows, reference-scale epoch count: the cap prevents the ~8M-step
    # schedule, truncating to whole epochs
    epochs, spe, total = train_plan(10_000_000, 205, 1024, max_train_steps=20_000)
    assert spe == 10_000_000 // 1024
    assert epochs == max(20_000 // spe, 1) == 2
    assert total == 2 * spe <= 20_000


def test_train_plan_cap_always_allows_one_epoch():
    epochs, spe, total = train_plan(100_000, 5, 100, max_train_steps=10)
    assert epochs == 1 and total == spe


def test_default_config_matches_bench():
    # IndexConfig() defaults ARE the benched configuration (bench.py) — the
    # defaults must reproduce the published numbers without overrides
    cfg = IndexConfig()
    assert (cfg.epochs, cfg.lr, cfg.batch_size, cfg.model_type) == (
        12, 0.003, 1024, "MLP-5"
    )
    epochs, spe, total = train_plan(
        300_000, cfg.epochs, cfg.batch_size, cfg.max_train_steps
    )
    assert (epochs, total) == (12, 12 * 292)  # cap does not bind at 300K


def test_small_data_one_step_floor():
    epochs, spe, total = train_plan(100, 3, 1024)
    assert spe == 1 and total == 3


def test_build_program_respects_cap():
    """The fused build trains exactly the planned number of steps: the
    returned per-epoch loss vector has the capped epoch count."""
    import jax
    from tpulmi.build import make_build_program
    from tpulmi.models.mlp import make_model
    import optax

    n, d, c = 2048, 8, 4
    model = make_model("MLP", c)
    prog = make_build_program(
        model, optax.adam(1e-2), n=n, d_nav=d, n_categories=c,
        kmeans_iters=2, epochs=50, batch_size=256, max_train_steps=16,
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, d)).astype(np.float32)
    out = prog(x, x, jax.random.PRNGKey(0))
    # 2048 // 256 = 8 steps/epoch; cap 16 -> 2 epochs
    assert out.losses.shape == (2,)
