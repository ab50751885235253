"""Two-level hierarchical index vs the exact oracle and the flat index."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpulmi.baseline import Baseline
from tpulmi.hierarchical import HierarchicalConfig, HierarchicalIndex
from tpulmi.utils.config import IndexConfig


@pytest.fixture(scope="module")
def built_hier(synthetic_small):
    cfg = HierarchicalConfig(
        n_groups=4,
        outer_epochs=6,
        outer_lr=0.003,
        inner=IndexConfig(n_categories=8, epochs=6, lr=0.003,
                          model_type="MLP-5", row_align=1),
    )
    hi = HierarchicalIndex(cfg)
    hi.build(synthetic_small["data_nav"], synthetic_small["data_search"])
    return hi


def test_hierarchical_recall(built_hier, synthetic_small):
    _, gt, _ = Baseline().search(
        synthetic_small["queries_search"], synthetic_small["data_search"], k=10
    )
    _, ids = built_hier.search(
        synthetic_small["queries_nav"], synthetic_small["queries_search"],
        n_groups=2, n_buckets=4, k=10,
    )
    assert ids.min() >= 1
    recall = np.mean([
        len(set(ids[i]) & set(gt[i])) / 10 for i in range(ids.shape[0])
    ])
    assert recall > 0.8


def test_hierarchical_more_groups_more_recall(built_hier, synthetic_small):
    _, gt, _ = Baseline().search(
        synthetic_small["queries_search"], synthetic_small["data_search"], k=10
    )

    def recall(n_groups):
        _, ids = built_hier.search(
            synthetic_small["queries_nav"], synthetic_small["queries_search"],
            n_groups=n_groups, n_buckets=8, k=10,
        )
        return np.mean([
            len(set(ids[i]) & set(gt[i])) / 10 for i in range(ids.shape[0])
        ])

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1 - 0.02
    assert r4 > 0.9


def test_no_duplicate_ids(built_hier, synthetic_small):
    _, ids = built_hier.search(
        synthetic_small["queries_nav"][:50], synthetic_small["queries_search"][:50],
        n_groups=3, n_buckets=4, k=10,
    )
    for row in ids:
        real = row[row >= 1]
        assert len(set(real)) == len(real)


def test_joint_router_logits_shape(built_hier, synthetic_small):
    """The factorized router exposes flat (Q, G*C) joint scores
    w·logP(g|q) + logP(b|q,g); the unweighted components are true
    log-probabilities (logsumexp == 0) and apply() is their calibrated
    combination."""
    import jax
    import jax.numpy as jnp

    clf = built_hier.built.classifier
    q = jnp.asarray(synthetic_small["queries_nav"][:16])
    logits = clf.model.apply({"params": clf.params}, q)
    assert logits.shape == (16, 4 * 8)
    lo, li = clf.model.components({"params": clf.params}, q)
    np.testing.assert_allclose(
        np.asarray(jax.scipy.special.logsumexp(lo, axis=1)), 0.0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(jax.scipy.special.logsumexp(li, axis=2)), 0.0, atol=1e-4)
    w = clf.model.outer_weight
    want = (w * np.asarray(lo)[:, :, None] + np.asarray(li)).reshape(16, -1)
    np.testing.assert_allclose(np.asarray(logits), want, atol=1e-5)


def test_hierarchical_save_load(built_hier, synthetic_small, tmp_path):
    d1, i1 = built_hier.search(
        synthetic_small["queries_nav"][:32], synthetic_small["queries_search"][:32],
        n_buckets=8, k=10,
    )
    built_hier.save(str(tmp_path / "hier_ckpt"))
    restored = HierarchicalIndex.load(str(tmp_path / "hier_ckpt"))
    d2, i2 = restored.search(
        synthetic_small["queries_nav"][:32], synthetic_small["queries_search"][:32],
        n_buckets=8, k=10,
    )
    np.testing.assert_allclose(d1, d2, atol=1e-5)
    np.testing.assert_array_equal(i1, i2)
    # the full hierarchy config round-trips — calibrate_budget included
    # (it silently reverted to the default on restore before); use a
    # non-default value so the assertion can actually fail
    import dataclasses

    orig_cfg = built_hier.hconfig
    try:
        built_hier.hconfig = dataclasses.replace(orig_cfg, calibrate_budget=5)
        built_hier.save(str(tmp_path / "hier_ckpt2"))
        r2 = HierarchicalIndex.load(str(tmp_path / "hier_ckpt2"))
        assert r2.hconfig.calibrate_budget == 5
        assert r2.hconfig.n_groups == orig_cfg.n_groups
    finally:
        built_hier.hconfig = orig_cfg


def test_hierarchical_sharded_by_group(built_hier, synthetic_small):
    """Groups are contiguous bucket ranges: shard_store(store, G) places one
    group per shard and the sharded search matches single-chip."""
    import jax.numpy as jnp
    from tpulmi.parallel.mesh import make_mesh
    from tpulmi.parallel.sharded import shard_store, sharded_probe_search
    from tpulmi.search import probe_search

    store = built_hier.built.store
    sstore = shard_store(store, 4)  # 4 groups x 8 buckets -> 8 buckets/shard
    assert sstore.cat_pad == 8
    mesh = make_mesh(4, ("buckets",))

    clf = built_hier.built.classifier
    q = jnp.asarray(synthetic_small["queries_nav"][:48])
    qs = synthetic_small["queries_search"][:48]
    import jax

    logits = clf.model.apply({"params": clf.params}, q)
    _, probes = jax.lax.top_k(logits, 6)
    probes = np.asarray(probes).astype(np.int32)
    d_single, _ = probe_search(probes, qs, store, k=10)
    d_shard, _ = sharded_probe_search(probes, qs, sstore, mesh, k=10)
    np.testing.assert_allclose(np.asarray(d_shard), np.asarray(d_single),
                               atol=1e-5)


def test_hierarchical_host_store_int8(synthetic_small):
    """build_with_host_store + int8 + rerank: the big-corpus configuration,
    exercised small."""
    cfg = HierarchicalConfig(
        n_groups=3,
        outer_epochs=4,
        outer_lr=0.003,
        inner=IndexConfig(n_categories=6, epochs=4, lr=0.003,
                          model_type="MLP-5", row_align=1),
    )
    hi = HierarchicalIndex(cfg)
    data_nav = synthetic_small["data_nav"]
    data_search = np.asarray(synthetic_small["data_search"], np.float32)
    hi.build_with_host_store(data_nav, data_search, store_dtype="int8")
    assert hi.built.store.is_quantized

    _, gt, _ = Baseline().search(
        synthetic_small["queries_search"], data_search, k=10
    )
    _, ids = hi.search(
        synthetic_small["queries_nav"], synthetic_small["queries_search"],
        n_buckets=9, k=10,
    )
    recall = np.mean([
        len(set(ids[i]) & set(gt[i])) / 10 for i in range(ids.shape[0])
    ])
    assert recall > 0.85


def test_calibrate_outer_weight(synthetic_small, tmp_path):
    """Router temperature calibration: returns a containment curve, applies
    the best weight, clears program caches, and the weight survives a
    checkpoint round trip."""
    cfg = HierarchicalConfig(
        n_groups=4,
        outer_epochs=4,
        outer_lr=0.003,
        inner=IndexConfig(n_categories=6, epochs=4, lr=0.003,
                          model_type="MLP-5", row_align=1),
    )
    hi = HierarchicalIndex(cfg)
    hi.build(synthetic_small["data_nav"], synthetic_small["data_search"])
    # prime a compiled program so we can observe the cache being cleared
    hi.search(synthetic_small["queries_nav"][:16],
              synthetic_small["queries_search"][:16], n_buckets=4, k=5)
    assert hi._search_programs

    res = hi.calibrate_outer_weight(
        synthetic_small["data_nav"], probe_budget=6,
        n_queries=256, n_corpus_sample=2000, grid=(0.5, 0.75, 1.0),
    )
    assert res["best"] in (0.5, 0.75, 1.0)
    assert len(res["containment"]) == 3
    assert all(0.0 <= c <= 1.0 for c in res["containment"])
    assert res["best_containment"] == max(res["containment"])
    assert hi.built.classifier.model.outer_weight == res["best"]
    assert not hi._search_programs  # caches cleared (w is traced constant)

    # searches still work at the calibrated weight, 1-based ids
    _, ids = hi.search(
        synthetic_small["queries_nav"], synthetic_small["queries_search"],
        n_buckets=8, k=10,
    )
    assert ids.min() >= 1

    # weight persists through save/load
    hi.set_outer_weight(0.6)
    hi.save(tmp_path / "ckpt")
    restored = HierarchicalIndex.load(tmp_path / "ckpt")
    assert restored.built.classifier.model.outer_weight == 0.6


def test_set_outer_weight_refreshes_predict(built_hier, synthetic_small):
    """`JointRouterClassifier.predict` must honor the CURRENT outer weight:
    its jitted scan takes `self` as a static (identity-keyed) argument, so
    a trace-time read of `model.outer_weight` would silently pin whatever
    weight was live at the first call (regression)."""
    import jax.numpy as jnp

    clf = built_hier.built.classifier
    X = synthetic_small["data_nav"][:256]
    w0 = clf.model.outer_weight
    clf.predict(X)  # populate the jit cache at the current weight
    try:
        flipped = False
        for w in (0.0, 50.0):   # inner-only, then outer-dominated routing
            built_hier.set_outer_weight(w)
            pred = np.asarray(clf.predict(X))
            logits = clf.model.apply(
                {"params": clf.params}, jnp.asarray(X, jnp.float32))
            expect = np.argmax(np.asarray(logits), axis=1)
            np.testing.assert_array_equal(pred, expect)
            built_hier.set_outer_weight(w0)
            flipped |= not np.array_equal(np.asarray(clf.predict(X)), pred)
        # at least one of the extreme weights must actually move some
        # assignments, or the equalities above prove nothing about staleness
        assert flipped
    finally:
        built_hier.set_outer_weight(w0)


def test_probe_mass_temperature_on_calibrated_router(built_hier,
                                                     synthetic_small):
    """probe_mass on a CALIBRATED router: ranking uses the calibrated joint
    score, the truncation mass its temperature-flattened softmax
    (mass_temp — the raw softmax is overconfident and measured-over-pruned
    at scale). probe_mass=1.0 must be a no-op; a tight mass must save scan
    work while keeping most of the full-budget k-set."""
    from tpulmi.utils.config import SearchConfig

    qn = synthetic_small["queries_nav"]
    qs = synthetic_small["queries_search"]
    w0 = built_hier.built.classifier.model.outer_weight
    t0 = built_hier.built.classifier.model.mass_temp
    try:
        built_hier.set_outer_weight(0.25)
        built_hier.set_mass_temp(2.0)
        # scan-row accounting is query-chunk-granular; a small chunk makes
        # slot truncation visible on this small fixture
        base = SearchConfig(k=10, backend="xla", compute_dtype="float32",
                            query_chunk=8)
        d0, i0 = built_hier.search(qn, qs, n_buckets=8, k=10,
                                   search_config=base)
        full = SearchConfig(k=10, backend="xla", compute_dtype="float32",
                            query_chunk=8, probe_mass=1.0)
        d1, i1 = built_hier.search(qn, qs, n_buckets=8, k=10,
                                   search_config=full)
        np.testing.assert_array_equal(i1, i0)
        assert built_hier.last_scan_rows == built_hier.last_nominal_rows
        nominal = built_hier.last_nominal_rows

        # the small fixture's true joint mass is spread: at 8/32 probes no
        # query reaches 0.95, so use a mass that actually truncates here
        trunc = SearchConfig(k=10, backend="xla", compute_dtype="float32",
                             query_chunk=8, probe_mass=0.60)
        d2, i2 = built_hier.search(qn, qs, n_buckets=8, k=10,
                                   search_config=trunc)
        assert built_hier.last_scan_rows < nominal  # real work saved
        kept = built_hier.last_scan_rows / nominal
        overlap = np.mean([
            len(set(i2[r]) & set(i0[r])) / 10 for r in range(len(i0))
        ])
        # graceful degradation: the k-set kept must beat the scan fraction
        # kept (true-mass ranking concentrates the useful work up front)
        assert overlap > kept
        assert overlap > 0.6
    finally:
        built_hier.set_outer_weight(w0)
        built_hier.set_mass_temp(t0)


def test_calibration_fits_mass_temp(built_hier, synthetic_small):
    """calibrate_outer_weight fits and applies a probe-mass temperature:
    the cumulative flattened mass before the true bucket's rank must
    deliver at least the containment each target mass promises."""
    w0 = built_hier.built.classifier.model.outer_weight
    t0 = built_hier.built.classifier.model.mass_temp
    try:
        res = built_hier.calibrate_outer_weight(
            synthetic_small["data_nav"], probe_budget=8, n_queries=512)
        assert res["mass_temp"] is not None and res["mass_temp"] >= 1.0
        assert (built_hier.built.classifier.model.mass_temp
                == res["mass_temp"])
    finally:
        built_hier.set_outer_weight(w0)
        built_hier.set_mass_temp(t0)


def test_router_restarts_build(synthetic_small, tmp_path):
    """Best-of-R navigation: restarts>1 builds R candidate stacks, records
    one containment score per candidate, keeps the max, and the knob
    round-trips through the checkpoint. The selected index must search at
    least as well as the baseline recall floor."""
    cfg = HierarchicalConfig(
        n_groups=3,
        outer_epochs=4,
        outer_lr=0.003,
        calibrate_budget=6,
        router_restarts=3,
        inner=IndexConfig(n_categories=6, epochs=4, lr=0.003,
                          model_type="MLP-5", row_align=1),
    )
    hi = HierarchicalIndex(cfg)
    hi.build(synthetic_small["data_nav"], synthetic_small["data_search"])

    scores = hi._router_restart_scores
    assert scores is not None and len(scores) == 3
    assert all(0.0 <= s <= 1.0 for s in scores)
    # calibration runs after selection; its containment at the same budget
    # comes from the SAME pseudo-query machinery, so the selected
    # candidate's realized containment must not fall below the floor of
    # what selection measured (different query samples => tolerance)
    _, gt, _ = Baseline().search(
        synthetic_small["queries_search"], synthetic_small["data_search"],
        k=10,
    )
    _, ids = hi.search(
        synthetic_small["queries_nav"], synthetic_small["queries_search"],
        n_buckets=8, k=10,
    )
    recall = np.mean([
        len(set(ids[i]) & set(gt[i])) / 10 for i in range(ids.shape[0])
    ])
    assert recall > 0.8

    hi.save(str(tmp_path / "restart_ckpt"))
    restored = HierarchicalIndex.load(str(tmp_path / "restart_ckpt"))
    assert restored.hconfig.router_restarts == 3


def test_containment_score_matches_manual(built_hier, synthetic_small):
    """The candidate scorer computes, for the candidate's own assignment
    of each pseudo-query's neighbor, the w-grid max of top-budget joint
    containment — verified against a direct dense computation."""
    import jax

    data_nav = np.asarray(synthetic_small["data_nav"], np.float32)
    qidx, nn_global = HierarchicalIndex._nn_pseudo_queries(
        data_nav, n_queries=128, n_corpus_sample=1500, seed=11)
    assert len(qidx) == 128 and len(nn_global) == 128
    assert not np.any(qidx == nn_global)  # self-excluded

    clf = built_hier.built.classifier
    grid = (0.25, 1.0)
    score, per_w = built_hier._containment_score(
        clf, data_nav, qidx, nn_global, budget=5, grid=grid)
    assert score == max(per_w) and len(per_w) == len(grid)

    tb = np.asarray(jax.device_get(clf.predict(
        jnp.asarray(data_nav[nn_global], jnp.float32))))
    lo, li = jax.device_get(clf.model.components(
        {"params": clf.params}, jnp.asarray(data_nav[qidx], jnp.float32)))
    for w, got in zip(grid, per_w):
        joint = (w * np.asarray(lo)[:, :, None] + np.asarray(li)).reshape(
            128, -1)
        # tie-insensitive containment: the target bucket is "contained"
        # when STRICTLY fewer than budget buckets outscore it (an argsort/
        # argpartition top-5 set can differ from the implementation's on
        # exact float ties at the boundary; the rank test cannot)
        tgt = joint[np.arange(128), tb]
        rank = (joint > tgt[:, None]).sum(axis=1)
        want = float(np.mean(rank < 5))
        assert abs(got - want) < 1e-9


def test_route_probes_ranks_by_score_truncates_by_mass():
    """route_probes(mass_logits=...): probe ORDER follows the ranking
    logits; the truncation point follows the cumulative mass of the
    mass_logits softmax — the rank-vs-mass separation the calibrated
    joint router needs (its ranking softmax is not a probability)."""
    from tpulmi.search import route_probes

    # ranking prefers buckets [3, 0, 2, 1]; the true mass is concentrated
    # on bucket 3 (0.7) then 0 (0.2): a 0.85 mass budget keeps exactly
    # ranks 0-1 and dumps ranks 2-3
    rank = jnp.array([[2.0, -1.0, 1.0, 3.0]])
    p = np.array([[0.2, 0.06, 0.04, 0.7]])
    mass = jnp.log(jnp.asarray(p))
    probes = np.asarray(route_probes(rank, 4, probe_mass=0.85, dump_id=-7,
                                     mass_logits=mass))
    np.testing.assert_array_equal(probes[0], [3, 0, -7, -7])
    # without mass_logits the ranking softmax is the mass: rank logits
    # [3,2,1] are e-spaced (top prob ~0.66, cum@2 ~0.90), so 0.85 keeps
    # ranks 0-1 too, but a 0.95 budget keeps rank 2 as well
    probes = np.asarray(route_probes(rank, 4, probe_mass=0.95, dump_id=-7))
    np.testing.assert_array_equal(probes[0], [3, 0, 2, -7])
    # probe_mass=None: plain top-k, no dumping
    probes = np.asarray(route_probes(rank, 4))
    np.testing.assert_array_equal(probes[0], [3, 0, 2, 1])
