"""Two-level hierarchical learned index — a routing factorization.

The 100M-scale design from SURVEY.md §7 stage 9 / BASELINE.json config 4.
The TPU-native insight: a two-level index does not need a second search
stack. The hierarchy is a *factorized router* — an outer MLP scores groups,
per-group inner MLPs score buckets within each group, and the joint global
bucket score is

    score(g, b) = log P(g | q) + log P(b | q, g)

reshaped to one (Q, G·C) logit matrix. Global bucket ids are group-major
(``g * C + b``), the store is one flat bucket-sorted CSR over all G·C
buckets, and EVERYTHING else — the single-program probe search, the Pallas
kernel, qpb overflow retry, int8 quantization + rerank, orbax checkpoints,
and bucket-range sharding (a shard = a contiguous group range, so
`shard_store(store, G)` places exactly one group per chip) — is inherited
unchanged from the flat `LearnedIndex`.

Joint top-k routing is also strictly better than staged pruning (probe the
top n_groups, then n_buckets in each): it follows the true probability
mass across group boundaries instead of committing to groups first.

Where the hierarchy still earns its keep:

- **build scale**: each inner k-means + MLP sees only its group's rows, so
  a corpus whose single-level build would not fit HBM builds group by
  group (`build_with_host_store` lays the flat store out host-side and
  uploads once);
- **placement**: groups are contiguous bucket ranges = natural shard /
  host-swap units for 100M+ corpora.

All G inner MLPs share one architecture; their params are stacked along a
leading group axis and applied with `jax.vmap` — one fused program scores
all groups, no Python loop over groups anywhere on the query path.

Replaces (and extends far beyond) the reference's single-level design;
the reference has no >10M story at all (`/root/reference/README.md:16-24`).
"""

from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpulmi.buckets import build_bucket_store
from tpulmi.index import BuiltIndex, LearnedIndex
from tpulmi.models.mlp import make_model
from tpulmi.utils.config import IndexConfig
from tpulmi.utils.logging import get_logger

log = get_logger("tpulmi.hierarchical")


@dataclass(frozen=True)
class HierarchicalConfig:
    n_groups: int = 8
    outer_epochs: int = 8
    outer_lr: float = 0.003
    outer_model_type: str = "MLP-5"
    inner: IndexConfig = field(default_factory=IndexConfig)
    seed: int = 2023
    # Auto-calibrate the outer temperature at the end of every build at
    # this probe budget (calibrate_outer_weight; measured at 20M: probes
    # for recall>=0.90 drop 48 -> 8). 0 disables.
    calibrate_budget: int = 16
    # Best-of-R navigation stacks: build the router (outer + inners) R
    # times under different seeds and keep the candidate with the highest
    # pseudo-query containment at `calibrate_budget` probes (max over the
    # calibration w-grid, so the score matches what calibration will
    # realize). Recall at a fixed probe budget varies ~±0.01 across
    # from-scratch rebuilds (NOTES.md round-4: a 20M rebuild landed 0.8993
    # where round 3 measured 0.9105 at 8 probes); selection turns that
    # variance tail into an advantage. Scoring a candidate predicts only
    # the ≤n_queries pseudo-NN rows — the full-corpus predict and the
    # store layout run once, for the winner. 1 disables.
    router_restarts: int = 1
    # rows per inner-build size class are padded with random unit vectors
    # (cosine ~1 to any query, never reach a top-k) so same-size groups
    # share one compiled inner-build program


class JointRouter:
    """Duck-typed flax-like module: ``apply({'params': p}, x)`` returns the
    (Q, G*C) joint log-probability logits. ``p`` is
    ``{'outer': outer_params, 'inner': stacked_inner_params}`` where the
    inner params carry a leading (G,) axis (vmapped apply).

    ``outer_weight`` is a calibration temperature on the outer (group)
    log-probabilities: ``score = w·log P(g|q) + log P(b|q,g)``. The raw
    joint (w=1) concentrates probe mass in the top group — at 20M the
    factorized router needed ~3x the flat index's probe fraction for equal
    recall (BENCH_20M.md r2). w<1 flattens the group term so the top-P
    global probes spread across plausible groups; `calibrate_outer_weight`
    picks w against the measured true-neighbor-bucket containment. It is a
    TRACED CONSTANT in compiled search programs — set it only through
    `HierarchicalIndex.set_outer_weight`, which clears the program caches."""

    def __init__(self, outer_model, inner_model, n_groups: int, n_cat: int,
                 outer_weight: float = 1.0, mass_temp: float = 1.0):
        self.outer_model = outer_model
        self.inner_model = inner_model
        self.n_groups = n_groups
        self.n_cat = n_cat
        self.outer_weight = float(outer_weight)
        # mass temperature for SearchConfig.probe_mass: the truncation
        # mass is softmax(ranking/mass_temp). Both the raw joint AND the
        # calibrated score produce overconfident softmaxes at scale
        # (measured 20M: truncating on either cuts to ~1-3 probes, recall
        # 0.91 -> 0.50); calibrate_outer_weight fits the smallest temp
        # whose cumulative mass before the true bucket's rank matches the
        # containment it promises. Traced constant — set via
        # `HierarchicalIndex.set_mass_temp` (clears program caches).
        self.mass_temp = float(mass_temp)

    def components(self, variables, x):
        """(outer log-softmax (Q, G), inner log-softmax (Q, G, C)) —
        unweighted; used by apply and by the calibration sweep."""
        p = variables["params"]
        lo = jax.nn.log_softmax(
            self.outer_model.apply({"params": p["outer"]}, x), axis=-1
        )                                                     # (Q, G)
        li = jax.vmap(
            lambda pg: jax.nn.log_softmax(
                self.inner_model.apply({"params": pg}, x), axis=-1
            )
        )(p["inner"])                                         # (G, Q, C)
        return lo, jnp.moveaxis(li, 0, 1)                     # (Q, G, C)

    def apply(self, variables, x):
        lo, li = self.components(variables, x)
        joint = self.outer_weight * lo[:, :, None] + li       # (Q, G, C)
        return joint.reshape(x.shape[0], self.n_groups * self.n_cat)


class JointRouterClassifier:
    """Classifier facade over `JointRouter` satisfying the contract the
    flat index machinery needs (model/params/predict + checkpoint metadata)."""

    def __init__(self, outer_model, inner_model, n_groups, n_cat, input_dim,
                 model_type: str):
        self.model = JointRouter(outer_model, inner_model, n_groups, n_cat)
        self.params = None
        self.input_dim = input_dim
        self.n_classes = n_groups * n_cat
        self.model_type = model_type

    @partial(jax.jit, static_argnames=("self", "chunk"))
    def _predict_scan(self, params, X, w, chunk: int):
        """One program for the whole corpus: `lax.scan` over fixed-size
        chunks (the `BucketClassifier._predict_chunked` pattern). A Python
        chunk loop here cost one dispatch round-trip per 131k rows — ~153
        round-trips x 30-65 ms of pure latency at 20M on the remote
        backend. The outer weight `w` is a TRACED argument: `self` is a
        static (identity-keyed) jit argument, so baking
        `self.model.outer_weight` in at trace time would silently pin the
        weight that was live at first call even after
        `set_outer_weight`/calibration changes it."""
        n, d = X.shape

        def block_pred(block):
            lo, li = self.model.components(
                {"params": params}, block.astype(jnp.float32)
            )
            joint = (w * lo[:, :, None] + li).reshape(block.shape[0], -1)
            return jnp.argmax(joint, axis=1).astype(jnp.int32)

        # Full chunks slice X in place; the sub-chunk tail is its own small
        # padded block. Padding ALL of X (`jnp.pad`) held a second full-size
        # corpus copy for the program's lifetime — 7.4 GB at 40M x 96 bf16,
        # an OOM next to the resident nav (same fix as tpulmi/build.py's
        # _chunked_rowmap).
        n_full = (n // chunk) * chunk
        parts = []
        if n_full:
            def body(_, i):
                block = jax.lax.dynamic_slice(X, (i * chunk, 0), (chunk, d))
                return None, block_pred(block)

            _, out = jax.lax.scan(body, None, jnp.arange(n_full // chunk))
            parts.append(out.reshape(-1))
        if n > n_full:
            tail = jnp.pad(X[n_full:], ((0, chunk - (n - n_full)), (0, 0)))
            parts.append(block_pred(tail)[: n - n_full])
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    def predict(self, X, chunk: int = 131072) -> jnp.ndarray:
        """Joint-argmax global bucket per row, one dispatch for any corpus
        size. Accepts bf16 — chunks are cast to f32 on device, so no
        full-size f32 copy materializes for large corpora."""
        X = jnp.asarray(X)
        chunk = min(chunk, max(128, int(X.shape[0])))
        return self._predict_scan(
            self.params, X, jnp.float32(self.model.outer_weight), chunk)

    # hashable-static support so the jitted method can take `self` static
    def __hash__(self):
        return hash((id(self),))

    def __eq__(self, other):
        return self is other


class HierarchicalIndex(LearnedIndex):
    """Flat `LearnedIndex` over G·C buckets with a factorized (two-level)
    router. Inherits search/save/quantize/rerank; overrides the build."""

    def __init__(self, config: HierarchicalConfig = HierarchicalConfig()):
        super().__init__(config.inner)
        self.hconfig = config
        # per-candidate containment scores of the last restarts>1 build
        self._router_restart_scores = None

    # ------------------------------------------------------------------ build
    def _build_navigation(self, data_nav_host):
        """All navigation stages: outer router on the full corpus, one inner
        build per group (size-class program reuse), stacked params, global
        joint-argmax bucket per row. Returns (classifier, pred_global).

        With ``router_restarts > 1`` the outer+inner stack is built that
        many times under distinct seeds and the candidate with the best
        pseudo-query containment wins (see `HierarchicalConfig`); only the
        winner pays the full-corpus predict."""
        hcfg = self.hconfig
        # a rebuild with restarts reduced to 1 must not leave the previous
        # build's per-candidate scores visible to introspection
        self._router_restart_scores = None
        # keep the caller's nav precision (bf16 halves the relay-bound
        # upload); every nav program casts to f32 on device
        data_nav_host = np.ascontiguousarray(np.asarray(data_nav_host))
        nav_dev = jax.device_put(jnp.asarray(data_nav_host))

        restarts = max(1, int(hcfg.router_restarts))
        if restarts == 1:
            classifier, centroids = self._build_nav_candidate(
                nav_dev, data_nav_host, hcfg.seed)
        else:
            budget = hcfg.calibrate_budget or 16
            qidx, nn_global = self._nn_pseudo_queries(
                data_nav_host, seed=hcfg.seed + 311)
            best, scores = None, []
            for r in range(restarts):
                cand, cents = self._build_nav_candidate(
                    nav_dev, data_nav_host, hcfg.seed + 1000 * r)
                score, per_w = self._containment_score(
                    cand, data_nav_host, qidx, nn_global, budget)
                scores.append(score)
                log.info(
                    "router restart %d/%d: containment@%d = %.4f "
                    "(per-w max; grid %s)", r + 1, restarts, budget, score,
                    ["%.4f" % c for c in per_w])
                # Losers must not hold DEVICE buffers: the store upload
                # right after nav needs ~all of HBM in one contiguous
                # region, and candidate params/centroids sitting mid-heap
                # fragment it (measured round-5: the 20M restarts=2 build
                # RESOURCE_EXHAUSTed the 15.7 GB slab upload that
                # restarts=1 survives). Demote each loser to host NOW.
                if best is None or score > best[0]:
                    if best is not None:  # demote the dethroned winner
                        best[1].params = jax.device_get(best[1].params)
                    best = (score, cand, cents)
                else:
                    cand.params = jax.device_get(cand.params)
                    cents = np.asarray(jax.device_get(cents))
            log.info("router restarts: selected containment@%d = %.4f",
                     budget, best[0])
            # introspection for benches/tests: per-candidate scores, in
            # build order (the winner is their max)
            self._router_restart_scores = scores
            classifier, centroids = best[1], best[2]

        # ---- global bucket assignment = joint argmax (model-argmax
        # semantics, the hierarchical analog of the reference's
        # `search/li/LearnedIndex.py:67,240`) ----
        pred = np.asarray(jax.device_get(classifier.predict(nav_dev)))
        return classifier, pred, centroids

    def _build_nav_candidate(self, nav_dev, data_nav_host, seed: int):
        """One navigation stack (outer router + G inner routers) built under
        ``seed``. Returns (classifier w/ device params, outer centroids)."""
        from tpulmi.build import get_build_program
        from tpulmi.search import size_class

        hcfg = self.hconfig
        cfg = hcfg.inner
        G, C = hcfg.n_groups, cfg.n_categories
        n, d_nav = data_nav_host.shape

        # ---- outer: the standard nav-only fused build at G categories ----
        outer_prog = get_build_program(
            model_type=hcfg.outer_model_type, lr=hcfg.outer_lr, n=n,
            d_nav=d_nav, n_categories=G, kmeans_iters=cfg.kmeans_iters,
            kmeans_train_points=cfg.kmeans_max_points_per_centroid * G,
            epochs=hcfg.outer_epochs, batch_size=cfg.batch_size,
            include_store=False, max_train_steps=cfg.max_train_steps,
        )
        outer_res = outer_prog(
            nav_dev, jnp.zeros((0, 1), jnp.float32),
            jax.random.PRNGKey(seed),
        )
        groups = np.asarray(jax.device_get(outer_res.pred_categories))
        outer_params = outer_res.params
        log.info("outer router: %d groups, sizes %s", G,
                 np.bincount(groups, minlength=G).tolist())

        # ---- inner builds per group (padded to size classes). Group rows
        # are gathered ON DEVICE from the resident nav data — no per-group
        # host→device re-upload (the relay of this environment runs at
        # ~25 MB/s; 2x nav traffic would double the nav-stage wall time).
        # Size-class padding REPEATS rows sampled from the group (pow2
        # rounding can mean 30%+ fill; random-noise fill at that fraction
        # would hand the inner k-means a phantom mass to waste buckets on,
        # while resampled real rows preserve the distribution — and the pad
        # rows' predictions are discarded, so the store only ever holds
        # real rows). ----
        rng = np.random.default_rng(seed + 17)
        inner_params = []
        # Device row-gathers (`jnp.take`) relayout their whole operand into
        # padded (8,128) tiles — a second full-size nav copy next to the
        # resident corpus (9.5 GB at 40M x 96 bf16: OOM, measured by
        # compile-time memory analysis). Past the gather-safe size each
        # group's training rows are sampled and gathered on the HOST and
        # uploaded (~0.2 GB/group; the async device_put pipelines with the
        # previous group's build program). The inner programs only produce
        # PARAMS — the global bucket assignment below is its own chunked
        # pass over all rows — so capping the sample costs nothing but SGD
        # examples (>=1M rows for 61 buckets, ~16k/bucket).
        gather_safe = n <= 8_388_608
        inner_cap = 1_048_576
        for g in range(G):
            idx = np.where(groups == g)[0]
            if not gather_safe and idx.size > inner_cap:
                idx = np.sort(rng.choice(idx, size=inner_cap, replace=False))
            m_pad = size_class(max(idx.size, cfg.batch_size))
            n_fill = m_pad - idx.size
            if idx.size:
                idx_pad = np.concatenate(
                    [idx, rng.choice(idx, size=n_fill, replace=True)]
                )
            else:
                idx_pad = np.zeros((m_pad,), np.int64)
            if gather_safe:
                nav_g = jnp.take(
                    nav_dev, jnp.asarray(idx_pad, jnp.int32), axis=0
                )
            else:
                nav_g = jax.device_put(jnp.asarray(data_nav_host[idx_pad]))
            prog = get_build_program(
                model_type=cfg.model_type, lr=cfg.lr, n=m_pad, d_nav=d_nav,
                n_categories=C, kmeans_iters=cfg.kmeans_iters,
                kmeans_train_points=cfg.kmeans_max_points_per_centroid * C,
                epochs=cfg.epochs, batch_size=cfg.batch_size,
                include_store=False, max_train_steps=cfg.max_train_steps,
            )
            res = prog(
                nav_g,
                jnp.zeros((0, 1), jnp.float32),
                jax.random.PRNGKey(seed + 100 + g),
            )
            inner_params.append(res.params)
            log.info("inner %d/%d: %d rows (padded %d)", g + 1, G, idx.size,
                     m_pad)

        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *inner_params
        )
        outer_model = make_model(hcfg.outer_model_type, G)
        inner_model = make_model(cfg.model_type, C)
        classifier = JointRouterClassifier(
            outer_model, inner_model, G, C, d_nav,
            model_type=f"hier{G}:{hcfg.outer_model_type}:{cfg.model_type}",
        )
        classifier.params = {"outer": outer_params, "inner": stacked}
        return classifier, outer_res.centroids

    def build(self, data_nav, data_search=None, **_ignored) -> Tuple[np.ndarray, float]:
        """Device-store build (corpus fits HBM alongside one working copy)."""
        import time

        from tpulmi.buckets import bucket_stats
        from tpulmi.ops.distance import l2_normalize

        start = time.perf_counter()
        hcfg = self.hconfig
        cfg = hcfg.inner
        classifier, pred, centroids = self._build_navigation(data_nav)
        if data_search is None:
            data_search = data_nav
        store = build_bucket_store(
            jnp.asarray(pred),
            l2_normalize(jnp.asarray(np.asarray(data_search, np.float32))),
            hcfg.n_groups * cfg.n_categories,
            row_align=cfg.row_align,
        )
        jax.device_get(store.data_sorted[-1, :1])
        build_time = time.perf_counter() - start
        mx, mn, mean = bucket_stats(store)
        log.info(
            "hierarchical build: N=%d groups=%d buckets=%d "
            "size max/mean/min=%d/%.0f/%d; %.1fs",
            store.n, hcfg.n_groups, store.n_categories, mx, mean, mn,
            build_time,
        )
        self.built = BuiltIndex(
            centroids=centroids,
            classifier=classifier,
            store=store,
            pred_categories=jnp.asarray(pred),
            config=cfg,
            max_bucket=mx,
        )
        if hcfg.calibrate_budget:
            self.calibrate_outer_weight(
                data_nav, probe_budget=hcfg.calibrate_budget)
        return pred, build_time

    def build_with_host_store(
        self,
        data_nav,
        data_search_host,
        normalized: bool = False,
        store_dtype: str = "bfloat16",
        overlap_upload: bool = False,
        mesh=None,
    ) -> Tuple[np.ndarray, float]:
        """Large-corpus build: navigation on device, flat G·C store laid out
        host-side (native kernel) and uploaded once (or slab-pipelined with
        the layout when ``overlap_upload=True``). With ``store_dtype='int8'``
        this is the 20M+/chip configuration.

        ``mesh`` uploads the layout shard-by-shard to the mesh devices (a
        shard = a contiguous group range; `mesh` of G devices places one
        group per chip) — the 100M/v5e-8 configuration, where the flat
        store exceeds any single chip's HBM and is never resident on one
        device."""
        import time

        from tpulmi.index import _materialize_async

        start = time.perf_counter()
        hcfg = self.hconfig
        cfg = hcfg.inner
        # memmap->RAM corpus copy runs while the nav stages keep the device
        # busy (VERDICT r2: these were serial, ~340 s wasted at 10M)
        mat_thread = _materialize_async(data_search_host)
        classifier, pred, centroids = self._build_navigation(data_nav)
        t_nav = time.perf_counter() - start
        log.info("hierarchical host-store build: nav stages %.1fs", t_nav)

        # Park the small nav outputs on the HOST so the device heap is
        # empty before the store allocation: a near-HBM-sized buffer needs
        # one contiguous region, and router params/centroids left sitting
        # mid-heap fragment it (observed: 15.7 GB alloc RESOURCE_EXHAUSTED
        # on a chip that fits 16.5 GB when empty). Re-uploaded below.
        classifier.params = jax.device_get(classifier.params)
        centroids = np.asarray(jax.device_get(centroids))
        # drop every nav-phase device reference before the near-HBM store
        # allocation (mirrors LearnedIndex.build_with_host_store): python
        # frees are lazy, and one straggling buffer fragments the heap
        import gc

        gc.collect()

        data_search_host = mat_thread.result()
        store, arrays, data_search_host = self._host_store_to_built(
            pred, data_search_host, hcfg.n_groups * cfg.n_categories,
            store_dtype=store_dtype, normalized=normalized,
            overlap_upload=overlap_upload, mesh=mesh,
        )
        # restore the router to the device (parked on host above)
        classifier.params = jax.device_put(classifier.params)
        build_time = time.perf_counter() - start
        log.info("hierarchical host-store build: total %.1fs", build_time)
        self.built = BuiltIndex(
            centroids=centroids,
            classifier=classifier,
            store=store,
            pred_categories=jnp.asarray(pred),
            config=cfg,
            max_bucket=int(arrays.counts.max()) if arrays.counts.size else 0,
        )
        # see LearnedIndex.build_with_host_store: a source-sequential
        # layout leaves the corpus mapped — retry the RAM copy for the
        # rerank now that the build-time peak is over
        import os as _os

        from tpulmi.hoststore import ensure_in_ram as _eir

        data_search_host = _eir(data_search_host, max_frac=float(
            _os.environ.get("TPULMI_RERANK_MATERIALIZE_MAX_FRAC", "0.6")))
        self._host_corpus = (data_search_host, normalized)
        if hcfg.calibrate_budget:
            self.calibrate_outer_weight(
                data_nav, probe_budget=hcfg.calibrate_budget)
        return pred, build_time

    # ------------------------------------------------------------ calibration
    @staticmethod
    def _nn_pseudo_queries(
        data_nav,
        n_queries: int = 2048,
        n_corpus_sample: int = 131072,
        seed: int = 97,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Label-free routing targets: sample corpus rows as pseudo-queries
        and find each one's self-excluded nearest neighbor among a corpus
        subsample (navigation space, cosine). Returns (qidx, nn_global) —
        global row indices of the pseudo-queries and their neighbors.
        Shared by `calibrate_outer_weight` and the router-restart scorer
        (one sweep per build; candidates are scored on the SAME targets so
        their containments are comparable)."""
        from tpulmi.ops.distance import l2_normalize

        rng = np.random.default_rng(seed)
        # only sampled rows are touched — no np.asarray of the full corpus
        # (a 20M nav memmap would materialize 7.7 GB for a 2k-row sample)
        n = int(data_nav.shape[0])
        n_queries = min(n_queries, n)
        n_corpus_sample = min(n_corpus_sample, n)
        qidx = rng.choice(n, size=n_queries, replace=False)
        sidx = rng.choice(n, size=n_corpus_sample, replace=False)

        corpus = l2_normalize(jnp.asarray(data_nav[sidx], jnp.float32))
        sidx_dev = jnp.asarray(sidx, jnp.int32)

        @jax.jit
        def nn_chunk(q_rows, q_ids):
            q_rows = l2_normalize(q_rows.astype(jnp.float32))
            sims = jax.lax.dot_general(
                q_rows, corpus,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            sims = jnp.where(sidx_dev[None, :] == q_ids[:, None],
                             -jnp.inf, sims)  # exclude self
            return jnp.argmax(sims, axis=1).astype(jnp.int32)

        chunk = 512
        nn_local = []
        for lo in range(0, n_queries, chunk):
            hi = min(lo + chunk, n_queries)
            pad = chunk - (hi - lo)
            q_rows = jnp.asarray(np.pad(
                data_nav[qidx[lo:hi]].astype(np.float32),
                ((0, pad), (0, 0))))
            q_ids = jnp.asarray(np.pad(qidx[lo:hi], (0, pad)), jnp.int32)
            nn_local.append(np.asarray(
                jax.device_get(nn_chunk(q_rows, q_ids)))[: hi - lo])
        return qidx, sidx[np.concatenate(nn_local)]

    @staticmethod
    def _router_components(classifier, data_nav, qidx, chunk: int = 512):
        """Outer/inner log-softmax components of the router at the sampled
        query rows: ((Qs, G), (Qs, G, C)) as host arrays."""
        model = classifier.model
        comp = jax.jit(lambda p, x: model.components({"params": p}, x))
        lo_parts, li_parts = [], []
        n_queries = len(qidx)
        for lo_i in range(0, n_queries, chunk):
            hi_i = min(lo_i + chunk, n_queries)
            pad = chunk - (hi_i - lo_i)
            q_rows = jnp.asarray(np.pad(
                data_nav[qidx[lo_i:hi_i]].astype(np.float32),
                ((0, pad), (0, 0))))
            lo_g, li_g = jax.device_get(comp(classifier.params, q_rows))
            lo_parts.append(np.asarray(lo_g)[: hi_i - lo_i])
            li_parts.append(np.asarray(li_g)[: hi_i - lo_i])
        return np.concatenate(lo_parts), np.concatenate(li_parts)

    def _containment_score(
        self,
        classifier,
        data_nav,
        qidx: np.ndarray,
        nn_global: np.ndarray,
        budget: int,
        grid: Tuple[float, ...] = (0.0, 0.1, 0.25, 0.4, 0.55, 0.7, 0.85,
                                   1.0),
    ) -> Tuple[float, list]:
        """Score a CANDIDATE navigation stack before any store exists: the
        target bucket of each pseudo-query is the candidate's own joint
        argmax of its neighbor row (== what the store assignment will be
        if this candidate wins), and the score is the best containment at
        `budget` probes over the calibration w-grid — i.e. what
        `calibrate_outer_weight` will realize. Only the ≤len(qidx) distinct
        neighbor rows are predicted. Returns (max, per-w list).

        Caveat: containment at a probe COUNT does not price bucket sizes —
        a degenerate router that collapses rows into few giant buckets
        would score perfectly while exploding scan cost. Every candidate
        here is a fully trained build under a different seed (same
        k-means/MLP recipe), so their balance is statistically identical
        and the comparison is fair; do not reuse this score to compare
        *differently structured* routers."""
        nn_unique, inv = np.unique(nn_global, return_inverse=True)
        tb = np.asarray(jax.device_get(
            classifier.predict(jnp.asarray(
                data_nav[nn_unique], jnp.float32))))[inv]
        lo_all, li_all = self._router_components(classifier, data_nav, qidx)
        gxc = lo_all.shape[1] * li_all.shape[2]
        budget = min(budget, gxc)
        per_w = []
        for w in grid:
            joint = (w * lo_all[:, :, None] + li_all).reshape(
                len(qidx), gxc)
            top = np.argpartition(-joint, budget - 1, axis=1)[:, :budget]
            per_w.append(float(np.mean((top == tb[:, None]).any(axis=1))))
        return max(per_w), per_w

    def set_outer_weight(self, w: float) -> None:
        """Set the router's outer temperature (see `JointRouter`). Clears
        the compiled search-program caches — the weight is a traced
        constant inside them."""
        if self.built is None:
            raise ValueError("Index is not built, call `build` first.")
        self.built.classifier.model.outer_weight = float(w)
        self._search_programs = {}
        self._sharded_programs = {}

    def set_mass_temp(self, t: float) -> None:
        """Set the probe-mass temperature (see `JointRouter.mass_temp`).
        Clears the compiled search-program caches."""
        if self.built is None:
            raise ValueError("Index is not built, call `build` first.")
        self.built.classifier.model.mass_temp = float(t)
        self._search_programs = {}
        self._sharded_programs = {}

    def calibrate_outer_weight(
        self,
        data_nav,
        probe_budget: int = 16,
        n_queries: int = 2048,
        n_corpus_sample: int = 131072,
        grid: Tuple[float, ...] = (0.0, 0.1, 0.25, 0.4, 0.55, 0.7, 0.85,
                                   1.0),
        seed: int = 97,
        apply: bool = True,
    ) -> dict:
        """Pick the outer temperature that maximizes routing recall at the
        probe budget, with no labeled queries: sample corpus rows as
        pseudo-queries, find each one's (self-excluded) nearest neighbor
        among a corpus subsample in navigation space, and measure — per
        candidate weight — how often the neighbor's STORED bucket lands in
        the pseudo-query's top-`probe_budget` joint ranking. The stored
        assignment (`pred_categories`, fixed at build) is the target;
        only the query-side ranking changes with w.

        This is the probe-efficiency fix for the factorized router's
        outer-mass concentration (BENCH_20M.md r2: 3x the flat index's
        probe fraction at equal recall). The reference has no hierarchy at
        all; the flat analog of this knob does not exist.

        Returns {"weights": grid, "containment": [...], "best": w,
        "baseline": containment at w=1}; applies the best w by default."""
        if self.built is None:
            raise ValueError("Index is not built, call `build` first.")
        qidx, nn_global = self._nn_pseudo_queries(
            data_nav, n_queries=n_queries,
            n_corpus_sample=n_corpus_sample, seed=seed)
        n_queries = len(qidx)
        pred = np.asarray(jax.device_get(self.built.pred_categories))
        target_bucket = pred[nn_global]                     # (n_queries,)

        lo_all, li_all = self._router_components(
            self.built.classifier, data_nav, qidx)  # (Qs, G), (Qs, G, C)

        gxc = lo_all.shape[1] * li_all.shape[2]
        budget = min(probe_budget, gxc)
        containment = []
        for w in grid:
            joint = (w * lo_all[:, :, None] + li_all).reshape(
                n_queries, gxc)
            top = np.argpartition(-joint, budget - 1, axis=1)[:, :budget]
            containment.append(float(np.mean(
                (top == target_bucket[:, None]).any(axis=1))))
        best_i = int(np.argmax(containment))
        baseline = (containment[grid.index(1.0)] if 1.0 in grid
                    else None)

        # ---- probe-mass temperature: the ranking softmax (any w) is
        # overconfident at scale, so `SearchConfig.probe_mass` drawn from
        # it over-prunes (measured 20M: recall 0.91 -> 0.50). Fit the
        # smallest temperature whose cumulative mass BEFORE the true
        # bucket's rank keeps >= m of the in-budget containment for every
        # target mass m — then "keep 0.95 mass" really keeps >= 95% of
        # the recall the probe budget could reach.
        w_best = float(grid[best_i])
        joint = (w_best * lo_all[:, :, None] + li_all).reshape(
            n_queries, gxc)
        order = np.argsort(-joint, axis=1)
        ranks = np.empty_like(order)
        np.put_along_axis(
            ranks, order, np.broadcast_to(np.arange(gxc), order.shape), 1)
        r_t = ranks[np.arange(n_queries), target_bucket]
        in_budget = r_t < budget
        mass_temp = None
        if in_budget.any():
            rows = np.arange(n_queries)
            for tau in (1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0):
                z = joint / tau
                z -= z.max(axis=1, keepdims=True)
                p = np.exp(z)
                p /= p.sum(axis=1, keepdims=True)
                sp = np.take_along_axis(p, order, 1)
                cum = np.cumsum(sp, axis=1)
                cb = (cum[rows, r_t] - sp[rows, r_t])[in_budget]
                if all(float(np.mean(cb < m)) >= m
                       for m in (0.8, 0.9, 0.95)):
                    mass_temp = tau
                    break
            if mass_temp is None:
                mass_temp = 128.0

        result = {
            "weights": list(grid),
            "containment": containment,
            "best": w_best,
            "best_containment": containment[best_i],
            "baseline_w1": baseline,
            "probe_budget": budget,
            "mass_temp": mass_temp,
        }
        log.info("router calibration @%d probes: %s -> w=%.2f "
                 "(containment %.4f, w=1 %.4f), mass_temp=%s", budget,
                 ["%.2f:%.4f" % (w, c) for w, c in zip(grid, containment)],
                 result["best"], result["best_containment"],
                 -1.0 if baseline is None else baseline, mass_temp)
        if apply:
            self.set_outer_weight(result["best"])
            if mass_temp is not None:
                self.set_mass_temp(mass_temp)
        return result

    # ----------------------------------------------------------------- search
    def search(
        self,
        queries_nav,
        queries_search=None,
        n_buckets: int = 4,
        k: int = 10,
        n_groups: Optional[int] = None,
        search_config=None,
        queries_search_host=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Probe the globally top-scored buckets under the joint router.

        ``n_groups`` is accepted for API compatibility with the staged
        two-level reading (probe budget becomes ``n_groups * n_buckets``
        global probes); joint routing subsumes staged pruning.

        ``SearchConfig.probe_mass`` composes with calibration: probes are
        RANKED by the calibrated score `w·logP(g|q) + logP(b|q,g)` while
        the truncation mass is `softmax(score / mass_temp)` with the
        temperature fitted by `calibrate_outer_weight` against measured
        containment (`tpulmi.search.routing_logits`). Both the raw joint
        and the calibrated softmax are overconfident at scale — truncating
        on either was measured to cut to ~1-3 probes (20M: recall
        0.91 → 0.50); the fitted temperature makes "keep mass m" keep
        ≥ m of the budget's reachable recall."""
        if n_groups:
            n_buckets = n_groups * n_buckets
        return super().search(
            queries_nav, queries_search, n_buckets=n_buckets, k=k,
            search_config=search_config,
            queries_search_host=queries_search_host,
        )

    # ------------------------------------------------------------ checkpoint
    def save(self, path: str, include_corpus: bool = False) -> None:
        """Checkpoint (inherits the flat layout; adds hierarchy metadata)."""
        import json
        from pathlib import Path

        super().save(path, include_corpus=include_corpus)
        hcfg = self.hconfig
        with open(Path(path).absolute() / "hier.json", "w") as f:
            json.dump({
                "n_groups": hcfg.n_groups,
                "outer_epochs": hcfg.outer_epochs,
                "outer_lr": hcfg.outer_lr,
                "outer_model_type": hcfg.outer_model_type,
                "seed": hcfg.seed,
                "calibrate_budget": hcfg.calibrate_budget,
                "router_restarts": hcfg.router_restarts,
                "outer_weight": float(getattr(
                    self.built.classifier.model, "outer_weight", 1.0)),
                "mass_temp": float(getattr(
                    self.built.classifier.model, "mass_temp", 1.0)),
            }, f)

    @classmethod
    def load(cls, path: str) -> "HierarchicalIndex":
        import json
        from pathlib import Path

        from tpulmi.buckets import BucketStore

        path = Path(path).absolute()
        meta, state = LearnedIndex._load_state(path)
        with open(path / "hier.json") as f:
            h = json.load(f)
        outer_weight = float(h.pop("outer_weight", 1.0))
        mass_temp = float(h.pop("mass_temp", 1.0))
        inner_cfg = IndexConfig(**meta["config"])
        cfg = HierarchicalConfig(inner=inner_cfg, **h)
        index = cls(cfg)
        G, C = cfg.n_groups, inner_cfg.n_categories
        classifier = JointRouterClassifier(
            make_model(cfg.outer_model_type, G),
            make_model(inner_cfg.model_type, C),
            G, C, meta["input_dim"],
            model_type=meta["model_type"],
        )
        classifier.model.outer_weight = outer_weight
        classifier.model.mass_temp = mass_temp
        classifier.params = jax.device_put(state["params"])
        store = BucketStore(
            data_sorted=jnp.asarray(state["store"]["data_sorted"]),
            ids_sorted=jnp.asarray(state["store"]["ids_sorted"]),
            offsets=jnp.asarray(state["store"]["offsets"]),
            counts=jnp.asarray(state["store"]["counts"]),
            n=int(meta["store_n"]),
            pad_rows=int(meta["store_pad_rows"]),
            row_align=int(meta.get("store_row_align", 1)),
            scales=(jnp.asarray(state["store"]["scales"])
                    if "scales" in state.get("store", {}) else None),
            quant_bits=int(meta.get("store_quant_bits", 8)),
            **{f: jnp.asarray(state["store"][f])
               for f in ("bucket_centroids", "bucket_cos_r",
                         "bucket_max_norm")
               if f in state.get("store", {})},
        )
        index.built = BuiltIndex(
            centroids=jnp.asarray(state["centroids"]),
            classifier=classifier,
            store=store,
            pred_categories=jnp.asarray(state["pred_categories"]),
            config=inner_cfg,
            max_bucket=int(jax.device_get(store.counts.max())),
        )
        LearnedIndex._restore_rerank(index, meta, path)
        return index
