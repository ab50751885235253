"""Two-level hierarchical learned index.

The 100M-scale design from SURVEY.md §7 stage 9 / BASELINE.json config 4:
an outer router (k-means + MLP, same recipe as the flat index) splits the
corpus into G groups, and each group holds an inner `LearnedIndex` over its
subset. A query routes to its top-`n_groups` groups, runs the inner probe
search in each, and merges the per-group top-k by distance.

Rationale: one v5e holds ~10M×768 bf16; at 100M the groups are the natural
sharding unit — place inner indexes on different chips (or host-swap them)
and the outer router stays tiny and replicated. This module implements the
algorithmic structure single-host; the per-group placement across a mesh
composes with tpulmi.parallel (each group's store is exactly a
ShardedBucketStore shard).

Group subsets are padded up to size classes (repeating rows, which keep
their original ids — the merge dedupes) so inner builds reuse compiled
programs across groups instead of compiling one program per distinct group
size.
"""

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpulmi.index import LearnedIndex
from tpulmi.models.train import BucketClassifier
from tpulmi.ops.distance import SENTINEL_DIST
from tpulmi.ops.kmeans import kmeans
from tpulmi.search import size_class
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


class HierarchicalIndex:
    def __init__(self, config: HierarchicalConfig = HierarchicalConfig()):
        self.config = config
        self.router: Optional[BucketClassifier] = None
        self.inner: List[LearnedIndex] = []
        self.group_rows: List[np.ndarray] = []  # inner row -> original 0-based id

    def build(self, data_nav, data_search=None) -> float:
        """Partition into groups with the outer router, then build one inner
        LearnedIndex per group. Returns build seconds."""
        import time

        cfg = self.config
        start = time.perf_counter()
        data_nav = np.asarray(data_nav, np.float32)
        data_search = np.asarray(
            data_search if data_search is not None else data_nav, np.float32
        )
        n = data_nav.shape[0]

        # ---- outer partition + router (same recipe as the flat index) ----
        nav_dev = jax.device_put(jnp.asarray(data_nav))
        _, labels = kmeans(nav_dev, cfg.n_groups, seed=cfg.seed)
        router = BucketClassifier(
            input_dim=data_nav.shape[1],
            n_classes=cfg.n_groups,
            lr=cfg.outer_lr,
            model_type=cfg.outer_model_type,
            seed=cfg.seed,
        )
        router.train(nav_dev, labels, epochs=cfg.outer_epochs,
                     batch_size=cfg.inner.batch_size)
        groups = np.asarray(jax.device_get(router.predict(nav_dev)))
        self.router = router

        # ---- inner indexes over size-class-padded subsets ----
        # Padding rows are random unit vectors (cosine distance ≈ 1 to any
        # real query in high dimension, so they never reach a top-k) with id
        # -1 so the merge drops them; repeating real rows instead would let
        # duplicates crowd true neighbors out of the inner top-k.
        rng = np.random.default_rng(cfg.seed + 17)
        self.inner, self.group_rows = [], []
        for g in range(cfg.n_groups):
            rows = np.where(groups == g)[0]
            if rows.size == 0:
                self.inner.append(None)
                self.group_rows.append(rows.astype(np.int64))
                continue
            m_pad = size_class(rows.size)
            n_fill = m_pad - rows.size
            nav_g = data_nav[rows]
            search_g = data_search[rows]
            if n_fill:
                fill_nav = rng.normal(size=(n_fill, nav_g.shape[1])).astype(np.float32)
                fill_nav /= np.linalg.norm(fill_nav, axis=1, keepdims=True)
                fill_search = rng.normal(size=(n_fill, search_g.shape[1])).astype(np.float32)
                fill_search /= np.linalg.norm(fill_search, axis=1, keepdims=True)
                nav_g = np.concatenate([nav_g, fill_nav])
                search_g = np.concatenate([search_g, fill_search])
            li = LearnedIndex(cfg.inner)
            li.build(nav_g, search_g)
            self.inner.append(li)
            self.group_rows.append(
                np.concatenate([rows, np.full(n_fill, -1)]).astype(np.int64)
            )
            log.info("group %d: %d rows (padded %d) built", g, rows.size, m_pad)
        return time.perf_counter() - start

    def search(
        self,
        queries_nav,
        queries_search=None,
        n_groups: int = 2,
        n_buckets: int = 4,
        k: int = 10,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Route to top-`n_groups` groups, inner-search each, merge by
        distance with id dedupe (subset padding repeats rows). Returns
        (dists, anns) with 1-based anns like the flat index."""
        if self.router is None:
            raise ValueError("Index is not built, call `build` first.")
        queries_nav = np.asarray(queries_nav, np.float32)
        queries_search = np.asarray(
            queries_search if queries_search is not None else queries_nav,
            np.float32,
        )
        q = queries_nav.shape[0]
        n_groups = min(n_groups, self.config.n_groups)
        _, routed = self.router.predict_proba(
            jnp.asarray(queries_nav), top=n_groups
        )
        routed = np.asarray(jax.device_get(routed))  # (Q, n_groups)

        all_d = np.full((q, n_groups * k), SENTINEL_DIST, np.float32)
        all_i = np.full((q, n_groups * k), -1, np.int64)
        for g in range(self.config.n_groups):
            li = self.inner[g]
            if li is None:
                continue
            q_sel = np.where((routed == g).any(axis=1))[0]
            if q_sel.size == 0:
                continue
            # pad the query batch to a size class so the inner search
            # program is reused across groups and calls
            qp = size_class(q_sel.size)
            q_padded = np.concatenate(
                [q_sel, np.zeros(qp - q_sel.size, np.int64)]
            )
            d_g, i_g = li.search(
                queries_nav[q_padded], queries_search[q_padded],
                n_buckets=n_buckets, k=k,
            )
            d_g, i_g = d_g[: q_sel.size], i_g[: q_sel.size]
            # inner 1-based subset ids -> original 0-based ids (-1 = padding)
            orig = self.group_rows[g][i_g - 1]
            orig = np.where(d_g >= SENTINEL_DIST, -1, orig)
            rank = (routed[q_sel] == g).argmax(axis=1)
            for j, qi in enumerate(q_sel):
                lo = rank[j] * k
                all_d[qi, lo: lo + k] = d_g[j]
                all_i[qi, lo: lo + k] = orig[j]

        # merge + dedupe per query (padding repeats map to the same id)
        out_d = np.full((q, k), SENTINEL_DIST, np.float32)
        out_i = np.zeros((q, k), np.int64)
        for qi in range(q):
            order = np.argsort(all_d[qi], kind="stable")
            seen, taken = set(), 0
            for idx in order:
                oid = all_i[qi, idx]
                if oid < 0 or oid in seen:
                    continue
                out_d[qi, taken] = all_d[qi, idx]
                out_i[qi, taken] = oid
                seen.add(oid)
                taken += 1
                if taken == k:
                    break
        return out_d, out_i + 1
