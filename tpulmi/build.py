"""The fused build program: the ENTIRE index build as one XLA program.

The reference's build is a Python pipeline across two native libraries —
faiss k-means, then a torch training loop, then a full-data predict
(`search/li/LearnedIndex.py:197-240`). Here all four stages

    1. k-means partition   (subsample → Lloyd scan → chunked full assign)
    2. MLP init + training (flat scan over all epochs × steps)
    3. full-data argmax predict (chunked scan)
    4. bucket-store layout (stable argsort → gather → CSR)

compile into a single jitted program dispatched once. Beyond being the
natural XLA formulation (one traced dataflow, maximal fusion, zero host
round-trips), this matters operationally: the remote-TPU path of this
environment charges tens of seconds of latency per *program*, so one
program instead of ~15 turns a multi-minute build into seconds.

The modular equivalents (tpulmi.ops.kmeans, tpulmi.models.train,
tpulmi.buckets) remain the unit-tested reference implementations; this
module re-expresses the same math inside one trace.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from tpulmi.models.mlp import MLP, make_model
from tpulmi.ops.distance import l2_normalize
from tpulmi.ops.kmeans import _sq_dists

# Compiled-program cache keyed on the semantic parameters (a fresh closure
# per build would force a recompile even for identical HLO).
_PROGRAM_CACHE = {}


def get_build_program(
    *,
    model_type: str,
    lr: float,
    n: int,
    d_nav: int,
    n_categories: int,
    kmeans_iters: int = 25,
    kmeans_train_points: int = 31232,
    epochs: int = 12,
    batch_size: int = 1024,
    row_align: int = 1,
    reference_step_semantics: bool = False,
    include_store: bool = True,
    max_train_steps=None,
):
    """Memoized fused build program for the given configuration."""
    key = (model_type, float(lr), n, d_nav, n_categories, kmeans_iters,
           kmeans_train_points, epochs, batch_size, row_align,
           reference_step_semantics, include_store, max_train_steps)
    prog = _PROGRAM_CACHE.get(key)
    if prog is None:
        model = make_model(model_type, n_categories)
        tx = optax.adam(lr)
        prog = make_build_program(
            model, tx,
            n=n, d_nav=d_nav, n_categories=n_categories,
            kmeans_iters=kmeans_iters,
            kmeans_train_points=kmeans_train_points,
            epochs=epochs, batch_size=batch_size,
            row_align=row_align,
            reference_step_semantics=reference_step_semantics,
            include_store=include_store,
            max_train_steps=max_train_steps,
        )
        _PROGRAM_CACHE[key] = prog
    return prog


class BuildResult(NamedTuple):
    centroids: jnp.ndarray       # (k, d_nav)
    params: dict                 # trained MLP params
    losses: jnp.ndarray          # (epochs,) mean CE per epoch
    pred_categories: jnp.ndarray  # (n,) int32 model-argmax bucket per row
    data_sorted: jnp.ndarray     # (n + pad_rows, d_search) bucket-sorted
    ids_sorted: jnp.ndarray      # (n + pad_rows,) int32; -1 padding
    offsets: jnp.ndarray         # (k + 1,) int32
    counts: jnp.ndarray          # (k,) int32


def make_build_program(
    model: MLP,
    tx: optax.GradientTransformation,
    *,
    n: int,
    d_nav: int,
    n_categories: int,
    kmeans_iters: int = 25,
    kmeans_train_points: int = 31232,
    epochs: int = 12,
    batch_size: int = 1024,
    chunk: int = 262144,
    pad_rows: int = 4096,
    row_align: int = 1,
    reference_step_semantics: bool = False,
    normalize_search: bool = True,
    include_store: bool = True,
    max_train_steps=None,
    train_sample_cap: int = 8_388_608,
):
    """Build the fused program for fixed shapes. Returns a jitted function
    (data_nav, data_search, key) -> BuildResult.

    ``include_store=False`` runs only the navigation stages (k-means,
    training, predict) and returns empty store arrays — used when the
    search-space store exceeds device memory and is laid out on the host
    instead (see LearnedIndex host_store_build).

    ``train_sample_cap`` bounds the rows the MLP trains on. Shuffled-batch
    training gathers rows with `jnp.take`, and a TPU gather relayouts its
    whole operand into padded (8,128) tiles — a second full-size copy of
    `data_nav` (9.5 GB at 40M x 96 bf16, measured: the difference between
    fitting and OOM on a 16 GB chip). Past the cap the program trains on
    an every-`stride`-th-row subsample taken with a strided `lax.slice`
    (which, like `dynamic_slice`, reads the argument in place — verified
    by compile-time memory analysis), so only the ~1.5 GB sample pays the
    gather relayout. Routing quality is unaffected at these scales: the
    router's classes see 8M+ examples either way. Corpora at or under the
    cap train on every row, exactly as before."""
    from tpulmi.models.train import train_plan

    sample_stride = max(1, -(-n // train_sample_cap))
    train_rows = -(-n // sample_stride)
    n_train = min(train_rows, kmeans_train_points)
    epochs, steps_per_epoch, _ = train_plan(
        train_rows, epochs, batch_size, max_train_steps,
        reference_step_semantics
    )
    eff_batch = min(batch_size, train_rows)
    chunk = min(chunk, n)
    if row_align > 1:
        n_total_aligned = -(-(n + n_categories * row_align) // row_align) * row_align
        pad_rows_aligned = -(-pad_rows // row_align) * row_align
    else:
        n_total_aligned = pad_rows_aligned = 0

    def loss_fn(params, xb, yb):
        logits = model.apply({"params": params}, xb)
        return optax.softmax_cross_entropy_with_integer_labels(logits, yb).mean()

    # NOTE: donating data_search (its buffer could be reused for the sorted
    # copy) is rejected by both the CPU backend and this environment's
    # remote TPU backend, so it is not attempted; the device-side build is
    # therefore bounded by 2x the store size, and larger-than-half-HBM
    # corpora go through LearnedIndex.build_with_host_store instead.
    @jax.jit
    def build_program(data_nav, data_search, key):
        kkey, ikey, tkey = jax.random.split(key, 3)
        # data_nav stays in its SOURCE precision (callers pass bf16 for
        # large corpora); every consumer casts its own chunk/batch to f32.
        # A whole-array f32 cast plus the padded copy below would hold
        # ~3 full-size copies — 19 GB at 20M x 96, past HBM.

        # Training sample (see `train_sample_cap` in the docstring): a
        # strided row slice reads `data_nav` in place; gathers below then
        # relayout only this sample, never the full corpus.
        if sample_stride > 1:
            nav_train = jax.lax.slice(
                data_nav, (0, 0), (n, d_nav), (sample_stride, 1))
        else:
            nav_train = data_nav

        # ---- 1. k-means: Lloyd on a random subsample, then full assign ----
        # Stratified jittered sample instead of `permutation(n)[:n_train]`:
        # a full-corpus permutation materializes n sort keys + values twice
        # (~2.6 GB of HLO temps at 40M) only to keep the first ~250k —
        # one uniform draw per stride-sized stratum is distinct, covers the
        # corpus evenly, and costs O(n_train) memory.
        if n_train < train_rows:
            stride = train_rows // n_train
            train_idx = jnp.arange(n_train, dtype=jnp.int32) * stride + (
                jax.random.randint(kkey, (n_train,), 0, stride, jnp.int32))
        else:
            train_idx = jnp.arange(n_train, dtype=jnp.int32)
        train_x = jnp.take(nav_train, train_idx, axis=0).astype(jnp.float32)
        # centroid init: every (n_train//k)-th sample point — distinct and
        # stratified across the corpus even if rows are cluster-ordered
        init_stride = max(1, n_train // n_categories)
        centroids0 = train_x[::init_stride][:n_categories]

        def lloyd_step(c, _):
            d = _sq_dists(train_x, c)
            lbl = jnp.argmin(d, axis=1)
            cnt = jax.ops.segment_sum(
                jnp.ones((n_train,), jnp.float32), lbl, num_segments=n_categories
            )
            sums = jax.ops.segment_sum(train_x, lbl, num_segments=n_categories)
            new_c = sums / jnp.maximum(cnt, 1.0)[:, None]
            return jnp.where(cnt[:, None] > 0, new_c, c), None

        centroids, _ = jax.lax.scan(lloyd_step, centroids0, None, length=kmeans_iters)

        # Chunked row maps slice their operand IN PLACE: padding the whole
        # array (`jnp.pad`) would hold a second full-size copy for the
        # program's lifetime — 7.4 GB at 40M x 96 bf16, the difference
        # between fitting and OOM. Full chunks use dynamic_slice; the
        # sub-chunk tail is its own small padded block outside the scan.
        def _chunked_rowmap(arr, m, row_fn):
            """row_fn: (chunk, d_nav) f32 -> (chunk,) i32, applied over all
            m rows of arr in `chunk`-sized blocks; returns (m,) i32."""
            m_full = (m // chunk) * chunk
            parts = []
            if m_full:
                def body(_, i):
                    block = jax.lax.dynamic_slice(
                        arr, (i * chunk, 0), (chunk, d_nav)
                    ).astype(jnp.float32)
                    return None, row_fn(block)

                _, full = jax.lax.scan(body, None,
                                       jnp.arange(m_full // chunk))
                parts.append(full.reshape(-1))
            if m > m_full:
                tail = jnp.pad(
                    arr[m_full:], ((0, chunk - (m - m_full)), (0, 0))
                ).astype(jnp.float32)
                parts.append(row_fn(tail)[: m - m_full])
            return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

        # k-means targets are only needed for the rows the MLP trains on
        labels = _chunked_rowmap(
            nav_train, train_rows,
            lambda b: jnp.argmin(_sq_dists(b, centroids), axis=1)
            .astype(jnp.int32))

        # ---- 2. MLP init + training (single flat scan) ----
        params = model.init(ikey, jnp.zeros((1, d_nav), jnp.float32))["params"]
        opt_state = tx.init(params)
        ekeys = jax.random.split(tkey, epochs)

        def train_step(carry, batch_idx):
            params, opt_state = carry
            xb = jnp.take(nav_train, batch_idx, axis=0).astype(jnp.float32)
            yb = jnp.take(labels, batch_idx, axis=0)
            loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        # One epoch's shuffled batch indices in flight at a time: vmapping
        # `permutation` over all epochs up front holds epochs x n sort
        # keys/values simultaneously (~5 GB of HLO temps at 40M x 8 epochs).
        # Same keys, same permutations, same losses — only the buffer
        # lifetime changes.
        def epoch_body(carry, ekey):
            idx_e = jax.random.permutation(ekey, train_rows)[
                : steps_per_epoch * eff_batch
            ].reshape(steps_per_epoch, eff_batch)
            carry, step_losses = jax.lax.scan(train_step, carry, idx_e)
            return carry, step_losses.mean()

        (params, _), losses = jax.lax.scan(
            epoch_body, (params, opt_state), ekeys)

        # ---- 3. full-data argmax predict (bucket assignment = the model's
        # own partition, matching the reference `search/li/LearnedIndex.py:67,240`) ----
        pred = _chunked_rowmap(
            data_nav, n,
            lambda b: jnp.argmax(
                model.apply({"params": params}, b), axis=1
            ).astype(jnp.int32))

        if not include_store:
            counts = jax.ops.segment_sum(
                jnp.ones((n,), jnp.int32), pred, num_segments=n_categories
            ).astype(jnp.int32)
            offsets = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
            )
            empty_d = jnp.zeros((0, 1), jnp.float32)
            empty_i = jnp.zeros((0,), jnp.int32)
            return BuildResult(
                centroids=centroids, params=params, losses=losses,
                pred_categories=pred, data_sorted=empty_d, ids_sorted=empty_i,
                offsets=offsets, counts=counts,
            )

        # ---- 4. bucket store: stable sort by predicted bucket, CSR;
        # bucket row ranges aligned to `row_align` blocks (sentinel gaps) so
        # the Pallas probe kernel can DMA whole blocks ----
        order = jnp.argsort(pred, stable=True).astype(jnp.int32)
        data_search = data_search.astype(jnp.float32)
        if normalize_search:
            data_search = l2_normalize(data_search)
        counts = jax.ops.segment_sum(
            jnp.ones((n,), jnp.int32), pred, num_segments=n_categories
        ).astype(jnp.int32)
        if row_align <= 1:
            offsets = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
            )
            data_sorted = jnp.pad(
                jnp.take(data_search, order, axis=0), ((0, pad_rows), (0, 0))
            )
            ids_sorted = jnp.pad(order, (0, pad_rows), constant_values=-1)
        else:
            aligned = -(-counts // row_align) * row_align
            offsets = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned).astype(jnp.int32)]
            )
            raw_offsets = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
            )
            sorted_labels = jnp.take(pred, order)
            rank = (jnp.arange(n, dtype=jnp.int32)
                    - jnp.take(raw_offsets, sorted_labels))
            pos = jnp.take(offsets, sorted_labels) + rank
            d_search = data_search.shape[1]
            data_sorted = jnp.zeros((n_total_aligned + pad_rows_aligned, d_search),
                                    jnp.float32)
            data_sorted = data_sorted.at[pos].set(
                jnp.take(data_search, order, axis=0)
            )
            ids_sorted = jnp.full((n_total_aligned + pad_rows_aligned,), -1,
                                  jnp.int32)
            ids_sorted = ids_sorted.at[pos].set(order)

        return BuildResult(
            centroids=centroids,
            params=params,
            losses=losses,
            pred_categories=pred,
            data_sorted=data_sorted,
            ids_sorted=ids_sorted,
            offsets=offsets,
            counts=counts,
        )

    return build_program
