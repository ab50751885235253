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
):
    """Build the fused program for fixed shapes. Returns a jitted function
    (data_nav, data_search, key) -> BuildResult.

    ``include_store=False`` runs only the navigation stages (k-means,
    training, predict) and returns empty store arrays — used when the
    search-space store exceeds device memory and is laid out on the host
    instead (see LearnedIndex host_store_build)."""
    from tpulmi.models.train import train_plan

    n_train = min(n, kmeans_train_points)
    epochs, steps_per_epoch, total_steps = train_plan(
        n, epochs, batch_size, max_train_steps, reference_step_semantics
    )
    eff_batch = min(batch_size, n)
    chunk = min(chunk, n)
    n_chunks = (n + chunk - 1) // chunk
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

        # ---- 1. k-means: Lloyd on a random subsample, then full assign ----
        perm = jax.random.permutation(kkey, n)
        train_x = jnp.take(data_nav, perm[:n_train], axis=0).astype(jnp.float32)
        centroids0 = train_x[:n_categories]  # distinct random points

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

        nav_pad = jnp.pad(data_nav, ((0, n_chunks * chunk - n), (0, 0)))

        def assign_body(_, i):
            block = jax.lax.dynamic_slice(
                nav_pad, (i * chunk, 0), (chunk, d_nav)
            ).astype(jnp.float32)
            return None, jnp.argmin(_sq_dists(block, centroids), axis=1).astype(jnp.int32)

        _, labels = jax.lax.scan(assign_body, None, jnp.arange(n_chunks))
        labels = labels.reshape(-1)[:n]

        # ---- 2. MLP init + training (single flat scan) ----
        params = model.init(ikey, jnp.zeros((1, d_nav), jnp.float32))["params"]
        opt_state = tx.init(params)
        ekeys = jax.random.split(tkey, epochs)
        perms = jax.vmap(
            lambda k: jax.random.permutation(k, n)[: steps_per_epoch * eff_batch]
        )(ekeys)
        idx = perms.reshape(total_steps, eff_batch)

        def train_step(carry, batch_idx):
            params, opt_state = carry
            xb = jnp.take(data_nav, batch_idx, axis=0).astype(jnp.float32)
            yb = jnp.take(labels, batch_idx, axis=0)
            loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, _), step_losses = jax.lax.scan(train_step, (params, opt_state), idx)
        losses = step_losses.reshape(epochs, steps_per_epoch).mean(axis=1)

        # ---- 3. full-data argmax predict (bucket assignment = the model's
        # own partition, matching the reference `search/li/LearnedIndex.py:67,240`) ----
        def predict_body(_, i):
            block = jax.lax.dynamic_slice(
                nav_pad, (i * chunk, 0), (chunk, d_nav)
            ).astype(jnp.float32)
            logits = model.apply({"params": params}, block)
            return None, jnp.argmax(logits, axis=1).astype(jnp.int32)

        _, pred = jax.lax.scan(predict_body, None, jnp.arange(n_chunks))
        pred = pred.reshape(-1)[:n]

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
