"""On-device training and inference for the bucket classifier.

Replaces the reference's torch ``NeuralNetwork`` train/predict wrapper
(`search/li/model.py:114-229`). The whole training run — epochs, per-epoch
shuffling, batching, Adam steps — is a single jitted ``lax.scan`` program:
the dataset is device-put once and batches are formed by on-device gather of
a shuffled index, so there are no host round-trips per step (the reference
pays a Python DataLoader iteration per batch, `search/li/LearnedIndex.py:224-230`).

The reference's ``train_batch`` applies exactly one optimizer step per epoch
(on the last batch; every other forward is wasted — `search/li/model.py:186-198`).
That behavior is reproducible with ``reference_step_semantics=True`` (one
step per epoch on a random batch, which is what the buggy loop effectively
does); the default trains properly with a step per batch.
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from tpulmi.models.mlp import MLP, make_model
from tpulmi.utils.logging import get_logger

log = get_logger("tpulmi.models.train")


@dataclass
class TrainState:
    params: FrozenDict
    opt_state: optax.OptState
    epoch_losses: jnp.ndarray  # (epochs,) mean CE loss per epoch


def train_plan(
    n: int,
    epochs: int,
    batch_size: int,
    max_train_steps: Optional[int] = None,
    reference_step_semantics: bool = False,
) -> Tuple[int, int, int]:
    """Resolve the training schedule: (epochs, steps_per_epoch, total_steps).

    Default semantics: one Adam step per batch, `n // batch_size` steps per
    epoch; `max_train_steps` caps the total budget, truncated to whole
    epochs (at least one). With `reference_step_semantics` one step runs per
    epoch — the reference's last-batch-only loop
    (`search/li/model.py:186-198`) — so `epochs` counts steps directly and
    the cap applies to that count."""
    steps_per_epoch = 1 if reference_step_semantics else max(n // batch_size, 1)
    if max_train_steps:
        capped = max(max_train_steps // steps_per_epoch, 1)
        if capped < epochs:
            log.info(
                "train plan: %d epochs x %d steps exceeds max_train_steps=%d; "
                "training %d epochs (%d steps)",
                epochs, steps_per_epoch, max_train_steps, capped,
                capped * steps_per_epoch,
            )
        epochs = min(epochs, capped)
    return epochs, steps_per_epoch, epochs * steps_per_epoch


def _make_train_fn(model: MLP, tx: optax.GradientTransformation,
                   n: int, batch_size: int, epochs: int,
                   reference_step_semantics: bool,
                   max_train_steps: Optional[int] = None):
    """The entire training run as ONE compiled program with a single
    flat `lax.scan` over all epochs × steps.

    Per-epoch shuffles are precomputed up front (`vmap`'d permutations over
    the per-epoch keys) so the scan stays single-level — a nested
    epochs-over-steps scan compiled pathologically slowly, and one dispatch
    avoids paying per-call latency `epochs` times."""
    epochs, steps_per_epoch, total_steps = train_plan(
        n, epochs, batch_size, max_train_steps, reference_step_semantics
    )
    eff_batch = min(batch_size, n)

    def loss_fn(params, xb, yb):
        logits = model.apply({"params": params}, xb)
        return optax.softmax_cross_entropy_with_integer_labels(logits, yb).mean()

    @jax.jit
    def train_fn(params, opt_state, X, y, key):
        ekeys = jax.random.split(key, epochs)
        perms = jax.vmap(
            lambda k: jax.random.permutation(k, n)[: steps_per_epoch * eff_batch]
        )(ekeys)
        idx = perms.reshape(total_steps, eff_batch)

        def step_fn(carry, batch_idx):
            params, opt_state = carry
            xb = jnp.take(X, batch_idx, axis=0)
            yb = jnp.take(y, batch_idx, axis=0)
            loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(step_fn, (params, opt_state), idx)
        return params, opt_state, losses.reshape(epochs, steps_per_epoch).mean(axis=1)

    return train_fn


def train_lr_sweep(
    model,
    X,
    y,
    lrs,
    epochs: int = 8,
    batch_size: int = 1024,
    seed: int = 2023,
    max_train_steps: Optional[int] = None,
):
    """Train one classifier PER learning rate in a single vmapped program —
    the TPU-idiomatic version of the reference's one-PBS-job-per-combo
    hyperparameter sweep (`search/run-multiple.sh:11-34`; SURVEY.md §2.3
    "vmap small-model training across configs on one chip"). All configs
    share the data, the batch schedule, and one compiled program; the MXU
    batches the per-config matmuls along the vmap axis.

    Returns (stacked_params, losses) where every leaf of `stacked_params`
    carries a leading (len(lrs),) axis and `losses` is
    (len(lrs), epochs)."""
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.int32)
    n = int(X.shape[0])
    lrs = jnp.asarray(lrs, jnp.float32)
    epochs_eff, steps_per_epoch, total_steps = train_plan(
        n, epochs, batch_size, max_train_steps
    )
    eff_batch = min(batch_size, n)

    @jax.jit
    def sweep_fn(X, y, lrs, key):
        ekeys = jax.random.split(key, epochs_eff)
        perms = jax.vmap(
            lambda k: jax.random.permutation(k, n)[
                : steps_per_epoch * eff_batch
            ]
        )(ekeys)
        idx = perms.reshape(total_steps, eff_batch)

        def run_one(lr, ikey):
            # optax transforms are pure: constructing the optimizer inside
            # the traced fn with a TRACED lr is what makes this vmappable
            tx = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
            params = model.init(ikey, jnp.zeros((1, X.shape[1])))["params"]
            opt_state = tx.init(params)

            def step_fn(carry, batch_idx):
                params, opt_state = carry
                xb = jnp.take(X, batch_idx, axis=0)
                yb = jnp.take(y, batch_idx, axis=0)

                def loss_fn(p):
                    logits = model.apply({"params": p}, xb)
                    return optax.softmax_cross_entropy_with_integer_labels(
                        logits, yb).mean()

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates),
                        opt_state), loss

            (params, _), losses = jax.lax.scan(
                step_fn, (params, opt_state), idx)
            return params, losses.reshape(
                epochs_eff, steps_per_epoch).mean(axis=1)

        ikeys = jax.random.split(jax.random.PRNGKey(seed), lrs.shape[0])
        return jax.vmap(run_one)(lrs, ikeys)

    return sweep_fn(X, y, lrs, jax.random.PRNGKey(seed + 1))


class BucketClassifier:
    """Train/serve wrapper around the Flax MLP, analogous to the reference's
    ``NeuralNetwork`` (`search/li/model.py:114`)."""

    def __init__(
        self,
        input_dim: int,
        n_classes: int,
        lr: float = 0.009,
        model_type: str = "MLP",
        seed: int = 2023,
        compute_dtype=jnp.float32,
        initialize: bool = True,
    ):
        self.model = make_model(model_type, n_classes, compute_dtype=compute_dtype)
        self.model_type = model_type
        self.input_dim = input_dim
        self.n_classes = n_classes
        self.lr = lr
        self.seed = seed
        self.tx = optax.adam(lr)
        self.params = None
        self.opt_state = None
        if initialize:
            # `initialize=False` defers to a caller that provides trained
            # params (e.g. the fused build program initializes in-program).
            key = jax.random.PRNGKey(seed)
            variables = self.model.init(key, jnp.zeros((1, input_dim), jnp.float32))
            self.params = variables["params"]
            self.opt_state = self.tx.init(self.params)
        self._train_fn_cache = {}

    def train(
        self,
        X,
        y,
        epochs: int = 100,
        batch_size: int = 256,
        reference_step_semantics: bool = False,
        max_train_steps: Optional[int] = None,
    ) -> jnp.ndarray:
        """Train on the full dataset; returns per-epoch mean losses."""
        X = jnp.asarray(X, jnp.float32)
        y = jnp.asarray(y, jnp.int32)
        n = int(X.shape[0])
        cache_key = (n, batch_size, epochs, reference_step_semantics,
                     max_train_steps)
        train_fn = self._train_fn_cache.get(cache_key)
        if train_fn is None:
            train_fn = _make_train_fn(
                self.model, self.tx, n, batch_size, epochs,
                reference_step_semantics, max_train_steps
            )
            self._train_fn_cache[cache_key] = train_fn
        key = jax.random.PRNGKey(self.seed + 1)
        self.params, self.opt_state, losses = train_fn(
            self.params, self.opt_state, X, y, key
        )
        return losses

    @partial(jax.jit, static_argnames=("self", "chunk"))
    def _predict_chunked(self, params, X, chunk: int):
        n, d = X.shape
        n_chunks = (n + chunk - 1) // chunk
        X_pad = jnp.pad(X, ((0, n_chunks * chunk - n), (0, 0)))

        def body(_, i):
            block = jax.lax.dynamic_slice(X_pad, (i * chunk, 0), (chunk, d))
            logits = self.model.apply({"params": params}, block)
            return None, jnp.argmax(logits, axis=1).astype(jnp.int32)

        _, out = jax.lax.scan(body, None, jnp.arange(n_chunks))
        return out.reshape(-1)[:n]

    def predict(self, X, chunk: int = 131072) -> jnp.ndarray:
        """Argmax bucket for every row (used for the build-time bucket
        assignment, reference `search/li/model.py:201-212`)."""
        X = jnp.asarray(X, jnp.float32)
        chunk = min(chunk, max(128, int(X.shape[0])))
        return self._predict_chunked(self.params, X, chunk)

    @partial(jax.jit, static_argnames=("self", "top"))
    def _predict_proba_top(self, params, X, top: int):
        logits = self.model.apply({"params": params}, X)
        probs = jax.nn.softmax(logits, axis=-1)
        top_p, top_i = jax.lax.top_k(probs, top)
        return top_p, top_i.astype(jnp.int32)

    def predict_proba(self, X, top: Optional[int] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Softmax bucket ranking per query. Unlike the reference — which
        ranks *all* buckets (`search/li/model.py:226-227`) — only the `top`
        buckets that will actually be probed are ranked (`lax.top_k`)."""
        X = jnp.asarray(X, jnp.float32)
        if top is None:
            top = self.n_classes
        return self._predict_proba_top(self.params, X, top)

    # hashable-static support so the jitted methods can take `self` static
    def __hash__(self):
        return hash((id(self),))

    def __eq__(self, other):
        return self is other
