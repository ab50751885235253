"""MLP family + trainer: all architecture variants, learning a partition,
and the reference's one-step-per-epoch semantics flag (SURVEY.md §3.6)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpulmi.models.mlp import MODEL_HIDDEN_DIMS, make_model
from tpulmi.models.train import BucketClassifier


@pytest.mark.parametrize("model_type", sorted(MODEL_HIDDEN_DIMS))
def test_all_variants_forward(model_type):
    import jax

    model = make_model(model_type, n_classes=13)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 24)))
    out = model.apply(params, jnp.zeros((5, 24)))
    assert out.shape == (5, 13)
    assert out.dtype == jnp.float32


def test_unknown_variant_raises():
    with pytest.raises(ValueError):
        make_model("MLP-42", n_classes=2)


def _separable(rng, n=4000, d=16, k=6):
    centers = 3.0 * rng.normal(size=(k, d)).astype(np.float32)
    y = rng.integers(0, k, size=n).astype(np.int32)
    x = centers[y] + 0.3 * rng.normal(size=(n, d)).astype(np.float32)
    return x, y


def test_training_learns_partition(rng):
    x, y = _separable(rng)
    clf = BucketClassifier(16, 6, lr=0.003, model_type="MLP-5", seed=0)
    losses = clf.train(x, y, epochs=6, batch_size=256)
    assert float(losses[-1]) < float(losses[0])
    acc = (np.asarray(clf.predict(x)) == y).mean()
    assert acc > 0.95


def test_reference_step_semantics_runs(rng):
    x, y = _separable(rng, n=1000)
    clf = BucketClassifier(16, 6, lr=0.01, model_type="MLP", seed=0)
    losses = clf.train(x, y, epochs=5, batch_size=256, reference_step_semantics=True)
    assert losses.shape == (5,)  # one (single-step) epoch loss each


def test_predict_proba_topk(rng):
    x, y = _separable(rng, n=500)
    clf = BucketClassifier(16, 6, lr=0.003, model_type="MLP-5", seed=0)
    clf.train(x, y, epochs=3, batch_size=128)
    probs, ids = clf.predict_proba(x[:32], top=4)
    assert probs.shape == (32, 4) and ids.shape == (32, 4)
    # descending probabilities, valid bucket ids
    assert (np.diff(np.asarray(probs), axis=1) <= 1e-6).all()
    assert np.asarray(ids).min() >= 0 and np.asarray(ids).max() < 6
    # rank-0 equals argmax prediction
    np.testing.assert_array_equal(np.asarray(ids)[:, 0], np.asarray(clf.predict(x[:32])))


def test_predict_chunking_consistent(rng):
    x, y = _separable(rng, n=700)
    clf = BucketClassifier(16, 6, lr=0.003, model_type="MLP-3", seed=0)
    clf.train(x, y, epochs=2, batch_size=128)
    np.testing.assert_array_equal(
        np.asarray(clf.predict(x, chunk=128)), np.asarray(clf.predict(x, chunk=700))
    )


def test_train_lr_sweep_vmapped(rng):
    """One vmapped program trains a classifier per learning rate; every
    config learns, and the lr axis is a real per-config axis (different
    lrs -> different trajectories)."""
    import jax

    from tpulmi.models.mlp import make_model
    from tpulmi.models.train import train_lr_sweep

    n, d, c = 2000, 12, 6
    centers = rng.normal(size=(c, d)).astype(np.float32)
    labels = rng.integers(0, c, size=n).astype(np.int32)
    X = centers[labels] + 0.05 * rng.normal(size=(n, d)).astype(np.float32)

    model = make_model("MLP-5", n_classes=c)
    lrs = (0.0003, 0.003)
    params, losses = train_lr_sweep(model, X, labels, lrs, epochs=6,
                                    batch_size=256, seed=7)
    losses = np.asarray(jax.device_get(losses))
    assert losses.shape == (2, 6)
    # both configs learn; trajectories differ across the lr axis
    assert (losses[:, -1] < losses[:, 0]).all()
    assert abs(losses[0, -1] - losses[1, -1]) > 1e-4

    # the stacked params are per-config: the faster lr fits better here
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.shape[0] == 2
    import jax.numpy as jnp
    p1 = jax.tree_util.tree_map(lambda l: l[1], params)
    acc = np.mean(np.asarray(jnp.argmax(
        model.apply({"params": p1}, jnp.asarray(X)), axis=1)) == labels)
    assert acc > 0.9
