"""Flax MLP bucket-classifier family.

Re-creates the nine architecture variants of the reference's torch ``Model``
(`search/li/model.py:15-79`) as a single parameterized Flax module: each
variant is a stack of Dense+ReLU hidden layers followed by a Dense logit
layer over the buckets.

Note: the reference's `MLP-9` wires ``Linear(input_dim, 8) → ReLU →
Linear(input_dim, 16)`` (`search/li/model.py:71-78`), which cannot run (the
second layer expects ``input_dim`` features but receives 8). Here `MLP-9`
means the evidently intended [8, 16] stack.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

MODEL_HIDDEN_DIMS = {
    "MLP": (128,),
    "MLP-2": (64,),
    "MLP-3": (256,),
    "MLP-4": (512,),
    "MLP-5": (256, 128),
    "MLP-6": (32,),
    "MLP-7": (16,),
    "MLP-8": (8,),
    "MLP-9": (8, 16),
}


class MLP(nn.Module):
    """ReLU MLP classifier: hidden_dims Dense+ReLU layers, then logits."""

    hidden_dims: Sequence[int]
    n_classes: int
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.compute_dtype)
        for width in self.hidden_dims:
            x = nn.Dense(width, param_dtype=self.param_dtype, dtype=self.compute_dtype)(x)
            x = nn.relu(x)
        # Logits in float32 for a stable softmax/cross-entropy.
        return nn.Dense(self.n_classes, param_dtype=self.param_dtype, dtype=jnp.float32)(x)


def make_model(
    model_type: str,
    n_classes: int,
    compute_dtype=jnp.float32,
) -> MLP:
    """Build the named architecture variant (reference CLI flag
    ``--model-type``, `search/search.py:200-205`)."""
    if model_type not in MODEL_HIDDEN_DIMS:
        raise ValueError(
            f"Unknown model_type {model_type!r}; expected one of {sorted(MODEL_HIDDEN_DIMS)}"
        )
    return MLP(
        hidden_dims=MODEL_HIDDEN_DIMS[model_type],
        n_classes=n_classes,
        compute_dtype=compute_dtype,
    )
