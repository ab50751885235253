"""tpulmi — a TPU-native learned index for approximate nearest-neighbor search.

A ground-up JAX/XLA/Pallas re-design of the SISAP 2023 LAION2B "LMI" learned
index (reference: TerkaSlan/sisap23-laion-challenge-learned-index). The
pipeline is the same three conceptual stages as the reference
(`/root/reference/README.md:11`):

1. **Partition** — k-means clusters the navigation embeddings into buckets.
   Here: jitted Lloyd iterations as batched matmuls + argmin on the MXU
   (``tpulmi.ops.kmeans``), replacing ``faiss.Kmeans``.
2. **Learn** — an MLP is trained to predict each vector's bucket.
   Here: a Flax MLP + optax Adam with an on-device, ``lax.scan``-batched
   training loop (``tpulmi.models``), replacing the torch training loop.
3. **Search** — per query, the MLP ranks buckets; the top-B buckets are probed
   with exact cosine distance over full-resolution vectors and merged into a
   global top-k. Here: a single jitted, fully batched probe pipeline
   (``tpulmi.search``) — softmax routing, slot-sorted bucket grouping,
   MXU distance matmuls, ``lax.top_k`` merges — replacing the per-bucket
   pandas groupby loop of the reference (`search/li/LearnedIndex.py:143`).

Two embedding spaces are used simultaneously, as in the reference: a small
"navigation" space (e.g. pca96) for clustering + routing and a
full-resolution "search" space (e.g. clip768) for the exact rerank.
"""

from tpulmi.index import LearnedIndex, BuiltIndex
from tpulmi.baseline import Baseline
from tpulmi.hierarchical import HierarchicalConfig, HierarchicalIndex
from tpulmi.utils.config import IndexConfig, SearchConfig

__version__ = "0.1.0"

__all__ = [
    "LearnedIndex",
    "BuiltIndex",
    "Baseline",
    "HierarchicalIndex",
    "HierarchicalConfig",
    "IndexConfig",
    "SearchConfig",
    "__version__",
]
