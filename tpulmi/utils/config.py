"""Configuration dataclasses for tpulmi.

Mirrors the knobs of the reference CLI (`search/search.py:169-233`): dataset
pair, number of categories/leaves, epochs, learning rate, model architecture,
probe budget (as a percentage of categories, like the reference's ``-bp``
flag), and k.

Epoch semantics differ deliberately from the reference: the reference's
``train_batch`` applies ONE optimizer step per epoch (last batch only,
`search/li/model.py:186-198`), so its published "205 epochs, lr 0.009" is
really 205 Adam steps. tpulmi trains properly — a step per batch — so far
fewer passes are needed; the defaults here (12 epochs, lr 0.003,
batch 1024) are the configuration benched in bench.py, and
``max_train_steps`` caps the total step budget (rounded down to whole
epochs) so reference-scale epoch counts on reference-scale corpora cannot
silently schedule millions of steps. Set ``reference_step_semantics=True``
to reproduce the reference's one-step-per-epoch behavior exactly.
"""

from dataclasses import dataclass, field, asdict
from typing import List, Optional, Tuple


@dataclass(frozen=True)
class IndexConfig:
    """Build-time configuration of the learned index."""

    n_categories: int = 122
    epochs: int = 12
    lr: float = 0.003
    model_type: str = "MLP-5"
    batch_size: int = 1024
    seed: int = 2023

    # Hard cap on total optimizer steps (epochs * (n // batch_size) with the
    # default per-batch stepping), truncated to whole epochs. None = no cap.
    max_train_steps: Optional[int] = 20_000

    # K-means (replaces faiss.Kmeans defaults: 25 Lloyd iterations, training
    # subsampled to 256 points per centroid — faiss Clustering defaults).
    kmeans_iters: int = 25
    kmeans_max_points_per_centroid: int = 256

    # Numerics. Matmuls run in this dtype on the MXU with f32 accumulation.
    compute_dtype: str = "float32"

    # Build the index via the single fused XLA program (tpulmi/build.py):
    # one compile, one dispatch. Disable to run the modular per-stage path.
    fused_build: bool = True

    # Bucket rows are padded so every bucket starts on a multiple of this;
    # must be a multiple of SearchConfig.pallas_mc for the Pallas kernel.
    row_align: int = 2048

    # The reference's `train_batch` only applies one optimizer step per epoch
    # (on the final batch — `search/li/model.py:186-198`). We train properly
    # (a step per batch) by default; set True to mimic the reference's
    # behavior for apples-to-apples validation (see SURVEY.md §3.6).
    reference_step_semantics: bool = False

    def to_dict(self) -> dict:
        return asdict(self)


@dataclass(frozen=True)
class SearchConfig:
    """Query-time configuration."""

    k: int = 10
    n_buckets: int = 4  # number of probed buckets (reference: bp% of n_categories)
    # Static padding knobs for the batched probe pipeline. `None` → derived
    # from the routing result at call time (rounded up to a size class so the
    # jitted pipeline is compiled only a handful of times).
    queries_per_bucket_pad: Optional[int] = None
    data_chunk: int = 2048   # rows of a bucket processed per inner-scan step
    query_chunk: int = 512   # slots per query chunk (cond-skipped when empty)
    batch_queries: Optional[int] = None  # split very large query sets
    # MXU input precision for the distance matmuls; accumulation is always
    # float32, so bfloat16 costs ~0.02% relative distance error for 2x
    # throughput. None = float32 (exact).
    compute_dtype: Optional[str] = "bfloat16"

    # Probe backend: "pallas" (fused Pallas kernel, ~3x the XLA pipeline on
    # TPU), "xla" (portable reference pipeline), or "auto" (pallas on TPU
    # when the store layout allows, else xla).
    backend: str = "auto"
    # Kernel tile sizes, tuned on hardware (scripts/kbench.py): qc=512
    # reads each bucket once for up to 512 slots/bucket and lifts the
    # matmul off the measured HBM roofline; mc=1024 satisfies the int8
    # scales tiling and amortizes per-tile overheads.
    pallas_qc: int = 512   # query-block rows per kernel tile
    pallas_mc: int = 1024  # data-block rows per kernel tile
    # Top-k maintenance strategy inside the kernel: "scalar" extracts one
    # per-query minimum per (min, argmin, knockout) sweep of the distance
    # tile; "group" harvests the minima of all mc/128 lane-aligned column
    # groups in ONE sweep and merges them on a 128-lane tile, repeating
    # only on same-group collisions among the top-k; "group2" is the same
    # harvest with two fewer full-tile VPU passes (similarity-space tile +
    # fused count/harvest sweep whose per-lane counts double as the
    # collision test). Hardware A/B at the 20M kernel shape (kbench,
    # int8 x int8 qc=192/mc=1024): group 19.3 ms vs scalar 21.6 ms (0.523
    # vs 0.468 of the measured HBM ceiling); qc=512: 25.3 vs 26.8 ms.
    # Exactness of all three is proven by the interpret-mode parity suite
    # incl. an adversarial same-group-collision test.
    pallas_extract: str = "group"
    # int8 stores + pallas backend only: quantize the query tiles too and
    # run the distance matmul int8 x int8 -> int32 on the MXU (2x the bf16
    # rate on v5e, no VMEM dequant of the data tile). Ranking is exact
    # w.r.t. the quantized scores (the per-query scale factors out); the
    # ~0.5% query-quantization noise sits inside the margin the int8
    # store's exact rerank already absorbs — keep `rerank` on with this.
    int8_queries: bool = False
    # Pallas backend: run the kernel on a flat worklist grid (one grid
    # step per live (query-block, chunk) pair) instead of the dense
    # (blocks × max_chunks) grid. Bucket-size skew costs the dense grid
    # one empty step per missing chunk — measured ~2.5× probe-phase
    # inflation at the skewed 10M shape (BENCH_10M.md). The worklist
    # length is sized from the first batch's actual routing and re-run
    # once larger on overflow (same contract as queries_per_bucket_pad).
    pallas_worklist: bool = False
    # Pallas backend + quantized rerank only: track a NARROW exact top-k
    # (the user's k) in the kernel and fill the rerank depth's extra
    # candidates (rerank_extra) from the kernel's residue-class pool —
    # scratch lanes [k, 128) accumulate each 128-column class's best
    # harvested candidate for one compare + two selects per chunk, no
    # serialized extraction. Every extraction merge and the improver
    # threshold then scale with k instead of k + rerank_extra (up to 40 at
    # int4 depths). The extras are best-effort, not exact order
    # statistics; the exact host rerank reorders whatever it gets, so the
    # effect on recall is A/B'd under the same gate as every other knob.
    pallas_pool: bool = False
    # Pallas backend: fuse TWO consecutive mc-row chunks into one 2·mc-wide
    # compute tile per grid step (two DMA refs). Halves grid steps and
    # top-k merge invocations — mc=2048's measured per-step amortization
    # (kbench 20M replica: 17.8 → 15.8 ms) without requiring
    # row_align=2048, whose store padding pushed the real 20M int8 store
    # past HBM. Off by default until the composed path is hardware-A/B'd.
    pallas_pair: bool = False

    # Quantized (int8) stores only: rerank the final candidates against a
    # host-resident full-precision corpus (when the index has one) to erase
    # the ~1e-3 int8 cosine error. `rerank_extra` extra candidates are
    # fetched per query so the exact reorder can recover neighbors the
    # quantized scores narrowly misranked. None resolves per store dtype at
    # search time: 30 for packed int4, 10 otherwise — int4's ~4e-3 cosine
    # noise needs the deeper exact pool (measured at 1M/120 buckets:
    # recall@10 plateaus at 0.867 across ALL probe budgets with 10 extras,
    # 0.97 at 30, 0.99 at 60 — the true neighbor must survive the
    # quantized top-(k+extra) cut before the exact rerank can restore it).
    rerank: bool = True
    rerank_extra: Optional[int] = None
    # "float16" gathers candidates from a cached f16 shadow of the host
    # corpus: half the (single-core) random-gather bytes for ~4e-4 relative
    # distance error — far below the int8 error the rerank erases.
    rerank_dtype: str = "float32"

    # Threshold pruning (XLA backend; needs `LearnedIndex.compute_bounds()`
    # on the store first): probe ranks beyond `prune_after` skip every
    # (query-chunk × bucket) scan whose spherical-cap lower bound exceeds
    # the running kth-best from the first `prune_after` ranks — the
    # reference's threshold prune (`search/li/utils.py:14-43`) without
    # dynamic shapes, and it saves real scan work instead of only masking.
    # 0 = off. Results are identical to the unpruned pipeline (`prune_eps`
    # slack absorbs compute-dtype rounding; None = auto from the store and
    # compute dtypes).
    prune_after: int = 0
    prune_eps: Optional[float] = None

    # Narrow the fetched distance leaf: cast the final (Q, k) distances to
    # this dtype on DEVICE as the search program's last op. Ranking and ids
    # are computed in f32 and are bit-identical; only the reported distance
    # values round (float16: ~5e-4 relative, bfloat16: ~4e-3). On a
    # host-link-bound serving path the distances are half of every fetched
    # result batch (e.g. 400 KB of an 800 KB 10k-query fetch — ~30 ms at
    # this environment's relay rates), so this is a direct latency cut for
    # pipelines that consume ids (+approximate scores). Flat-index path
    # only (sharded/rerank paths never download full-precision distances
    # anyway). None = exact float32.
    fetch_dtype: Optional[str] = None

    # Per-query adaptive probe truncation (XLA backend): stop probing once
    # the cumulative routed probability mass reaches this value, i.e.
    # n_buckets becomes a per-query CAP instead of a fixed budget. Slots
    # beyond the crossing are dropped before the scan, so easy queries
    # (router mass concentrated) stop at 1-2 probes while hard ones use
    # the full budget — real scan-work savings where worst-case geometric
    # bounds cannot fire (in 768-d a perfect bound would prune 94%+ of
    # deep-probe work, but high-dimensional concentration makes every cap
    # bound vacuous; this probability knob is the typical-case answer, and
    # the per-query-adaptive analog of the reference's fixed `-bp` budget).
    # None = off; 1.0 = keep everything (identical results).
    probe_mass: Optional[float] = None

    def to_dict(self) -> dict:
        return asdict(self)


def n_buckets_from_percentage(bp: List[int], n_categories: int) -> List[int]:
    """Reference `-bp` semantics: percent of n_categories, floored, deduped,
    zero-dropped (`search/search.py:37-38`). bp=4, 122 cats → 4 buckets;
    bp=6 → 7 buckets."""
    buckets = [int((b / 100) * n_categories) for b in bp]
    return sorted(set(b for b in buckets if b > 0))
