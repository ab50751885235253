"""Host-side data layer: dataset fetch/load, normalization, result writing.

Covers the reference's `search/li/utils.py:46-97` (S3 download of the SISAP
LAION subsets, SISAP result-format HDF5 writer) and the loading/normalization
in `search/search.py:46-93`. I/O stays on the host (h5py); arrays are
device-put once by the index layer.

Also provides a synthetic clustered-dataset generator used by the test suite
and the benchmark — the reference has no offline test data path at all (its
CI downloads the real 300K subset; `.github/workflows/ci.yml:50-60`).
"""

import os
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

from tpulmi.utils.logging import get_logger

log = get_logger("tpulmi.data")

SISAP_URL = "https://sisap-23-challenge.s3.amazonaws.com/SISAP23-Challenge"
VALID_SIZES = ("100K", "300K", "10M", "30M", "100M")


def normalize(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    """L2-normalize rows (host-side, float32). Equivalent to
    sklearn.preprocessing.normalize as used in `search/search.py:50-52`."""
    x = np.asarray(x, dtype=np.float32)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.maximum(norms, eps)


def save_as_pickle(filename: str, obj) -> None:
    """Pickle an object to disk (reference `search/li/utils.py:46-60`).
    Prefer `LearnedIndex.save` — the orbax checkpoint has a load path and
    doesn't capture device buffers in a fragile binary format."""
    import pickle

    os.makedirs(Path(filename).parent or Path("."), exist_ok=True)
    with open(filename, "wb") as f:
        pickle.dump(obj, f)


def download(src: str, dst: str) -> None:
    """Fetch `src` to `dst` unless it already exists (reference
    `search/li/utils.py:63-68`)."""
    from urllib.request import urlretrieve

    if not os.path.exists(dst):
        os.makedirs(Path(dst).parent, exist_ok=True)
        log.info("downloading %s -> %s", src, dst)
        urlretrieve(src, dst)


def prepare(kind: str, size: str, data_dir: str = "data") -> Dict[str, str]:
    """Ensure the SISAP query + dataset h5 files for (kind, size) exist
    locally; returns their paths (reference `search/li/utils.py:71-82`)."""
    task = {
        "query": f"{SISAP_URL}/public-queries-10k-{kind}.h5",
        "dataset": f"{SISAP_URL}/laion2B-en-{kind}-n={size}.h5",
    }
    paths = {}
    for version, url in task.items():
        target = os.path.join(data_dir, kind, size, f"{version}.h5")
        download(url, target)
        if not os.path.exists(target):
            raise FileNotFoundError(f"Failed to download {url}")
        paths[version] = target
    return paths


def load_h5(path: str, key: str) -> np.ndarray:
    """Load one dataset from an HDF5 file into host memory as float32."""
    import h5py

    with h5py.File(path, "r") as f:
        return np.asarray(f[key], dtype=np.float32)


def load_dataset(
    kind: str,
    key: str,
    size: str,
    data_dir: str = "data",
    preprocess: bool = False,
    fetch: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Load (dataset, queries) for a SISAP (kind, size) pair, optionally
    L2-normalizing both (reference `search/search.py:46-52`)."""
    if fetch:
        prepare(kind, size, data_dir)
    data = load_h5(os.path.join(data_dir, kind, size, "dataset.h5"), key)
    queries = load_h5(os.path.join(data_dir, kind, size, "query.h5"), key)
    if preprocess:
        data = normalize(data)
        queries = normalize(queries)
    return data, queries


def store_results(
    dst: str,
    algo: str,
    kind: str,
    dists: np.ndarray,
    anns: np.ndarray,
    buildtime: float,
    querytime: float,
    params: str,
    size: str,
) -> None:
    """Write a SISAP-format result file — byte-compatible with the reference
    writer (`search/li/utils.py:85-97`) so the upstream eval harness
    (sisap-challenges/sisap23-laion-challenge-evaluation) works unchanged.
    `anns` must already be 1-based."""
    import h5py

    os.makedirs(Path(dst).parent, exist_ok=True)
    with h5py.File(dst, "w") as f:
        f.attrs["algo"] = algo
        f.attrs["data"] = kind
        f.attrs["buildtime"] = buildtime
        f.attrs["querytime"] = querytime
        f.attrs["size"] = size
        f.attrs["params"] = params
        f.create_dataset("knns", anns.shape, dtype=anns.dtype)[:] = anns
        f.create_dataset("dists", dists.shape, dtype=dists.dtype)[:] = dists


def synthetic_dataset(
    n: int,
    n_queries: int,
    d_nav: int = 96,
    d_search: int = 768,
    n_clusters: int = 122,
    seed: int = 2023,
    cluster_std: float = 0.9,
    skew: float = 1.5,
    zipf: float = 0.0,
    ood_queries: float = 0.0,
    nav_decorrelation: float = 0.0,
) -> Dict[str, np.ndarray]:
    """Generate a clustered synthetic dataset shaped like the LAION subsets:
    a low-dim navigation view and a high-dim search view of the same points,
    both L2-normalized, with a skewed (Zipf-ish) cluster-size profile so the
    ragged-bucket handling is exercised the way real k-means output would.

    The two views are linked by a fixed random linear map so that proximity
    in nav space correlates with proximity in search space (as PCA96 does
    for clip768).

    Hard-mode knobs (adversarial regimes for validation — real CLIP
    embeddings are much harder than well-separated blobs, see
    docs/HARDMODE.md):

    - ``cluster_std``: overlap ramp — at ≥2 clusters blur into each other
      and the routing problem approaches structureless;
    - ``zipf > 0``: cluster sizes follow a Zipf(zipf) law instead of the
      default mild power profile — giant head buckets + a long tail of
      near-empty ones (routing skew + qpb overflow pressure);
    - ``ood_queries``: fraction of queries drawn uniformly at random on the
      sphere, off the data manifold entirely;
    - ``nav_decorrelation``: fraction of independent noise mixed into the
      points BEFORE the nav projection, so nav-space neighborhoods stop
      agreeing with search-space neighborhoods (stresses the dual-space
      design the way a bad PCA would).
    """
    rng = np.random.default_rng(seed)
    # Cluster-size profile: mild power skew by default, Zipf on request.
    if zipf > 0:
        weights = 1.0 / np.arange(1, n_clusters + 1, dtype=np.float64) ** zipf
        weights = rng.permutation(weights)
    else:
        weights = rng.random(n_clusters) ** skew
    weights /= weights.sum()
    assignments = rng.choice(n_clusters, size=n, p=weights)

    centers_search = rng.normal(size=(n_clusters, d_search)).astype(np.float32)
    centers_search /= np.linalg.norm(centers_search, axis=1, keepdims=True)

    # `cluster_std` is the expected noise *norm* relative to the unit-norm
    # centers (per-dim std scaled by 1/sqrt(d)), so cluster structure
    # survives in high dimension.
    noise_scale = cluster_std / np.sqrt(d_search)
    data_search = centers_search[assignments] + noise_scale * rng.normal(
        size=(n, d_search)
    ).astype(np.float32)

    # Navigation view: fixed random projection of the search view + noise.
    proj = rng.normal(size=(d_search, d_nav)).astype(np.float32) / np.sqrt(d_search)
    if nav_decorrelation > 0:
        # unit-relative mixing: rows are ~unit norm, so noise rows are drawn
        # at matching per-element scale (1/sqrt(d)); dec=0.5 then means the
        # nav view carries 4x more signal energy than noise, dec=0.8 ~ 0.6x
        mix = np.sqrt(1.0 - nav_decorrelation ** 2)
        nav_src = (mix * data_search
                   + nav_decorrelation * rng.normal(
                       size=(n, d_search)).astype(np.float32)
                   / np.sqrt(d_search))
    else:
        nav_src = data_search
    data_nav = nav_src @ proj

    # Queries: points near the data manifold (a fraction off-manifold when
    # ood_queries > 0).
    q_assign = rng.choice(n_clusters, size=n_queries, p=weights)
    queries_search = centers_search[q_assign] + noise_scale * rng.normal(
        size=(n_queries, d_search)
    ).astype(np.float32)
    if ood_queries > 0:
        n_ood = int(round(ood_queries * n_queries))
        ood = rng.normal(size=(n_ood, d_search)).astype(np.float32)
        queries_search[:n_ood] = ood
    if nav_decorrelation > 0:
        mix = np.sqrt(1.0 - nav_decorrelation ** 2)
        q_nav_src = (mix * queries_search
                     + nav_decorrelation * rng.normal(
                         size=(n_queries, d_search)).astype(np.float32)
                     / np.sqrt(d_search))
    else:
        q_nav_src = queries_search
    queries_nav = q_nav_src @ proj

    return {
        "data_nav": normalize(data_nav),
        "data_search": normalize(data_search),
        "queries_nav": normalize(queries_nav),
        "queries_search": normalize(queries_search),
        "cluster_assignments": assignments,
    }


def synthetic_dataset_big(
    n: int,
    n_queries: int,
    d_nav: int = 96,
    d_search: int = 768,
    n_clusters: int = 122,
    seed: int = 2023,
    cluster_std: float = 0.9,
    skew: float = 1.5,
    cache_dir: str = ".bench_cache",
    chunk: int = 1_000_000,
    backend: str = "host",
) -> Dict[str, np.ndarray]:
    """Multi-million-row variant of `synthetic_dataset`: the search-space
    vectors are generated in chunks and stored in a host bfloat16 buffer;
    the navigation view stays float32. Results are cached on disk (bf16
    stored as uint16 bits) so repeat benchmark runs skip generation.

    ``backend="host"`` (default) generates with numpy directly into the
    disk cache — on this environment the host↔device relay moves only
    ~10-30 MB/s, so downloading a device-generated 20M×768 corpus would
    take ~an hour while a single host core generates it in ~15 minutes.
    ``backend="device"`` keeps the original on-device generator (the right
    choice on a directly-attached TPU host where PCIe dwarfs one CPU core).

    All views are L2-normalized. Statistically matches `synthetic_dataset`'s
    construction (skewed clusters, linked nav/search views) but uses a
    per-chunk RNG stream, so exact values differ from the small generator
    (and between the two backends — the cache tag records the backend).
    """
    import ml_dtypes

    os.makedirs(cache_dir, exist_ok=True)
    tag = f"big_n{n}_q{n_queries}_dn{d_nav}_ds{d_search}_c{n_clusters}_s{seed}"
    if backend == "host":
        tag += "_h"
    paths = {k: os.path.join(cache_dir, f"{tag}_{k}.npy")
             for k in ("data_nav", "data_search", "queries_nav",
                       "queries_search")}
    if all(os.path.exists(p) for p in paths.values()):
        out = {
            "data_nav": np.load(paths["data_nav"], mmap_mode="r"),
            "data_search": np.load(
                paths["data_search"], mmap_mode="r"
            ).view(ml_dtypes.bfloat16),
            "queries_nav": np.load(paths["queries_nav"]),
            "queries_search": np.load(paths["queries_search"]),
        }
        log.info("loaded cached big dataset %s", tag)
        return out

    if backend == "host":
        return _synthetic_big_host(
            n, n_queries, d_nav, d_search, n_clusters, seed, cluster_std,
            skew, chunk, paths)

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    weights = rng.random(n_clusters) ** skew
    weights /= weights.sum()
    assignments = rng.choice(n_clusters, size=n, p=weights).astype(np.int32)
    q_assign = rng.choice(n_clusters, size=n_queries, p=weights).astype(np.int32)

    centers = rng.normal(size=(n_clusters, d_search)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    proj = rng.normal(size=(d_search, d_nav)).astype(np.float32) / np.sqrt(d_search)
    noise_scale = cluster_std / np.sqrt(d_search)

    centers_d = jax.device_put(jnp.asarray(centers))
    proj_d = jax.device_put(jnp.asarray(proj))

    def gen_chunk(key, assign_chunk):
        x = jnp.take(centers_d, assign_chunk, axis=0)
        x = x + noise_scale * jax.random.normal(key, x.shape, jnp.float32)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        nav = x @ proj_d
        nav = nav / jnp.maximum(jnp.linalg.norm(nav, axis=1, keepdims=True), 1e-12)
        return x.astype(jnp.bfloat16), nav

    gen_chunk = jax.jit(gen_chunk)
    key = jax.random.PRNGKey(seed)

    data_search = np.empty((n, d_search), dtype=ml_dtypes.bfloat16)
    data_nav = np.empty((n, d_nav), dtype=np.float32)
    for i, lo in enumerate(range(0, n, chunk)):
        hi = min(lo + chunk, n)
        key, sub = jax.random.split(key)
        x, nav = gen_chunk(sub, jnp.asarray(assignments[lo:hi]))
        data_search[lo:hi] = np.asarray(jax.device_get(x))
        data_nav[lo:hi] = np.asarray(jax.device_get(nav))
        log.info("big datagen: %d/%d rows", hi, n)

    key, sub = jax.random.split(key)
    qx, qnav = gen_chunk(sub, jnp.asarray(q_assign))
    queries_search = np.asarray(jax.device_get(qx), dtype=np.float32)
    queries_search /= np.maximum(
        np.linalg.norm(queries_search, axis=1, keepdims=True), 1e-12
    )
    queries_nav = np.asarray(jax.device_get(qnav))

    np.save(paths["data_search"], data_search.view(np.uint16))
    np.save(paths["data_nav"], data_nav)
    np.save(paths["queries_nav"], queries_nav)
    np.save(paths["queries_search"], queries_search.astype(np.float32))
    return {
        "data_nav": data_nav,
        "data_search": data_search,
        "queries_nav": queries_nav,
        "queries_search": queries_search.astype(np.float32),
    }


def _f32_to_bf16_bits(x: np.ndarray) -> np.ndarray:
    """float32 -> bfloat16 bit pattern (uint16), round-to-nearest-even.
    ~8x faster than `astype(ml_dtypes.bfloat16)` on this host (pure
    vectorized integer ops; NaNs quieted the same way XLA does)."""
    v = x.view(np.uint32)
    rounded = (v + np.uint32(0x7FFF) + ((v >> np.uint32(16)) & np.uint32(1)))
    out = (rounded >> np.uint32(16)).astype(np.uint16)
    nan = ~np.isfinite(x) & ((v & np.uint32(0x007FFFFF)) != 0)
    if nan.any():
        out[nan] = np.uint16(0x7FC1)
    return out


def _synthetic_big_host(n, n_queries, d_nav, d_search, n_clusters, seed,
                        cluster_std, skew, chunk, paths):
    """Host-side chunked generator for `synthetic_dataset_big(backend="host")`.
    Writes straight into the .npy cache as memmaps (no relay traffic, no
    double-buffering in RAM) and returns read-only mmap views."""
    import ml_dtypes

    rng = np.random.default_rng(seed)
    weights = rng.random(n_clusters) ** skew
    weights /= weights.sum()
    assignments = rng.choice(n_clusters, size=n, p=weights).astype(np.int32)
    q_assign = rng.choice(n_clusters, size=n_queries, p=weights).astype(np.int32)

    centers = rng.normal(size=(n_clusters, d_search)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    proj = rng.normal(size=(d_search, d_nav)).astype(np.float32) / np.sqrt(d_search)
    noise_scale = np.float32(cluster_std / np.sqrt(d_search))

    def gen_chunk(stream_key, assign_chunk):
        rs = np.random.default_rng([seed, 11, stream_key])
        x = centers[assign_chunk]
        x += noise_scale * rs.standard_normal(x.shape, dtype=np.float32)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                        np.float32(1e-12))
        nav = x @ proj
        nav /= np.maximum(np.linalg.norm(nav, axis=1, keepdims=True),
                          np.float32(1e-12))
        return x, nav

    # Per-chunk RNG streams are independent of completion order, so a
    # killed/crashed generation resumes at the first unwritten chunk (the
    # sidecar marker records completed rows). At 40M rows this phase is
    # hours on a 1-core host — without resume, any restart pays it all.
    marker = paths["data_search"] + ".progress"
    done_rows = 0
    if os.path.exists(marker) and os.path.exists(paths["data_search"]) \
            and os.path.exists(paths["data_nav"]):
        try:
            with open(marker) as f:
                done_rows = min(int(f.read().strip() or 0), n)
        except (OSError, ValueError):
            done_rows = 0
    resume = done_rows > 0
    try:
        ds_mm = np.lib.format.open_memmap(
            paths["data_search"], mode="r+" if resume else "w+",
            dtype=np.uint16, shape=(n, d_search))
        dn_mm = np.lib.format.open_memmap(
            paths["data_nav"], mode="r+" if resume else "w+",
            dtype=np.float32, shape=(n, d_nav))
    except ValueError:  # stale file with a different shape/dtype
        done_rows = 0
        ds_mm = np.lib.format.open_memmap(
            paths["data_search"], mode="w+", dtype=np.uint16,
            shape=(n, d_search))
        dn_mm = np.lib.format.open_memmap(
            paths["data_nav"], mode="w+", dtype=np.float32, shape=(n, d_nav))
    if done_rows:
        log.info("big datagen (host): resuming at %d/%d rows", done_rows, n)
    for i, lo in enumerate(range(0, n, chunk)):
        hi = min(lo + chunk, n)
        if hi <= done_rows:
            continue
        x, nav = gen_chunk(i, assignments[lo:hi])
        ds_mm[lo:hi] = _f32_to_bf16_bits(x)
        dn_mm[lo:hi] = nav
        with open(marker, "w") as f:
            f.write(str(hi))
        log.info("big datagen (host): %d/%d rows", hi, n)
    ds_mm.flush()
    dn_mm.flush()
    del ds_mm, dn_mm
    if os.path.exists(marker):
        os.remove(marker)

    qx, qnav = gen_chunk(1_000_003, q_assign)  # distinct from any chunk index
    # match the device path: queries round-trip bf16 then renormalize in f32
    qx = _f32_to_bf16_bits(qx).view(ml_dtypes.bfloat16).astype(np.float32)
    qx /= np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
    np.save(paths["queries_nav"], qnav)
    np.save(paths["queries_search"], qx)

    return {
        "data_nav": np.load(paths["data_nav"], mmap_mode="r"),
        "data_search": np.load(
            paths["data_search"], mmap_mode="r").view(ml_dtypes.bfloat16),
        "queries_nav": qnav,
        "queries_search": qx,
    }
