"""Int8 row quantization numerics: reconstruction and cosine-distance error
bounds on normalized vectors."""

import numpy as np

from tpulmi.ops.quantize import cosine_dists_int8, dequantize_rows, quantize_rows


def _unit(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_roundtrip_error(rng):
    x = _unit(rng, 200, 768)
    q, s = quantize_rows(x)
    back = np.asarray(dequantize_rows(q, s))
    rel = np.abs(back - x).max() / np.abs(x).max()
    assert rel < 0.01


def test_cosine_dist_error(rng):
    data = _unit(rng, 500, 768)
    queries = _unit(rng, 50, 768)
    qd, sd = quantize_rows(data)
    qq, sq = quantize_rows(queries)
    got = np.asarray(cosine_dists_int8(qq, sq, qd, sd))
    want = 1.0 - queries @ data.T
    err = np.abs(got - want)
    assert err.max() < 5e-3
    assert err.mean() < 1e-3


def test_topk_agreement(rng):
    """int8 distances must preserve the neighbor ranking well enough that
    the int8 top-10 overlaps the exact top-10 ≥ 9/10 on average."""
    data = _unit(rng, 2000, 768)
    queries = _unit(rng, 64, 768)
    qd, sd = quantize_rows(data)
    qq, sq = quantize_rows(queries)
    got = np.asarray(cosine_dists_int8(qq, sq, qd, sd))
    want = 1.0 - queries @ data.T
    overlap = np.mean([
        len(set(np.argsort(got[i])[:10]) & set(np.argsort(want[i])[:10])) / 10
        for i in range(64)
    ])
    assert overlap > 0.9
