"""Large-corpus paths at small scale: host-staged store build and the
streaming exact oracle."""

import ml_dtypes
import numpy as np
import pytest

from tpulmi.baseline import exact_knn_streamed
from tpulmi.index import LearnedIndex
from tpulmi.ops.distance import exact_knn
from tpulmi.utils.config import IndexConfig


def test_build_with_host_store_matches_device_build(synthetic_small):
    host_bf16 = synthetic_small["data_search"].astype(ml_dtypes.bfloat16)
    cfg = IndexConfig(n_categories=24, epochs=6, lr=0.003, row_align=256)

    li_host = LearnedIndex(cfg)
    pred_h, bt = li_host.build_with_host_store(
        synthetic_small["data_nav"], host_bf16, normalized=True
    )
    assert bt > 0
    li_dev = LearnedIndex(cfg)
    pred_d, _ = li_dev.build(
        synthetic_small["data_nav"], synthetic_small["data_search"]
    )
    # same nav pipeline -> same partition
    assert (pred_h == pred_d).mean() > 0.999

    d_h, i_h = li_host.search(
        synthetic_small["queries_nav"], synthetic_small["queries_search"],
        n_buckets=4, k=10,
    )
    d_d, i_d = li_dev.search(
        synthetic_small["queries_nav"], synthetic_small["queries_search"],
        n_buckets=4, k=10,
    )
    # identical routing; results equal up to bf16-vs-f32 store rounding
    assert (i_h == i_d).mean() > 0.97
    np.testing.assert_allclose(d_h, d_d, atol=2e-2)


def test_exact_knn_streamed_matches_exact(rng):
    data = rng.normal(size=(3000, 64)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = rng.normal(size=(40, 64)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    import jax.numpy as jnp

    d_s, i_s = exact_knn_streamed(queries, data, k=10, chunk=512,
                                  compute_dtype=jnp.float32)
    d_e, i_e = exact_knn(queries, data, k=10, normalized=True)
    np.testing.assert_allclose(d_s, np.asarray(d_e), atol=1e-5)
    np.testing.assert_array_equal(i_s, np.asarray(i_e))


def test_exact_knn_streamed_resume(rng, tmp_path, monkeypatch):
    """The checkpointed oracle must survive a mid-stream crash: a rerun
    resumes from the last checkpoint (skipping the merged chunks) and the
    final result is identical to an uninterrupted run; a checkpoint from
    different queries is detected stale and ignored."""
    import jax.numpy as jnp

    import tpulmi.baseline as baseline

    data = rng.normal(size=(2048, 32)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = rng.normal(size=(16, 32)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    part = str(tmp_path / "gt.part")

    d_ref, i_ref = exact_knn_streamed(queries, data, k=5, chunk=256,
                                      compute_dtype=jnp.float32)

    merged = []
    orig = baseline._merge_chunk

    def crashy(best_d, best_i, q, block, base, valid, *, k):
        if len(merged) == 5:
            raise RuntimeError("injected backend wedge")
        merged.append(int(base))
        return orig(best_d, best_i, q, block, base, valid, k=k)

    monkeypatch.setattr(baseline, "_merge_chunk", crashy)
    with pytest.raises(RuntimeError, match="injected"):
        exact_knn_streamed(queries, data, k=5, chunk=256,
                           compute_dtype=jnp.float32, resume_path=part,
                           checkpoint_every=2)
    assert len(merged) == 5  # crashed after 5 of 8 chunks
    import os

    assert os.path.exists(part)  # checkpoint at chunk 4 (every=2)

    merged.clear()
    monkeypatch.setattr(
        baseline, "_merge_chunk",
        lambda *a, **kw: (merged.append(int(a[4])), orig(*a, **kw))[1])
    d_r, i_r = exact_knn_streamed(queries, data, k=5, chunk=256,
                                  compute_dtype=jnp.float32,
                                  resume_path=part, checkpoint_every=2)
    assert merged[0] == 4 * 256  # resumed at the checkpoint, not zero
    np.testing.assert_allclose(d_r, d_ref, atol=1e-6)
    np.testing.assert_array_equal(i_r, i_ref)

    # a stale checkpoint (different queries) must be ignored, not merged
    exact_knn_streamed(queries, data, k=5, chunk=256,
                       compute_dtype=jnp.float32, resume_path=part,
                       checkpoint_every=2)
    assert os.path.exists(part)
    merged.clear()
    q2 = np.roll(queries, 1, axis=0) * 0.5
    d2, i2 = exact_knn_streamed(q2, data, k=5, chunk=256,
                                compute_dtype=jnp.float32, resume_path=part,
                                checkpoint_every=2)
    assert merged[0] == 0  # started fresh
    d2_ref, i2_ref = exact_knn_streamed(q2, data, k=5, chunk=256,
                                        compute_dtype=jnp.float32)
    np.testing.assert_allclose(d2, d2_ref, atol=1e-6)
    np.testing.assert_array_equal(i2, i2_ref)


def test_exact_knn_streamed_bf16_corpus(rng):
    data = rng.normal(size=(1000, 64)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    host = data.astype(ml_dtypes.bfloat16)
    queries = data[:8]  # self-queries: nearest neighbor must be itself
    _, ids = exact_knn_streamed(queries, host, k=1, chunk=256)
    np.testing.assert_array_equal(ids[:, 0], np.arange(8))


@pytest.mark.parametrize("store_dtype", ["bfloat16", "int8"])
def test_layout_and_upload_overlap_matches_blocking(rng, store_dtype):
    """The slab-pipelined upload must produce a device store bit-identical
    to the serial layout-then-device_put path (same host arrays, same
    device bytes), including per-row int8 scales."""
    import jax

    from tpulmi.hoststore import layout_and_upload

    n, d, n_cat = 5000, 32, 7
    pred = rng.integers(0, n_cat, size=n).astype(np.int32)
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)

    kw = dict(row_align=64, store_dtype=store_dtype, normalized=True,
              pad_rows=128)
    a_b, dev_b = layout_and_upload(pred, data, n_cat, overlap=False, **kw)
    # tiny slabs force many pipelined updates incl. a partial tail slab
    a_o, dev_o = layout_and_upload(pred, data, n_cat, overlap=True,
                                   slab_rows=512, **kw)

    np.testing.assert_array_equal(
        np.asarray(a_o.data_sorted).view(np.uint16 if store_dtype ==
                                         "bfloat16" else np.int8),
        np.asarray(a_b.data_sorted).view(np.uint16 if store_dtype ==
                                         "bfloat16" else np.int8))
    np.testing.assert_array_equal(a_o.ids_sorted, a_b.ids_sorted)
    got = np.asarray(jax.device_get(dev_o))
    want = np.asarray(jax.device_get(dev_b))
    np.testing.assert_array_equal(
        got.view(np.uint16) if store_dtype == "bfloat16" else got,
        want.view(np.uint16) if store_dtype == "bfloat16" else want)
    if store_dtype == "int8":
        np.testing.assert_array_equal(a_o.scales, a_b.scales)


def test_overlap_path_actually_engages(rng, caplog):
    """Regression: a NameError inside the uploader thread (a refactor once
    dropped its `jnp` import) silently downgraded every overlapped upload
    to the serial fallback — results identical, pipelining gone. The
    overlap path must complete IN-STREAM, not via fallback."""
    import logging

    from tpulmi.hoststore import layout_and_upload

    n, d, n_cat = 4000, 32, 5
    pred = rng.integers(0, n_cat, size=n).astype(np.int32)
    data = rng.normal(size=(n, d)).astype(np.float32)

    with caplog.at_level(logging.INFO, logger="tpulmi.hoststore"):
        layout_and_upload(pred, data, n_cat, overlap=True, slab_rows=512,
                          row_align=64, store_dtype="bfloat16",
                          normalized=False, pad_rows=64)
    messages = [r.getMessage() for r in caplog.records]
    assert any("completed in-stream" in m for m in messages), messages
    assert not any("unavailable" in m for m in messages), messages


def test_slab_upload_serial_roundtrip(rng):
    """The serial slab-upload fallback (used for near-HBM stores where one
    whole-array device_put would host-OOM) lands the exact host bytes,
    including a ragged tail slab."""
    import jax

    from tpulmi.hoststore import _slab_upload_serial

    host = rng.normal(size=(1000, 16)).astype(np.float32)
    buf = _slab_upload_serial(host, slab_rows=256)  # 3 full slabs + 232 tail
    np.testing.assert_array_equal(np.asarray(jax.device_get(buf)), host)


@pytest.mark.parametrize("store_dtype", ["int4", "int8", "bfloat16"])
def test_source_sequential_layout_matches_gather(rng, tmp_path, monkeypatch,
                                                 store_dtype):
    """A corpus too big to materialize (TPULMI_MATERIALIZE_MAX_FRAC=0
    forces the decline) takes the source-sequential scatter path and must
    produce the exact arrays of the in-RAM gather layout, with monotone
    upload watermarks that never release a row before its final write."""
    from tpulmi.hoststore import layout_host_store

    n, d, n_cat = 5000, 32, 7
    pred = rng.integers(0, n_cat, size=n).astype(np.int32)
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    path = tmp_path / "corpus.npy"
    np.save(path, data)
    mm = np.load(path, mmap_mode="r")

    want = layout_host_store(pred, data, n_cat, row_align=64,
                             store_dtype=store_dtype, normalized=True,
                             pad_rows=64, chunk=1024)

    monkeypatch.setenv("TPULMI_MATERIALIZE_MAX_FRAC", "0")
    marks = []
    got = layout_host_store(pred, mm, n_cat, row_align=64,
                            store_dtype=store_dtype, normalized=True,
                            pad_rows=64, chunk=1024,
                            progress_cb=marks.append)
    assert isinstance(got.data_sorted, np.ndarray)
    np.testing.assert_array_equal(np.asarray(got.data_sorted),
                                  np.asarray(want.data_sorted))
    np.testing.assert_array_equal(got.ids_sorted, want.ids_sorted)
    if store_dtype in ("int4", "int8"):
        np.testing.assert_array_equal(got.scales, want.scales)
    assert marks == sorted(marks)          # monotone watermarks
    assert marks[-1] == got.data_sorted.shape[0]
