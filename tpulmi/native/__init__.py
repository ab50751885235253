"""Native (C++) runtime components, bound via ctypes.

`native_layout` wraps the multi-threaded bucket-store layout kernel
(layout.cpp). The shared library is compiled on first use with the system
g++ (cached next to the source); every entry point degrades gracefully to
the NumPy fallback in tpulmi/hoststore.py when no toolchain is available.
"""

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

from tpulmi.utils.logging import get_logger

log = get_logger("tpulmi.native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "layout.cpp")


def _so_path() -> str:
    """Shared-library cache path keyed by the SOURCE HASH (not mtime:
    checkouts give every file the same timestamp, which would silently keep
    a stale binary). The .so is a build artifact, never committed."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_HERE, f"_layout_{digest}.so")

_DTYPE_CODES = {"float32": 0, "float16": 1, "bfloat16": 2, "int8": 3}


class _NativeLayout:
    def __init__(self):
        self._lib = None
        self._tried = False
        self._lock = threading.Lock()

    def _load(self):
        with self._lock:
            if self._tried:
                return self._lib
            self._tried = True
            try:
                so = _so_path()
                if not os.path.exists(so):
                    # -march=native unlocks F16C/FMA for the fused rerank
                    # dot; the .so is a machine-local build artifact (hash-
                    # keyed, never committed) so native codegen is safe.
                    # Retry without it for toolchains that reject the flag.
                    base = ["g++", "-O3", "-shared", "-fPIC", "-pthread",
                            "-std=c++17", _SRC, "-o", so]
                    try:
                        subprocess.run(base[:2] + ["-march=native"]
                                       + base[2:], check=True,
                                       capture_output=True, timeout=120)
                    except subprocess.CalledProcessError:
                        subprocess.run(base, check=True,
                                       capture_output=True, timeout=120)
                    log.info("compiled native layout kernel: %s", so)
                lib = ctypes.CDLL(so)
                fn = lib.tpulmi_scatter_rows
                fn.restype = ctypes.c_int
                fn.argtypes = [
                    ctypes.c_void_p, ctypes.c_int,          # src, src_dtype
                    ctypes.c_void_p, ctypes.c_void_p,        # order, pos
                    ctypes.c_void_p, ctypes.c_int,           # dst, dst_dtype
                    ctypes.c_void_p, ctypes.c_void_p,        # scales, ids
                    ctypes.c_longlong, ctypes.c_longlong,    # n, d
                    ctypes.c_int, ctypes.c_int,              # normalize, threads
                ]
                fn2 = lib.tpulmi_rerank_dot
                fn2.restype = ctypes.c_int
                fn2.argtypes = [
                    ctypes.c_void_p, ctypes.c_int,     # corpus, corpus_dtype
                    ctypes.c_void_p, ctypes.c_void_p,  # ids, queries
                    ctypes.c_void_p,                   # out_sims
                    ctypes.c_longlong, ctypes.c_longlong,  # q, k_eff
                    ctypes.c_longlong, ctypes.c_longlong,  # d, n_rows
                    ctypes.c_int, ctypes.c_int,        # normalize, threads
                ]
                self._lib = lib
            except Exception as e:  # noqa: BLE001 - any failure -> fallback
                log.info("native layout unavailable (%s); using NumPy path", e)
                self._lib = None
            return self._lib

    def available(self) -> bool:
        return self._load() is not None

    def scatter_rows(self, src, order, pos, dst, scales=None, ids=None,
                     *, normalized: bool = False, n_threads: int = 0):
        """Gather rows `src[order[i]]`, L2-normalize (unless `normalized`),
        convert to `dst.dtype`, scatter to `dst[pos[i]]` (+ per-row int8
        scales). src/dst must be contiguous 2-D arrays."""
        lib = self._load()
        if lib is None:
            raise RuntimeError("native layout kernel unavailable")
        src = np.ascontiguousarray(src)
        src_code = _DTYPE_CODES.get(str(src.dtype))
        dst_code = _DTYPE_CODES.get(str(dst.dtype))
        if src_code is None or src_code == 3 or dst_code is None:
            raise ValueError(
                f"unsupported dtypes {src.dtype} -> {dst.dtype}"
            )
        order = np.ascontiguousarray(order, np.int32)
        pos = np.ascontiguousarray(pos, np.int64)
        n, d = order.shape[0], src.shape[1]
        assert dst.flags["C_CONTIGUOUS"]
        if n_threads <= 0:
            n_threads = min(os.cpu_count() or 1, 32)
        rc = lib.tpulmi_scatter_rows(
            src.ctypes.data, src_code,
            order.ctypes.data, pos.ctypes.data,
            dst.ctypes.data, dst_code,
            scales.ctypes.data if scales is not None else None,
            ids.ctypes.data if ids is not None else None,
            n, d, 0 if normalized else 1, n_threads,
        )
        if rc != 0:
            raise RuntimeError(f"native scatter_rows failed (rc={rc})")

    def rerank_dot(self, corpus, ids, queries, *, normalized: bool = True,
                   n_threads: int = 0) -> np.ndarray:
        """Fused candidate gather + dot: `sims[i, j] = queries[i] ·
        corpus[max(ids[i, j], 0)]` (rows L2-normalized on the fly unless
        `normalized`), one pass over the candidate bytes, no (Q, K, d)
        intermediate. `corpus` must be a contiguous 2-D f32, f16, or bf16
        array (the rerank corpus — the big benches cache it as bf16 — or
        its f16 shadow)."""
        lib = self._load()
        if lib is None:
            raise RuntimeError("native rerank kernel unavailable")
        code = {"float32": 0, "float16": 1, "bfloat16": 2}.get(
            str(corpus.dtype))
        if code is None:
            raise ValueError(f"unsupported rerank corpus dtype {corpus.dtype}")
        if not corpus.flags["C_CONTIGUOUS"]:
            raise ValueError("rerank corpus must be C-contiguous")
        ids = np.ascontiguousarray(ids, np.int64)
        queries = np.ascontiguousarray(queries, np.float32)
        q, k_eff = ids.shape
        d = corpus.shape[1]
        assert queries.shape == (q, d)
        out = np.empty((q, k_eff), np.float32)
        if n_threads <= 0:
            n_threads = min(os.cpu_count() or 1, 32)
        rc = lib.tpulmi_rerank_dot(
            corpus.ctypes.data, code, ids.ctypes.data, queries.ctypes.data,
            out.ctypes.data, q, k_eff, d, corpus.shape[0],
            0 if normalized else 1, n_threads,
        )
        if rc != 0:
            raise RuntimeError(f"native rerank_dot failed (rc={rc})")
        return out


native_layout = _NativeLayout()
