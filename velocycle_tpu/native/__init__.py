"""Native (C++) ingest kernels with transparent numpy fallbacks.

The reference is 100% Python (SURVEY.md §2) and pays host-side
preprocessing through scipy/numpy; here the ingest hot path — sparse
densification into the model's (Ng, Nc) layout, MatrixMarket parsing, size
factors, one-hot designs — is a multi-threaded C++ library
(`native/ingest.cpp`) bound via ctypes (no pybind11 in this environment).

The library is compiled on first use with the system toolchain and cached
next to the source keyed by a source hash; when no toolchain is available
every entry point falls back to an equivalent numpy implementation, so the
package never hard-depends on the native build.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

__all__ = [
    "available",
    "csr_to_dense",
    "size_factors",
    "one_hot",
    "read_mtx",
]

_SRC = os.path.join(os.path.dirname(__file__), "ingest.cpp")
_LIB = None
_TRIED = False


def _source_hash():
    with open(_SRC, "rb") as f:
        return hashlib.blake2s(f.read(), digest_size=8).hexdigest()


def _build_dir():
    override = os.environ.get("VELOCYCLE_TPU_NATIVE_CACHE")
    if override:
        return override
    cand = os.path.join(os.path.dirname(__file__), "_build")
    try:
        os.makedirs(cand, exist_ok=True)
        probe = os.path.join(cand, ".probe")
        with open(probe, "w"):
            pass
        os.remove(probe)
        return cand
    except OSError:
        return os.path.join(tempfile.gettempdir(), "velocycle_tpu_native")


def _compile():
    build = _build_dir()
    os.makedirs(build, exist_ok=True)
    so = os.path.join(build, f"libvct_ingest_{_source_hash()}.so")
    if os.path.exists(so):
        return so
    tmp = so + f".tmp{os.getpid()}"
    cmd = [
        os.environ.get("CXX", "g++"), "-O3", "-std=c++17", "-fPIC",
        "-shared", "-pthread", "-march=native", _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
    except (subprocess.SubprocessError, OSError):
        # retry without -march=native (unsupported on some toolchains)
        cmd.remove("-march=native")
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    os.replace(tmp, so)
    return so


def _lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("VELOCYCLE_TPU_DISABLE_NATIVE"):
        return None
    try:
        lib = ctypes.CDLL(_compile())
    except (OSError, subprocess.SubprocessError):
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i8p = ctypes.POINTER(ctypes.c_int8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.vct_csr_to_dense.argtypes = [
        i64p, i32p, f32p, ctypes.c_int64, ctypes.c_int64, f32p, ctypes.c_int,
    ]
    lib.vct_csr_to_dense_t.argtypes = lib.vct_csr_to_dense.argtypes
    lib.vct_size_factors.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, f32p, f32p, ctypes.c_int,
    ]
    lib.vct_one_hot.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int64, i8p, ctypes.c_int,
    ]
    lib.vct_mtx_header.argtypes = [ctypes.c_char_p, i64p, i64p, i64p]
    lib.vct_mtx_read.argtypes = [
        ctypes.c_char_p, i32p, i32p, f32p, ctypes.c_int64, ctypes.c_int,
    ]
    for fn in (
        lib.vct_csr_to_dense, lib.vct_csr_to_dense_t, lib.vct_size_factors,
        lib.vct_one_hot, lib.vct_mtx_header, lib.vct_mtx_read,
        lib.vct_version,
    ):
        fn.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    """True when the native library compiled and loaded."""
    return _lib() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def csr_to_dense(matrix, transpose=False, nthreads=0):
    """Dense float32 array from a scipy CSR/CSC/COO (cells x genes) matrix.

    ``transpose=True`` writes the (genes x cells) model layout directly —
    the orientation `preprocessing.py` feeds to PhaseData/VelocityData —
    without a separate host transpose pass.
    """
    import scipy.sparse as sp

    if not sp.issparse(matrix):
        dense = np.ascontiguousarray(np.asarray(matrix, np.float32))
        return dense.T.copy() if transpose else dense
    csr = matrix.tocsr()
    lib = _lib()
    n_rows, n_cols = csr.shape
    if lib is None:
        dense = np.asarray(csr.todense(), np.float32)
        return np.ascontiguousarray(dense.T) if transpose else dense
    indptr = np.ascontiguousarray(csr.indptr, np.int64)
    indices = np.ascontiguousarray(csr.indices, np.int32)
    data = np.ascontiguousarray(csr.data, np.float32)
    if transpose:
        out = np.empty((n_cols, n_rows), np.float32)
        rc = lib.vct_csr_to_dense_t(
            _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
            _ptr(data, ctypes.c_float), n_rows, n_cols,
            _ptr(out, ctypes.c_float), nthreads,
        )
    else:
        out = np.empty((n_rows, n_cols), np.float32)
        rc = lib.vct_csr_to_dense(
            _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
            _ptr(data, ctypes.c_float), n_rows, n_cols,
            _ptr(out, ctypes.c_float), nthreads,
        )
    if rc != 0:
        raise RuntimeError(f"vct_csr_to_dense failed with code {rc}")
    return out


def size_factors(dense, nthreads=0):
    """(totals, count_factor) per cell from a dense (Nc, Ng) count matrix:
    ``count_factor_c = log(UMI_c / mean UMI)`` — the fixed size factor of
    `/root/reference/velocycle/preprocessing.py:149-153`."""
    dense = np.ascontiguousarray(dense, np.float32)
    n_cells, n_genes = dense.shape
    lib = _lib()
    if lib is None:
        totals = dense.sum(1)
        return totals, np.log(totals / totals.mean()).astype(np.float32)
    totals = np.empty((n_cells,), np.float32)
    cf = np.empty((n_cells,), np.float32)
    rc = lib.vct_size_factors(
        _ptr(dense, ctypes.c_float), n_cells, n_genes,
        _ptr(totals, ctypes.c_float), _ptr(cf, ctypes.c_float), nthreads,
    )
    if rc != 0:
        raise RuntimeError(f"vct_size_factors failed with code {rc}")
    return totals, cf


def one_hot(codes, k=None, nthreads=0):
    """(n, k) int8 one-hot design from integer category codes."""
    codes = np.ascontiguousarray(codes, np.int32)
    if k is None:
        k = int(codes.max()) + 1 if codes.size else 0
    lib = _lib()
    if lib is None:
        return (codes[:, None] == np.arange(k)[None, :]).astype(np.int8)
    out = np.empty((codes.shape[0], k), np.int8)
    rc = lib.vct_one_hot(
        _ptr(codes, ctypes.c_int32), codes.shape[0], k,
        _ptr(out, ctypes.c_int8), nthreads,
    )
    if rc != 0:
        raise RuntimeError(f"vct_one_hot failed with code {rc}")
    return out


def read_mtx(path, nthreads=0):
    """scipy COO matrix from a MatrixMarket coordinate file (the 10x/
    Stereo-seq distribution format), parsed chunk-parallel natively."""
    import scipy.sparse as sp

    lib = _lib()
    if lib is None:
        import scipy.io as sio

        return sio.mmread(path).tocoo()
    n_rows = ctypes.c_int64()
    n_cols = ctypes.c_int64()
    nnz = ctypes.c_int64()
    rc = lib.vct_mtx_header(
        str(path).encode(), ctypes.byref(n_rows), ctypes.byref(n_cols),
        ctypes.byref(nnz),
    )
    if rc != 0:
        raise RuntimeError(f"vct_mtx_header failed with code {rc} on {path}")
    rows = np.empty((nnz.value,), np.int32)
    cols = np.empty((nnz.value,), np.int32)
    vals = np.empty((nnz.value,), np.float32)
    rc = lib.vct_mtx_read(
        str(path).encode(), _ptr(rows, ctypes.c_int32),
        _ptr(cols, ctypes.c_int32), _ptr(vals, ctypes.c_float),
        nnz.value, nthreads,
    )
    if rc != 0:
        raise RuntimeError(f"vct_mtx_read failed with code {rc} on {path}")
    return sp.coo_matrix(
        (vals, (rows, cols)), shape=(n_rows.value, n_cols.value)
    )
