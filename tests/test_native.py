"""Native (C++) ingest kernels vs their numpy/scipy references.

The toolchain (g++) is baked into the image; if compilation is unavailable
the wrapper falls back to numpy and `available()` is False — the fallback
path is tested either way via the env kill-switch.
"""
import os
import subprocess
import sys

import numpy as np
import pytest
import scipy.io as sio
import scipy.sparse as sp

from velocycle_tpu import native


@pytest.fixture(scope="module")
def csr():
    return sp.random(
        500, 200, density=0.07, format="csr", random_state=0,
        dtype=np.float32,
    )


def test_csr_to_dense_matches_scipy(csr):
    out = native.csr_to_dense(csr)
    np.testing.assert_allclose(out, np.asarray(csr.todense()))
    assert out.dtype == np.float32


def test_csr_to_dense_transposed_model_layout(csr):
    out = native.csr_to_dense(csr, transpose=True)
    np.testing.assert_allclose(out, np.asarray(csr.todense()).T)


def test_csr_to_dense_accepts_dense_input(csr):
    dense = np.asarray(csr.todense(), np.float32)
    np.testing.assert_allclose(native.csr_to_dense(dense), dense)


def test_size_factors(csr):
    dense = native.csr_to_dense(csr) + 0.5  # avoid zero-count cells
    totals, cf = native.size_factors(dense)
    np.testing.assert_allclose(totals, dense.sum(1), rtol=1e-5)
    np.testing.assert_allclose(
        cf, np.log(dense.sum(1) / dense.sum(1).mean()), rtol=1e-4,
        atol=1e-5,
    )


def test_one_hot():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 5, 400).astype(np.int32)
    oh = native.one_hot(codes, 5)
    assert oh.shape == (400, 5)
    assert (oh.sum(1) == 1).all()
    assert (oh.argmax(1) == codes).all()


def test_mtx_round_trip(tmp_path, csr):
    path = tmp_path / "counts.mtx"
    sio.mmwrite(str(path), csr.tocoo())
    back = native.read_mtx(str(path))
    assert back.shape == csr.shape
    np.testing.assert_allclose(
        np.asarray(back.todense()), np.asarray(csr.todense())
    )


def test_native_actually_compiled():
    """g++ is part of the target environment; the fast path must be live
    (guards against silently shipping the fallback)."""
    assert native.available()


def test_fallback_path_matches(tmp_path):
    """With the native kill-switch set, every wrapper returns the same
    results through numpy/scipy (exercised in a subprocess so the cached
    library handle can't leak in)."""
    code = (
        "import numpy as np, scipy.sparse as sp\n"
        "from velocycle_tpu import native\n"
        "assert not native.available()\n"
        "m = sp.random(50, 20, density=0.2, format='csr',"
        " random_state=1, dtype=np.float32)\n"
        "assert np.allclose(native.csr_to_dense(m), m.todense())\n"
        "assert np.allclose("
        "native.csr_to_dense(m, transpose=True), m.todense().T)\n"
        "d = np.asarray(m.todense()) + 1.0\n"
        "t, cf = native.size_factors(d)\n"
        "assert np.allclose(cf, np.log(d.sum(1) / d.sum(1).mean()),"
        " rtol=1e-5)\n"
        "oh = native.one_hot(np.array([0, 2, 1], np.int32), 3)\n"
        "assert (oh.argmax(1) == [0, 2, 1]).all()\n"
        "print('fallback-ok')\n"
    )
    env = dict(os.environ)
    env["VELOCYCLE_TPU_DISABLE_NATIVE"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "fallback-ok" in out.stdout
