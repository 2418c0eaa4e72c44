"""Spline basis vs scipy.interpolate.BSpline ground truth."""
import numpy as np
import jax.numpy as jnp
from scipy.interpolate import BSpline

from velocycle_tpu.ops.splines import (
    spline_basis,
    spline_basis_2d,
    spline_basis_2d_der,
    spline_basis_auto,
    spline_knots,
)


def _scipy_basis(x, knots, degree, der=0):
    n = len(knots) - degree - 1
    out = np.zeros((len(x), n))
    for i in range(n):
        c = np.zeros(n)
        c[i] = 1.0
        spl = BSpline(knots, c, degree, extrapolate=False)
        if der:
            spl = spl.derivative(der)
        vals = spl(x)
        out[:, i] = np.nan_to_num(vals)
    return out


def test_knots_structure():
    t = spline_knots(0.0, 1.0, n_basis=6, degree=3)
    assert len(t) == 6 + 3 + 1
    assert (t[:4] == 0.0).all() and (t[-4:] == 1.0).all()


def test_basis_matches_scipy():
    t = spline_knots(0.0, 10.0, n_basis=6, degree=3)
    x = np.linspace(0.0, 10.0, 57)[:-1]  # interior points
    ours = np.asarray(spline_basis(jnp.asarray(x), t, 3))
    theirs = _scipy_basis(x, t, 3)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_basis_partition_of_unity_and_endpoint():
    t = spline_knots(0.0, 10.0, n_basis=7, degree=3)
    x = np.linspace(0.0, 10.0, 31)  # includes both endpoints
    B = np.asarray(spline_basis(jnp.asarray(x), t, 3))
    np.testing.assert_allclose(B.sum(-1), 1.0, atol=1e-5)
    assert B[-1, -1] == 1.0  # right endpoint lands on the last basis


def test_derivative_matches_scipy():
    t = spline_knots(0.0, 10.0, n_basis=6, degree=3)
    x = np.linspace(0.01, 9.99, 41)
    ours = np.asarray(spline_basis(jnp.asarray(x), t, 3, der=1))
    theirs = _scipy_basis(x, t, 3, der=1)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_derivative_finite_difference():
    t = spline_knots(0.0, 1.0, n_basis=8, degree=3)
    x = np.linspace(0.05, 0.95, 19)
    eps = 1e-4
    B_p = np.asarray(spline_basis(jnp.asarray(x + eps), t, 3))
    B_m = np.asarray(spline_basis(jnp.asarray(x - eps), t, 3))
    dB = np.asarray(spline_basis(jnp.asarray(x), t, 3, der=1))
    np.testing.assert_allclose(dB, (B_p - B_m) / (2 * eps), atol=1e-2)


def test_basis_auto_constant_column():
    x = np.linspace(0.0, 1.0, 11)
    B = np.asarray(spline_basis_auto(jnp.asarray(x), n_basis=5, degree=2))
    assert B.shape == (11, 6)
    np.testing.assert_allclose(B[:, 0], 1.0)
    dB = np.asarray(
        spline_basis_auto(jnp.asarray(x), der=1, n_basis=5, degree=2)
    )
    np.testing.assert_allclose(dB[:, 0], 0.0)


def test_basis_2d_tensor_product():
    tx = spline_knots(0.0, 1.0, 4, 2)
    ty = spline_knots(0.0, 2.0, 5, 2)
    x = np.array([0.3, 0.7])
    y = np.array([0.5, 1.5])
    B = np.asarray(
        spline_basis_2d(jnp.asarray(x), jnp.asarray(y), tx, ty, 2)
    )
    assert B.shape == (2, 4 * 5 + 1)
    # partition of unity (excluding the constant column)
    np.testing.assert_allclose(B[:, 1:].sum(-1), 1.0, atol=1e-5)
    Bx = np.asarray(spline_basis(jnp.asarray(x), tx, 2))
    By = np.asarray(spline_basis(jnp.asarray(y), ty, 2))
    np.testing.assert_allclose(
        B[0, 1:], np.outer(Bx[0], By[0]).ravel(), atol=1e-6
    )


def test_basis_2d_derivatives_finite_difference():
    tx = spline_knots(0.0, 1.0, 5, 3)
    x = np.array([0.31, 0.62])
    y = np.array([0.45, 0.8])
    eps = 1e-4
    dx, dy = spline_basis_2d_der(
        jnp.asarray(x), jnp.asarray(y), tx, tx, 3
    )
    B_xp = np.asarray(
        spline_basis_2d(jnp.asarray(x + eps), jnp.asarray(y), tx, tx, 3)
    )
    B_xm = np.asarray(
        spline_basis_2d(jnp.asarray(x - eps), jnp.asarray(y), tx, tx, 3)
    )
    np.testing.assert_allclose(
        np.asarray(dx), (B_xp - B_xm) / (2 * eps), atol=1e-2
    )
    B_yp = np.asarray(
        spline_basis_2d(jnp.asarray(x), jnp.asarray(y + eps), tx, tx, 3)
    )
    B_ym = np.asarray(
        spline_basis_2d(jnp.asarray(x), jnp.asarray(y - eps), tx, tx, 3)
    )
    np.testing.assert_allclose(
        np.asarray(dy), (B_yp - B_ym) / (2 * eps), atol=1e-2
    )


def test_fourier_dispatcher_spline_kind():
    from velocycle_tpu.ops.fourier import basis

    x = jnp.linspace(0.0, 1.0, 7)
    B = basis(x, kind="spline", n_basis=5, degree=2)
    assert B.shape == (7, 6)
