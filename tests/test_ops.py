"""Fourier basis, circular ops: closed-form checks + derivative checks."""
import jax
import jax.numpy as jnp
import numpy as np

from velocycle_tpu.ops import (
    fourier_basis,
    basis,
    pack_direction,
    unpack_direction,
    circular_corrcoef,
    circular_std_from_concentration,
)


def test_fourier_basis_values():
    phi = np.array([0.0, np.pi / 4, np.pi / 2], dtype=np.float32)
    Z = np.asarray(fourier_basis(jnp.asarray(phi), num_harmonics=2))
    # columns: [1, cos, sin, cos2, sin2]
    np.testing.assert_allclose(Z[:, 0], 1.0)
    np.testing.assert_allclose(Z[:, 1], np.cos(phi), rtol=1e-6)
    np.testing.assert_allclose(Z[:, 2], np.sin(phi), rtol=1e-6)
    np.testing.assert_allclose(Z[:, 3], np.cos(2 * phi), atol=1e-6)
    np.testing.assert_allclose(Z[:, 4], np.sin(2 * phi), atol=1e-6)


def test_fourier_derivative_matches_autodiff():
    H = 3

    def f(p):
        return fourier_basis(p, H, der=0)

    phi = jnp.asarray(0.73)
    jac = jax.jacfwd(f)(phi)
    der = fourier_basis(phi, H, der=1)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(der), atol=1e-5)


def test_basis_dispatcher():
    phi = jnp.asarray([0.1, 0.2])
    Z = basis(phi, kind="fourier", num_harmonics=1)
    assert Z.shape == (2, 3)
    try:
        basis(phi, kind="nope")
        assert False
    except ValueError:
        pass


def test_pack_unpack_roundtrip():
    phi = np.linspace(-np.pi + 0.01, np.pi - 0.01, 17).astype(np.float32)
    xy = unpack_direction(jnp.asarray(phi), concentration=2.5)
    back = pack_direction(xy)
    np.testing.assert_allclose(np.asarray(back), phi, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(xy), axis=-1), 2.5, rtol=1e-6
    )


def test_circular_corrcoef_perfect_and_shifted():
    x = np.linspace(0, 2 * np.pi, 50, endpoint=False)
    assert float(circular_corrcoef(jnp.asarray(x), jnp.asarray(x))) > 0.999
    # constant shift keeps |mean(exp(i d))| = 1 (same statistic as reference)
    assert (
        float(circular_corrcoef(jnp.asarray(x), jnp.asarray(x + 1.0))) > 0.999
    )


def test_circular_std_monotone():
    k = jnp.asarray([0.5, 1.0, 2.0, 5.0, 20.0])
    s = np.asarray(circular_std_from_concentration(k))
    assert np.all(np.diff(s) < 0)  # more concentration -> less std
    assert s[-1] < 0.25
