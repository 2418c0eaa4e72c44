"""Fused NB log-likelihood kernel vs the jnp reference: forward + all
four gradients (interpret mode on CPU; compiled Mosaic on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from velocycle_tpu.ops.nb_kernels import (
    nb_loglik_fused,
    nb_loglik_reference,
)


def _inputs(Ng=50, Nc=70, Nh=5, seed=0):
    rng = np.random.default_rng(seed)
    S = jnp.asarray(rng.poisson(3, (Ng, Nc)).astype(np.float32))
    nu = jnp.asarray(rng.normal(0.5, 0.5, (Ng, Nh)).astype(np.float32))
    zeta = jnp.asarray(rng.normal(0, 0.7, (Nc, Nh)).astype(np.float32))
    cf = jnp.asarray(rng.normal(0, 0.2, Nc).astype(np.float32))
    r = jnp.asarray(
        np.abs(rng.normal(0.5, 0.2, Ng)).astype(np.float32) + 0.05
    )
    return S, nu, zeta, cf, r


def test_forward_matches_reference():
    args = _inputs()
    ref = float(nb_loglik_reference(*args))
    fused = float(nb_loglik_fused(*args))
    assert abs(ref - fused) / abs(ref) < 1e-5


def test_forward_non_tile_aligned_shapes():
    # shapes straddling tile boundaries exercise the padding mask
    for Ng, Nc in [(1, 1), (128, 128), (129, 257), (3, 300)]:
        args = _inputs(Ng=Ng, Nc=Nc, seed=Ng + Nc)
        ref = float(nb_loglik_reference(*args))
        fused = float(nb_loglik_fused(*args))
        assert abs(ref - fused) / max(abs(ref), 1.0) < 1e-5, (Ng, Nc)


def test_gradients_match_reference():
    args = _inputs()
    gref = jax.grad(nb_loglik_reference, argnums=(1, 2, 3, 4))(*args)
    gfus = jax.grad(
        lambda *a: nb_loglik_fused(*a), argnums=(1, 2, 3, 4)
    )(*args)
    for name, a, b in zip(("nu", "zeta", "cf", "disp"), gref, gfus):
        err = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
        assert err < 1e-4, (name, err)


def test_gradient_cotangent_scaling():
    args = _inputs(Ng=20, Nc=30)
    g1 = jax.grad(lambda *a: 2.5 * nb_loglik_fused(*a), argnums=1)(*args)
    g0 = jax.grad(lambda *a: nb_loglik_fused(*a), argnums=1)(*args)
    np.testing.assert_allclose(np.asarray(g1), 2.5 * np.asarray(g0),
                               rtol=1e-5)


def test_fused_under_jit_and_vmap_free():
    args = _inputs(Ng=16, Nc=24)
    out = jax.jit(nb_loglik_fused)(*args)
    assert np.isfinite(float(out))
