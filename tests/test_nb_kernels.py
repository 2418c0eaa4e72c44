"""Fused NB log-likelihood kernel vs the jnp reference: forward + all
four gradients (interpret mode on CPU; compiled Mosaic on TPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from velocycle_tpu.ops.nb_kernels import (
    nb_loglik_fused,
    nb_loglik_reference,
)

pytestmark = pytest.mark.slow  # interpret-mode Pallas compiles: fast lane skips


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


# ---------------------------------------------------------------------------
# special functions (ops.special): the Mosaic-lowerable lgamma/digamma the
# kernels use in place of jax.scipy.special
# ---------------------------------------------------------------------------

def test_special_lgamma_digamma_vs_scipy():
    import scipy.special as sps
    from velocycle_tpu.ops.special import lgamma_pos, digamma_pos, softplus

    x = np.concatenate([
        np.linspace(1e-3, 0.5, 57),
        np.linspace(0.5, 30, 101),
        np.logspace(1.5, 6, 53),
    ]).astype(np.float32)
    lg = np.asarray(lgamma_pos(jnp.asarray(x)))
    dg = np.asarray(digamma_pos(jnp.asarray(x)))
    assert np.max(np.abs(lg - sps.gammaln(x.astype(np.float64)))
                  / (np.abs(sps.gammaln(x.astype(np.float64))) + 1.0)) < 5e-4
    assert np.max(np.abs(dg - sps.digamma(x.astype(np.float64)))
                  / (np.abs(sps.digamma(x.astype(np.float64))) + 1.0)) < 5e-4
    y = jnp.asarray([-50.0, -1.0, 0.0, 1.0, 50.0, 500.0])
    sp = np.asarray(softplus(y))
    ref = np.logaddexp(0.0, np.asarray(y, np.float64))
    np.testing.assert_allclose(sp, ref, rtol=1e-5, atol=1e-6)


def test_special_ratio_forms_vs_scipy():
    """lgamma_ratio/digamma_ratio (the kernels' hot path: masked 8-term
    recurrence for k < 8, Stirling difference above) vs f64 scipy, over
    the full count x concentration range the NB models hit — including
    the large a = 1/r regime where naive lgamma differences cancel
    catastrophically."""
    import scipy.special as sps
    from velocycle_tpu.ops.special import digamma_ratio, lgamma_ratio

    k = np.concatenate([np.arange(0, 12),
                        [20, 50, 119, 500, 2000]]).astype(np.float64)
    for a in [0.02, 0.5, 2.0, 7.9, 8.0, 8.1, 59.0, 2000.0]:
        want_l = sps.gammaln(k + a) - sps.gammaln(a)
        got_l = np.asarray(lgamma_ratio(
            jnp.asarray(k, jnp.float32), jnp.float32(a)), np.float64)
        np.testing.assert_allclose(
            got_l, want_l, rtol=5e-6, atol=5e-6,
            err_msg=f"lgamma_ratio at a={a}")
        want_d = sps.digamma(k + a) - sps.digamma(a)
        got_d = np.asarray(digamma_ratio(
            jnp.asarray(k, jnp.float32), jnp.float32(a)), np.float64)
        np.testing.assert_allclose(
            got_d, want_d, rtol=5e-6, atol=5e-6,
            err_msg=f"digamma_ratio at a={a}")


# ---------------------------------------------------------------------------
# delta_nu variant of the phase kernel
# ---------------------------------------------------------------------------

def _dnu_inputs(Ng=60, Nc=90, Nb=3, seed=1):
    rng = np.random.default_rng(seed)
    S, nu, zeta, cf, r = _inputs(Ng=Ng, Nc=Nc, seed=seed)
    dnu = jnp.asarray(rng.normal(0, 0.1, (Nb, Ng)).astype(np.float32))
    groups = rng.integers(0, Nb, Nc)
    Db = jnp.asarray(np.eye(Nb, dtype=np.float32)[:, groups] * 0 +
                     (np.arange(Nb)[:, None] == groups[None, :]))
    return S, nu, zeta, cf, r, dnu, Db.astype(jnp.float32)


def test_phase_kernel_with_delta_nu():
    args = _dnu_inputs()
    ref = float(nb_loglik_reference(*args))
    fused = float(nb_loglik_fused(*args))
    assert abs(ref - fused) / abs(ref) < 1e-5
    argnums = (1, 2, 3, 4, 5)  # nu, zeta, cf, disp, delta_nu
    gref = jax.grad(nb_loglik_reference, argnums=argnums)(*args)
    gfus = jax.grad(nb_loglik_fused, argnums=argnums)(*args)
    for name, a, b in zip(("nu", "zeta", "cf", "disp", "dnu"), gref, gfus):
        err = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
        assert err < 1e-4, (name, err)


# ---------------------------------------------------------------------------
# velocity-stage fused kernel (joint S+U with the kinetic coupling)
# ---------------------------------------------------------------------------

def _velo_inputs(Ng=60, Nc=90, Nh=5, seed=2, with_dnu=False, Nb=2):
    from velocycle_tpu.ops.nb_kernels import nbsu_loglik_reference  # noqa

    rng = np.random.default_rng(seed)
    S, nu, zeta, cf, r = _inputs(Ng=Ng, Nc=Nc, Nh=Nh, seed=seed)
    U = jnp.asarray(rng.poisson(2, (Ng, Nc)).astype(np.float32))
    zdp = jnp.asarray(rng.normal(0, 0.7, (Nc, Nh)).astype(np.float32))
    omega = jnp.asarray(rng.normal(0.3, 0.2, Nc).astype(np.float32))
    lbeta = jnp.asarray(rng.normal(0, 0.3, Ng).astype(np.float32))
    lgam = jnp.asarray(rng.normal(0, 0.3, Ng).astype(np.float32))
    args = [S, U, nu, zeta, zdp, cf, omega, lbeta, lgam, r]
    if with_dnu:
        dnu = jnp.asarray(rng.normal(0, 0.1, (Nb, Ng)).astype(np.float32))
        groups = rng.integers(0, Nb, Nc)
        Db = jnp.asarray(
            (np.arange(Nb)[:, None] == groups[None, :]).astype(np.float32)
        )
        args += [dnu, Db]
    return tuple(args)


def test_velocity_kernel_forward():
    from velocycle_tpu.ops.nb_kernels import (
        nbsu_loglik_fused, nbsu_loglik_reference,
    )

    for with_dnu in (False, True):
        args = _velo_inputs(with_dnu=with_dnu)
        ref = float(nbsu_loglik_reference(*args))
        fused = float(nbsu_loglik_fused(*args))
        assert abs(ref - fused) / abs(ref) < 1e-5, with_dnu


def test_velocity_kernel_gradients():
    from velocycle_tpu.ops.nb_kernels import (
        nbsu_loglik_fused, nbsu_loglik_reference,
    )

    names = ("nu", "zeta", "zdphi", "cf", "omega", "lbeta", "lgamma",
             "disp", "dnu")
    for with_dnu in (False, True):
        args = _velo_inputs(with_dnu=with_dnu)
        argnums = tuple(range(2, 10)) + ((10,) if with_dnu else ())
        gref = jax.grad(nbsu_loglik_reference, argnums=argnums)(*args)
        gfus = jax.grad(nbsu_loglik_fused, argnums=argnums)(*args)
        for name, a, b in zip(names, gref, gfus):
            err = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
            assert err < 5e-4, (with_dnu, name, err)


def test_velocity_kernel_non_tile_aligned():
    from velocycle_tpu.ops.nb_kernels import (
        nbsu_loglik_fused, nbsu_loglik_reference,
    )

    for Ng, Nc in [(1, 1), (129, 257), (3, 300)]:
        args = _velo_inputs(Ng=Ng, Nc=Nc, seed=Ng + Nc)
        ref = float(nbsu_loglik_reference(*args))
        fused = float(nbsu_loglik_fused(*args))
        assert abs(ref - fused) / max(abs(ref), 1.0) < 1e-5, (Ng, Nc)


def test_lgamma_k_sum_shortcut_matches():
    """Passing the precomputed sum(lgamma(k+1)) constant must reproduce the
    full value exactly (same math, reassociated), for both kernels."""
    import scipy.special as sps
    from velocycle_tpu.ops.nb_kernels import (
        nbsu_loglik_fused, nbsu_loglik_reference,
    )

    args = _inputs(Ng=60, Nc=90)
    S = args[0]
    const = np.float32(sps.gammaln(np.asarray(S, np.float64) + 1.0).sum())
    full = float(nb_loglik_fused(*args))
    short = float(nb_loglik_fused(*args, lgamma_k_sum=const))
    assert abs(full - short) / abs(full) < 1e-5
    # gradients identical (the skipped term is parameter-free)
    gfull = jax.grad(nb_loglik_fused, argnums=(1, 2, 3, 4))(*args)
    gshort = jax.grad(
        lambda *a: nb_loglik_fused(*a, lgamma_k_sum=const),
        argnums=(1, 2, 3, 4),
    )(*args)
    for a, b in zip(gfull, gshort):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    vargs = _velo_inputs(Ng=60, Nc=90)
    S, U = vargs[0], vargs[1]
    const = np.float32(
        sps.gammaln(np.asarray(S, np.float64) + 1.0).sum()
        + sps.gammaln(np.asarray(U, np.float64) + 1.0).sum()
    )
    full = float(nbsu_loglik_fused(*vargs))
    short = float(nbsu_loglik_fused(*vargs, lgamma_k_sum=const))
    assert abs(full - short) / abs(full) < 1e-5


def test_int16_counts_match_float32():
    """Counts stored as int16 (half the HBM stream) must give identical
    results — the kernels upcast per tile in VMEM."""
    S, nu, zeta, cf, r = _inputs(Ng=40, Nc=200, seed=11)
    S16 = jnp.asarray(np.asarray(S), jnp.int16)
    f = lambda S_: nb_loglik_fused(S_, nu, zeta, cf, r)
    assert float(f(S16)) == float(f(S))
    g32 = jax.grad(lambda n: nb_loglik_fused(S, n, zeta, cf, r))(nu)
    g16 = jax.grad(lambda n: nb_loglik_fused(S16, n, zeta, cf, r))(nu)
    np.testing.assert_array_equal(np.asarray(g16), np.asarray(g32))


def test_velocity_int16_counts_match_float32():
    from velocycle_tpu.ops.nb_kernels import nbsu_loglik_fused

    rng = np.random.default_rng(5)
    Ng, Nc, Nh = 24, 150, 3
    S = rng.poisson(3, (Ng, Nc)).astype(np.float32)
    U = rng.poisson(2, (Ng, Nc)).astype(np.float32)
    nu = jnp.asarray(rng.normal(0.5, 0.4, (Ng, Nh)), jnp.float32)
    zeta = jnp.asarray(rng.normal(0, 0.7, (Nc, Nh)), jnp.float32)
    zdphi = jnp.asarray(rng.normal(0, 0.7, (Nc, Nh)), jnp.float32)
    cf = jnp.asarray(rng.normal(0, 0.2, Nc), jnp.float32)
    om = jnp.asarray(np.abs(rng.normal(0.4, 0.1, Nc)), jnp.float32)
    lb = jnp.asarray(rng.normal(1.0, 0.3, Ng), jnp.float32)
    lg = jnp.asarray(rng.normal(0.0, 0.3, Ng), jnp.float32)
    r = jnp.asarray(np.abs(rng.normal(0.5, 0.2, Ng)) + 0.05, jnp.float32)

    f32 = float(nbsu_loglik_fused(
        jnp.asarray(S), jnp.asarray(U), nu, zeta, zdphi, cf, om, lb, lg, r
    ))
    i16 = float(nbsu_loglik_fused(
        jnp.asarray(S, jnp.int16), jnp.asarray(U, jnp.int16),
        nu, zeta, zdphi, cf, om, lb, lg, r
    ))
    assert f32 == i16


def test_fused_lgamma_digamma_ratio_vs_scipy():
    """The fused threshold-4 ratio pair must match scipy to f32 accuracy
    for integer k (the kernels' contract) across small and large counts
    and small/large per-gene a."""
    import scipy.special as ss

    from velocycle_tpu.ops.special import lgamma_digamma_ratio

    k = np.array([0, 1, 2, 3, 4, 5, 7, 8, 20, 200, 5000],
                 np.float32)[None, :]
    a = np.array([0.05, 0.3, 1.0, 4.0, 50.0, 2000.0],
                 np.float32)[:, None]
    lgr, dgr = lgamma_digamma_ratio(jnp.asarray(np.broadcast_to(
        k, (a.shape[0], k.shape[1]))), jnp.asarray(a))
    k64 = k.astype(np.float64)       # scipy ufuncs compute in the input
    a64 = a.astype(np.float64)       # dtype — force f64 references
    want_l = ss.gammaln(k64 + a64) - ss.gammaln(a64)
    want_d = ss.digamma(k64 + a64) - ss.digamma(a64)
    np.testing.assert_allclose(np.asarray(lgr), want_l,
                               rtol=3e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dgr), want_d,
                               rtol=3e-6, atol=1e-5)


def test_softplus_sigmoid_shared():
    from velocycle_tpu.ops.special import softplus_sigmoid

    x = jnp.asarray(np.linspace(-40, 40, 401), jnp.float32)
    sp, sig = softplus_sigmoid(x)
    np.testing.assert_allclose(
        np.asarray(sp), np.logaddexp(0.0, np.asarray(x, np.float64)),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sig),
        1.0 / (1.0 + np.exp(-np.asarray(x, np.float64))),
        rtol=1e-6, atol=1e-7,
    )


def test_disp_grad_false_matches_except_dispersion():
    """disp_grad=False must give the identical loss and identical
    gradients for every argument EXCEPT dispersion (whose cotangent
    becomes zero — only valid when discarded, i.e. shape_inv
    conditioned)."""
    S, nu, zeta, cf, r = _inputs(Ng=40, Nc=200, seed=13)

    def loss(nu_, cf_, r_, disp_grad):
        return nb_loglik_fused(S, nu_, zeta, cf_, r_, disp_grad=disp_grad)

    l_on = float(loss(nu, cf, r, True))
    l_off = float(loss(nu, cf, r, False))
    assert l_on == l_off

    g_on = jax.grad(loss, argnums=(0, 1, 2))(nu, cf, r, True)
    g_off = jax.grad(loss, argnums=(0, 1, 2))(nu, cf, r, False)
    np.testing.assert_array_equal(np.asarray(g_on[0]), np.asarray(g_off[0]))
    np.testing.assert_array_equal(np.asarray(g_on[1]), np.asarray(g_off[1]))
    assert np.abs(np.asarray(g_on[2])).max() > 0     # real disp gradient
    assert np.abs(np.asarray(g_off[2])).max() == 0.0  # compiled out


def test_velocity_disp_grad_false_matches_except_dispersion():
    from velocycle_tpu.ops.nb_kernels import nbsu_loglik_fused

    rng = np.random.default_rng(7)
    Ng, Nc, Nh = 24, 150, 3
    S = jnp.asarray(rng.poisson(3, (Ng, Nc)).astype(np.float32))
    U = jnp.asarray(rng.poisson(2, (Ng, Nc)).astype(np.float32))
    nu = jnp.asarray(rng.normal(0.5, 0.4, (Ng, Nh)), jnp.float32)
    zeta = jnp.asarray(rng.normal(0, 0.7, (Nc, Nh)), jnp.float32)
    zdphi = jnp.asarray(rng.normal(0, 0.7, (Nc, Nh)), jnp.float32)
    cf = jnp.asarray(rng.normal(0, 0.2, Nc), jnp.float32)
    om = jnp.asarray(np.abs(rng.normal(0.4, 0.1, Nc)), jnp.float32)
    lb = jnp.asarray(rng.normal(1.0, 0.3, Ng), jnp.float32)
    lg = jnp.asarray(rng.normal(0.0, 0.3, Ng), jnp.float32)
    r = jnp.asarray(np.abs(rng.normal(0.5, 0.2, Ng)) + 0.05, jnp.float32)

    def loss(nu_, lb_, r_, disp_grad):
        return nbsu_loglik_fused(S, U, nu_, zeta, zdphi, cf, om, lb_, lg,
                                 r_, disp_grad=disp_grad)

    assert float(loss(nu, lb, r, True)) == float(loss(nu, lb, r, False))
    g_on = jax.grad(loss, argnums=(0, 1, 2))(nu, lb, r, True)
    g_off = jax.grad(loss, argnums=(0, 1, 2))(nu, lb, r, False)
    np.testing.assert_array_equal(np.asarray(g_on[0]), np.asarray(g_off[0]))
    np.testing.assert_array_equal(np.asarray(g_on[1]), np.asarray(g_off[1]))
    assert np.abs(np.asarray(g_off[2])).max() == 0.0
