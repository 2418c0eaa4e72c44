"""Unit tests: distribution log-probs against scipy closed forms, sampling
moments, and the exact NB parameterization used by the reference
(`GammaPoisson(1/r, 1/(r*mu))`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from velocycle_tpu.core import distributions as dist
from velocycle_tpu.ops.likelihoods import nb_logpmf


KEY = jax.random.PRNGKey(0)


def test_normal_logprob():
    x = np.linspace(-3, 3, 11)
    d = dist.Normal(0.5, 1.7)
    np.testing.assert_allclose(
        d.log_prob(jnp.asarray(x)), st.norm(0.5, 1.7).logpdf(x),
        rtol=1e-4, atol=1e-4,
    )


def test_lognormal_logprob():
    x = np.linspace(0.1, 5, 11)
    d = dist.LogNormal(0.3, 0.8)
    np.testing.assert_allclose(
        d.log_prob(jnp.asarray(x)),
        st.lognorm(s=0.8, scale=np.exp(0.3)).logpdf(x),
        rtol=1e-5,
    )


def test_gamma_logprob():
    x = np.linspace(0.1, 8, 13)
    d = dist.Gamma(2.5, 1.3)
    np.testing.assert_allclose(
        d.log_prob(jnp.asarray(x)),
        st.gamma(a=2.5, scale=1 / 1.3).logpdf(x),
        rtol=1e-5,
    )


def test_poisson_logprob():
    k = np.arange(0, 20)
    d = dist.Poisson(3.7)
    np.testing.assert_allclose(
        d.log_prob(jnp.asarray(k, jnp.float32)),
        st.poisson(3.7).logpmf(k),
        rtol=1e-3, atol=1e-3,
    )


def test_gammapoisson_matches_nbinom():
    """GammaPoisson(a, b) == scipy nbinom(n=a, p=b/(1+b))."""
    k = np.arange(0, 30).astype(np.float32)
    a, b = 2.0, 0.5
    d = dist.GammaPoisson(a, b)
    np.testing.assert_allclose(
        d.log_prob(jnp.asarray(k)),
        st.nbinom(n=a, p=b / (1 + b)).logpmf(k),
        rtol=1e-3, atol=1e-3,
    )


def test_negative_binomial_reference_parameterization():
    """NB(mean=mu, dispersion=r) must equal GammaPoisson(1/r, 1/(r*mu))
    (`/root/reference/velocycle/phase_inference_model.py:393`) and have the
    right mean/variance: var = mu + r*mu^2."""
    mu, r = 4.0, 0.6
    d = dist.NegativeBinomial(mu, r)
    k = np.arange(0, 60).astype(np.float32)
    lp = np.asarray(d.log_prob(jnp.asarray(k)))
    p = np.exp(lp)
    assert abs(p.sum() - 1.0) < 1e-3
    mean = (p * k).sum()
    var = (p * k**2).sum() - mean**2
    assert abs(mean - mu) < 1e-2
    assert abs(var - (mu + r * mu * mu)) < 0.15


def test_nb_logpmf_stable_at_extreme_dispersion():
    """f32 NB log-pmf must stay accurate when dispersion r -> 0 (a = 1/r
    huge): the textbook gammaln form loses O(1) nats to cancellation at
    r=5e-4 — the root cause of round 3's frozen MCMC chains (a sampler
    that wanders into the small-r region sees a noise cliff).  Reference
    values from scipy in float64."""
    k = np.array([0.0, 1.0, 3.0, 17.0, 119.0])
    for r in [5e-4, 5e-3, 0.05, 0.5, 5.0, 50.0]:
        for mu in [0.3, 3.0, 30.0]:
            a = 1.0 / r
            b = 1.0 / (r * mu)
            want = st.nbinom(n=a, p=b / (1.0 + b)).logpmf(k)  # f64 scipy
            got = np.asarray(dist.NegativeBinomial(
                jnp.float32(mu), jnp.float32(r)
            ).log_prob(jnp.asarray(k, jnp.float32)), np.float64)
            np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
            got_k = np.asarray(nb_logpmf(
                jnp.asarray(k, jnp.float32),
                jnp.float32(np.log(mu)), jnp.float32(r),
            ), np.float64)
            np.testing.assert_allclose(got_k, want, rtol=2e-3, atol=2e-3)


def test_nb_logpmf_kernel_matches_distribution():
    rng = np.random.default_rng(1)
    k = rng.poisson(4, size=(5, 7)).astype(np.float32)
    elog_mu = rng.normal(1.0, 0.3, size=(5, 7)).astype(np.float32)
    r = np.abs(rng.normal(0.5, 0.1, size=(5, 1))).astype(np.float32)
    got = nb_logpmf(jnp.asarray(k), jnp.asarray(elog_mu), jnp.asarray(r))
    want = dist.NegativeBinomial(jnp.exp(elog_mu), r).log_prob(k)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_beta_bernoulli_uniform():
    x = np.linspace(0.05, 0.95, 9)
    np.testing.assert_allclose(
        dist.Beta(2.0, 3.0).log_prob(jnp.asarray(x)),
        st.beta(2, 3).logpdf(x),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        dist.Bernoulli(0.3).log_prob(jnp.asarray([0.0, 1.0])),
        [np.log(0.7), np.log(0.3)],
        rtol=1e-5,
    )
    d = dist.Uniform(1.0, 3.0)
    np.testing.assert_allclose(d.log_prob(jnp.asarray(2.0)), -np.log(2.0))
    assert np.isneginf(float(d.log_prob(jnp.asarray(4.0))))


def test_mvn_logprob():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(3, 3)).astype(np.float32)
    cov = A @ A.T + 3 * np.eye(3, dtype=np.float32)
    loc = rng.normal(size=3).astype(np.float32)
    x = rng.normal(size=(4, 3)).astype(np.float32)
    d = dist.MultivariateNormal(loc, covariance_matrix=cov)
    np.testing.assert_allclose(
        d.log_prob(jnp.asarray(x)),
        st.multivariate_normal(loc, cov).logpdf(x),
        rtol=1e-4,
    )


def test_lowrank_mvn_logprob_and_sampling():
    rng = np.random.default_rng(3)
    n, rank = 6, 2
    loc = rng.normal(size=n).astype(np.float32)
    W = rng.normal(size=(n, rank)).astype(np.float32) * 0.5
    D = (0.5 + rng.random(n)).astype(np.float32)
    cov = W @ W.T + np.diag(D)
    d = dist.LowRankMultivariateNormal(loc, W, D)
    x = rng.normal(size=(5, n)).astype(np.float32)
    np.testing.assert_allclose(
        d.log_prob(jnp.asarray(x)),
        st.multivariate_normal(loc, cov).logpdf(x),
        rtol=1e-4, atol=1e-4,
    )
    s = d.sample(KEY, (20000,))
    np.testing.assert_allclose(np.mean(np.asarray(s), 0), loc, atol=0.05)
    np.testing.assert_allclose(np.cov(np.asarray(s).T), cov, atol=0.12)


def test_vonmises_logprob_and_sampling():
    x = np.linspace(-np.pi, np.pi, 21)
    d = dist.VonMises(0.7, 2.5)
    np.testing.assert_allclose(
        d.log_prob(jnp.asarray(x)),
        st.vonmises(kappa=2.5, loc=0.7).logpdf(x),
        rtol=1e-4, atol=1e-5,
    )
    s = np.asarray(d.sample(KEY, (20000,)))
    # circular mean close to loc
    ang = np.angle(np.exp(1j * s).mean())
    assert abs(ang - 0.7) < 0.05
    # concentration estimate from resultant length
    R = np.abs(np.exp(1j * s).mean())
    R_expected = st.vonmises(kappa=2.5).expect(lambda t: np.cos(t))
    assert abs(R - R_expected) < 0.03


def test_projected_normal_logprob_normalizes():
    d = dist.ProjectedNormal(jnp.asarray([1.2, 0.8]))
    theta = np.linspace(-np.pi, np.pi, 4001)
    p = np.exp(np.asarray(d.log_prob(jnp.asarray(theta))))
    integral = np.trapezoid(p, theta)
    assert abs(integral - 1.0) < 1e-3


def test_independent_event_dims():
    d = dist.Normal(jnp.zeros((4, 3)), 1.0).to_event(1)
    assert d.batch_shape == (4,)
    assert d.event_shape == (3,)
    lp = d.log_prob(jnp.ones((4, 3)))
    assert lp.shape == (4,)


def test_gamma_poisson_sampling_moments():
    d = dist.GammaPoisson(4.0, 2.0)  # mean 2, var 2 + 4/4 = 3
    s = np.asarray(d.sample(KEY, (40000,)))
    assert abs(s.mean() - 2.0) < 0.05
    assert abs(s.var() - 3.0) < 0.15


def test_delta_logprob_zero():
    d = dist.Delta(jnp.asarray([1.0, 2.0]))
    np.testing.assert_array_equal(
        d.log_prob(jnp.asarray([1.0, 2.0])), [0.0, 0.0]
    )
