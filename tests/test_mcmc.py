"""MCMC engines: statistical correctness of HMC and NUTS against known
posteriors, bijection handling (positive / unit-interval / circular), and
NUTS on the phase model."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.stats as st

from velocycle_tpu.core import distributions as dist
from velocycle_tpu.core import handlers as h
from velocycle_tpu.infer.mcmc import MCMC, init_model



pytestmark = pytest.mark.slow  # heavy fits/samplers: fast lane skips this module

def _gauss_gamma():
    h.sample("x", dist.Normal(2.0, 3.0))
    h.sample("y", dist.Gamma(2.0, 1.0))


@pytest.mark.parametrize("kernel", ["hmc", "nuts"])
def test_moments_normal_gamma(kernel):
    m = MCMC(_gauss_gamma, kernel=kernel, num_warmup=500,
             num_samples=1500, num_chains=2)
    m.run(jax.random.PRNGKey(0))
    s = m.get_samples()
    assert abs(s["x"].mean() - 2.0) < 0.3
    assert abs(s["x"].std() - 3.0) < 0.4
    assert abs(s["y"].mean() - 2.0) < 0.25
    assert abs(s["y"].std() - np.sqrt(2.0)) < 0.3
    assert (s["y"] > 0).all()
    summ = m.summary()
    assert float(summ["x"]["rhat"][0]) < 1.1
    assert float(summ["y"]["rhat"][0]) < 1.1
    assert m.accept_rate() > 0.5


def test_nuts_circular_von_mises():
    """S^1 wrapping: NUTS on a VonMises site reproduces the circular mean
    and the resultant length (the statistic the reference can't sample at
    all — it has no MCMC)."""

    def cmodel():
        h.sample("phi", dist.VonMises(1.0, 4.0))

    m = MCMC(cmodel, kernel="nuts", num_warmup=500, num_samples=2000,
             num_chains=4, init_jitter=0.5)
    m.run(jax.random.PRNGKey(2))
    phi = m.get_samples()["phi"]
    assert (phi >= -np.pi).all() and (phi < np.pi).all()
    z = np.exp(1j * phi).mean()
    R_expected = st.vonmises(kappa=4.0).expect(lambda t: np.cos(t))
    assert abs(np.angle(z) - 1.0) < 0.1
    assert abs(np.abs(z) - R_expected) < 0.04


def test_beta_unit_interval_support():
    def bmodel():
        h.sample("p", dist.Beta(2.0, 5.0))

    m = MCMC(bmodel, kernel="hmc", num_warmup=400, num_samples=1500,
             num_chains=2)
    m.run(jax.random.PRNGKey(3))
    p = m.get_samples()["p"]
    assert (p > 0).all() and (p < 1).all()
    assert abs(p.mean() - 2.0 / 7.0) < 0.05


def test_posterior_conditioning():
    """Observed data shifts the posterior correctly (conjugate check):
    x ~ N(0, 1), y_i ~ N(x, 1) observed."""
    y_obs = jnp.asarray([1.0, 1.4, 0.8, 1.2])

    def model():
        x = h.sample("x", dist.Normal(0.0, 1.0))
        h.sample("y", dist.Normal(x, 1.0).to_event(1), obs=y_obs)

    n = len(y_obs)
    post_mean = float(y_obs.sum() / (n + 1))
    post_sd = float(np.sqrt(1.0 / (n + 1)))
    m = MCMC(model, kernel="nuts", num_warmup=500, num_samples=2000,
             num_chains=2)
    m.run(jax.random.PRNGKey(4))
    x = m.get_samples()["x"]
    assert abs(x.mean() - post_mean) < 0.06
    assert abs(x.std() - post_sd) < 0.06


def test_init_model_potential():
    """potential_fn == negative unconstrained log joint with Jacobian (up
    to the recorded baseline constant ``log_offset``)."""
    u = jnp.asarray([0.5, -0.3])
    # manual: x = u0; y = softplus(u1)
    x = 0.5
    yv = float(jnp.logaddexp(-0.3, 0.0))
    logp = (
        st.norm(2, 3).logpdf(x)
        + st.gamma(a=2, scale=1).logpdf(yv)
        + float(-jnp.logaddexp(0.3, 0.0))  # log sigmoid(u1)
    )

    # raw potential (no baseline)
    info_raw = init_model(_gauss_gamma, subtract_baseline=False)
    assert info_raw.init_u.shape == (2,)
    assert info_raw.log_offset == 0.0
    assert abs(float(info_raw.potential_fn(u)) + logp) < 1e-3

    # baselined potential: shifted by exactly log_offset
    info = init_model(_gauss_gamma)
    pot = float(info.potential_fn(u))
    assert abs((pot - info.log_offset) + logp) < 1e-3
    vals = info.unflatten(u)
    assert abs(float(vals["y"]) - yv) < 1e-6


def test_nuts_phase_model_small():
    """NUTS runs on the real phase model (tiny) with finite samples and a
    moving chain."""
    from velocycle_tpu import Cycle, Phases, preprocess_for_phase_estimation
    from velocycle_tpu.simulate import simulate_data

    sim = simulate_data(Nc=30, Ng=10, seed=5)
    rng = np.random.default_rng(0)
    nu = sim.uns["simulated_nu"]
    cycle = Cycle.from_array(
        (nu + rng.normal(0, 0.2, nu.shape)).T, np.full((3, 10), 0.5),
        list(sim.var.index),
    )
    phases = Phases.from_angles(
        sim.obs["simulated_phis"].values, 2.0, list(sim.obs.index)
    )
    mp = preprocess_for_phase_estimation(
        sim, cycle, phases, n_harmonics=1, with_delta_nu=False,
    )

    def model():
        mp.model_fn(mp.data)

    m = MCMC(model, kernel="nuts", num_warmup=300, num_samples=150,
             num_chains=2, max_depth=6, init_jitter=0.1)
    m.run(jax.random.PRNGKey(6))
    s = m.get_samples(group_by_chain=True)
    assert s["nu"].shape == (2, 150, 10, 3)
    assert s["phi_xy"].shape == (2, 150, 30, 2)
    assert np.isfinite(s["nu"]).all()
    assert s["shape_inv"].min() > 0
    # at least one chain mixes (short warmup on a funnel-ish posterior can
    # leave an unlucky chain slow; that is a tuning property, not a bug)
    moves = [
        np.abs(np.diff(s["nu"][c, :, 0, 0])).mean() for c in range(2)
    ]
    assert max(moves) > 1e-3, moves
