"""Tempered SMC: posterior moments, log-evidence, constrained supports,
adaptive schedule behavior."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.stats as st

from velocycle_tpu.core import distributions as dist
from velocycle_tpu.core import handlers as h
from velocycle_tpu.infer.smc import SMC

pytestmark = pytest.mark.slow  # tempered SMC runs: fast lane skips this module


def test_conjugate_posterior_and_evidence():
    y = jnp.asarray([1.0, 1.4, 0.8, 1.2])

    def model():
        x = h.sample("x", dist.Normal(0.0, 1.0))
        h.sample("y", dist.Normal(x, 1.0).to_event(1), obs=y)

    smc = SMC(model, num_particles=1024, num_moves=3)
    smc.run(jax.random.PRNGKey(0))
    s = smc.get_samples()
    n = len(y)
    post_mean = float(y.sum() / (n + 1))
    post_sd = float(np.sqrt(1.0 / (n + 1)))
    assert abs(s["x"].mean() - post_mean) < 0.05
    assert abs(s["x"].std() - post_sd) < 0.05
    # marginal likelihood: y ~ N(0, I + 11^T)
    cov = np.eye(n) + np.ones((n, n))
    logZ_true = st.multivariate_normal(np.zeros(n), cov).logpdf(
        np.asarray(y)
    )
    assert abs(smc.log_evidence() - logZ_true) < 0.15
    sched = smc.temperature_schedule
    assert sched[-1] == 1.0
    assert (np.diff(sched) > 0).all()


def test_positive_support_particles():
    k = jnp.asarray([3.0, 5.0, 4.0, 2.0, 6.0])

    def model():
        rate = h.sample("rate", dist.Gamma(2.0, 1.0))
        h.sample("k", dist.Poisson(rate * jnp.ones(5)).to_event(1), obs=k)

    smc = SMC(model, num_particles=512, num_moves=3)
    smc.run(jax.random.PRNGKey(1))
    rate = smc.get_samples()["rate"]
    assert (rate > 0).all()
    # conjugate Gamma(2 + sum k, 1 + n) posterior
    post = st.gamma(a=2 + float(k.sum()), scale=1.0 / (1 + 5))
    assert abs(rate.mean() - post.mean()) < 0.25
    assert abs(rate.std() - post.std()) < 0.15


def test_smc_phase_model_small():
    """SMC runs end-to-end on a tiny phase model."""
    from velocycle_tpu import Cycle, Phases, preprocess_for_phase_estimation
    from velocycle_tpu.simulate import simulate_data

    sim = simulate_data(Nc=20, Ng=8, seed=9)
    rng = np.random.default_rng(0)
    nu = sim.uns["simulated_nu"]
    cycle = Cycle.from_array(
        (nu + rng.normal(0, 0.2, nu.shape)).T, np.full((3, 8), 0.5),
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

    smc = SMC(model, num_particles=256, num_moves=2, max_stages=100)
    smc.run(jax.random.PRNGKey(2))
    s = smc.get_samples()
    assert s["nu"].shape == (256, 8, 3)
    assert s["phi_xy"].shape == (256, 20, 2)
    assert np.isfinite(s["nu"]).all()
    assert s["shape_inv"].min() > 0
    assert np.isfinite(smc.log_evidence())


def test_sharded_smc_matches_single_device():
    """Particle-axis sharding over an 8-device mesh must not change the
    algorithm: same key => same tempering schedule, and logZ / posterior
    moments equal to the unsharded run up to SPMD reduction-order noise.
    Resampling (`particles[idx]`) is the cross-shard collective most
    likely to be wrong (SURVEY §5.8) — this pins it down."""
    from velocycle_tpu.parallel import make_mesh

    y = jnp.asarray([1.0, 1.4, 0.8, 1.2])

    def model():
        x = h.sample("x", dist.Normal(0.0, 1.0))
        h.sample("y", dist.Normal(x, 1.0).to_event(1), obs=y)

    key = jax.random.PRNGKey(3)
    single = SMC(model, num_particles=512, num_moves=2)
    single.run(key)
    logZ_single = single.log_evidence()
    x_single = single.get_samples()["x"]

    mesh = make_mesh(("particles",))
    sharded = SMC(model, num_particles=512, num_moves=2)
    sharded.run(key, mesh=mesh, particle_axis="particles")
    logZ_sharded = sharded.log_evidence()
    x_sharded = sharded.get_samples()["x"]

    assert len(sharded.temperature_schedule) == len(
        single.temperature_schedule
    )
    np.testing.assert_allclose(
        sharded.temperature_schedule, single.temperature_schedule,
        atol=2e-3,
    )
    assert abs(logZ_sharded - logZ_single) < 0.05
    assert abs(x_sharded.mean() - x_single.mean()) < 0.02
    assert abs(x_sharded.std() - x_single.std()) < 0.02


def test_sharded_bridged_smc_matches_single_device():
    """Same agreement contract for the variational-bridge sampler (the
    path that scales), on a phase model via the SMCFitModel driver."""
    from velocycle_tpu import (
        Cycle, Phases, SMCFitModel, preprocess_for_phase_estimation,
    )
    from velocycle_tpu.parallel import make_mesh
    from velocycle_tpu.simulate import simulate_data

    sim = simulate_data(Nc=24, Ng=8, seed=9)
    rng = np.random.default_rng(0)
    nu = sim.uns["simulated_nu"]
    cycle = Cycle.from_array(
        (nu + rng.normal(0, 0.2, nu.shape)).T, np.full((3, 8), 0.5),
        list(sim.var.index),
    )
    phases = Phases.from_angles(
        sim.obs["simulated_phis"].values, 2.0, list(sim.obs.index)
    )
    mp = preprocess_for_phase_estimation(
        sim, cycle, phases, n_harmonics=1, with_delta_nu=False,
    )
    cond = {"phi_xy": np.asarray(mp.data.phixy_prior)}

    def run(mesh):
        fm = SMCFitModel(
            mp, condition_on=cond, num_particles=256, num_moves=2,
            svi_steps=300, max_stages=60,
        )
        fm.run(jax.random.PRNGKey(4), mesh=mesh)
        return fm

    fm1 = run(None)
    fm8 = run(make_mesh(("particles",)))
    assert abs(fm8.log_evidence - fm1.log_evidence) < 1.0
    nu1 = fm1.posterior["nu"]
    nu8 = fm8.posterior["nu"]
    np.testing.assert_allclose(nu8.mean(0), nu1.mean(0), atol=0.05)
    np.testing.assert_allclose(
        nu8.std(0), nu1.std(0), atol=0.05, rtol=0.35
    )
