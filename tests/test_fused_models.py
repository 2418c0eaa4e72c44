"""End-to-end parity of the Pallas fused-NB model paths vs the plain paths.

`use_fused_nb=True` must be a pure performance switch: with the same PRNG
key, the ELBO loss trajectory of a fused fit must track the plain fit step
for step (same math, different kernels — tolerance covers the fused path's
Lanczos lgamma vs XLA's lgamma).
"""
import dataclasses

import numpy as np
import pytest
import jax

from velocycle_tpu import (
    AngularSpeed, Cycle, Phases,
    preprocess_for_phase_estimation, preprocess_for_velocity_estimation,
)
from velocycle_tpu.infer import SVI, Trace_ELBO, clipped_adam
from velocycle_tpu.simulate import simulate_data


def _sim(Nc=120, Ng=40, seed=3):
    adata = simulate_data(Nc=Nc, Ng=Ng, omegas_to_test=(0.4,), seed=seed)
    cycle = Cycle.trivial_prior(list(adata.var.index), harmonics=2)
    phases = Phases.from_angles(
        np.asarray(adata.obs["simulated_phis"].values),
        cell_names=list(adata.obs.index),
    )
    return adata, cycle, phases


def _loss_traj(mp, n_steps=8, key=0):
    svi = SVI(mp.model_fn, mp.guide_fn, clipped_adam(lr=0.02), Trace_ELBO())
    state = svi.init(jax.random.PRNGKey(key), mp.data)
    state, losses = svi.update_chunk(state, n_steps, mp.data)
    return np.asarray(jax.device_get(losses))


def test_phase_fused_elbo_parity():
    adata, cycle, phases = _sim()
    kw = dict(n_harmonics=2, with_delta_nu=False)
    plain = preprocess_for_phase_estimation(adata, cycle, phases, **kw)
    fused = preprocess_for_phase_estimation(
        adata, cycle, phases, use_fused_nb=True, **kw
    )
    lp = _loss_traj(plain)
    lf = _loss_traj(fused)
    np.testing.assert_allclose(lf, lp, rtol=5e-4)


@pytest.mark.slow
def test_phase_fused_elbo_parity_with_delta_nu():
    adata, cycle, phases = _sim(seed=4)
    design = np.asarray(
        (np.arange(len(phases)) % 2)[:, None] == np.arange(2)[None, :],
        np.int64,
    )
    kw = dict(n_harmonics=2, with_delta_nu=True, design_mtx=design)
    plain = preprocess_for_phase_estimation(adata, cycle, phases, **kw)
    fused = preprocess_for_phase_estimation(
        adata, cycle, phases, use_fused_nb=True, **kw
    )
    np.testing.assert_allclose(_loss_traj(fused), _loss_traj(plain),
                               rtol=5e-4)


@pytest.mark.slow
def test_velocity_fused_elbo_parity():
    adata, cycle, phases = _sim(seed=5)
    speed = AngularSpeed.trivial_prior(["cond"], harmonics=1)
    kw = dict(n_harmonics=2, with_delta_nu=False, model_type="fourier")
    plain = preprocess_for_velocity_estimation(
        adata, cycle, phases, speed, **kw
    )
    fused = preprocess_for_velocity_estimation(
        adata, cycle, phases, speed, use_fused_nb=True, **kw
    )
    np.testing.assert_allclose(_loss_traj(fused), _loss_traj(plain),
                               rtol=5e-4)


@pytest.mark.slow
def test_velocity_fused_lrmn_parity():
    adata, cycle, phases = _sim(seed=6)
    speed = AngularSpeed.trivial_prior(["cond"], harmonics=0)
    kw = dict(n_harmonics=2, with_delta_nu=True, model_type="lrmn")
    plain = preprocess_for_velocity_estimation(
        adata, cycle, phases, speed, **kw
    )
    fused = preprocess_for_velocity_estimation(
        adata, cycle, phases, speed, use_fused_nb=True, **kw
    )
    np.testing.assert_allclose(_loss_traj(fused), _loss_traj(plain),
                               rtol=5e-4)


@pytest.mark.slow
def test_fused_fit_driver_posterior_unfuses():
    """The fit driver's Predictive path must expose ElogS even when the
    fit itself ran fused (the fused model records no ElogS site)."""
    from velocycle_tpu.fit import PhaseFitModel

    adata, cycle, phases = _sim(Nc=80, Ng=24, seed=7)
    mp = preprocess_for_phase_estimation(
        adata, cycle, phases, n_harmonics=2, with_delta_nu=False,
        use_fused_nb=True,
    )
    fit = PhaseFitModel(mp, num_samples=4, n_per_bin=4)
    fit.fit(num_steps=10)
    assert np.isfinite(fit.losses).all()
    assert fit.posterior["ElogS"].shape == (mp.Ng, mp.Nc)
    assert np.isfinite(fit.posterior["nu"]).all()


@pytest.mark.slow
def test_nuts_through_fused_kernel():
    """The fused Pallas likelihood also drives MCMC: the NUTS potential's
    gradient flows through the custom VJP.  Posterior means must agree with
    the plain-path run up to MC error."""
    from velocycle_tpu.core import handlers
    from velocycle_tpu.infer.mcmc import MCMC

    adata, cycle, phases = _sim(Nc=80, Ng=16, seed=9)
    means = {}
    for fused in (False, True):
        mp = preprocess_for_phase_estimation(
            adata, cycle, phases, n_harmonics=2, with_delta_nu=False,
            use_fused_nb=fused,
        )
        model = handlers.condition(
            mp.model_fn, data={"phi_xy": mp.data.phixy_prior}
        )
        m = MCMC(model, kernel="nuts", num_warmup=150, num_samples=120,
                 num_chains=2, max_depth=6)
        m.run(jax.random.PRNGKey(0), mp.data)
        # short-warmup adaptation is noisy; just require healthy mixing
        assert m.accept_rate() > 0.3
        means[fused] = m.get_samples()["nu"].mean(0)
    r = np.corrcoef(means[True].ravel(), means[False].ravel())[0, 1]
    assert r > 0.95, r
