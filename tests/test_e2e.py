"""End-to-end posterior recovery on simulated ground truth.

The reference's only quantitative accuracy harness correlates fitted vs
simulated parameters (`tutorials/VeloCycle_2D/run_simulations.py:253-294`);
these tests apply the same strategy to the 1-D cycle pipeline:
simulate -> preprocess -> PhaseFitModel -> VelocityFitModel (conditioned on
stage 1), asserting circular/linear correlation thresholds.
"""
import numpy as np
import jax
import pytest

from velocycle_tpu import (
    AngularSpeed, Cycle, Phases, PhaseFitModel, VelocityFitModel,
    preprocess_for_phase_estimation, preprocess_for_velocity_estimation,
)
from velocycle_tpu.ops.circular import circular_corrcoef
from velocycle_tpu.simulate import simulate_data


pytestmark = pytest.mark.slow  # heavy fits/samplers: fast lane skips this module

NC, NG = 120, 40


@pytest.fixture(scope="module")
def sim():
    return simulate_data(Nc=NC, Ng=NG, omegas_to_test=(0.4,),
                         key=jax.random.PRNGKey(42))


@pytest.fixture(scope="module")
def phase_fit(sim):
    adata = sim
    genes = list(adata.var.index)
    # informative priors, mirroring the real workflow: a curated Cycle
    # prior (here: truth + noise, like the Seurat/DeepCycle coefficient
    # tables) and a PCA-like phase initialisation (truth + noise).  With
    # NG=40/NC=120 a flat prior is under-determined; the tutorials always
    # supply both priors (SURVEY.md §3.1).
    rng = np.random.default_rng(0)
    true_nu = adata.uns["simulated_nu"]
    cycle = Cycle.from_array(
        (true_nu + rng.normal(0, 0.2, true_nu.shape)).T,
        np.full((3, NG), 0.5), genes,
    )
    init = adata.obs["simulated_phis"].values + rng.normal(0, 0.3, NC)
    phases = Phases.from_angles(init, concentration=2.0,
                                cell_names=list(adata.obs.index))
    mp = preprocess_for_phase_estimation(
        adata, cycle, phases, n_harmonics=1, with_delta_nu=False,
    )
    fit = PhaseFitModel(mp, num_samples=40, n_per_bin=40)
    fit.fit(num_steps=1500, key=jax.random.PRNGKey(0))
    return fit


def test_phase_recovery(sim, phase_fit):
    true_phis = sim.obs["simulated_phis"].values[:NC]
    cc = float(circular_corrcoef(phase_fit.phase_fit.phis, true_phis))
    assert cc > 0.8, f"circular corr {cc}"


def test_harmonics_recovery(sim, phase_fit):
    true_nu = sim.uns["simulated_nu"]  # (Ng, 3)
    est_nu = phase_fit.cycle_fit.means_array
    # nu0 is identified directly; nu1 up to the global phase rotation
    r0 = np.corrcoef(true_nu[:, 0], est_nu[:, 0])[0, 1]
    assert r0 > 0.9, f"nu0 corr {r0}"
    amp_true = np.hypot(true_nu[:, 1], true_nu[:, 2])
    amp_est = np.hypot(est_nu[:, 1], est_nu[:, 2])
    # true first-harmonic amplitudes are small (prior sd 0.2), so this is
    # a noisy statistic at NG=40
    r_amp = np.corrcoef(amp_true, amp_est)[0, 1]
    assert r_amp > 0.5, f"amplitude corr {r_amp}"


def test_phase_posterior_dict(phase_fit):
    post = phase_fit.posterior
    assert post["nu"].shape == (40, NG, 3)
    assert post["phi"].shape == (40, NC)
    assert post["ElogS"].shape == (NG, NC)
    assert np.isfinite(phase_fit.losses).all()
    # ELBO should improve substantially
    assert phase_fit.losses[-1] < phase_fit.losses[0] - 100


def test_velocity_fit_conditioned(sim, phase_fit):
    adata = sim
    cycle_fit = phase_fit.cycle_fit
    speed = AngularSpeed.trivial_prior(["cond"], harmonics=0,
                                       means=0.3, stds=0.5)
    mp = preprocess_for_velocity_estimation(
        adata, cycle_fit, phase_fit.phase_fit, speed,
        n_harmonics=1, with_delta_nu=False, model_type="fourier",
    )
    condition_on = {
        "phi_xy": mp.data.phixy_prior,
        "nu": mp.data.mu_nu,
        "shape_inv": phase_fit.disp,
    }
    vfit = VelocityFitModel(mp, condition_on=condition_on,
                            num_samples=20, n_per_bin=20)
    vfit.fit(num_steps=800, key=jax.random.PRNGKey(1))
    assert np.isfinite(vfit.losses).all()
    assert vfit.losses[-1] < vfit.losses[0]
    # constant angular speed recovered within a factor ~2 and positive
    omega_est = float(vfit.speed_fit.means.iloc[0, 0])
    assert 0.1 < omega_est < 1.2, f"omega {omega_est}"
    # kinetics: log_beta correlates with ground truth
    r_beta = np.corrcoef(
        sim.var["simulated_betas"].values, vfit.cycle_fit.log_betas
    )[0, 1]
    assert r_beta > 0.5, f"log_beta corr {r_beta}"
    # posterior dict has the advertised sites
    assert "omega" in vfit.posterior
    assert vfit.posterior["omega"].shape == (20, NC)


def test_velocity_lrmn_guide_runs(sim, phase_fit):
    adata = sim
    speed = AngularSpeed.trivial_prior(["cond"], harmonics=0,
                                       means=0.3, stds=0.5)
    mp = preprocess_for_velocity_estimation(
        adata, phase_fit.cycle_fit, phase_fit.phase_fit, speed,
        n_harmonics=1, with_delta_nu=False, model_type="lrmn",
    )
    condition_on = {
        "phi_xy": mp.data.phixy_prior,
        "nu": mp.data.mu_nu,
        "shape_inv": phase_fit.disp,
    }
    vfit = VelocityFitModel(mp, condition_on=condition_on,
                            get_posterior=False)
    vfit.fit(num_steps=300, key=jax.random.PRNGKey(2))
    assert np.isfinite(vfit.losses).all()
    assert vfit.losses[-1] < vfit.losses[0]
    assert vfit.speed_fit.shape == (1, 1)
    assert vfit.cycle_fit.log_gammas.shape == (NG,)
