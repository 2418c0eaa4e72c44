"""1D-manifold (spline-basis) model family: the pancreas workflow.

The reference only demonstrates this capability inline in
`tutorials/1D_Pancreas_Analysis.ipynb` (cells 28/46): a B-spline basis over
a fixed linear pseudotime, two-stage fit (expression field, then a scalar
velocity).  Here it is a first-class path of the packaged models
(``basis_kind="spline"``), tested as a simulate -> fit -> recover loop.

Note the kinetic scale degeneracy: (omega, gamma, beta) -> (c*omega,
c*gamma, c*beta) leaves ElogU invariant, so omega's absolute scale is
identified only through the gamma/beta priors; the simulation draws
gamma/beta from the model priors so omega is pinned.
"""
import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp
import pytest

from velocycle_tpu import (
    AngularSpeed,
    Cycle,
    PhaseFitModel,
    Phases,
    VelocityFitModel,
    preprocess_for_phase_estimation,
    preprocess_for_velocity_estimation,
)
from velocycle_tpu.anndata_lite import AnnDataLite
from velocycle_tpu.ops.splines import spline_basis_auto


pytestmark = pytest.mark.slow  # heavy fits/samplers: fast lane skips this module

NC, NG, NB = 300, 40, 8
OMEGA_TRUE = 0.5
MU_GAMMA, MU_BETA = 0.0, 2.0


@pytest.fixture(scope="module")
def sim():
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 1, NC)).astype(np.float32)
    W = rng.normal(0, 0.5, (NG, NB + 1)).astype(np.float32)
    W[:, 0] += 3.0
    B = np.asarray(
        spline_basis_auto(jnp.asarray(t), n_basis=NB, degree=3,
                          domain=(0.0, 1.0))
    )
    dB = np.asarray(
        spline_basis_auto(jnp.asarray(t), der=1, n_basis=NB, degree=3,
                          domain=(0.0, 1.0))
    )
    ElogS = W @ B.T
    # kinetics drawn from the model priors so omega's scale is identified
    gamma = np.exp(rng.normal(MU_GAMMA, 0.3, NG)).astype(np.float32)
    beta = np.exp(rng.normal(MU_BETA, 0.3, NG)).astype(np.float32)
    kin = (W @ dB.T) * OMEGA_TRUE + gamma[:, None]
    ElogU = (
        -np.log(beta)[:, None]
        + np.log(np.maximum(kin, 0) + 1e-5)
        + ElogS
    )
    S = rng.poisson(np.exp(ElogS)).astype(np.float32)
    U = rng.poisson(np.exp(ElogU)).astype(np.float32)
    genes = [f"g{i:03d}" for i in range(NG)]
    cells = [f"c{i}" for i in range(NC)]
    adata = AnnDataLite(
        X=S.T, layers={"spliced": S.T, "unspliced": U.T},
        obs=pd.DataFrame(index=cells), var=pd.DataFrame(index=genes),
    )
    return dict(t=t, W=W, B=B, ElogS=ElogS, gamma=gamma, beta=beta,
                adata=adata, genes=genes, cells=cells)


@pytest.fixture(scope="module")
def phase_fit(sim):
    cyc = Cycle.spline_prior(sim["genes"], n_basis=NB, means=0.0, stds=3.0)
    ph = Phases.from_angles(sim["t"], cell_names=sim["cells"])
    mp = preprocess_for_phase_estimation(
        sim["adata"], cyc, ph, noisemodel="Poisson", with_delta_nu=False,
        basis_kind="spline", spline_domain=(0.0, 1.0),
    )
    assert mp.data.basis_kind == "spline"
    assert mp.data.spline_n_basis == NB
    assert mp.data.mu_nu.shape == (NG, NB + 1)
    fit = PhaseFitModel(
        mp, condition_on={"phi": jnp.asarray(sim["t"])}, num_samples=8,
        n_per_bin=8,
    )
    fit.fit(num_steps=1000, key=jax.random.PRNGKey(0))
    return fit


def test_phase_spline_recovers_expression_field(sim, phase_fit):
    nu_hat = phase_fit.params["nu_locs"]
    corr = np.corrcoef(
        (nu_hat @ sim["B"].T).ravel(), sim["ElogS"].ravel()
    )[0, 1]
    assert corr > 0.97, corr


def test_phase_spline_posterior_and_extraction(sim, phase_fit):
    post = phase_fit.posterior
    assert "nu" in post and post["nu"].shape[1:] == (NG, NB + 1)
    # conditioned phi: the posterior Phases falls back to the prior angles
    np.testing.assert_allclose(
        np.mod(phase_fit.phase_fit.phis, 2 * np.pi),
        np.mod(sim["t"], 2 * np.pi), atol=1e-4,
    )
    assert "phi_xy" not in post  # spline path has no S^1 2-vector site


def test_phase_spline_learns_phi_when_unconditioned(sim):
    """Without conditioning, phi is learned via interval-constrained Deltas
    initialized at the prior — check it stays in-domain and improves ELBO."""
    cyc = Cycle.spline_prior(sim["genes"], n_basis=NB, means=0.0, stds=3.0)
    # prior: true pseudotime corrupted by noise
    rng = np.random.default_rng(1)
    noisy = np.clip(
        sim["t"] + rng.normal(0, 0.05, NC).astype(np.float32), 0.0, 1.0
    )
    ph = Phases.from_angles(noisy, cell_names=sim["cells"])
    mp = preprocess_for_phase_estimation(
        sim["adata"], cyc, ph, noisemodel="Poisson", with_delta_nu=False,
        basis_kind="spline", spline_domain=(0.0, 1.0),
    )
    fit = PhaseFitModel(mp, get_posterior=False)
    fit.fit(num_steps=600, key=jax.random.PRNGKey(2))
    phi_hat = np.asarray(fit.params["phi_locs"]).reshape(-1)
    assert phi_hat.min() >= 0.0 and phi_hat.max() <= 1.0
    # learned pseudotime should track truth better than chance
    corr = np.corrcoef(phi_hat, sim["t"])[0, 1]
    assert corr > 0.9, corr


def test_velocity_spline_recovers_kinetics(sim, phase_fit):
    nu_hat = phase_fit.params["nu_locs"]
    cyc_fit = Cycle.from_array(
        nu_hat.T, phase_fit.params["nu_scales"].T, sim["genes"]
    )
    ph = Phases.from_angles(sim["t"], cell_names=sim["cells"])
    speed_prior = AngularSpeed.from_array(
        np.array([[0.0]]), np.array([[1.0]]),
        condition_names=["cond"], num_coeffs=1,
    )
    mpv = preprocess_for_velocity_estimation(
        sim["adata"], cyc_fit, ph, speed_prior, noisemodel="Poisson",
        with_delta_nu=False, model_type="fourier",
        basis_kind="spline", spline_domain=(0.0, 1.0),
        mu_gamma=MU_GAMMA, mu_beta=MU_BETA,
    )
    assert mpv.data.Nhw == 1
    vfit = VelocityFitModel(
        mpv,
        condition_on={
            "phi": jnp.asarray(sim["t"]), "nu": jnp.asarray(nu_hat),
        },
        get_posterior=False,
    )
    vfit.fit(num_steps=3000, key=jax.random.PRNGKey(1))
    omega_hat = float(vfit.speed_fit.means_array.squeeze())
    corr_g = np.corrcoef(
        vfit.cycle_fit.log_gammas, np.log(sim["gamma"])
    )[0, 1]
    corr_b = np.corrcoef(
        vfit.cycle_fit.log_betas, np.log(sim["beta"])
    )[0, 1]
    assert corr_g > 0.7, corr_g
    assert corr_b > 0.7, corr_b
    # the likelihood is exactly invariant under (omega, gamma, beta) ->
    # (c*omega, c*gamma, c*beta); only the priors pin c, and SVI can stall
    # on that flat ridge — so test the *identifiable* combination:
    # omega corrected by the fitted-vs-true gamma scale.
    shift = np.mean(np.log(sim["gamma"])) - np.mean(vfit.cycle_fit.log_gammas)
    omega_corrected = omega_hat * np.exp(shift)
    assert 0.6 * OMEGA_TRUE < omega_corrected < 1.6 * OMEGA_TRUE, (
        omega_hat, omega_corrected
    )
    # period = integral of 1/omega over the domain, in domain units
    period = vfit.period_hours(n_grid=200)
    np.testing.assert_allclose(period, 1.0 / omega_hat, rtol=1e-3)
