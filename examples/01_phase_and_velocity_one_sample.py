"""Canonical one-sample workflow (mirrors
`tutorials/Tutorial_Capolupo_HumanFibroblasts_OneSample.ipynb`):

  simulate counts (tutorial datasets are external downloads) ->
  manifold-learning (phase fit) -> orientation checks ->
  velocity-learning, constant omega -> velocity-learning, periodic omega
  -> cell-cycle period.

Run: python examples/01_phase_and_velocity_one_sample.py
"""
import numpy as np
import jax

from velocycle_tpu import (
    AngularSpeed, Cycle, Phases, PhaseFitModel, VelocityFitModel,
    preprocess_for_phase_estimation, preprocess_for_velocity_estimation,
)
from velocycle_tpu.ops.circular import circular_corrcoef
from velocycle_tpu.simulate import simulate_data

from _smoke import sz

NC, NG = sz(300, 64), sz(80, 24)


def main():
    # -- data (stand-in for the fibroblast AnnData) -----------------------
    adata = simulate_data(Nc=NC, Ng=NG, omegas_to_test=(0.4,), seed=11)
    true_phis = adata.obs["simulated_phis"].values

    # -- priors: curated cycle coefficients + PCA-like phase init ---------
    rng = np.random.default_rng(0)
    nu = adata.uns["simulated_nu"]
    cycle_prior = Cycle.from_array(
        (nu + rng.normal(0, 0.2, nu.shape)).T,
        np.full((3, NG), 0.5),
        list(adata.var.index),
    )
    phase_prior = Phases.from_angles(
        true_phis + rng.normal(0, 0.4, NC), concentration=2.0,
        cell_names=list(adata.obs.index),
    )

    # -- stage 1: manifold-learning ---------------------------------------
    mp = preprocess_for_phase_estimation(
        adata, cycle_prior, phase_prior, n_harmonics=1,
        with_delta_nu=False,
    )
    pfit = PhaseFitModel(mp, num_samples=100, n_per_bin=100)
    pfit.fit(num_steps=sz(2000, 40), key=jax.random.PRNGKey(0))
    cc = float(circular_corrcoef(pfit.phase_fit.phis, true_phis))
    print(f"phase fit: ELBO {pfit.losses[0]:.0f} -> {pfit.losses[-1]:.0f}, "
          f"circular corr vs truth {cc:.3f}")
    from _figs import fig_elbo, fig_phase_scatter, fig_polar
    fig_elbo(pfit.losses, "one_sample_elbo.png", "phase fit ELBO")
    fig_phase_scatter(pfit.phase_fit.phis, true_phis,
                      "one_sample_phase_scatter.png")
    fig_polar(pfit, "one_sample_polar.png")

    # -- stage 2a: velocity with constant omega ---------------------------
    speed_prior = AngularSpeed.trivial_prior(
        ["sample"], harmonics=0, means=0.3, stds=0.5
    )
    vp = preprocess_for_velocity_estimation(
        adata, pfit.cycle_fit, pfit.phase_fit, speed_prior,
        n_harmonics=1, with_delta_nu=False, model_type="fourier",
    )
    condition_on = {
        "phi_xy": vp.data.phixy_prior,
        "nu": vp.data.mu_nu,
        "shape_inv": pfit.disp,
    }
    vfit = VelocityFitModel(vp, condition_on=condition_on,
                            get_posterior=False)
    vfit.fit(num_steps=sz(3000, 40), key=jax.random.PRNGKey(1))
    omega = float(vfit.speed_fit.means.iloc[0, 0])
    print(f"constant-omega fit: omega {omega:.3f} (simulated 0.4), "
          f"period {vfit.period_hours()[0]:.1f} rad-units")

    # -- stage 2b: periodic omega (H=1 speed harmonics) -------------------
    speed_prior_p = AngularSpeed.trivial_prior(
        ["sample"], harmonics=1, means=omega, stds=0.005
    )
    vp2 = preprocess_for_velocity_estimation(
        adata, pfit.cycle_fit, pfit.phase_fit, speed_prior_p,
        n_harmonics=1, with_delta_nu=False, model_type="fourier",
    )
    vfit2 = VelocityFitModel(vp2, condition_on=condition_on,
                             get_posterior=False)
    vfit2.fit(num_steps=sz(3000, 40), key=jax.random.PRNGKey(2))
    print("periodic-omega coefficients:")
    print(vfit2.speed_fit.means)
    print(f"period (trapz of 1/omega): {vfit2.period_hours()[0]:.2f}")


if __name__ == "__main__":
    main()
