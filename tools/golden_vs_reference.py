"""Golden-number cross-validation against the reference Pyro implementation.

SURVEY §4(c) / BASELINE acceptance: posterior moments of the JAX phase fit
must match a reference Pyro+ClippedAdam SVI fit of the *same simulated
dataset* within Monte-Carlo error.  This script has two halves:

  produce  — run the reference implementation (`/root/reference/build/lib/
             velocycle`, the released code; the working tree has a syntax
             error, SURVEY §0) on a `velocycle_tpu.simulate.simulate_data`
             dataset and write the posterior moments to
             `tests/golden/reference_phase_fit.npz`.  Requires torch +
             pyro (+ the reference mount); prints a skip message when any
             is missing instead of failing.
  compare  — run the JAX fit on the identical dataset and report
             moment agreement vs the committed artifact.

`tests/test_golden.py` runs the compare half whenever the artifact exists.
Two producers exist:
  * this module's `produce` — the actual reference code under pyro
    (needs a pyro environment);
  * `tools/reference_torch_fit.py` — the reference model + guide
    replicated site-for-site in raw torch.distributions, float64
    (runs on this rig: torch is installed, pyro is not).  This produced
    the committed artifact; agreement of the JAX fit with it:
    phi circular corr 0.9994, nu RMSE 0.019, nu-sd median ratio 0.984.

Reference entry points exercised: `preprocessing.preprocess_for_phase_
estimation` (reference preprocessing.py:103) and `PhaseFitModel.fit`
(reference phase_inference_model.py:81-341).

Usage:  python tools/golden_vs_reference.py [produce|compare|both]
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_LIB = "/root/reference/build/lib"
ARTIFACT = os.path.join(REPO, "tests", "golden", "reference_phase_fit.npz")
VELOCITY_ARTIFACT = os.path.join(
    REPO, "tests", "golden", "reference_velocity_fit.npz"
)
sys.path.insert(0, REPO)

# Small but informative config: big enough that posterior moments are tight,
# small enough that the Pyro fit runs in ~a minute on CPU.
NC, NG, SEED, HARMONICS = 400, 60, 123, 1
NUM_STEPS = 3000
# Fit noise floor: two SVI runs of the SAME implementation with different
# seeds differ by about this much (Monte-Carlo + optimizer error); the
# cross-implementation tolerance is a small multiple of it.
PHI_CIRC_CORR_MIN = 0.97     # posterior-mean phases, circular corr
NU_RMSE_MAX = 0.15           # posterior-mean harmonics, RMSE (prior sd 0.5)
NU_SD_RATIO_TOL = 0.5        # posterior sds agree within 50% in the median

# -- velocity stage (BASELINE: "angular velocity" posterior) ----------------
# Same dataset; the two-stage workflow conditions the velocity model on the
# PHASE-STAGE golden artifact (nu, phi_xy, shape_inv), mirroring the
# tutorials' conditioning dict (reference tutorial cell 39).  Free sites:
# log_gamma, log_beta, nu_omega (mean-field guide,
# `velocity_inference_guide.py:9-63`).
VELO_NUM_STEPS = 6000
OMEGA_HARMONICS = 1                         # periodic omega, Nhw = 3
LOG_GAMMA_CORR_MIN = 0.95    # per-gene degradation rates, Pearson corr
LOG_GAMMA_RMSE_MAX = 0.15    # posterior means (prior sd 0.5)
LOG_BETA_RMSE_MAX = 0.25     # posterior means (prior sd 3.0)
NU_OMEGA_ABS_MAX = 0.05      # angular-speed coefficients, abs diff
VELO_SD_RATIO_TOL = 0.5      # posterior sds agree within 50% in the median


def make_dataset():
    """The shared dataset: deterministic, identical for both halves."""
    from velocycle_tpu.simulate import simulate_data

    return simulate_data(Nc=NC, Ng=NG, omegas_to_test=(0.4,), seed=SEED)


def _priors(adata):
    rng = np.random.default_rng(0)
    nu = np.asarray(adata.uns["simulated_nu"])
    nu_means = (nu + rng.normal(0, 0.2, nu.shape)).T        # (3, Ng)
    nu_stds = np.full((2 * HARMONICS + 1, NG), 0.5)
    phi_init = (np.asarray(adata.obs["simulated_phis"].values)
                + rng.normal(0, 0.4, NC))
    return nu_means, nu_stds, phi_init


def produce():
    try:
        import torch  # noqa: F401
        import pyro  # noqa: F401
    except ImportError as e:
        print(f"SKIP produce: reference runtime unavailable ({e}). "
              "Run this half in an environment with torch+pyro "
              "(reference requirements.txt pins pyro-ppl 1.8.6 / "
              "torch 2.1.1) and commit the artifact.")
        return False
    if not os.path.isdir(REFERENCE_LIB):
        print(f"SKIP produce: reference mount missing at {REFERENCE_LIB}")
        return False
    sys.path.insert(0, REFERENCE_LIB)
    import scipy.sparse as sp
    import torch
    import pyro
    from velocycle.cycle import Cycle as RefCycle
    from velocycle.phases import Phases as RefPhases
    from velocycle.preprocessing import preprocess_for_phase_estimation
    from velocycle.phase_inference_model import PhaseFitModel as RefFit

    adata = make_dataset()
    nu_means, nu_stds, phi_init = _priors(adata)
    # the reference reads sparse layers via .A (reference
    # preprocessing.py:142-143); AnnDataLite duck-types the rest
    for name in ("spliced", "unspliced"):
        adata.layers[name] = sp.csr_matrix(np.asarray(adata.layers[name]))

    genes = list(adata.var.index)
    cyc = RefCycle.from_array(nu_means, gene_names=genes)
    cyc.set_stds(nu_stds)
    ph = RefPhases.from_array(
        np.stack([np.cos(phi_init), np.sin(phi_init)]) * 2.0,
        cell_names=list(adata.obs.index),
    )
    pyro.clear_param_store()
    torch.manual_seed(0)
    mp = preprocess_for_phase_estimation(
        adata, cyc, ph, design_mtx=None, n_harmonics=HARMONICS,
        with_delta_nu=False,
    )
    fit = RefFit(mp)
    fit.fit(pyro.optim.ClippedAdam({
        "lr": 0.05, "betas": (0.80, 0.99),
        "lrd": 0.1 ** (1 / NUM_STEPS), "clip_norm": 10.0,
    }), num_steps=NUM_STEPS)
    post = fit.posterior
    np.savez(
        ARTIFACT,
        nu_mean=np.asarray(post["ν"].mean(0).squeeze()),
        nu_sd=np.asarray(post["ν"].std(0).squeeze()),
        phi_mean_angle=np.arctan2(
            *np.asarray(post["ϕxy"].mean(0).squeeze()).T[::-1]),
        shape_inv_mean=np.asarray(post["shape_inv"].mean(0).squeeze()),
        config=np.array([NC, NG, SEED, HARMONICS, NUM_STEPS]),
    )
    print(f"wrote {ARTIFACT}")
    return True


def run_jax_fit():
    import jax

    from velocycle_tpu import (
        Cycle, Phases, PhaseFitModel, preprocess_for_phase_estimation,
    )

    adata = make_dataset()
    nu_means, nu_stds, phi_init = _priors(adata)
    cycle = Cycle.from_array(nu_means, nu_stds, list(adata.var.index))
    phases = Phases.from_angles(phi_init, concentration=2.0,
                                cell_names=list(adata.obs.index))
    mp = preprocess_for_phase_estimation(
        adata, cycle, phases, n_harmonics=HARMONICS, with_delta_nu=False,
    )
    fit = PhaseFitModel(mp, num_samples=200, n_per_bin=100)
    fit.fit(num_steps=NUM_STEPS, key=jax.random.PRNGKey(0))
    post = fit.posterior
    return {
        "nu_mean": np.asarray(post["nu"]).mean(0),
        "nu_sd": np.asarray(post["nu"]).std(0),
        "phi_mean_angle": np.asarray(fit.phase_fit.phis),
        "shape_inv_mean": np.asarray(post["shape_inv"]).mean(0).squeeze(),
    }


def velocity_conditioning():
    """Stage-2 conditioning values from the committed PHASE artifact —
    identical for both halves (the tutorials condition stage 2 on stage-1
    point estimates; here the shared point estimates are the golden phase
    fit itself, so the velocity comparison is independent of which runtime
    produced them)."""
    ref = np.load(ARTIFACT)
    phi = np.asarray(ref["phi_mean_angle"], np.float64)
    phi_xy = 2.0 * np.stack([np.cos(phi), np.sin(phi)], axis=-1)  # (Nc, 2)
    return {
        "nu": np.asarray(ref["nu_mean"], np.float64),             # (Ng, Nh)
        "phi_xy": phi_xy,
        "shape_inv": np.asarray(ref["shape_inv_mean"], np.float64),
    }


def make_velocity_metapars():
    """Shared `Metapars` for the velocity stage (both halves read the same
    arrays out of it)."""
    from velocycle_tpu import (
        AngularSpeed, Cycle, Phases, preprocess_for_velocity_estimation,
    )

    adata = make_dataset()
    nu_means, nu_stds, _ = _priors(adata)
    cond = velocity_conditioning()
    cycle = Cycle.from_array(nu_means, nu_stds, list(adata.var.index))
    phases = Phases.from_angles(
        np.arctan2(cond["phi_xy"][:, 1], cond["phi_xy"][:, 0]),
        concentration=2.0, cell_names=list(adata.obs.index),
    )
    speed = AngularSpeed.trivial_prior(
        ["c0"], harmonics=OMEGA_HARMONICS, means=0.2, stds=0.5
    )
    mp = preprocess_for_velocity_estimation(
        adata, cycle, phases, speed, n_harmonics=HARMONICS,
        omega_n_harmonics=OMEGA_HARMONICS, with_delta_nu=False,
        model_type="fourier",
    )
    return mp, cond


def run_jax_velocity_fit():
    import jax

    from velocycle_tpu import VelocityFitModel

    mp, cond = make_velocity_metapars()
    fit = VelocityFitModel(
        mp,
        condition_on={
            "nu": cond["nu"].astype(np.float32),
            "phi_xy": cond["phi_xy"].astype(np.float32),
            "shape_inv": cond["shape_inv"].astype(np.float32),
        },
        num_samples=200, n_per_bin=100,
    )
    fit.fit(num_steps=VELO_NUM_STEPS, key=jax.random.PRNGKey(0))
    p = fit.params
    return {
        "log_gamma_mean": np.asarray(p["log_gamma_locs"]),
        "log_gamma_sd": np.asarray(p["log_gamma_scales"]),
        "log_beta_mean": np.asarray(p["log_beta_locs"]),
        "log_beta_sd": np.asarray(p["log_beta_scales"]),
        "nu_omega_mean": np.asarray(p["nu_omega_locs"]).reshape(-1),
        "nu_omega_sd": np.asarray(p["nu_omega_scales"]).reshape(-1),
    }


def compare_velocity(jax_moments=None, verbose=True):
    """Velocity-stage golden comparison: posterior moments of log_gamma,
    log_beta and nu_omega vs the committed torch-f64 reference artifact."""
    ref = np.load(VELOCITY_ARTIFACT)
    want = [NC, NG, SEED, HARMONICS, OMEGA_HARMONICS, VELO_NUM_STEPS]
    assert list(ref["config"]) == want, (
        f"artifact built for config {list(ref['config'])}, "
        f"harness is {want} — re-produce it")
    ours = jax_moments if jax_moments is not None else run_jax_velocity_fit()

    lg_corr = float(np.corrcoef(
        ours["log_gamma_mean"], ref["log_gamma_mean"])[0, 1])
    lg_rmse = float(np.sqrt(np.mean(
        (ours["log_gamma_mean"] - ref["log_gamma_mean"]) ** 2)))
    lb_rmse = float(np.sqrt(np.mean(
        (ours["log_beta_mean"] - ref["log_beta_mean"]) ** 2)))
    nw_abs = float(np.max(np.abs(
        ours["nu_omega_mean"] - ref["nu_omega_mean"])))
    sd_ratios = np.concatenate([
        ours["log_gamma_sd"] / np.maximum(ref["log_gamma_sd"], 1e-9),
        ours["log_beta_sd"] / np.maximum(ref["log_beta_sd"], 1e-9),
        ours["nu_omega_sd"] / np.maximum(ref["nu_omega_sd"], 1e-9),
    ])
    sd_ratio = float(np.median(sd_ratios))
    metrics = {
        "log_gamma_corr": lg_corr, "log_gamma_rmse": lg_rmse,
        "log_beta_rmse": lb_rmse, "nu_omega_max_abs_diff": nw_abs,
        "sd_median_ratio": sd_ratio,
    }
    if verbose:
        for k, v in metrics.items():
            print(f"  {k}: {v:.4f}")
    assert lg_corr > LOG_GAMMA_CORR_MIN, metrics
    assert lg_rmse < LOG_GAMMA_RMSE_MAX, metrics
    assert lb_rmse < LOG_BETA_RMSE_MAX, metrics
    assert nw_abs < NU_OMEGA_ABS_MAX, metrics
    assert abs(np.log(sd_ratio)) < np.log(1 + VELO_SD_RATIO_TOL), metrics
    return metrics


def compare(jax_moments=None, verbose=True):
    """Compare the JAX fit against the committed reference artifact.

    Returns a dict of metrics; raises AssertionError on disagreement
    beyond MC error.
    """
    from velocycle_tpu.ops.circular import circular_corrcoef

    ref = np.load(ARTIFACT)
    want = [NC, NG, SEED, HARMONICS, NUM_STEPS]
    assert list(ref["config"]) == want, (
        f"artifact built for config {list(ref['config'])}, "
        f"harness is {want} — re-produce it")
    ours = jax_moments if jax_moments is not None else run_jax_fit()

    cc = float(circular_corrcoef(ours["phi_mean_angle"],
                                 ref["phi_mean_angle"]))
    nu_rmse = float(np.sqrt(np.mean(
        (ours["nu_mean"] - ref["nu_mean"]) ** 2)))
    sd_ratio = np.median(ours["nu_sd"] / np.maximum(ref["nu_sd"], 1e-9))
    metrics = {"phi_circ_corr": cc, "nu_rmse": nu_rmse,
               "nu_sd_median_ratio": float(sd_ratio)}
    if verbose:
        for k, v in metrics.items():
            print(f"  {k}: {v:.4f}")
    assert cc > PHI_CIRC_CORR_MIN, metrics
    assert nu_rmse < NU_RMSE_MAX, metrics
    assert abs(np.log(sd_ratio)) < np.log(1 + NU_SD_RATIO_TOL), metrics
    return metrics


def main(argv):
    mode = argv[1] if len(argv) > 1 else "both"
    if mode in ("produce", "both"):
        produce()
    if mode in ("compare", "both"):
        if os.path.exists(ARTIFACT):
            compare()
            print("phase golden comparison PASSED")
        else:
            print(f"SKIP compare: no artifact at {ARTIFACT} "
                  "(produce it in a pyro environment first)")
        if os.path.exists(VELOCITY_ARTIFACT):
            compare_velocity()
            print("velocity golden comparison PASSED")
        else:
            print(f"SKIP compare: no artifact at {VELOCITY_ARTIFACT} "
                  "(python tools/reference_torch_fit.py velocity)")


if __name__ == "__main__":
    main(sys.argv)
