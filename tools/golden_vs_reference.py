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
            print("golden comparison PASSED")
        else:
            print(f"SKIP compare: no artifact at {ARTIFACT} "
                  "(produce it in a pyro environment first)")


if __name__ == "__main__":
    main(sys.argv)
