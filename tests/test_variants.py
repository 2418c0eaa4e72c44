"""Ground-truth tests for the previously-untested variants (round-1 gaps):

  * LBA: the analytic Bernoulli mixture must separate periodic from flat
    genes (reference enumeration semantics,
    `/root/reference/velocycle/phase_inference_model.py:397-456`).
  * LRMN: the structured guide's conditional-Normal regression must
    reproduce the per-gene gamma-beta correlation rho it encodes
    (`velocity_inference_guide.py:109-126`).
  * Determinism: same key => bit-identical fits; mid-fit posterior
    snapshots (store_output) and plate checking.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from velocycle_tpu import (
    AngularSpeed, Cycle, Phases, PhaseFitModel,
    preprocess_for_phase_estimation, preprocess_for_velocity_estimation,
)
from velocycle_tpu.core import handlers
from velocycle_tpu.simulate import simulate_data


# ---------------------------------------------------------------------------
# LBA: periodic-vs-flat gene separation
# ---------------------------------------------------------------------------

def _lba_sim(Ng=40, Nc=200, n_flat=20, seed=0):
    """NB counts where the first Ng-n_flat genes are periodic (strong first
    harmonic) and the last n_flat are constant."""
    rng = np.random.default_rng(seed)
    phis = rng.uniform(0, 2 * np.pi, Nc)
    nu = np.zeros((Ng, 3), np.float32)
    nu[:, 0] = rng.normal(2.0, 0.3, Ng)
    amp = rng.uniform(0.8, 1.5, Ng)
    theta = rng.uniform(0, 2 * np.pi, Ng)
    nu[:-n_flat, 1] = (amp * np.cos(theta))[:-n_flat]
    nu[:-n_flat, 2] = (amp * np.sin(theta))[:-n_flat]
    zeta = np.stack([np.ones_like(phis), np.cos(phis), np.sin(phis)], 1)
    mu = np.exp(nu @ zeta.T)
    r = 0.3
    lam = rng.gamma(1.0 / r, r * mu)
    S = rng.poisson(lam).astype(np.float32)

    from velocycle_tpu.anndata_lite import AnnDataLite
    import pandas as pd

    genes = [f"g{i}" for i in range(Ng)]
    cells = [f"c{i}" for i in range(Nc)]
    adata = AnnDataLite(
        X=S.T, obs=pd.DataFrame(index=cells), var=pd.DataFrame(index=genes),
        layers={"spliced": S.T, "unspliced": S.T},
    )
    return adata, phis, nu, n_flat


@pytest.mark.slow
def test_lba_separates_periodic_from_flat():
    adata, phis, true_nu, n_flat = _lba_sim()
    Ng = true_nu.shape[0]
    genes = list(adata.var.index)
    cycle = Cycle.from_array(
        true_nu.T * 0.0, np.full((3, Ng), 1.0), genes
    )
    phases = Phases.from_angles(
        phis, concentration=5.0, cell_names=list(adata.obs.index)
    )
    mp = preprocess_for_phase_estimation(
        adata, cycle, phases, n_harmonics=1, with_delta_nu=False,
        gene_selection_model="lba",
    )
    fit = PhaseFitModel(mp, num_samples=20, n_per_bin=20)
    fit.fit(num_steps=800, key=jax.random.PRNGKey(0))

    periodic = fit.posterior["periodic"].mean(0)  # (Ng,)
    p_periodic = periodic[: Ng - n_flat]
    p_flat = periodic[Ng - n_flat:]
    # posterior membership separates the two classes
    assert p_periodic.mean() > 0.8, p_periodic.mean()
    assert p_flat.mean() < 0.4, p_flat.mean()
    assert p_periodic.mean() - p_flat.mean() > 0.5


# ---------------------------------------------------------------------------
# LRMN: the beta|gamma conditional regression encodes rho
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_lrmn_guide_gamma_beta_correlation():
    """Draw many guide samples at fixed params and check the empirical
    per-gene corr(log_gamma, log_beta) matches rho(rho_real) =
    1.998*sigmoid(rho_real/rho_scale) - 0.999."""
    adata = simulate_data(Nc=60, Ng=12, omegas_to_test=(0.4,), seed=1)
    genes = list(adata.var.index)
    cycle = Cycle.trivial_prior(genes, harmonics=1)
    phases = Phases.from_angles(
        np.asarray(adata.obs["simulated_phis"].values),
        cell_names=list(adata.obs.index),
    )
    speed = AngularSpeed.trivial_prior(["c"], harmonics=0)
    mp = preprocess_for_velocity_estimation(
        adata, cycle, phases, speed, n_harmonics=1,
        with_delta_nu=False, model_type="lrmn",
    )
    from velocycle_tpu.infer.svi import init_params, constrain

    key = jax.random.PRNGKey(0)
    params, cons = init_params(mp.guide_fn, key, mp.data)
    constrained = constrain(params, cons)
    # plant a known spread of rho_real values across genes
    rho_real = np.linspace(-3.0, 3.0, mp.Ng).astype(np.float32)
    constrained["rho_real_loc"] = jnp.asarray(rho_real)
    # give gamma real variance so the regression has signal
    constrained["cov_diag"] = jnp.ones_like(constrained["cov_diag"])

    def draw(k):
        g = handlers.substitute(mp.guide_fn, data=constrained)
        tr = handlers.trace(handlers.seed(g, k)).get_trace(mp.data)
        return tr["log_gamma"]["value"], tr["log_beta"]["value"]

    keys = jax.random.split(jax.random.PRNGKey(1), 3000)
    lg, lb = jax.vmap(draw)(keys)  # (3000, Ng) each
    lg, lb = np.asarray(lg), np.asarray(lb)
    emp = np.array([
        np.corrcoef(lg[:, i], lb[:, i])[0, 1] for i in range(mp.Ng)
    ])
    rho_target = 1.998 / (1.0 + np.exp(-rho_real)) - 0.999
    np.testing.assert_allclose(emp, rho_target, atol=0.08)


# ---------------------------------------------------------------------------
# determinism + observability
# ---------------------------------------------------------------------------

def _small_fit(num_steps=60, store_output=False, **fit_kw):
    adata = simulate_data(Nc=80, Ng=20, omegas_to_test=(0.4,), seed=2)
    cycle = Cycle.trivial_prior(list(adata.var.index), harmonics=1)
    phases = Phases.from_angles(
        np.asarray(adata.obs["simulated_phis"].values),
        cell_names=list(adata.obs.index),
    )
    mp = preprocess_for_phase_estimation(
        adata, cycle, phases, n_harmonics=1, with_delta_nu=False,
    )
    fit = PhaseFitModel(mp, num_samples=4, n_per_bin=4)
    fit.fit(num_steps=num_steps, key=jax.random.PRNGKey(7),
            store_output=store_output, **fit_kw)
    return fit


@pytest.mark.slow
def test_fit_bit_reproducible():
    """Two identical fits (same key) must agree bit-for-bit — losses and
    every extracted parameter (the determinism claim in fit.py:17)."""
    f1 = _small_fit()
    f2 = _small_fit()
    np.testing.assert_array_equal(f1.losses, f2.losses)
    for k in f1.params:
        np.testing.assert_array_equal(f1.params[k], f2.params[k])


def test_store_output_snapshots():
    fit = _small_fit(num_steps=60, store_output=True,
                     intermediate_output_step_size=20,
                     store_num_samples=3)
    snaps = fit.intermediate_output
    assert len(snaps) == 3  # steps 20, 40, 60
    assert [s["step"] for s in snaps] == [20, 40, 60]
    assert snaps[0]["nu"].shape[0] == 3
    assert np.isfinite(snaps[-1]["phi"]).all()


def test_check_model_plate_shapes_clean():
    fit = _small_fit(num_steps=1)
    assert fit.check_model() == []
    assert fit.check_guide() == []


def test_check_plate_shapes_catches_mismatch():
    from velocycle_tpu.core import distributions as dist

    def bad_model():
        with handlers.plate("genes", 7, dim=-1):
            handlers.sample("x", dist.Normal(jnp.zeros(5), 1.0))

    problems = handlers.check_plate_shapes(bad_model)
    assert len(problems) == 1
    assert "plate 'genes'" in problems[0]
