"""Minibatched / streaming SVI (infer.minibatch).

Checks, in order of strength:
  * the blockwise objective is EXACT: the average of scaled block losses
    over one epoch equals the full-batch ELBO for fixed parameter values
    (phase and velocity families);
  * num_blocks=1 reproduces the full-batch `SVI` path step for step
    (same losses, same params) — the masked ClippedAdam matches the optax
    `clipped_adam` chain;
  * a 4-block minibatch fit recovers simulated phases;
  * the host-streaming path (`fit_streamed` + `iter_host_blocks`) is
    bit-identical to the on-device block fit.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from velocycle_tpu import (
    AngularSpeed, Cycle, Phases,
    preprocess_for_phase_estimation, preprocess_for_velocity_estimation,
)
from velocycle_tpu.core import handlers
from velocycle_tpu.infer import (
    SVI, Trace_ELBO, clipped_adam, MinibatchSVI, split_cells,
    iter_host_blocks,
)
from velocycle_tpu.infer.minibatch import LOCAL_SITES
from velocycle_tpu.ops.circular import circular_corrcoef
from velocycle_tpu.simulate import simulate_data


pytestmark = pytest.mark.slow  # heavy fits/samplers: fast lane skips this module

NC, NG, NBLK = 120, 40, 4


@pytest.fixture(scope="module")
def sim():
    return simulate_data(Nc=NC, Ng=NG, omegas_to_test=(0.4,),
                         key=jax.random.PRNGKey(42))


@pytest.fixture(scope="module")
def phase_mp(sim):
    adata = sim
    rng = np.random.default_rng(0)
    true_nu = adata.uns["simulated_nu"]
    cycle = Cycle.from_array(
        (true_nu + rng.normal(0, 0.2, true_nu.shape)).T,
        np.full((3, NG), 0.5), list(adata.var.index),
    )
    init = adata.obs["simulated_phis"].values + rng.normal(0, 0.3, NC)
    phases = Phases.from_angles(init, concentration=2.0,
                                cell_names=list(adata.obs.index))
    return preprocess_for_phase_estimation(
        adata, cycle, phases, n_harmonics=1, with_delta_nu=False,
    )


def _fixed_values(model_or_guide, data, key):
    tr = handlers.trace(
        handlers.seed(model_or_guide, key)
    ).get_trace(data)
    return {
        n: s["value"] for n, s in tr.items() if s["type"] == "sample"
    }


def _scaled(fn, s):
    def wrapped(*a, **kw):
        with handlers.scale(scale_factor=s,
                            site_filter=LOCAL_SITES.__contains__):
            return fn(*a, **kw)
    return wrapped


def _loss_with_values(model, guide, data, values, key):
    m = handlers.substitute(model, data=values)
    g = handlers.substitute(guide, data=values)
    return float(Trace_ELBO().loss(key, m, g, data))


def _block_loss_with_values(model, guide, block, values, key, nblk):
    m = _scaled(handlers.substitute(model, data=values), float(nblk))
    g = _scaled(handlers.substitute(guide, data=values), float(nblk))
    return float(Trace_ELBO().loss(key, m, g, block))


def test_block_objective_exact_phase(phase_mp):
    mp = phase_mp
    key = jax.random.PRNGKey(1)
    vals = _fixed_values(mp.guide_fn, mp.data, key)
    full = _loss_with_values(mp.model_fn, mp.guide_fn, mp.data, vals, key)
    blocks = split_cells(mp.data, NBLK)
    B = NC // NBLK
    total = 0.0
    for i, blk in enumerate(blocks):
        v = dict(vals)
        v["phi_xy"] = vals["phi_xy"][i * B:(i + 1) * B]
        total += _block_loss_with_values(
            mp.model_fn, mp.guide_fn, blk, v, key, NBLK
        )
    assert np.isclose(total / NBLK, full, rtol=1e-5), (total / NBLK, full)


def test_block_objective_exact_velocity(sim, phase_mp):
    adata = sim
    speed = AngularSpeed.trivial_prior(["cond"], harmonics=0,
                                       means=0.3, stds=0.5)
    mp = preprocess_for_velocity_estimation(
        adata, phase_mp.cycle_prior, phase_mp.phase_prior, speed,
        n_harmonics=1, with_delta_nu=False, model_type="fourier",
    )
    key = jax.random.PRNGKey(2)
    vals = _fixed_values(mp.guide_fn, mp.data, key)
    full = _loss_with_values(mp.model_fn, mp.guide_fn, mp.data, vals, key)
    blocks = split_cells(mp.data, NBLK)
    B = NC // NBLK
    total = 0.0
    for i, blk in enumerate(blocks):
        v = dict(vals)
        v["phi_xy"] = vals["phi_xy"][i * B:(i + 1) * B]
        total += _block_loss_with_values(
            mp.model_fn, mp.guide_fn, blk, v, key, NBLK
        )
    assert np.isclose(total / NBLK, full, rtol=1e-5), (total / NBLK, full)


def test_single_block_matches_full_batch_svi(phase_mp):
    mp = phase_mp
    key = jax.random.PRNGKey(3)

    svi = SVI(mp.model_fn, mp.guide_fn, clipped_adam(lr=0.05), Trace_ELBO())
    state_full = svi.init(key, mp.data)

    mb = MinibatchSVI(mp.model_fn, mp.guide_fn, num_blocks=1, lr=0.05)
    state_mb = mb.init(key, mp.data)
    (block,) = split_cells(mp.data, 1)

    for _ in range(5):
        state_full, loss_full = svi.update(state_full, mp.data)
        state_mb, loss_mb = mb.update_block(
            state_mb, jnp.asarray(0, jnp.int32), block
        )
        assert np.isclose(float(loss_full), float(loss_mb), rtol=1e-5)
    for name, p in svi.get_params(state_full).items():
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(mb.get_params(state_mb)[name]),
            rtol=1e-4, atol=1e-6, err_msg=name,
        )


def test_minibatch_fit_recovers_phases(sim, phase_mp):
    mp = phase_mp
    mb = MinibatchSVI(mp.model_fn, mp.guide_fn, num_blocks=NBLK, lr=0.05)
    state, losses = mb.fit(jax.random.PRNGKey(0), mp.data, num_epochs=400)
    assert np.isfinite(losses).all()
    # per-step losses are block estimates of the full ELBO; epoch means
    # must improve
    assert losses[-NBLK:].mean() < losses[:NBLK].mean() - 100
    locs = np.asarray(mb.get_params(state)["phixy_locs"])
    est_phis = np.arctan2(locs[:, 1], locs[:, 0])
    true_phis = sim.obs["simulated_phis"].values[:NC]
    cc = float(circular_corrcoef(est_phis, true_phis))
    assert cc > 0.75, f"circular corr {cc}"


def test_streamed_fit_matches_on_device(phase_mp):
    mp = phase_mp
    key = jax.random.PRNGKey(4)

    mb1 = MinibatchSVI(mp.model_fn, mp.guide_fn, num_blocks=NBLK)
    s1, l1 = mb1.fit(key, mp.data, num_epochs=3, shuffle=False)

    S = np.asarray(mp.data.S)
    cf = np.asarray(mp.data.count_factor)
    pp = np.asarray(mp.data.phixy_prior)
    logS = np.asarray(mp.data.logS)
    Db = np.asarray(mp.data.Db)

    def factory():
        return iter_host_blocks(
            S, cf, pp, mp.data, NBLK, logS=logS, Db=Db,
        )

    mb2 = MinibatchSVI(mp.model_fn, mp.guide_fn, num_blocks=NBLK)
    s2, l2 = mb2.fit_streamed(key, mp.data, factory, num_epochs=3)

    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    for name, p in mb1.get_params(s1).items():
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(mb2.get_params(s2)[name]),
            rtol=1e-6, err_msg=name,
        )


def test_per_row_adam_visit_counts(phase_mp):
    """ADVICE r2: masked rows must be bias-corrected with their OWN visit
    count, not the global step count.  With 4 blocks and shuffle=False,
    each phixy row is visited once per epoch while global params step
    NBLK times per epoch."""
    mp = phase_mp
    mb = MinibatchSVI(mp.model_fn, mp.guide_fn, num_blocks=NBLK)
    state, _ = mb.fit(jax.random.PRNGKey(5), mp.data, num_epochs=3,
                      shuffle=False)
    counts = jax.device_get(state.counts)
    assert int(state.step) == 3 * NBLK
    np.testing.assert_array_equal(np.asarray(counts["phixy_locs"]), 3)
    assert int(counts["nu_locs"]) == 3 * NBLK


def test_first_visit_bias_correction_matches_fresh_adam(phase_mp):
    """A row first visited at global step 2 must take the fresh-Adam c=1
    step — mu_hat = clip(g), nu_hat = clip(g)^2, lr undecayed — not the
    c=2-bias-corrected step the old global counter produced."""
    mp = phase_mp
    blocks2 = split_cells(mp.data, 2)
    key = jax.random.PRNGKey(6)

    mb = MinibatchSVI(mp.model_fn, mp.guide_fn, num_blocks=2, lrd=0.9)
    s = mb.init(key, mp.data)
    s, _ = mb.update_block(s, jnp.asarray(0, jnp.int32), blocks2[0])
    # snapshot before step 2 (update_block donates its state argument)
    params_pre = jax.tree_util.tree_map(jnp.array, s.params)
    step_key = jax.random.split(jnp.array(s.key))[1]
    s, _ = mb.update_block(s, jnp.asarray(1, jnp.int32), blocks2[1])

    g = jax.grad(mb._block_loss)(
        params_pre, step_key, jnp.asarray(1, jnp.int32), blocks2[1]
    )["phixy_locs"]
    B = mp.data.Nc // 2
    g = np.clip(np.asarray(g)[B:], -mb.clip_norm, mb.clip_norm)
    # fresh Adam, c=1: upd = -lr * g / (|g| + eps); no lrd decay yet
    expect = np.asarray(params_pre["phixy_locs"])[B:] - (
        mb.lr * g / (np.abs(g) + mb.eps)
    )
    rows = np.asarray(s.params["phixy_locs"])[B:]
    np.testing.assert_allclose(rows, expect, rtol=1e-4, atol=1e-6)


def test_shuffle_reproducible_and_key_dependent(phase_mp):
    mp = phase_mp
    mk = lambda: MinibatchSVI(mp.model_fn, mp.guide_fn, num_blocks=NBLK)
    _, l1 = mk().fit(jax.random.PRNGKey(7), mp.data, num_epochs=2)
    _, l2 = mk().fit(jax.random.PRNGKey(7), mp.data, num_epochs=2)
    _, l3 = mk().fit(jax.random.PRNGKey(8), mp.data, num_epochs=2)
    np.testing.assert_array_equal(l1, l2)  # same key => same block order
    assert not np.array_equal(l1, l3)      # different key => different run


def test_warns_on_nonlocal_cell_site(phase_mp):
    """The unbiasedness guard: dropping phi_xy from local_sites must warn
    that the blockwise objective is biased."""
    mp = phase_mp
    mb = MinibatchSVI(
        mp.model_fn, mp.guide_fn, num_blocks=NBLK,
        local_sites=LOCAL_SITES - {"phi_xy"},
    )
    with pytest.warns(UserWarning, match="phi_xy"):
        mb.init(jax.random.PRNGKey(0), mp.data)


def test_init_template_streamed_matches_full_init(phase_mp):
    """`init_template` (host placeholders, zero HBM for the count matrix)
    must produce the identical streamed fit as initializing from the full
    device container."""
    from velocycle_tpu.infer import init_template

    mp = phase_mp
    key = jax.random.PRNGKey(9)
    S = np.asarray(mp.data.S)
    cf = np.asarray(mp.data.count_factor)
    pp = np.asarray(mp.data.phixy_prior)
    logS = np.asarray(mp.data.logS)
    Db = np.asarray(mp.data.Db)

    def factory():
        return iter_host_blocks(S, cf, pp, mp.data, NBLK, logS=logS, Db=Db)

    mb1 = MinibatchSVI(mp.model_fn, mp.guide_fn, num_blocks=NBLK)
    s1, l1 = mb1.fit_streamed(key, mp.data, factory, num_epochs=2)

    first_block = next(iter(factory()))[1]
    tmpl = init_template(first_block, NC, pp, count_factor=cf, Db=Db)
    mb2 = MinibatchSVI(mp.model_fn, mp.guide_fn, num_blocks=NBLK)
    s2, l2 = mb2.fit_streamed(key, tmpl, factory, num_epochs=2)

    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    for name, p in mb1.get_params(s1).items():
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(mb2.get_params(s2)[name]),
            rtol=1e-6, err_msg=name,
        )


def test_streamed_epoch_aware_factory_shuffles(phase_mp):
    """A one-arg factory receives the epoch index so it can permute its
    block order; visiting order must differ across epochs."""
    mp = phase_mp
    S = np.asarray(mp.data.S)
    cf = np.asarray(mp.data.count_factor)
    pp = np.asarray(mp.data.phixy_prior)
    logS = np.asarray(mp.data.logS)
    Db = np.asarray(mp.data.Db)
    seen = []

    def factory(epoch):
        order = np.random.default_rng(epoch).permutation(NBLK)
        blocks = list(iter_host_blocks(S, cf, pp, mp.data, NBLK,
                                       logS=logS, Db=Db))
        for i in order:
            seen.append(int(i))
            yield blocks[int(i)]

    mb = MinibatchSVI(mp.model_fn, mp.guide_fn, num_blocks=NBLK)
    mb.fit_streamed(jax.random.PRNGKey(10), mp.data, factory, num_epochs=2)
    assert len(seen) == 2 * NBLK
    assert seen[:NBLK] != seen[NBLK:]  # different permutation per epoch
