"""Multi-device sharding: the SVI step compiles SPMD over a cells mesh and
gives the same loss as the single-device path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from velocycle_tpu import Cycle, Phases, preprocess_for_phase_estimation
from velocycle_tpu.infer import SVI, Trace_ELBO, clipped_adam
from velocycle_tpu.parallel import (
    make_mesh,
    shard_phase_data,
    shard_params,
)
from velocycle_tpu.simulate import simulate_data

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)


def _metapars(Nc=64, Ng=12):
    adata = simulate_data(Nc=Nc, Ng=Ng, omegas_to_test=(0.4,),
                          key=jax.random.PRNGKey(3))
    cycle = Cycle.trivial_prior(list(adata.var.index), harmonics=1)
    phases = Phases.from_angles(
        np.asarray(adata.obs["simulated_phis"].values),
        cell_names=list(adata.obs.index),
    )
    return preprocess_for_phase_estimation(
        adata, cycle, phases, n_harmonics=1, with_delta_nu=False,
    )


@pytest.mark.slow
def test_sharded_update_matches_single_device():
    mp = _metapars()
    n = len(jax.devices())
    mesh = make_mesh(("cells",))
    svi = SVI(mp.model_fn, mp.guide_fn, clipped_adam(), Trace_ELBO())

    state_single = svi.init(jax.random.PRNGKey(0), mp.data)
    _, loss_single = svi.update(state_single, mp.data)

    data_sharded = shard_phase_data(mp.data, mesh)
    state_sharded = svi.init_sharded(
        jax.random.PRNGKey(0), mesh, data_sharded
    )
    new_state, loss_sharded = svi.update(state_sharded, data_sharded)

    # data is sharded over all devices on the cell axis
    s_shard = data_sharded.S.sharding
    assert len(s_shard.device_set) == n
    np.testing.assert_allclose(
        float(loss_single), float(loss_sharded), rtol=2e-4
    )
    # params stay finite and phixy_locs keeps its cell sharding
    assert np.isfinite(float(loss_sharded))
    assert len(new_state.params["phixy_locs"].sharding.device_set) == n


def test_sharded_chunk_runs():
    mp = _metapars()
    mesh = make_mesh(("cells",))
    svi = SVI(mp.model_fn, mp.guide_fn, clipped_adam(), Trace_ELBO())
    data = shard_phase_data(mp.data, mesh)
    state = svi.init_sharded(jax.random.PRNGKey(0), mesh, data)
    state, losses = svi.update_chunk(state, 20, data)
    losses = np.asarray(jax.device_get(losses))
    assert losses.shape == (20,)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(len(jax.devices()))


@pytest.mark.slow
def test_sharded_trajectory_matches_single_device():
    """ELBO *trajectories* (not just one step) agree between the 1-device
    and 8-device SPMD programs — the device-count-invariance half of the
    determinism story (same key, same math, different reduction layout)."""
    mp = _metapars()
    mesh = make_mesh(("cells",))
    svi = SVI(mp.model_fn, mp.guide_fn, clipped_adam(), Trace_ELBO())

    state = svi.init(jax.random.PRNGKey(0), mp.data)
    _, losses_single = svi.update_chunk(state, 25, mp.data)

    data = shard_phase_data(mp.data, mesh)
    state_sh = svi.init_sharded(jax.random.PRNGKey(0), mesh, data)
    _, losses_sharded = svi.update_chunk(state_sh, 25, data)

    np.testing.assert_allclose(
        np.asarray(jax.device_get(losses_sharded)),
        np.asarray(jax.device_get(losses_single)),
        rtol=2e-3,
    )
