"""Multi-device execution: shard the cell axis over a mesh and run the SVI
step SPMD; shard MCMC chains and SMC particles the same way.  On a pod
slice this is the same code after `parallel.distributed.initialize()`
(each host loading its `distributed.process_cell_slice` of the cells); on
a dev box, set XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu to exercise 8 virtual devices.
"""
import numpy as np
import jax

from _smoke import sz
from velocycle_tpu import Cycle, Phases, preprocess_for_phase_estimation
from velocycle_tpu.core import handlers
from velocycle_tpu.infer import SVI, Trace_ELBO, clipped_adam
from velocycle_tpu.infer.mcmc import MCMC
from velocycle_tpu.infer.smc import SMC
from velocycle_tpu.parallel import (
    distributed, make_mesh, shard_phase_data,
)
from velocycle_tpu.simulate import simulate_data


def main():
    distributed.initialize()  # no-op off-pod
    n_dev = len(jax.devices())
    Nc = sz(128, 16) * n_dev
    adata = simulate_data(Nc=Nc, Ng=sz(64, 16), seed=4)
    cycle = Cycle.trivial_prior(list(adata.var.index), harmonics=1)
    phases = Phases.from_angles(
        adata.obs["simulated_phis"].values,
        cell_names=list(adata.obs.index),
    )
    mp = preprocess_for_phase_estimation(
        adata, cycle, phases, n_harmonics=1, with_delta_nu=False,
    )

    mesh = make_mesh(("cells",))
    data = shard_phase_data(mp.data, mesh)
    svi = SVI(mp.model_fn, mp.guide_fn, clipped_adam(), Trace_ELBO())
    state = svi.init_sharded(jax.random.PRNGKey(0), mesh, data)
    state, losses = svi.update_chunk(state, sz(200, 20), data)
    losses = np.asarray(jax.device_get(losses))
    print(f"{n_dev}-device mesh: ELBO {losses[0]:.0f} -> {losses[-1]:.0f}")
    print("S sharding:", data.S.sharding)

    # -- sharded NUTS chains (gene posteriors, phases pinned) -------------
    model = handlers.condition(
        mp.model_fn, data={"phi_xy": mp.data.phixy_prior}
    )
    chains_mesh = make_mesh(("chains",))
    m = MCMC(model, kernel="nuts", num_warmup=sz(100, 30),
             num_samples=sz(100, 20),
             num_chains=n_dev, max_depth=6)
    m.run(jax.random.PRNGKey(1), mp.data, mesh=chains_mesh)
    rhat = float(m.summary()["nu"]["rhat"].max())
    print(f"sharded NUTS: {n_dev} chains, accept "
          f"{m.accept_rate():.2f}, max rhat {rhat:.3f}")

    # -- sharded SMC particles --------------------------------------------
    smc = SMC(model, num_particles=sz(32, 8) * n_dev, num_moves=sz(2, 1))
    smc.run(jax.random.PRNGKey(2), mp.data,
            mesh=make_mesh(("particles",)))
    print(f"sharded SMC: {sz(32, 8) * n_dev} particles, "
          f"{len(smc.temperature_schedule)} stages, "
          f"logZ {smc.log_evidence():.1f}")


if __name__ == "__main__":
    main()
