"""Multi-device fit: shard the cell axis over a mesh and run the SVI step
SPMD.  On a pod slice this is the same code after
`jax.distributed.initialize()`; on a dev box, set
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu to
exercise 8 virtual devices.
"""
import numpy as np
import jax

from velocycle_tpu import Cycle, Phases, preprocess_for_phase_estimation
from velocycle_tpu.infer import SVI, Trace_ELBO, clipped_adam
from velocycle_tpu.parallel import make_mesh, shard_phase_data
from velocycle_tpu.simulate import simulate_data


def main():
    n_dev = len(jax.devices())
    Nc = 128 * n_dev
    adata = simulate_data(Nc=Nc, Ng=64, seed=4)
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
    state, losses = svi.update_chunk(state, 200, data)
    losses = np.asarray(jax.device_get(losses))
    print(f"{n_dev}-device mesh: ELBO {losses[0]:.0f} -> {losses[-1]:.0f}")
    print("S sharding:", data.S.sharding)


if __name__ == "__main__":
    main()
