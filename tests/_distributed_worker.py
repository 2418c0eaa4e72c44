"""Worker for the real 2-process `jax.distributed` test.

Launched as: python tests/_distributed_worker.py <coordinator> <nproc> <rank>

Each process: initialize the distributed runtime over localhost, build the
SAME simulated phase dataset host-side, keep only this process's
`process_cell_slice` of the cell axis, assemble global arrays with
`globalize_data`/`globalize_params`, and run a jitted SVI chunk over a
2-device (1 per process) "cells" mesh.  Rank 0 prints the loss trajectory
as one JSON line; the parent test compares it to a single-process fit.
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # exactly one CPU device per process

coordinator, nproc, rank = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from velocycle_tpu.parallel import distributed  # noqa: E402

ok = distributed.initialize(
    coordinator_address=coordinator, num_processes=nproc, process_id=rank
)
assert ok and distributed.is_initialized(), "non-no-op branch must engage"
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == nproc, jax.devices()

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402

from velocycle_tpu import (  # noqa: E402
    Cycle, Phases, preprocess_for_phase_estimation,
)
from velocycle_tpu.infer import SVI, Trace_ELBO, clipped_adam  # noqa: E402
from velocycle_tpu.infer.svi import SVIState, init_params  # noqa: E402
from velocycle_tpu.parallel import make_mesh  # noqa: E402
from velocycle_tpu.simulate import simulate_data  # noqa: E402

NC, NG = 64, 24

# -- identical host-side dataset on every process -------------------------
adata = simulate_data(Nc=NC, Ng=NG, omegas_to_test=(0.4,), seed=3)
cycle = Cycle.trivial_prior(list(adata.var.index), harmonics=1)
phases = Phases.from_angles(
    np.asarray(adata.obs["simulated_phis"].values),
    cell_names=list(adata.obs.index),
)
mp = preprocess_for_phase_estimation(
    adata, cycle, phases, n_harmonics=1, with_delta_nu=False,
)

# -- this process keeps only its cell slice host-side ---------------------
lo, hi = distributed.process_cell_slice(NC)
cell_axes = {"S": 1, "logS": 1, "count_factor": 0, "phixy_prior": 0, "Db": 1}
local_fields = {}
for name, ax in cell_axes.items():
    leaf = getattr(mp.data, name)
    if leaf is None:
        continue
    local_fields[name] = distributed.local_data_slice(
        np.asarray(jax.device_get(leaf)), axis=ax
    )
# lgamma_k_sum stays the GLOBAL sum (computed from the full matrix above)
local_data = dataclasses.replace(mp.data, **local_fields, Nc=hi - lo)

mesh = make_mesh(("cells",))
data = distributed.globalize_data(local_data, mesh, NC)

# -- params: init from identical host values, shard the phixy rows --------
params_full, constraints = init_params(
    mp.guide_fn, jax.random.PRNGKey(0), mp.data
)
params_host = jax.device_get(params_full)
params_local = dict(params_host)
params_local["phixy_locs"] = params_host["phixy_locs"][lo:hi]
svi = SVI(mp.model_fn, mp.guide_fn, clipped_adam(), Trace_ELBO())
svi.constraints = constraints
params = distributed.globalize_params(params_local, mesh, NC)
opt_state = jax.jit(svi.optim.init)(params)
state = SVIState(
    distributed.replicate_global(np.zeros((), np.int32), mesh),
    params,
    opt_state,
    distributed.replicate_global(
        np.asarray(jax.random.PRNGKey(0)), mesh
    ),
)

state, losses = svi.update_chunk(state, 20, data)
# losses are replicated: every process's local shard holds the full series
local = np.asarray(losses.addressable_shards[0].data)
if rank == 0:
    print("LOSSES " + json.dumps([float(x) for x in local]), flush=True)
