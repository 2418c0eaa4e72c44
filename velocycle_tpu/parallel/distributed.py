"""Multi-host wiring: jax.distributed initialisation + host-sharded ingest.

The reference is single-process/single-device (SURVEY.md §2, §5.8); this is
the north-star layer it lacks.  On a TPU pod slice each host runs the same
program:

    from velocycle_tpu.parallel import distributed, make_mesh
    distributed.initialize()              # no-op off-pod, env-driven on-pod
    mesh = make_mesh(("cells", "chains"), shape=(8, jax.device_count()//8))
    lo, hi = distributed.process_cell_slice(Nc)   # this host's cell rows
    # ... load only cells [lo:hi) host-side, device_put with the "cells"
    # sharding (parallel.shard_phase_data), run the same jitted SVI step.

Collectives ride ICI within a slice and DCN across slices — XLA chooses
from the mesh's device order, which `make_mesh` keeps in `jax.devices()`
order (ICI-contiguous).
"""
from __future__ import annotations

import jax
import numpy as np

__all__ = [
    "initialize",
    "is_initialized",
    "process_index",
    "process_count",
    "process_cell_slice",
    "local_data_slice",
    "globalize_data",
    "globalize_params",
    "replicate_global",
]

_INITIALIZED = False


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, **kwargs):
    """Initialise the JAX distributed runtime (multi-host pods).

    A no-op when running single-process (no coordinator configured and no
    cluster environment detected) so workflows are portable: call it
    unconditionally at program start.  On TPU pods the arguments are
    usually auto-detected from the environment
    (`jax.distributed.initialize()` with no args).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return False
    import os

    # only an explicit coordinator (argument or env) triggers cluster init;
    # single-host TPU tunnels also set worker-hostname vars, so those are
    # not a reliable multi-host signal
    has_env = any(
        v in os.environ
        for v in (
            "COORDINATOR_ADDRESS",
            "JAX_COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    )
    if coordinator_address is None and not has_env:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    _INITIALIZED = True
    return True


def is_initialized():
    return _INITIALIZED


def process_index():
    return jax.process_index()


def process_count():
    return jax.process_count()


def process_cell_slice(n_cells, index=None, count=None):
    """This host's contiguous [lo, hi) slice of the global cell axis.

    Cells are distributed as evenly as possible (first ``n_cells % count``
    hosts get one extra), matching the layout `shard_phase_data` produces
    when the "cells" mesh axis spans hosts — so per-host loading feeds the
    right shard with no resharding.
    """
    index = jax.process_index() if index is None else index
    count = jax.process_count() if count is None else count
    base, extra = divmod(int(n_cells), count)
    lo = index * base + min(index, extra)
    hi = lo + base + (1 if index < extra else 0)
    return lo, hi


def local_data_slice(array, axis=-1, index=None, count=None):
    """Slice a host-side array to this process's cell range along ``axis``."""
    lo, hi = process_cell_slice(np.shape(array)[axis], index, count)
    sl = [slice(None)] * np.ndim(array)
    sl[axis] = slice(lo, hi)
    return array[tuple(sl)]


# -- multi-process array assembly -------------------------------------------
# On a pod each host holds only its cell slice host-side; these helpers
# assemble the GLOBAL jax.Arrays the jitted SPMD step consumes.  (Plain
# `device_put` cannot do this: the target sharding spans non-addressable
# devices.)  Single-process they degrade to ordinary sharded device_puts,
# so the same program runs everywhere.

def _to_global(local, sharding, global_shape=None):
    local = np.asarray(local)
    return jax.make_array_from_process_local_data(
        sharding, local, global_shape
    )


def globalize_data(local_data, mesh, global_Nc, axis="cells"):
    """Assemble a globally-sharded PhaseData/VelocityData from THIS
    process's host-side cell slice.

    ``local_data`` carries the local `process_cell_slice` rows in its
    cell-axis fields (counts, count_factor, phixy_prior, design rows) and
    the full (replicated) gene-side priors; scalar dataset constants
    (``lgamma_k_sum``) must already be GLOBAL sums — compute them before
    slicing, or psum host-side.  Returns the same container type with
    global jax.Arrays and ``Nc=global_Nc``.
    """
    import dataclasses

    from .sharding import data_sharding_spec, _cell_axes_for_data

    spec = data_sharding_spec(local_data, mesh, axis)
    cell_axes = _cell_axes_for_data(local_data)
    fields = {}
    for name in local_data.__dataclass_fields__:
        field = local_data.__dataclass_fields__[name]
        if field.metadata.get("pytree_node", True) is False:
            continue
        leaf = getattr(local_data, name)
        if leaf is None:
            continue
        ax = cell_axes.get(name)
        if ax is None or getattr(leaf, "ndim", 0) <= ax:
            fields[name] = _to_global(leaf, spec[name])
        else:
            gshape = list(np.shape(leaf))
            gshape[ax] = int(global_Nc)
            fields[name] = _to_global(leaf, spec[name], tuple(gshape))
    return dataclasses.replace(local_data, **fields, Nc=int(global_Nc))


def globalize_params(local_params, mesh, global_Nc, axis="cells"):
    """Assemble globally-sharded variational params from per-process host
    values: per-cell rows (``phixy_locs``/``phi_locs``) come from each
    process's slice; gene/global params must be identical on every process
    (same init key) and are replicated."""
    from .sharding import param_sharding_spec, _PARAM_CELL_AXES

    spec = param_sharding_spec(local_params, mesh, axis)
    out = {}
    for name, v in local_params.items():
        ax = _PARAM_CELL_AXES.get(name)
        if ax is None:
            out[name] = _to_global(v, spec[name])
        else:
            gshape = list(np.shape(v))
            gshape[ax] = int(global_Nc)
            out[name] = _to_global(v, spec[name], tuple(gshape))
    return out


def replicate_global(tree, mesh):
    """Replicate identical-on-every-process host values over a (possibly
    multi-process) mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: _to_global(x, sh), tree)
