"""Sharding rules: which axes of the data/param pytrees ride the mesh.

TPU-native scaling design (SURVEY.md §5.7-5.8, no reference equivalent —
the reference is single-device):

  * The **cell axis** (Nc) is sharded: counts ``S,U,logS,logU (Ng, Nc)`` on
    their last dim, per-cell vectors (``count_factor``, ``phixy_prior``) on
    their first, design matrices ``(Nb|Nx, Nc)`` on their last.
  * **Gene-wise** leaves (nu priors, kinetics priors, scalars) replicate:
    they are small and every shard needs them — exactly a data-parallel
    layout where "batch" = cells.
  * Variational params: ``phixy_locs (Nc, 2)`` shards with its cells; all
    gene/global params replicate.

With inputs laid out this way, `jax.jit` compiles the unchanged SVI step to
an SPMD program: the ELBO's cell-axis reductions lower to `psum` over ICI
and gene-parameter gradients arrive via the same all-reduce — no explicit
collectives in model code (the "annotate shardings, let XLA insert
collectives" recipe).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "data_sharding_spec",
    "param_sharding_spec",
    "shard_phase_data",
    "shard_velocity_data",
    "shard_params",
    "replicate",
]

# leaf-name -> index of the cell axis in that leaf's shape
# (phi_prior is the per-cell (Nc,) pseudotime prior of the spline/1-D
# models — without it multi-process globalize_data treated a local slice
# as replicated and failed to widen it to global_Nc)
_PHASE_CELL_AXES = {
    "S": 1, "logS": 1, "count_factor": 0, "phixy_prior": 0, "Db": 1,
    "phi_prior": 0,
}
_VELOCITY_CELL_AXES = {
    "S": 1, "U": 1, "logS": 1, "logU": 1,
    "count_factor": 0, "phixy_prior": 0, "Db": 1, "D": 1,
    "phi_prior": 0,
}
# variational params with a leading cell axis
_PARAM_CELL_AXES = {"phixy_locs": 0, "phi_locs": 0}


def _cell_axes_for_data(data):
    return _VELOCITY_CELL_AXES if hasattr(data, "U") else _PHASE_CELL_AXES


def _spec_for(name, ndim, cell_axes, axis="cells"):
    ax = cell_axes.get(name)
    if ax is None or ax >= ndim:      # absent/None leaf (ndim 0): replicate
        return P()
    parts = [None] * ndim
    parts[ax] = axis
    return P(*parts)


def data_sharding_spec(data, mesh: Mesh, axis="cells"):
    """{field: NamedSharding} for a PhaseData/VelocityData pytree."""
    cell_axes = (
        _VELOCITY_CELL_AXES if hasattr(data, "U") else _PHASE_CELL_AXES
    )
    out = {}
    for name in data.__dataclass_fields__:
        field = data.__dataclass_fields__[name]
        if field.metadata.get("pytree_node", True) is False:
            continue
        leaf = getattr(data, name)
        ndim = getattr(leaf, "ndim", 0)
        out[name] = NamedSharding(
            mesh, _spec_for(name, ndim, cell_axes, axis)
        )
    return out


def param_sharding_spec(params, mesh: Mesh, axis="cells"):
    return {
        name: NamedSharding(
            mesh,
            _spec_for(name, getattr(v, "ndim", 0), _PARAM_CELL_AXES, axis),
        )
        for name, v in params.items()
    }


def _place(data, spec):
    return type(data)(
        **{
            name: (
                jax.device_put(getattr(data, name), spec[name])
                if name in spec
                else getattr(data, name)
            )
            for name in data.__dataclass_fields__
        }
    )


def shard_phase_data(data, mesh: Mesh, axis="cells"):
    """device_put a PhaseData with cell-axis sharding."""
    return _place(data, data_sharding_spec(data, mesh, axis))


def shard_velocity_data(data, mesh: Mesh, axis="cells"):
    return _place(data, data_sharding_spec(data, mesh, axis))


def shard_params(params, mesh: Mesh, axis="cells"):
    """device_put a param dict: per-cell params sharded, rest replicated."""
    spec = param_sharding_spec(params, mesh, axis)
    return {k: jax.device_put(v, spec[k]) for k, v in params.items()}


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
