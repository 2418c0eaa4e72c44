"""Metaparameter containers: the bridge between host preprocessing and the
jitted compute path.

The reference packs ~30 tensors/config values into an immutable namedtuple
(`/root/reference/velocycle/preprocessing.py:168-205,270-319`).  Here the
split is explicit and TPU-first:

  * `PhaseData` / `VelocityData` are `flax.struct` pytrees — array leaves are
    traced into `jit`; config fields (sizes, flags, strings) are static
    hashable aux data, so changing data re-uses the compiled step and
    changing config triggers exactly one recompile.
  * Arrays use clean 2-D layouts (``S,U: (Ng, Nc)``, ``nu prior: (Ng, Nh)``,
    ``phi_xy: (Nc, 2)``) instead of the reference's plate-broadcast singleton
    dims (e.g. ``(Nb,1,1,1,Nc)``): the model einsums become MXU matmuls with
    no wasted layout.
  * Host-only objects (Cycle/Phases/AngularSpeed priors, pandas-backed) live
    on the enclosing `*Metapars` wrapper, never entering the device path.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

from flax import struct
import jax.numpy as jnp


@struct.dataclass
class PhaseData:
    """Device-side data/priors for manifold-learning (phase inference)."""

    # observed data
    S: jnp.ndarray            # (Ng, Nc) spliced counts
    logS: jnp.ndarray         # (Ng, Nc) log1p-ish counts for Lognormal model
    count_factor: jnp.ndarray  # (Nc,)
    # priors
    mu_nu: jnp.ndarray        # (Ng, Nh) harmonic-coefficient prior means
    sd_nu: jnp.ndarray        # (Ng, Nh) prior stds
    phixy_prior: jnp.ndarray  # (Nc, 2)
    Db: jnp.ndarray           # (Nb, Nc) batch one-hot design
    mu_dnu: jnp.ndarray       # scalar prior mean for batch offsets
    sd_dnu: jnp.ndarray       # scalar or (Nb,1) prior std for batch offsets
    gamma_alpha: jnp.ndarray  # scalar NB dispersion Gamma prior
    gamma_beta: jnp.ndarray
    sigma_gc: jnp.ndarray     # scalar Lognormal noise scale
    beta0: jnp.ndarray        # LBA Beta prior
    beta1: jnp.ndarray
    # non-fourier (spline) path: prior location of the latent coordinate
    phi_prior: jnp.ndarray = None  # (Nc,) or None
    # precomputed sum(lgamma(S+1)) dataset constant: lets the fused kernel
    # skip one full-tile lgamma per step (ops/nb_kernels.py)
    lgamma_k_sum: jnp.ndarray = None
    # static config
    Ng: int = struct.field(pytree_node=False, default=0)
    Nc: int = struct.field(pytree_node=False, default=0)
    Nb: int = struct.field(pytree_node=False, default=1)
    num_harmonics_S: int = struct.field(pytree_node=False, default=2)
    noisemodel: str = struct.field(
        pytree_node=False, default="NegativeBinomial"
    )
    with_delta_nu: bool = struct.field(pytree_node=False, default=True)
    gene_selection_model: str = struct.field(
        pytree_node=False, default="all"
    )
    basis_kind: str = struct.field(pytree_node=False, default="fourier")
    # "xy" (the reference's phi_xy 2-vector trick) or "wrapped" (phi on
    # S^1 proper, VonMises prior + circular bijector).  For MCMC over the
    # phases "wrapped" is load-bearing: the per-cell phi_xy posterior is
    # a thin curved arc (likelihood depends on the angle only), and at
    # Nc >= 2000 the joint of thousands of such arcs pins NUTS's step
    # size (measured: median ESS 74/9600 draws vs 5123/6400 wrapped).
    phi_parametrization: str = struct.field(pytree_node=False, default="xy")
    # spline-basis config (basis_kind == "spline"); the expression basis has
    # spline_n_basis + 1 columns (leading constant)
    spline_n_basis: int = struct.field(pytree_node=False, default=10)
    spline_degree: int = struct.field(pytree_node=False, default=3)
    spline_domain: tuple = struct.field(
        pytree_node=False, default=(0.0, 6.283185307179586)
    )
    # Pallas fused NB likelihood (ops/nb_kernels.py); only used when
    # noisemodel == NegativeBinomial and with_delta_nu is False
    use_fused_nb: bool = struct.field(pytree_node=False, default=False)
    # compile the dispersion gradient (the digamma chain — the kernels'
    # most expensive gradient).  The fit drivers flip this to False when
    # shape_inv is CONDITIONED (the two-stage workflow), where that
    # gradient is discarded
    disp_grad: bool = struct.field(pytree_node=False, default=True)


@struct.dataclass
class VelocityData:
    """Device-side data/priors for velocity-learning."""

    S: jnp.ndarray            # (Ng, Nc)
    U: jnp.ndarray            # (Ng, Nc)
    logS: jnp.ndarray
    logU: jnp.ndarray
    count_factor: jnp.ndarray  # (Nc,) or scalar 0.0
    mu_nu: jnp.ndarray        # (Ng, Nh)
    sd_nu: jnp.ndarray
    phixy_prior: jnp.ndarray  # (Nc, 2)
    D: jnp.ndarray            # (Nx, Nc) condition design
    Db: jnp.ndarray           # (Nb, Nc) batch design
    mu_dnu: jnp.ndarray
    sd_dnu: jnp.ndarray
    mu_gamma: jnp.ndarray     # (Ng,) log-degradation prior
    sd_gamma: jnp.ndarray
    mu_beta: jnp.ndarray      # (Ng,) log-splicing prior
    sd_beta: jnp.ndarray
    mu_nuomega: jnp.ndarray   # (Nx, Nhw) angular-speed prior
    sd_nuomega: jnp.ndarray
    gamma_alpha: jnp.ndarray
    gamma_beta: jnp.ndarray
    sigma_s_gc: jnp.ndarray
    sigma_u_gc: jnp.ndarray
    # LRMN hyperparameters
    rho_mean: jnp.ndarray
    rho_std: jnp.ndarray
    rho_scale: jnp.ndarray
    # non-fourier (spline) path: prior location of the latent coordinate
    phi_prior: jnp.ndarray = None  # (Nc,) or None
    # precomputed sum(lgamma(S+1)) + sum(lgamma(U+1)) for the fused kernel
    lgamma_k_sum: jnp.ndarray = None
    # static config
    Ng: int = struct.field(pytree_node=False, default=0)
    Nc: int = struct.field(pytree_node=False, default=0)
    Nb: int = struct.field(pytree_node=False, default=1)
    Nx: int = struct.field(pytree_node=False, default=1)
    Nhw: int = struct.field(pytree_node=False, default=3)
    num_harmonics_S: int = struct.field(pytree_node=False, default=2)
    omega_harmonics: int = struct.field(pytree_node=False, default=1)
    noisemodel: str = struct.field(
        pytree_node=False, default="NegativeBinomial"
    )
    with_delta_nu: bool = struct.field(pytree_node=False, default=True)
    model_type: str = struct.field(pytree_node=False, default="lrmn")
    rho_rank: int = struct.field(pytree_node=False, default=5)
    basis_kind: str = struct.field(pytree_node=False, default="fourier")
    # "xy" or "wrapped" — see PhaseData.phi_parametrization
    phi_parametrization: str = struct.field(pytree_node=False, default="xy")
    # spline-basis config (basis_kind == "spline")
    spline_n_basis: int = struct.field(pytree_node=False, default=10)
    spline_degree: int = struct.field(pytree_node=False, default=3)
    spline_domain: tuple = struct.field(
        pytree_node=False, default=(0.0, 6.283185307179586)
    )
    # Pallas fused joint S+U NB likelihood (ops/nb_kernels.py); used when
    # noisemodel == NegativeBinomial
    use_fused_nb: bool = struct.field(pytree_node=False, default=False)
    # see PhaseData.disp_grad
    disp_grad: bool = struct.field(pytree_node=False, default=True)


@dataclasses.dataclass
class Metapars:
    """Host-side wrapper: device data + prior containers + model selection.

    Mirrors the role of the reference's MetaparContainer namedtuple but keeps
    pandas-backed objects off the device path.
    """

    data: Any                     # PhaseData or VelocityData
    model_fn: Callable
    guide_fn: Callable
    cycle_prior: Any = None       # Cycle
    phase_prior: Any = None       # Phases
    speed_prior: Any = None       # AngularSpeed
    condition: Any = None         # names conditioned on (informational)
    extras: Optional[dict] = None

    def __getattr__(self, name):
        # convenience passthrough to the device container's fields
        data = object.__getattribute__(self, "data")
        try:
            return getattr(data, name)
        except AttributeError as e:
            raise AttributeError(name) from e
