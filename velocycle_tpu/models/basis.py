"""Shared basis/latent-coordinate plumbing for the model families.

The reference's packaged velocity model dispatches its design matrices
through `torch_basis(..., kind=mp.basis_kind, **mp.kwargs)` and falls back
to a ``phi ~ Uniform`` latent when the manifold is not the circle
(`/root/reference/velocycle/velocity_inference_model.py:336-357`,
`utils.py:439-466` — where only "fourier" is actually implemented).  The
1D-pancreas notebook then re-implements the whole model inline with a
B-spline basis over a fixed pseudotime coordinate
(`tutorials/1D_Pancreas_Analysis.ipynb` cells 28/46).

Here both paths are first-class: every model family calls these helpers, so
``basis_kind="spline"`` turns the S^1 Fourier model into a bounded-interval
spline model (the pancreas workflow) with no model rewriting.  Shapes stay
static — the spline degree/size/domain are static metapar fields, so each
(basis, shape) config compiles exactly once.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import distributions as dist
from ..core import constraints
from ..core.handlers import deterministic, param, plate, sample
from ..ops.circular import pack_direction
from ..ops.fourier import fourier_basis
from ..ops.splines import spline_basis_auto

__all__ = ["expression_basis", "omega_basis", "sample_phi", "guide_phi"]


def expression_basis(mp, phi, der=0):
    """Design matrix zeta (or d zeta/d phi) for the gene-expression series.

    Columns must match ``mp.mu_nu.shape[-1]``: ``2*num_harmonics_S + 1`` for
    the Fourier basis, ``spline_n_basis + 1`` (leading constant column) for
    the spline basis.
    """
    if mp.basis_kind == "fourier":
        return fourier_basis(phi, mp.num_harmonics_S, der=der)
    if mp.basis_kind == "spline":
        return spline_basis_auto(
            phi, der=der, n_basis=mp.spline_n_basis, degree=mp.spline_degree,
            domain=mp.spline_domain, include_constant=True,
        )
    raise ValueError(f"basis_kind={mp.basis_kind!r} not in ('fourier', 'spline')")


def omega_basis(mp, phi):
    """Design matrix zeta_omega for the angular-speed series (Nhw columns).

    Spline path: ``Nhw == 1`` means a constant speed over the manifold (the
    pancreas notebook's scalar ``omega ~ Normal(0, 1)``); otherwise a
    ``Nhw - 1``-function spline with a leading constant column.
    """
    if mp.basis_kind == "fourier":
        return fourier_basis(phi, mp.omega_harmonics, der=0)
    if mp.Nhw == 1:
        return jnp.ones(jnp.shape(phi) + (1,), jnp.float32)
    return spline_basis_auto(
        phi, der=0, n_basis=mp.Nhw - 1, degree=mp.spline_degree,
        domain=mp.spline_domain, include_constant=True,
    )


def sample_phi(mp):
    """Latent manifold coordinate, one per cell.

    Fourier (S^1): the reference's phi_xy 2-vector trick — ``phi_xy ~
    Normal(prior, 1)`` with ``phi = atan2`` (`phase_inference_model.py:
    366-371`).  Spline (interval): ``phi ~ Uniform(domain)``, the packaged
    model's non-fourier branch (`velocity_inference_model.py:340-342`);
    workflows with a known pseudotime condition this site.
    """
    if mp.basis_kind == "fourier":
        if getattr(mp, "phi_parametrization", "xy") == "wrapped":
            # S^1 proper: phi itself is the latent, VonMises prior at the
            # prior angle with kappa = |prior|^2 (the large-|mu| limit of
            # the projected-Normal angular concentration).  For NUTS over
            # the phases this is load-bearing: the phi_xy posterior is a
            # thin curved arc per cell that pins the sampler's step size
            # at scale (see metapars.PhaseData.phi_parametrization).
            angles = jnp.arctan2(mp.phixy_prior[:, 1], mp.phixy_prior[:, 0])
            kappa = jnp.maximum(jnp.sum(mp.phixy_prior**2, -1), 1e-3)
            with plate("cells", mp.Nc, dim=-1):
                phi = sample("phi", dist.VonMises(angles, kappa))
            return phi
        with plate("cells", mp.Nc, dim=-1):
            phi_xy = sample(
                "phi_xy", dist.Normal(mp.phixy_prior, 1.0).to_event(1)
            )  # (Nc, 2)
        phi = pack_direction(phi_xy)
        deterministic("phi", phi)
        return phi
    lo, hi = mp.spline_domain
    with plate("cells", mp.Nc, dim=-1):
        phi = sample(
            "phi",
            dist.Uniform(
                jnp.full((mp.Nc,), lo, jnp.float32),
                jnp.full((mp.Nc,), hi, jnp.float32),
            ),
        )
    return phi


def guide_phi(mp):
    """Variational family for the manifold coordinate.

    Fourier: ``phi_xy ~ Normal(learnable locs, 1.0)`` — the reference's
    fixed-scale family (`phase_inference_guide.py:42,55-56`).  Spline: a
    Delta at interval-constrained learnable locations initialized from the
    phi prior (point-mass pseudotime, matching the conditioned-phi pancreas
    workflow while still allowing phi to be learned when unconditioned).
    """
    if mp.basis_kind == "fourier":
        if getattr(mp, "phi_parametrization", "xy") == "wrapped":
            # point-mass phases (the VonMises family is not
            # reparameterizable; MAP phases are what the conditioned
            # workflows consume, and MCMC is the full-posterior path)
            angles = jnp.arctan2(mp.phixy_prior[:, 1], mp.phixy_prior[:, 0])
            phi_locs = param("phi_locs", angles)
            with plate("cells", mp.Nc, dim=-1):
                sample("phi", dist.Delta(phi_locs))
            return
        phixy_locs = param("phixy_locs", mp.phixy_prior)
        with plate("cells", mp.Nc, dim=-1):
            sample("phi_xy", dist.Normal(phixy_locs, 1.0).to_event(1))
        return
    lo, hi = mp.spline_domain
    init = mp.phi_prior
    if init is None:
        init = jnp.full((mp.Nc,), 0.5 * (lo + hi), jnp.float32)
    eps = 1e-4 * (hi - lo)
    init = jnp.clip(jnp.asarray(init, jnp.float32), lo + eps, hi - eps)
    phi_locs = param(
        "phi_locs", init, constraint=constraints.interval(lo, hi)
    )
    with plate("cells", mp.Nc, dim=-1):
        sample("phi", dist.Delta(phi_locs))
