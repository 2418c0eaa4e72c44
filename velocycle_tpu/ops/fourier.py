"""Fourier basis on S^1 (and the generic basis dispatcher).

Equivalent math to the reference's `torch_fourier_basis`
(`/root/reference/velocycle/utils.py:400-437`): columns
``[1, cos(phi), sin(phi), cos(2 phi), sin(2 phi), ...]`` or the phi-derivative
``[0, -sin, cos, -2 sin(2 phi), 2 cos(2 phi), ...]``.

TPU-first implementation: instead of the reference's masked three-way
`torch.where` over a (..., 2H+1) lattice, we build the cos/sin blocks
directly and interleave them — fewer transcendentals (cos/sin evaluated once
per harmonic) and a layout XLA maps straight onto the VPU.  The basis feeds
the MXU matmul ``ElogS = nu @ zeta^T`` downstream.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["fourier_basis", "basis"]


def fourier_basis(phi, num_harmonics, der=0):
    """Fourier design matrix.

    Args:
      phi: angles, any shape ``(...,)``.
      num_harmonics: H; output has ``2*H + 1`` basis columns.
      der: 0 for the basis, 1 for its derivative w.r.t. phi.

    Returns:
      Array of shape ``(..., 2*H + 1)``.
    """
    phi = jnp.asarray(phi, jnp.float32)
    h = jnp.arange(1, num_harmonics + 1, dtype=phi.dtype)  # (H,)
    hphi = phi[..., None] * h  # (..., H)
    cos, sin = jnp.cos(hphi), jnp.sin(hphi)
    if der == 0:
        pairs = jnp.stack([cos, sin], axis=-1)  # (..., H, 2)
        head = jnp.ones_like(phi)[..., None]
    elif der == 1:
        pairs = jnp.stack([-h * sin, h * cos], axis=-1)
        head = jnp.zeros_like(phi)[..., None]
    else:
        raise ValueError(f"der={der} is not allowed, use 0 or 1")
    interleaved = pairs.reshape(*pairs.shape[:-2], 2 * num_harmonics)
    return jnp.concatenate([head, interleaved], axis=-1)


def basis(x, der=0, kind="fourier", **kwargs):
    """Basis dispatcher (reference: `utils.py:439-466` accepts only
    "fourier"; we additionally support "spline" covering the 1D-pancreas and
    2D workflows the reference only demonstrates in notebooks)."""
    if kind == "fourier":
        if "num_harmonics" not in kwargs:
            raise ValueError(
                "num_harmonics needs to be provided if kind='fourier'"
            )
        return fourier_basis(x, num_harmonics=kwargs["num_harmonics"], der=der)
    if kind == "spline":
        from .splines import spline_basis_auto

        return spline_basis_auto(x, der=der, **kwargs)
    raise ValueError(f"kind={kind!r} is not valid; use 'fourier' or 'spline'")
