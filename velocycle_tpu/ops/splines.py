"""B-spline bases on 1-D and 2-D manifolds.

Generalizes the Fourier basis beyond the circle — the capability the
reference demonstrates via `tutorials/VeloCycle_2D/splines_torch.py:7-222`
(Cox-de-Boor recursion, derivative bases via `scipy.interpolate.splder`,
tensor-product 2-D bases) and the 1D-pancreas notebook.

TPU-first implementation: the Cox-de-Boor recursion is unrolled over the
(static) degree as pure vectorized jnp — each level is one fused
elementwise step over a ``(..., n_knots)`` lattice; derivatives use the
analytic B-spline derivative recurrence (no scipy, fully differentiable and
jit-safe).  Downstream, design matrices feed the same MXU matmul path as
the Fourier basis.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "spline_knots",
    "spline_basis",
    "spline_basis_auto",
    "spline_basis_2d",
    "spline_basis_2d_der",
]


def spline_knots(low, high, n_basis, degree=3):
    """Open (clamped) uniform knot vector with ``n_basis`` basis functions:
    length n_basis + degree + 1, endpoints repeated degree+1 times."""
    interior = n_basis - degree - 1
    if interior < 0:
        raise ValueError(
            f"n_basis={n_basis} must be > degree={degree}"
        )
    inner = np.linspace(low, high, interior + 2)
    return np.concatenate([
        np.full(degree, low), inner, np.full(degree, high),
    ]).astype(np.float32)


def _degree0(x, t, domain_end):
    xe = x[..., None]
    inside = (xe >= t[:-1]) & (xe < t[1:])
    # right-closed last nonempty interval so x == domain end is supported
    at_end = (xe == domain_end) & (t[:-1] < t[1:]) & (t[1:] == domain_end)
    return (inside | at_end).astype(x.dtype)


def _cox_de_boor(x, t, degree):
    """All degree-``degree`` B-spline basis values: (..., n_basis)."""
    domain_end = t[-1]
    B = _degree0(x, t, domain_end)
    for k in range(1, degree + 1):
        d1 = t[k:-1] - t[: -k - 1]
        d2 = t[k + 1:] - t[1:-k]
        xe = x[..., None]
        w1 = jnp.where(d1 > 0, (xe - t[: -k - 1]) / jnp.where(d1 > 0, d1, 1.0), 0.0)
        w2 = jnp.where(d2 > 0, (t[k + 1:] - xe) / jnp.where(d2 > 0, d2, 1.0), 0.0)
        B = w1 * B[..., :-1] + w2 * B[..., 1:]
    return B


def spline_basis(x, knots, degree=3, der=0):
    """B-spline design matrix (or its derivative) at points ``x``.

    Args:
      x: evaluation points, any shape.
      knots: knot vector of length n_basis + degree + 1.
      degree: spline degree (static).
      der: 0 for the basis, 1 for d/dx.

    Returns:
      (..., n_basis) array.
    """
    x = jnp.asarray(x, jnp.float32)
    t = jnp.asarray(knots, jnp.float32)
    if der == 0:
        return _cox_de_boor(x, t, degree)
    if der == 1:
        # B'_{i,k} = k * (B_{i,k-1}/(t_{i+k}-t_i) - B_{i+1,k-1}/(t_{i+k+1}-t_{i+1}))
        if degree == 0:
            return jnp.zeros(x.shape + (len(t) - 1,), x.dtype)
        Bm1 = _cox_de_boor(x, t, degree - 1)  # (..., n_basis + 1)
        d1 = t[degree:-1] - t[: -degree - 1]
        d2 = t[degree + 1:] - t[1:-degree]
        term1 = jnp.where(d1 > 0, Bm1[..., :-1] / jnp.where(d1 > 0, d1, 1.0), 0.0)
        term2 = jnp.where(d2 > 0, Bm1[..., 1:] / jnp.where(d2 > 0, d2, 1.0), 0.0)
        return degree * (term1 - term2)
    raise ValueError(f"der={der} is not allowed, use 0 or 1")


def spline_basis_auto(x, der=0, n_basis=10, degree=3, domain=None,
                      include_constant=True):
    """Basis with knots inferred from the data range — the form the
    `ops.fourier.basis` dispatcher exposes (reference 1D workflow:
    `splines_torch.py:106-141` optionally prepends a constant column)."""
    x = jnp.asarray(x, jnp.float32)
    if domain is None:
        lo = float(jnp.min(x))
        hi = float(jnp.max(x))
    else:
        lo, hi = domain
    knots = spline_knots(lo, hi, n_basis, degree)
    B = spline_basis(x, knots, degree, der)
    if include_constant:
        head = (
            jnp.ones_like(x)[..., None] if der == 0
            else jnp.zeros_like(x)[..., None]
        )
        B = jnp.concatenate([head, B], axis=-1)
    return B


def spline_basis_2d(x, y, knots_x, knots_y, degree=3,
                    include_constant=True):
    """Tensor-product 2-D basis: (..., nx*ny [+1]) with an optional leading
    constant column (`splines_torch.py:162-183`)."""
    Bx = spline_basis(x, knots_x, degree)          # (..., nx)
    By = spline_basis(y, knots_y, degree)          # (..., ny)
    prod = (Bx[..., :, None] * By[..., None, :]).reshape(
        *Bx.shape[:-1], Bx.shape[-1] * By.shape[-1]
    )
    if include_constant:
        prod = jnp.concatenate(
            [jnp.ones_like(prod[..., :1]), prod], axis=-1
        )
    return prod


def spline_basis_2d_der(x, y, knots_x, knots_y, degree=3,
                        include_constant=True):
    """(d/dx, d/dy) of the tensor-product basis
    (`splines_torch.py:186-222`)."""
    Bx = spline_basis(x, knots_x, degree)
    By = spline_basis(y, knots_y, degree)
    dBx = spline_basis(x, knots_x, degree, der=1)
    dBy = spline_basis(y, knots_y, degree, der=1)

    def _prod(a, b):
        out = (a[..., :, None] * b[..., None, :]).reshape(
            *a.shape[:-1], a.shape[-1] * b.shape[-1]
        )
        if include_constant:
            out = jnp.concatenate(
                [jnp.zeros_like(out[..., :1]), out], axis=-1
            )
        return out

    return _prod(dBx, By), _prod(Bx, dBy)
