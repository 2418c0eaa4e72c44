"""Circular (S^1) math utilities.

jnp equivalents of the reference's direction packing and circular statistics
(`/root/reference/velocycle/utils.py:468-506,586-610`,
`phases.py:17-100,219-234`).  The Bessel-ratio circular std uses
`jax.scipy.special.i0e/i1e` instead of the reference's Abramowitz–Stegun
polynomial tables — exact, branch-free, and differentiable.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy import special as jsp

__all__ = [
    "pack_direction",
    "unpack_direction",
    "wrap_angle",
    "circular_std_from_concentration",
    "circular_corrcoef",
    "circular_mean",
    "circular_distance",
]


def unpack_direction(loc, concentration=1.0):
    """angle -> 2-vector on the circle scaled by concentration."""
    loc = jnp.asarray(loc)
    return (
        jnp.stack([jnp.cos(loc), jnp.sin(loc)], axis=-1) * concentration
    )


def pack_direction(xy_pair):
    """2-vector -> angle (atan2)."""
    xy_pair = jnp.asarray(xy_pair)
    return jnp.arctan2(xy_pair[..., 1], xy_pair[..., 0])


def wrap_angle(phi):
    """Wrap into [0, 2*pi)."""
    return jnp.mod(phi, 2.0 * jnp.pi)


def circular_std_from_concentration(kappa):
    """sqrt(1 - I1(kappa)/I0(kappa)) — the projected-normal circular std the
    reference derives via log-Bessel polynomials (`phases.py:219-234`)."""
    kappa = jnp.asarray(kappa, jnp.float32)
    ratio = jsp.i1e(kappa) / jsp.i0e(kappa)
    return jnp.sqrt(1.0 - ratio)


def circular_corrcoef(x1, x2):
    """|mean(exp(i(x1 - x2)))| — same statistic as `utils.py:586-610`."""
    d = jnp.asarray(x1) - jnp.asarray(x2)
    return jnp.sqrt(jnp.mean(jnp.cos(d)) ** 2 + jnp.mean(jnp.sin(d)) ** 2)


def circular_mean(phi, axis=None):
    s = jnp.mean(jnp.sin(phi), axis=axis)
    c = jnp.mean(jnp.cos(phi), axis=axis)
    return jnp.arctan2(s, c)


def circular_distance(a, b):
    """Shortest signed arc from b to a, in (-pi, pi]."""
    return jnp.mod(a - b + jnp.pi, 2.0 * jnp.pi) - jnp.pi
