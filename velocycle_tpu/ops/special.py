"""Special functions as pure arithmetic — usable inside Pallas TPU kernels.

Mosaic (the Pallas TPU compiler) has no lowering for the `lgamma` /
`digamma` HLO primitives, so the fused NB kernels (`ops/nb_kernels.py`)
cannot call `jax.scipy.special.gammaln/digamma` the way the pure-XLA path
does.  These implementations use only VPU-lowerable ops (exp, log, divide,
select) and are accurate to f32 roundoff over the positive domain the NB
likelihood needs (`x = k + 1/r > 0`):

  * `lgamma_pos`: Lanczos approximation (g=7, n=9 — Numerical Recipes /
    Boost coefficients), relative error ~1e-7 for x > 0 in f32.
  * `digamma_pos`: 6-step upward recurrence into the asymptotic series
    (Abramowitz & Stegun 6.3.18 — the same handbook the reference uses for
    its Bessel tables, `/root/reference/velocycle/phases.py:35-69`).
  * `softplus`: overflow-safe log(1 + exp(x)).

They are also correct under plain XLA, so the CPU test suite exercises the
identical code path the TPU kernel compiles.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["lgamma_pos", "digamma_pos", "softplus"]

# Lanczos g=7, n=9 coefficients (double precision; exact in f32).
_LANCZOS_G = 7.0
_LANCZOS_C0 = 0.99999999999980993
_LANCZOS_C = (
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
)
_HALF_LOG_2PI = 0.9189385332046727  # 0.5 * log(2*pi)


def lgamma_pos(x):
    """log Gamma(x) for x > 0, pure arithmetic (Lanczos, g=7, n=9)."""
    z = x - 1.0
    series = _LANCZOS_C0
    for i, c in enumerate(_LANCZOS_C):
        series = series + c / (z + (i + 1.0))
    t = z + _LANCZOS_G + 0.5
    return _HALF_LOG_2PI + (z + 0.5) * jnp.log(t) - t + jnp.log(series)


def digamma_pos(x):
    """digamma(x) for x > 0: shift x above 6 with psi(x) = psi(x+1) - 1/x,
    then the asymptotic series (A&S 6.3.18) — pure arithmetic."""
    acc = jnp.zeros_like(x)
    for _ in range(6):
        small = x < 6.0
        acc = acc - jnp.where(small, 1.0 / x, 0.0)
        x = x + jnp.where(small, 1.0, 0.0)
    inv = 1.0 / x
    inv2 = inv * inv
    series = (
        jnp.log(x)
        - 0.5 * inv
        - inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 * (1.0 / 252.0)))
    )
    return acc + series


def softplus(x):
    """log(1 + exp(x)), safe for large |x| (no exp overflow)."""
    return jnp.maximum(x, 0.0) + jnp.log(1.0 + jnp.exp(-jnp.abs(x)))
