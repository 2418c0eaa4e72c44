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

__all__ = [
    "lgamma_pos", "digamma_pos", "softplus", "softplus_sigmoid",
    "lgamma_ratio", "digamma_ratio", "lgamma_digamma_ratio",
]

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


def softplus_sigmoid(x):
    """(softplus(x), sigmoid(x)) sharing one exp and one reciprocal —
    the NB log-pmf + gradient needs both of exactly the same argument.
    sigmoid(x) = 1/(1+e) for x >= 0 and e/(1+e) for x < 0, with
    e = exp(-|x|); both branches overflow-safe."""
    e = jnp.exp(-jnp.abs(x))
    d = 1.0 / (1.0 + e)
    sp = jnp.maximum(x, 0.0) + jnp.log1p(e)
    sig = jnp.where(x >= 0.0, d, e * d)
    return sp, sig


def _stirling_rc(z):
    """Stirling-series correction 1/(12z) - 1/(360z^3) + 1/(1260z^5)."""
    inv = 1.0 / z
    inv2 = inv * inv
    return inv * (
        1.0 / 12.0 - inv2 * (1.0 / 360.0 - inv2 * (1.0 / 1260.0))
    )


def lgamma_ratio(k, a):
    """lgamma(k + a) - lgamma(a) for integer-valued counts ``k >= 0`` and
    per-gene ``a > 0`` broadcast along the cell axis.

    This is the NB kernels' hottest special function, and the ratio form
    is both FASTER and more ACCURATE than two Lanczos evaluations:

      * k < 8:  sum_{j<k} log(a + j) — the log(a+j) columns depend only on
        the per-gene ``a`` (negligible), so per ELEMENT this is 8 masked
        adds instead of a Lanczos series (8 divides + 2 logs);
      * k >= 8: sum_{j<8} log(a+j) + [lgamma(k+a) - lgamma(a+8)], the
        bracket by Stirling's series at arguments >= 8 (one log1p + one
        log), which also avoids the catastrophic cancellation of
        subtracting two O(a log a) lgammas when a = 1/r is large (the r4
        frozen-chain root cause, `core/distributions.py`).
    """
    # per-gene columns (broadcast against k's cell axis)
    logs = [jnp.log(a + j) for j in range(8)]
    full8 = sum(logs)
    small = sum(
        jnp.where(k > j, logs[j], 0.0) for j in range(8)
    )
    # lgamma(k+a) - lgamma(a+8), both args >= 8 when k >= 8:
    # (y-1/2)log1p(x/y) + x log(y+x) - x + rc(y+x) - rc(y), y=a+8, x=k-8
    y = a + 8.0
    x = jnp.maximum(k - 8.0, 0.0)          # keep the unselected branch finite
    ka = a + jnp.maximum(k, 8.0)
    stir = (
        (y - 0.5) * jnp.log1p(x / y)
        + x * jnp.log(ka)
        - x
        + _stirling_rc(ka)
        - _stirling_rc(y)
    )
    return jnp.where(k < 8, small, full8 + stir)


def lgamma_digamma_ratio(k, a):
    """(lgamma(k+a) - lgamma(a), digamma(k+a) - digamma(a)) with every
    intermediate shared — the single-pass fwd+grad kernels need BOTH, and
    computing them together saves one log1p, one reciprocal, and all the
    small-k mask compares vs calling `lgamma_ratio` + `digamma_ratio`.

    Threshold 2 (vs 8 in the standalone forms): the Stirling difference
    is evaluated at arguments >= a+2 with a 4-term correction series
    (accurate to ~2e-7 absolute at z=2 — below f32 roundoff of the O(1)
    log-pmf values), and the masked small-k path shrinks from 8 to 2
    select+add pairs per element per function.  The per-element divide
    x/y becomes a multiply by the per-gene 1/y, and log(ka) folds into
    the shared log1p: log(ka) = log(y) + log1p(x/y).  Exact for integer
    k (same contract as `lgamma_ratio`)."""
    masks = [k > j for j in range(2)]
    logs = [jnp.log(a + j) for j in range(2)]    # per-gene columns
    invs = [1.0 / (a + j) for j in range(2)]
    small_l = sum(jnp.where(masks[j], logs[j], 0.0) for j in range(2))
    small_d = sum(jnp.where(masks[j], invs[j], 0.0) for j in range(2))
    full_l = sum(logs)
    full_d = sum(invs)

    # Stirling differences at args >= 2: y = a+2, x = k-2 (clamped)
    y = a + 2.0
    x = jnp.maximum(k - 2.0, 0.0)
    ka = y + x                                   # = a + max(k, 2)
    inv_y = 1.0 / y                              # per-gene
    inv2_y = inv_y * inv_y
    log_y = jnp.log(y)                           # per-gene
    l1p = jnp.log1p(x * inv_y)
    inv = 1.0 / ka
    inv2 = inv * inv
    # lgamma correction 1/(12z) - 1/(360z^3) + 1/(1260z^5) - 1/(1680z^7)
    rc_ka = inv * (1.0 / 12.0 - inv2 * (
        1.0 / 360.0 - inv2 * (1.0 / 1260.0 - inv2 * (1.0 / 1680.0))
    ))
    rc_y = inv_y * (1.0 / 12.0 - inv2_y * (
        1.0 / 360.0 - inv2_y * (1.0 / 1260.0 - inv2_y * (1.0 / 1680.0))
    ))
    stir_l = (y - 0.5 + x) * l1p + x * log_y - x + rc_ka - rc_y
    # digamma tail -1/(2z) - 1/(12z^2) + 1/(120z^4) - 1/(252z^6)
    tail_ka = -0.5 * inv - inv2 * (
        1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 / 252.0)
    )
    tail_y = -0.5 * inv_y - inv2_y * (
        1.0 / 12.0 - inv2_y * (1.0 / 120.0 - inv2_y / 252.0)
    )
    stir_d = l1p + tail_ka - tail_y

    lt = k < 2
    return (
        jnp.where(lt, small_l, full_l + stir_l),
        jnp.where(lt, small_d, full_d + stir_d),
    )


def digamma_ratio(k, a):
    """digamma(k + a) - digamma(a), same structure as `lgamma_ratio`:
    sum_{j<k} 1/(a+j) exactly for k < 8 (per-gene reciprocal columns, 8
    masked adds per element), Stirling difference above."""
    invs = [1.0 / (a + j) for j in range(8)]
    full8 = sum(invs)
    small = sum(
        jnp.where(k > j, invs[j], 0.0) for j in range(8)
    )
    # digamma(k+a) - digamma(a+8) via the asymptotic series at args >= 8:
    # log(z) - 1/(2z) - 1/(12z^2) + 1/(120z^4) - ...
    y = a + 8.0
    x = jnp.maximum(k - 8.0, 0.0)
    ka = a + jnp.maximum(k, 8.0)

    def _tail(z):
        inv = 1.0 / z
        inv2 = inv * inv
        return (
            -0.5 * inv
            - inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 / 252.0))
        )

    stir = jnp.log1p(x / y) + _tail(ka) - _tail(y)
    return jnp.where(k < 8, small, full8 + stir)
