"""Count-likelihood kernels: the FLOP-dominant ops of every SVI step.

The reference's per-step cost is dominated by `O(Ng*Nc)` Negative-Binomial
log-probs over the dense cell x gene matrix
(`/root/reference/velocycle/phase_inference_model.py:386`).  These helpers
are the jnp reference implementations; `ops.nb_kernels` provides the
Pallas-fused versions (matmul + NB log-pmf + reduction in one kernel) that
the models can swap in via `use_pallas=True` paths.

NB parameterization matches the reference exactly:
``GammaPoisson(1/r, 1/(r * exp(ElogS)))`` with per-gene dispersion r.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy import special as jsp

__all__ = ["nb_logpmf", "poisson_logpmf", "lognormal_logpdf"]


def nb_logpmf(k, elog_mu, dispersion):
    """Negative-Binomial log-pmf at counts ``k``.

    Args:
      k: counts, (Ng, Nc).
      elog_mu: log of the expected value (ElogS / ElogU), (Ng, Nc).
      dispersion: r, broadcastable to (Ng, Nc).

    GammaPoisson(a=1/r, b=1/(r*mu)) gives
      log p(k) = lgamma(k + a) - lgamma(a) - lgamma(k+1)
                 + a*log(b) - (a+k)*log1p(b)
    with a = 1/r, log(b) = -log(r) - elog_mu.

    Computed in the cancellation-free form (see
    `core.distributions.GammaPoisson.log_prob` for the derivation and the
    f32 noise measurement that motivates it):
      lgamma(k+a) - lgamma(a)    -> Stirling log1p expansion for a >= 8
      a*log b - (a+k)*log1p(b)   -> -a*softplus(s) - k*softplus(-s),
                                    s = elog_mu + log(r)  (so e^s = r*mu)

    ``k`` may arrive as an integer array (int16/int8 count storage halves
    the HBM stream of the fused kernels); upcast once here.
    """
    k = jnp.asarray(k, jnp.float32)
    a = 1.0 / dispersion
    s = elog_mu + jnp.log(dispersion)
    direct = jsp.gammaln(k + a) - jsp.gammaln(a)

    def rc(z):
        z2 = z * z
        return (
            (1.0 / 12.0) / z
            - (1.0 / 360.0) / (z * z2)
            + (1.0 / 1260.0) / (z * z2 * z2)
        )

    a_big = jnp.maximum(a, 8.0)
    stirling = (
        (a_big - 0.5) * jnp.log1p(k / a_big)
        + k * jnp.log(a_big + k)
        - k
        + rc(a_big + k)
        - rc(a_big)
    )
    lgam_diff = jnp.where(a >= 8.0, stirling, direct)
    softplus = lambda x: jnp.logaddexp(x, 0.0)
    return (
        lgam_diff
        - jsp.gammaln(k + 1.0)
        - a * softplus(s)
        - k * softplus(-s)
    )


def poisson_logpmf(k, elog_mu):
    return k * elog_mu - jnp.exp(elog_mu) - jsp.gammaln(k + 1.0)


def lognormal_logpdf(logx, elog_mu, sigma):
    z = (logx - elog_mu) / sigma
    return -0.5 * z * z - jnp.log(sigma) - 0.5 * jnp.log(2.0 * jnp.pi)
