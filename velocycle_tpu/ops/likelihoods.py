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
    """
    a = 1.0 / dispersion
    log_b = -jnp.log(dispersion) - elog_mu
    b = jnp.exp(log_b)
    return (
        jsp.gammaln(k + a)
        - jsp.gammaln(a)
        - jsp.gammaln(k + 1.0)
        + a * log_b
        - (a + k) * jnp.log1p(b)
    )


def poisson_logpmf(k, elog_mu):
    return k * elog_mu - jnp.exp(elog_mu) - jsp.gammaln(k + 1.0)


def lognormal_logpdf(logx, elog_mu, sigma):
    z = (logx - elog_mu) / sigma
    return -0.5 * z * z - jnp.log(sigma) - 0.5 * jnp.log(2.0 * jnp.pi)
