"""TPU-native distribution library for velocycle_tpu.

A minimal, pure-`jax.numpy` distribution set covering everything the VeloCycle
model family needs (reference inventory: SURVEY.md §2.4;
`/root/reference/velocycle/phase_inference_model.py:382-395`,
`velocity_inference_guide.py:95-97`).  All log-probs are deterministic f32
`jnp` expressions so they trace into a single XLA computation and fuse with the
surrounding ELBO arithmetic; sampling is reparameterized wherever the
reference's SVI relies on reparameterized gradients (Normal & friends).

Design notes (TPU-first, not a torch port):
  * Distributions are plain Python objects built *inside* traced functions;
    they hold only jnp arrays, so construction is free under `jit`.
  * `sample(key, shape)` is reparameterized for location-scale families.
  * `.to_event(n)` returns an `Independent` wrapper (sums the last ``n``
    batch dims into the event), mirroring the semantics the reference uses
    via pyro's `.to_event(1)`.
  * Discrete distributions (`Bernoulli`) support `enumerate_support` for the
    analytic-enumeration ELBO used by the LBA model variant.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

__all__ = [
    "Distribution",
    "Independent",
    "Normal",
    "LogNormal",
    "Gamma",
    "Poisson",
    "GammaPoisson",
    "NegativeBinomial",
    "Delta",
    "Beta",
    "Bernoulli",
    "Uniform",
    "MultivariateNormal",
    "LowRankMultivariateNormal",
    "VonMises",
    "ProjectedNormal",
]

_LOG_2PI = math.log(2.0 * math.pi)


def _promote(*xs):
    return [jnp.asarray(x, dtype=jnp.result_type(float)) for x in xs]


class Distribution:
    """Base class: batch_shape/event_shape bookkeeping + to_event."""

    event_shape: tuple = ()
    support = "real"  # named support for MCMC bijections (constraints.biject_to)

    @property
    def batch_shape(self):
        raise NotImplementedError

    @property
    def event_dim(self):
        return len(self.event_shape)

    def sample(self, key, sample_shape=()):
        raise NotImplementedError

    def log_prob(self, value):
        raise NotImplementedError

    def to_event(self, n=1):
        if n == 0:
            return self
        return Independent(self, n)

    @property
    def has_rsample(self):
        return True

    @property
    def mean(self):
        raise NotImplementedError


class Independent(Distribution):
    """Reinterpret the last ``n`` batch dims of ``base`` as event dims."""

    def __init__(self, base, reinterpreted_batch_ndims):
        self.base = base
        self.ndims = int(reinterpreted_batch_ndims)

    @property
    def batch_shape(self):
        bs = self.base.batch_shape
        return bs[: len(bs) - self.ndims]

    @property
    def event_shape(self):
        bs = self.base.batch_shape
        return bs[len(bs) - self.ndims:] + self.base.event_shape

    def sample(self, key, sample_shape=()):
        return self.base.sample(key, sample_shape)

    def log_prob(self, value):
        lp = self.base.log_prob(value)
        if self.ndims:
            lp = lp.sum(axis=tuple(range(-self.ndims, 0)))
        return lp

    @property
    def mean(self):
        return self.base.mean

    def to_event(self, n=1):
        if n == 0:
            return self
        return Independent(self.base, self.ndims + n)

    @property
    def support(self):
        return self.base.support


class Normal(Distribution):
    def __init__(self, loc, scale):
        self.loc, self.scale = _promote(loc, scale)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        eps = jax.random.normal(key, shape, dtype=self.loc.dtype)
        return self.loc + self.scale * eps

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - 0.5 * _LOG_2PI

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    def entropy(self):
        return 0.5 + 0.5 * _LOG_2PI + jnp.log(self.scale)


class LogNormal(Distribution):
    support = "positive"

    def __init__(self, loc, scale):
        self.loc, self.scale = _promote(loc, scale)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        eps = jax.random.normal(key, shape, dtype=self.loc.dtype)
        return jnp.exp(self.loc + self.scale * eps)

    def log_prob(self, value):
        logv = jnp.log(value)
        z = (logv - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - 0.5 * _LOG_2PI - logv

    @property
    def mean(self):
        return jnp.exp(self.loc + 0.5 * self.scale**2)


class Gamma(Distribution):
    """Gamma(concentration, rate) — matches pyro's dist.Gamma."""

    support = "positive"

    def __init__(self, concentration, rate):
        self.concentration, self.rate = _promote(concentration, rate)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(
            jnp.shape(self.concentration), jnp.shape(self.rate)
        )

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        g = jax.random.gamma(key, jnp.broadcast_to(self.concentration, shape))
        return g / self.rate

    def log_prob(self, value):
        c, r = self.concentration, self.rate
        return (
            c * jnp.log(r)
            + (c - 1.0) * jnp.log(value)
            - r * value
            - jsp.gammaln(c)
        )

    @property
    def mean(self):
        return self.concentration / self.rate


class Poisson(Distribution):
    has_rsample = False

    def __init__(self, rate):
        (self.rate,) = _promote(rate)

    @property
    def batch_shape(self):
        return jnp.shape(self.rate)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.poisson(
            key, jnp.broadcast_to(self.rate, shape)
        ).astype(self.rate.dtype)

    def log_prob(self, value):
        return value * jnp.log(self.rate) - self.rate - jsp.gammaln(value + 1.0)

    @property
    def mean(self):
        return self.rate


class GammaPoisson(Distribution):
    """Gamma-Poisson compound (== NegativeBinomial).

    Parameterization matches pyro's ``GammaPoisson(concentration, rate)``:
    a Poisson whose rate is Gamma(concentration, rate)-distributed.  The
    reference builds it as ``GammaPoisson(1/r, 1/(r*mu))`` with per-gene
    dispersion r (`/root/reference/velocycle/phase_inference_model.py:393`).
    """

    has_rsample = False

    def __init__(self, concentration, rate):
        self.concentration, self.rate = _promote(concentration, rate)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(
            jnp.shape(self.concentration), jnp.shape(self.rate)
        )

    def sample(self, key, sample_shape=()):
        kg, kp = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        lam = jax.random.gamma(
            key=kg, a=jnp.broadcast_to(self.concentration, shape)
        ) / jnp.broadcast_to(self.rate, shape)
        return jax.random.poisson(kp, lam).astype(lam.dtype)

    def log_prob(self, value):
        """Numerically stable form.  The textbook expression
        ``gammaln(k+a) - gammaln(a) + a*log(b) - (a+k)*log1p(b)`` loses
        ~ULP(gammaln(a)) per element to catastrophic cancellation when the
        concentration ``a`` is large (NB with dispersion r -> 0 has
        a = 1/r: at r=5e-4, gammaln terms are O(1e4) and f32 rounding
        injects O(1e-3..1) nats of state-dependent noise per element —
        enough to freeze an MCMC chain that wanders into the small-r
        region; measured in round 4's frozen-chain root-cause).  Stable
        rewrite:

          gammaln(k+a)-gammaln(a) = (a-1/2)*log1p(k/a) + k*log(a+k) - k
                                    + rc(a+k) - rc(a)        [Stirling, a>=8]
          a*log(b) - (a+k)*log1p(b) = -a*log1p(1/b) - k*log1p(b)

        with rc(z) the Stirling-series correction; every intermediate is
        O(k log a) instead of O(a log a)."""
        a, b = self.concentration, self.rate
        direct = jsp.gammaln(value + a) - jsp.gammaln(a)

        def rc(z):
            z2 = z * z
            return (
                (1.0 / 12.0) / z
                - (1.0 / 360.0) / (z * z2)
                + (1.0 / 1260.0) / (z * z2 * z2)
            )

        a_big = jnp.maximum(a, 8.0)     # keep the unselected branch finite
        stirling = (
            (a_big - 0.5) * jnp.log1p(value / a_big)
            + value * jnp.log(a_big + value)
            - value
            + rc(a_big + value)
            - rc(a_big)
        )
        lgam_diff = jnp.where(a >= 8.0, stirling, direct)
        return (
            lgam_diff
            - jsp.gammaln(value + 1.0)
            - a * jnp.log1p(1.0 / b)
            - value * jnp.log1p(b)
        )

    @property
    def mean(self):
        return self.concentration / self.rate


def NegativeBinomial(mean, dispersion):
    """NB in (mean, dispersion) form: ``GammaPoisson(1/r, 1/(r*mu))``."""
    r = dispersion
    return GammaPoisson(1.0 / r, 1.0 / (r * mean))


class Delta(Distribution):
    """Point mass.  log_prob is 0 at the point (pyro semantics): a Delta
    guide site contributes zero entropy to the ELBO."""

    def __init__(self, v, log_density=0.0):
        (self.v,) = _promote(v)
        self.log_density = log_density

    @property
    def batch_shape(self):
        return jnp.shape(self.v)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jnp.broadcast_to(self.v, shape)

    def log_prob(self, value):
        return jnp.broadcast_to(
            jnp.asarray(self.log_density, dtype=self.v.dtype),
            jnp.broadcast_shapes(jnp.shape(value), self.batch_shape),
        )

    @property
    def mean(self):
        return self.v


class Beta(Distribution):
    support = "unit_interval"

    def __init__(self, concentration1, concentration0):
        self.concentration1, self.concentration0 = _promote(
            concentration1, concentration0
        )

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(
            jnp.shape(self.concentration1), jnp.shape(self.concentration0)
        )

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.beta(
            key,
            jnp.broadcast_to(self.concentration1, shape),
            jnp.broadcast_to(self.concentration0, shape),
        )

    def log_prob(self, value):
        c1, c0 = self.concentration1, self.concentration0
        return (
            (c1 - 1.0) * jnp.log(value)
            + (c0 - 1.0) * jnp.log1p(-value)
            - jsp.betaln(c1, c0)
        )

    @property
    def mean(self):
        return self.concentration1 / (self.concentration1 + self.concentration0)


class Bernoulli(Distribution):
    has_rsample = False

    def __init__(self, probs):
        (self.probs,) = _promote(probs)

    @property
    def batch_shape(self):
        return jnp.shape(self.probs)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.bernoulli(
            key, jnp.broadcast_to(self.probs, shape)
        ).astype(self.probs.dtype)

    def log_prob(self, value):
        p = jnp.clip(self.probs, 1e-7, 1.0 - 1e-7)
        return value * jnp.log(p) + (1.0 - value) * jnp.log1p(-p)

    def enumerate_support(self):
        """Support values stacked on a new leading axis, for parallel
        enumeration (static shape: (2,) + batch_shape)."""
        zero = jnp.zeros(self.batch_shape, dtype=self.probs.dtype)
        return jnp.stack([zero, zero + 1.0], axis=0)

    @property
    def mean(self):
        return self.probs


class Uniform(Distribution):
    def __init__(self, low, high):
        self.low, self.high = _promote(low, high)

    @property
    def support(self):
        return ("interval", self.low, self.high)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.low), jnp.shape(self.high))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        u = jax.random.uniform(key, shape, dtype=self.low.dtype)
        return self.low + (self.high - self.low) * u

    def log_prob(self, value):
        inside = (value >= self.low) & (value <= self.high)
        lp = -jnp.log(self.high - self.low)
        return jnp.where(inside, lp, -jnp.inf)

    @property
    def mean(self):
        return 0.5 * (self.low + self.high)


class MultivariateNormal(Distribution):
    def __init__(self, loc, covariance_matrix=None, scale_tril=None):
        (self.loc,) = _promote(loc)
        if scale_tril is None:
            covariance_matrix = jnp.asarray(
                covariance_matrix, dtype=self.loc.dtype
            )
            scale_tril = jnp.linalg.cholesky(covariance_matrix)
        self.scale_tril = jnp.asarray(scale_tril, dtype=self.loc.dtype)

    @property
    def event_shape(self):
        return self.loc.shape[-1:]

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(
            self.loc.shape[:-1], self.scale_tril.shape[:-2]
        )

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape + self.event_shape
        eps = jax.random.normal(key, shape, dtype=self.loc.dtype)
        return self.loc + jnp.einsum("...ij,...j->...i", self.scale_tril, eps)

    def log_prob(self, value):
        diff = value - self.loc
        bshape = jnp.broadcast_shapes(
            diff.shape[:-1], self.scale_tril.shape[:-2]
        )
        L = jnp.broadcast_to(
            self.scale_tril, bshape + self.scale_tril.shape[-2:]
        )
        diff = jnp.broadcast_to(diff, bshape + diff.shape[-1:])
        y = jax.scipy.linalg.solve_triangular(
            L, diff[..., None], lower=True
        )[..., 0]
        d = self.loc.shape[-1]
        half_logdet = jnp.log(
            jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1)
        ).sum(-1)
        return -0.5 * (y * y).sum(-1) - half_logdet - 0.5 * d * _LOG_2PI

    @property
    def mean(self):
        return self.loc


class LowRankMultivariateNormal(Distribution):
    """N(loc, W W^T + D).  Reparameterized sampling is the only thing the
    reference's LRMN guide needs (`velocity_inference_guide.py:95-97`), but
    log_prob is provided via the Woodbury identity for completeness."""

    def __init__(self, loc, cov_factor, cov_diag):
        self.loc, self.cov_factor, self.cov_diag = _promote(
            loc, cov_factor, cov_diag
        )

    @property
    def event_shape(self):
        return self.loc.shape[-1:]

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(
            self.loc.shape[:-1],
            self.cov_factor.shape[:-2],
            self.cov_diag.shape[:-1],
        )

    def sample(self, key, sample_shape=()):
        k1, k2 = jax.random.split(key)
        rank = self.cov_factor.shape[-1]
        shape = tuple(sample_shape) + self.batch_shape
        eps_w = jax.random.normal(k1, shape + (rank,), dtype=self.loc.dtype)
        eps_d = jax.random.normal(
            k2, shape + self.event_shape, dtype=self.loc.dtype
        )
        return (
            self.loc
            + jnp.einsum("...ij,...j->...i", self.cov_factor, eps_w)
            + jnp.sqrt(self.cov_diag) * eps_d
        )

    def log_prob(self, value):
        W, D = self.cov_factor, self.cov_diag
        diff = value - self.loc
        d = self.loc.shape[-1]
        rank = W.shape[-1]
        Dinv_diff = diff / D
        Wt_Dinv = jnp.swapaxes(W, -1, -2) / D[..., None, :]
        cap = jnp.eye(rank, dtype=W.dtype) + Wt_Dinv @ W
        L = jnp.linalg.cholesky(cap)
        rhs = jnp.einsum("...ij,...j->...i", Wt_Dinv, diff)
        bshape = jnp.broadcast_shapes(rhs.shape[:-1], L.shape[:-2])
        Lb = jnp.broadcast_to(L, bshape + L.shape[-2:])
        rhs = jnp.broadcast_to(rhs, bshape + rhs.shape[-1:])
        y = jax.scipy.linalg.solve_triangular(
            Lb, rhs[..., None], lower=True
        )[..., 0]
        mahal = (diff * Dinv_diff).sum(-1) - (y * y).sum(-1)
        logdet = jnp.log(D).sum(-1) + 2.0 * jnp.log(
            jnp.diagonal(L, axis1=-2, axis2=-1)
        ).sum(-1)
        return -0.5 * (mahal + logdet + d * _LOG_2PI)

    @property
    def mean(self):
        return self.loc

    def covariance_matrix(self):
        W, D = self.cov_factor, self.cov_diag
        return W @ jnp.swapaxes(W, -1, -2) + jnp.vectorize(
            jnp.diag, signature="(n)->(n,n)"
        )(D)


def log_i0(x):
    """log of the modified Bessel function I0, numerically stable."""
    return jnp.log(jsp.i0e(x)) + jnp.abs(x)


def log_i1(x):
    return jnp.log(jsp.i1e(x)) + jnp.abs(x)


class VonMises(Distribution):
    """Circular distribution on S^1; used by the MCMC backend where the
    reference sidesteps circular topology via the phi_xy 2-vector trick
    (`/root/reference/velocycle/phases.py:103-132`)."""

    has_rsample = False
    support = "circular"

    def __init__(self, loc, concentration):
        self.loc, self.concentration = _promote(loc, concentration)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(
            jnp.shape(self.loc), jnp.shape(self.concentration)
        )

    def log_prob(self, value):
        return (
            self.concentration * jnp.cos(value - self.loc)
            - _LOG_2PI
            - log_i0(self.concentration)
        )

    def sample(self, key, sample_shape=()):
        """Best-Fisher (1979) rejection sampling with a fixed unrolled budget
        of proposals per draw (compiler-friendly: static shapes, no
        while_loop on accept)."""
        shape = tuple(sample_shape) + self.batch_shape
        kappa = jnp.broadcast_to(self.concentration, shape)
        loc = jnp.broadcast_to(self.loc, shape)

        tau = 1.0 + jnp.sqrt(1.0 + 4.0 * kappa**2)
        rho = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * kappa + 1e-12)
        r = (1.0 + rho**2) / (2.0 * rho + 1e-12)

        def proposal(k):
            k1, k2, k3 = jax.random.split(k, 3)
            u1 = jax.random.uniform(k1, shape)
            u2 = jax.random.uniform(k2, shape)
            u3 = jax.random.uniform(k3, shape)
            z = jnp.cos(jnp.pi * u1)
            f = (1.0 + r * z) / (r + z)
            c = kappa * (r - f)
            accept = (c * (2.0 - c) - u2 > 0) | (
                jnp.log(c / jnp.maximum(u2, 1e-12)) + 1.0 - c >= 0
            )
            theta = jnp.sign(u3 - 0.5) * jnp.arccos(jnp.clip(f, -1.0, 1.0))
            return accept, theta

        # 16 rounds of rejection: acceptance rate is >60% per round, so the
        # probability all 16 fail is < 1e-6 even at extreme kappa.
        keys = jax.random.split(key, 16)
        found = jnp.zeros(shape, dtype=bool)
        out = jnp.zeros(shape, dtype=loc.dtype)
        for i in range(16):
            acc, theta = proposal(keys[i])
            take = acc & ~found
            out = jnp.where(take, theta, out)
            found = found | acc
        wrapped = jnp.mod(out + loc + jnp.pi, 2.0 * jnp.pi) - jnp.pi
        return wrapped

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)


class ProjectedNormal(Distribution):
    """Angle of a 2-D isotropic normal centred at ``loc_xy`` — the implicit
    prior the reference places on phases through the phi_xy parametrization
    (`/root/reference/velocycle/phase_inference_model.py:366`)."""

    def __init__(self, loc_xy, scale=1.0):
        (self.loc_xy,) = _promote(loc_xy)
        (self.scale,) = _promote(scale)

    @property
    def batch_shape(self):
        return self.loc_xy.shape[:-1]

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape + (2,)
        xy = self.loc_xy + self.scale[..., None] * jax.random.normal(
            key, shape, dtype=self.loc_xy.dtype
        )
        return jnp.arctan2(xy[..., 1], xy[..., 0])

    def log_prob(self, value):
        """Exact projected-normal density on the circle."""
        mx = self.loc_xy[..., 0] / self.scale
        my = self.loc_xy[..., 1] / self.scale
        t = mx * jnp.cos(value) + my * jnp.sin(value)
        r2 = mx * mx + my * my
        # p(theta) = exp(-r^2/2)/(2 pi) * (1 + t * Phi(t)/phi(t))
        log_ratio = jnp.log1p(
            t * jnp.exp(
                jnp.log(jsp.ndtr(t) + 1e-38) + 0.5 * t * t + 0.5 * _LOG_2PI
            )
        )
        return -0.5 * r2 - _LOG_2PI + log_ratio

    @property
    def mean(self):
        return jnp.arctan2(self.loc_xy[..., 1], self.loc_xy[..., 0])
