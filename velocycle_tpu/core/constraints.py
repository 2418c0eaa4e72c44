"""Constraint transforms for variational parameters.

The reference stores constrained pyro.params (`constraints.positive` on
`ν_scales`, `shape_inv_locs`, etc. — `phase_inference_guide.py:36-45`).  Here
parameters live *unconstrained* in the optimizer pytree and are mapped through
a bijector inside the jitted step, so Adam updates are unconstrained and XLA
fuses the transform into the ELBO computation.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "real", "positive", "circular", "interval", "unit_interval",
    "Constraint", "biject_to",
]


class Constraint:
    name = "real"

    def forward(self, u):
        """unconstrained -> constrained"""
        return u

    def inverse(self, x):
        """constrained -> unconstrained (used once at init)"""
        return x

    def log_abs_det_jacobian(self, u):
        """log |d forward(u) / du| elementwise — the change-of-variables
        term the MCMC backend adds to the unconstrained log-density."""
        return jnp.zeros_like(jnp.asarray(u))


class _Real(Constraint):
    name = "real"


class _Circular(Constraint):
    """S^1 wrapping: the unconstrained value is an angle on the real line;
    `forward` wraps into [-pi, pi).  The log-density of a circular
    distribution is periodic, so the Jacobian is 1 and HMC trajectories
    simply wrap — the treatment the reference sidesteps with its phi_xy
    2-vector trick (`/root/reference/velocycle/phases.py:103-132`)."""

    name = "circular"

    def forward(self, u):
        import math

        return jnp.mod(u + math.pi, 2.0 * math.pi) - math.pi

    def inverse(self, x):
        return jnp.asarray(x)


class _Positive(Constraint):
    """softplus bijection: smooth, no overflow for large |u|."""

    name = "positive"

    def forward(self, u):
        return jnp.logaddexp(u, 0.0)  # softplus

    def inverse(self, x):
        x = jnp.asarray(x)
        # inverse softplus, stable for large x
        return x + jnp.log(-jnp.expm1(-x))

    def log_abs_det_jacobian(self, u):
        # d softplus(u)/du = sigmoid(u); log sigmoid(u) = -softplus(-u)
        return -jnp.logaddexp(-jnp.asarray(u), 0.0)


class _Interval(Constraint):
    name = "interval"

    def __init__(self, low, high):
        self.low = low
        self.high = high

    def forward(self, u):
        return self.low + (self.high - self.low) * jnp.reciprocal(
            1.0 + jnp.exp(-u)
        )

    def inverse(self, x):
        p = (x - self.low) / (self.high - self.low)
        p = jnp.clip(p, 1e-7, 1.0 - 1e-7)
        return jnp.log(p) - jnp.log1p(-p)

    def log_abs_det_jacobian(self, u):
        u = jnp.asarray(u)
        # d/du = (high-low) * s(u) (1 - s(u))
        return (
            jnp.log(jnp.asarray(self.high - self.low))
            - jnp.logaddexp(-u, 0.0)
            - jnp.logaddexp(u, 0.0)
        )


real = _Real()
positive = _Positive()
circular = _Circular()


def interval(low, high):
    return _Interval(low, high)


unit_interval = _Interval(0.0, 1.0)


def biject_to(support_name):
    """Constraint for a named support ("real", "positive", "unit_interval",
    "circular", or ("interval", low, high))."""
    if isinstance(support_name, tuple) and support_name[0] == "interval":
        return _Interval(support_name[1], support_name[2])
    return {
        "real": real,
        "positive": positive,
        "unit_interval": unit_interval,
        "circular": circular,
    }[support_name]
