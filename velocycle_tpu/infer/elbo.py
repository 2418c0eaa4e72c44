"""ELBO estimators.

`Trace_ELBO` reproduces the estimator the reference relies on
(`pyro.infer.Trace_ELBO(num_particles=1)`,
`/root/reference/velocycle/phase_inference_model.py:128`): a single
reparameterized sample from the guide, replayed through the model,
ELBO = sum(model log p) - sum(guide log q).  Delta guide sites contribute
log q = 0 (pyro semantics), so MAP-style sites behave identically.

The whole estimator is pure jnp, so `jax.value_and_grad` of it is exactly the
reparameterized gradient the reference computes with torch autograd — but
compiled once into a fused XLA program instead of re-traced per step.
"""
from __future__ import annotations

import jax

from ..core import handlers


def _logp_sum(tr, site_filter=lambda name, site: True):
    total = 0.0
    for name, site in tr.items():
        if site["type"] != "sample" or site.get("hidden"):
            continue
        # auxiliary sites (e.g. the LRMN guide's single rsample feeding its
        # Delta sites) carry no ELBO term, matching pyro where the rsample
        # happens outside any sample statement.
        if site.get("infer", {}).get("is_auxiliary"):
            continue
        if not site_filter(name, site):
            continue
        lp = site["fn"].log_prob(site["value"]).sum()
        # site scale (handlers.scale): minibatch blocks upweight cell-local
        # terms so each block loss is an unbiased full-ELBO estimate
        total = total + lp * site.get("scale", 1.0)
    return total


class Trace_ELBO:
    """Single-particle reparameterized Trace ELBO (negated => loss)."""

    def __init__(self, num_particles=1):
        self.num_particles = num_particles

    def loss(self, key, model, guide, *args, **kwargs):
        def particle(k):
            k_guide, k_model = jax.random.split(k)
            guide_tr = handlers.trace(
                handlers.seed(guide, k_guide)
            ).get_trace(*args, **kwargs)
            model_tr = handlers.trace(
                handlers.seed(
                    handlers.replay(model, guide_trace=guide_tr), k_model
                )
            ).get_trace(*args, **kwargs)
            logp = _logp_sum(model_tr)
            logq = _logp_sum(guide_tr)
            return -(logp - logq)

        if self.num_particles == 1:
            return particle(key)
        keys = jax.random.split(key, self.num_particles)
        return jax.vmap(particle)(keys).mean()
