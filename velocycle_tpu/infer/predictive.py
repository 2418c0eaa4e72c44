"""Posterior predictive sampling.

Replaces `pyro.infer.Predictive` as used by the fit drivers
(`/root/reference/velocycle/phase_inference_model.py:274-302`): draw from
the guide, replay the model, collect requested latent *and* deterministic
sites.  TPU-first: one jitted, `vmap`-ed program evaluates all samples in a
single fused computation — the reference loops Python-side per sample and
moves bins to CPU to bound GPU memory; here `num_samples` is a batch axis
and binning is only needed for very large site sets.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import handlers

__all__ = ["Predictive"]


class Predictive:
    """Sample sites from guide-replayed model executions.

    Args:
      model: model callable.
      guide: guide callable (optional; without it, samples the prior
        predictive by running the unconditioned model).
      params: dict of *constrained* parameter values substituted into both
        model and guide (the trained variational parameters).
      num_samples: number of posterior draws.
      return_sites: site names to collect; None = all sample +
        deterministic sites.
    """

    def __init__(self, model, guide=None, params=None, num_samples=1,
                 return_sites=None):
        self.model = model
        self.guide = guide
        self.params = params or {}
        self.num_samples = num_samples
        self.return_sites = return_sites

    def _single(self, key, args, kwargs):
        k_guide, k_model = jax.random.split(key)
        model = handlers.substitute(self.model, data=self.params)
        if self.guide is not None:
            guide = handlers.substitute(self.guide, data=self.params)
            guide_tr = handlers.trace(
                handlers.seed(guide, k_guide)
            ).get_trace(*args, **kwargs)
            model = handlers.replay(model, guide_trace=guide_tr)
        else:
            guide_tr = {}
        model_tr = handlers.trace(
            handlers.seed(model, k_model)
        ).get_trace(*args, **kwargs)

        out = {}
        for name, site in {**guide_tr, **model_tr}.items():
            if site["type"] not in ("sample", "deterministic"):
                continue
            if site.get("infer", {}).get("is_auxiliary"):
                continue
            if self.return_sites is not None and name not in self.return_sites:
                continue
            out[name] = site["value"]
        if self.return_sites is not None:
            missing = set(self.return_sites) - set(out)
            if missing:
                raise KeyError(
                    f"return_sites not found in trace: {sorted(missing)}"
                )
        return out

    def __call__(self, key, *args, **kwargs):
        """Returns {site: (num_samples, ...) array}."""
        keys = jax.random.split(key, self.num_samples)

        @jax.jit
        def batched(keys):
            return jax.vmap(lambda k: self._single(k, args, kwargs))(keys)

        return batched(keys)
