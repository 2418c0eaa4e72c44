"""Automatic guides.

`AutoNormal` replaces `pyro.infer.autoguide.AutoNormal` as used by the
reference's 2-D driver (`tutorials/VeloCycle_2D/run_simulations.py:30,46`)
and as the `PhaseFitModel` fallback
(`/root/reference/velocycle/phase_inference_model.py:157-160`): a diagonal
Normal over every latent site, locs initialized from one prior draw (a la
init_to_sample) or the prior mean.

The model is traced once host-side to harvest site shapes; afterwards the
guide is pure traced jnp, so it compiles into the same fused SVI step as
hand-written guides.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import constraints, handlers
from ..core import distributions as dist

__all__ = ["AutoNormal", "AutoDelta"]


class _AutoGuide:
    def __init__(self, model, prefix=None, init_key=None):
        self.model = model
        self.prefix = prefix or type(self).__name__
        self.init_key = init_key if init_key is not None else (
            jax.random.PRNGKey(0)
        )
        self._prototype = None

    def _get_prototype(self, *args, **kwargs):
        if self._prototype is None:
            tr = handlers.trace(
                handlers.seed(self.model, self.init_key)
            ).get_trace(*args, **kwargs)
            proto = {}
            for name, site in tr.items():
                if site["type"] != "sample" or site["is_observed"]:
                    continue
                if site.get("infer", {}).get("is_auxiliary"):
                    continue
                proto[name] = jnp.asarray(site["value"])
            self._prototype = proto
        return self._prototype


class AutoNormal(_AutoGuide):
    """Mean-field Normal guide: per-site ``loc``/``scale`` params."""

    def __init__(self, model, init_scale=0.1, **kwargs):
        super().__init__(model, **kwargs)
        self.init_scale = init_scale

    def __call__(self, *args, **kwargs):
        proto = self._get_prototype(*args, **kwargs)
        for name, value in proto.items():
            loc = handlers.param(f"{self.prefix}.locs.{name}", value)
            scale = handlers.param(
                f"{self.prefix}.scales.{name}",
                jnp.full(value.shape, self.init_scale, value.dtype),
                constraint=constraints.positive,
            )
            handlers.sample(
                name, dist.Normal(loc, scale).to_event(value.ndim)
            )

    def median(self, params):
        """{site: loc} from a constrained param dict."""
        return {
            name[len(self.prefix) + 6:]: v
            for name, v in params.items()
            if name.startswith(f"{self.prefix}.locs.")
        }


class AutoDelta(_AutoGuide):
    """MAP guide: Delta at a learnable point per site."""

    def __call__(self, *args, **kwargs):
        proto = self._get_prototype(*args, **kwargs)
        for name, value in proto.items():
            loc = handlers.param(f"{self.prefix}.locs.{name}", value)
            handlers.sample(name, dist.Delta(loc).to_event(value.ndim))

    median = AutoNormal.median
