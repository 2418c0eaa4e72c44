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


def _elbo_term(site):
    if site["type"] != "sample" or site.get("hidden"):
        return None
    if site.get("infer", {}).get("is_auxiliary"):
        return None
    return site["fn"].log_prob(site["value"]) * site.get("scale", 1.0)


class TraceEnum_ELBO:
    """Trace ELBO with exact parallel enumeration of marked discrete sites
    (pyro ``TraceEnum_ELBO`` / ``config_enumerate`` equivalent;
    `/root/reference/velocycle/phase_inference_model.py:397,425`).

    Sites sampled in the MODEL with ``infer={"enumerate": "parallel"}``
    and absent from the guide are summed out of the model log-joint:

        log p(x, z_cont) = logsumexp_k [ sum_{factors on k} log p ]
                           + sum_{factors independent of k} log p

    where the logsumexp runs per element of the enumerated sites' batch
    profile (a per-gene Bernoulli is marginalized per gene), and factor
    axes the profile does not carry (e.g. the cell axis of the likelihood)
    are summed *inside* the logsumexp.  Enumerated sites broadcast on
    leading axes (see `handlers.enum`), so a model written with ordinary
    ``jnp.where`` mixing — like the reference's LBA — needs no changes.

    Continuous sites keep the standard single-particle reparameterized
    estimator.  Limitations (the first shared with pyro's parallel
    strategy): a factor may not couple an enumerated variable across its
    own batch axes, and when several sites are enumerated they should
    share one batch profile (e.g. all per-gene) — mixed-granularity
    enumeration needs per-plate factor bookkeeping this lean
    implementation does not do.
    """

    def __init__(self, num_particles=1):
        self.num_particles = num_particles

    def loss(self, key, model, guide, *args, **kwargs):
        import jax.numpy as jnp

        def particle(k):
            k_guide, k_model = jax.random.split(k)
            guide_tr = handlers.trace(
                handlers.seed(guide, k_guide)
            ).get_trace(*args, **kwargs)
            replayed = handlers.seed(
                handlers.replay(model, guide_trace=guide_tr), k_model
            )
            # base trace: enum sites sampled normally — only its (static)
            # log-prob *shapes* are used, so XLA dead-code-eliminates the
            # sampled branch under jit
            base_tr = handlers.trace(replayed).get_trace(*args, **kwargs)
            base_ndim = {
                name: _elbo_term(site).ndim
                for name, site in base_tr.items()
                if _elbo_term(site) is not None
            }
            model_tr = handlers.trace(
                handlers.enum(replayed)
            ).get_trace(*args, **kwargs)

            # profile = broadcast batch shape of the enumerated sites
            profile = ()
            for site in model_tr.values():
                if site.get("infer", {}).get("_enumerated"):
                    profile = jnp.broadcast_shapes(
                        profile, tuple(site["fn"].batch_shape)
                    )

            lps = {}
            for name, site in model_tr.items():
                lp = _elbo_term(site)
                if lp is not None:
                    lps[name] = lp
            dep_names = [
                n for n, lp in lps.items() if lp.ndim > base_ndim[n]
            ]
            indep = 0.0
            for n, lp in lps.items():
                if n not in dep_names:
                    indep = indep + lp.sum()
            if dep_names:
                # common base width so every factor's enum prefix sits
                # left of the SAME number of batch axes (right-aligned
                # broadcasting then lines the enum axes up correctly)
                M = max(base_ndim[n] for n in dep_names)
                dep = None
                for n in dep_names:
                    lp, nb = lps[n], base_ndim[n]
                    extra = lp.ndim - nb
                    # the factor's trailing base axes must be broadcast-
                    # compatible with the enum profile (size equal, or 1
                    # on either side) — a silent positional reduction on
                    # a mismatched axis would marginalize the WRONG axis
                    # and return a wrong ELBO/gradient with no error
                    for r in range(1, min(nb, len(profile)) + 1):
                        ls, ps = lp.shape[-r], profile[-r]
                        if ls != ps and ls != 1 and ps != 1:
                            raise ValueError(
                                f"enumerated-dependent factor {n!r} has "
                                f"batch shape {lp.shape[extra:]} whose "
                                f"axis -{r} (size {ls}) is not broadcast-"
                                f"compatible with the enumeration "
                                f"profile {tuple(profile)} (size {ps}); "
                                "reshape the factor so its trailing axes "
                                "line up with the enumerated sites' "
                                "batch shape"
                            )
                    # sum base axes the enum profile does not carry INSIDE
                    # the marginalization (keepdims preserves alignment)
                    reduce_axes = tuple(
                        lp.ndim - r
                        for r in range(1, nb + 1)
                        if r > len(profile) or profile[-r] == 1
                    )
                    if reduce_axes:
                        lp = lp.sum(axis=reduce_axes, keepdims=True)
                    lp = lp.reshape(
                        lp.shape[:extra] + (1,) * (M - nb) + lp.shape[extra:]
                    )
                    dep = lp if dep is None else dep + lp
                n_enum = dep.ndim - M
                marg = jax.scipy.special.logsumexp(
                    dep, axis=tuple(range(n_enum))
                )
                indep = indep + marg.sum()
            logq = _logp_sum(guide_tr)
            return -(indep - logq)

        if self.num_particles == 1:
            return particle(key)
        keys = jax.random.split(key, self.num_particles)
        return jax.vmap(particle)(keys).mean()
