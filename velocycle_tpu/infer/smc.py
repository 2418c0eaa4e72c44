"""Sequential Monte Carlo sampler (likelihood-tempered SMC).

Inference engine #3 (BASELINE.json config #5: "cell-axis sharding + SMC
particle backend") — no reference equivalent; the reference is SVI-only.

Del Moral-style adaptive tempering:

  1. particles ~ prior (unconstrained space, via the same bijections as
     MCMC);
  2. anneal the likelihood exponent beta: 0 -> 1, each increment chosen by
     bisection so the effective sample size of the incremental weights
     stays at ``target_ess`` (a `lax.while_loop` inside the compiled
     step);
  3. systematic resampling;
  4. rejuvenation: a few HMC transitions at the current tempered
     posterior.

TPU-first: particles are the leading axis of every array — a `vmap` batch
on one chip, a sharded axis over a ``("particles",)`` mesh on many.  Under
pjit the resampling gather and the ESS/log-mean-exp reductions lower to
XLA collectives; nothing in this file is device-count aware.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import constraints as C
from ..core import handlers
from .mcmc import _hmc_step

__all__ = ["SMC", "init_tempered_model"]


class TemperedModel(NamedTuple):
    log_prior_fn: callable     # flat_u -> log p(latents) + log|J| - C_prior
    log_lik_fn: callable       # flat_u -> log p(obs | latents) - C_lik
    unflatten: callable
    sample_prior_u: callable   # key -> flat_u  (one prior draw)
    dim: int
    log_lik_offset: float = 0.0   # C_lik: add back for ABSOLUTE logZ


def init_tempered_model(model, *args, key=None, **kwargs):
    """Split the model's joint into prior and likelihood parts over a flat
    unconstrained vector (observed sites = likelihood; latent sites =
    prior, with bijection Jacobians).

    Both parts are returned BASELINED: each site's elementwise log-prob at
    a reference prior draw is subtracted before the reduction.  Same
    posterior and same tempered weights (the shift cancels in normalized
    weights and ESS), but the float32 reduction noise drops ~2 orders of
    magnitude — load-bearing for the Metropolis arithmetic of the
    rejuvenation moves and for weight stability at scale (see
    `mcmc.init_model`'s docstring for the measurement).  The likelihood's
    subtracted constant is recorded in ``log_lik_offset``;
    `SMC.log_evidence` adds it back."""
    if key is None:
        key = jax.random.PRNGKey(0)
    tr = handlers.trace(handlers.seed(model, key)).get_trace(*args, **kwargs)

    site_meta = {}
    for name, site in tr.items():
        if site["type"] != "sample" or site["is_observed"]:
            continue
        if site.get("infer", {}).get("is_auxiliary"):
            continue
        value = jnp.asarray(site["value"], jnp.float32)
        constraint = C.biject_to(getattr(site["fn"], "support", "real"))
        site_meta[name] = (value.shape, int(value.size), constraint)
    dim = sum(size for _, size, _ in site_meta.values())

    def _values_and_logdet(flat_u):
        values = {}
        log_det = 0.0
        i = 0
        for name, (shape, size, constraint) in site_meta.items():
            u = flat_u[i:i + size].reshape(shape)
            values[name] = constraint.forward(u)
            log_det = log_det + constraint.log_abs_det_jacobian(u).sum()
            i += size
        return values, log_det

    def _traced(flat_u):
        # full-precision matmuls: Metropolis/weight arithmetic cannot
        # tolerate the TPU's default bf16 matmul rounding (see
        # mcmc.init_model)
        with jax.default_matmul_precision("highest"):
            values, log_det = _values_and_logdet(flat_u)
            sub = handlers.substitute(model, data=values)
            return handlers.trace(
                handlers.seed(sub, jax.random.PRNGKey(0))
            ).get_trace(*args, **kwargs), log_det

    # elementwise baselines at the reference draw (the seeding trace)
    prior_baselines, lik_baselines = {}, {}
    log_lik_offset = 0.0
    for name, site in tr.items():
        if site["type"] != "sample":
            continue
        if site.get("infer", {}).get("is_auxiliary"):
            continue
        lp0 = jax.lax.stop_gradient(site["fn"].log_prob(site["value"]))
        if site["is_observed"]:
            lik_baselines[name] = lp0
            log_lik_offset += float(
                np.sum(np.asarray(jax.device_get(lp0), np.float64))
            )
        else:
            prior_baselines[name] = lp0

    def log_prior_fn(flat_u):
        tr, log_det = _traced(flat_u)
        lp = log_det
        for name, site in tr.items():
            if site["type"] != "sample" or site["is_observed"]:
                continue
            if site.get("infer", {}).get("is_auxiliary"):
                continue
            term = site["fn"].log_prob(site["value"])
            b = prior_baselines.get(name)
            if b is not None:
                term = term - b
            lp = lp + term.sum()
        return lp

    def log_lik_fn(flat_u):
        tr, _ = _traced(flat_u)
        ll = 0.0
        for name, site in tr.items():
            if site["type"] == "sample" and site["is_observed"]:
                term = site["fn"].log_prob(site["value"])
                b = lik_baselines.get(name)
                if b is not None:
                    term = term - b
                ll = ll + term.sum()
        return ll

    def unflatten(flat_u):
        values, _ = _values_and_logdet(flat_u)
        return values

    def sample_prior_u(key):
        ptr = handlers.trace(handlers.seed(model, key)).get_trace(
            *args, **kwargs
        )
        parts = []
        for name, (shape, size, constraint) in site_meta.items():
            v = jnp.asarray(ptr[name]["value"], jnp.float32)
            parts.append(constraint.inverse(v).reshape(-1))
        return jnp.concatenate(parts)

    return TemperedModel(log_prior_fn, log_lik_fn, unflatten,
                         sample_prior_u, dim, log_lik_offset)


def _systematic_resample(key, log_weights, n):
    """Systematic resampling: indices (n,) with O(1) random numbers."""
    w = jax.nn.softmax(log_weights)
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key, ())
    pts = (u0 + jnp.arange(n)) / n
    return jnp.searchsorted(cum, pts)


def _ess(log_w):
    log_norm = jax.scipy.special.logsumexp(log_w)
    w = jnp.exp(log_w - log_norm)
    return 1.0 / jnp.sum(w * w)


class SMC:
    """Adaptive tempered SMC driver.

    Example::

        smc = SMC(model, num_particles=512)
        state = smc.run(jax.random.PRNGKey(0), data)
        samples = smc.get_samples()        # {site: (num_particles, ...)}
        logZ = smc.log_evidence()
    """

    def __init__(self, model, num_particles=512, num_moves=3,
                 target_ess=0.5, hmc_step_size=0.1, hmc_leapfrog=8,
                 max_stages=50):
        self.model = model
        self.num_particles = num_particles
        self.num_moves = num_moves
        self.target_ess = target_ess
        self.hmc_step_size = hmc_step_size
        self.hmc_leapfrog = hmc_leapfrog
        self.max_stages = max_stages
        self.tempered = None
        self._particles = None
        self._log_Z = None
        self._betas = None

    def run(self, key, *args, mesh=None, particle_axis="particles",
            **kwargs):
        """Run the sampler.  With ``mesh=`` (a `jax.sharding.Mesh` carrying
        ``particle_axis``), the particle population is sharded over that
        axis: the whole tempering scan compiles SPMD, with the ESS/evidence
        reductions lowering to psum and the systematic-resampling gather
        (``particles[idx]``) to an XLA all-gather/permute across the mesh."""
        k_init, k_prior, k_run = jax.random.split(key, 3)
        tm = init_tempered_model(self.model, *args, key=k_init, **kwargs)
        self.tempered = tm
        n = self.num_particles

        prior_keys = jax.random.split(k_prior, n)
        particles = jax.vmap(tm.sample_prior_u)(prior_keys)  # (n, dim)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            particles = jax.device_put(
                particles, NamedSharding(mesh, P(particle_axis))
            )

        log_lik_v = jax.vmap(tm.log_lik_fn)

        def potential_at(beta):
            def pot(u):
                return -(tm.log_prior_fn(u) + beta * tm.log_lik_fn(u))
            return pot

        def next_beta(beta, loglik):
            """Largest delta with ESS(delta * loglik) >= target via
            bisection."""
            target = self.target_ess * n

            def ess_at(b):
                return _ess((b - beta) * loglik)

            def cond(carry):
                lo, hi, it = carry
                return (it < 30) & ((hi - lo) > 1e-4)

            def body(carry):
                lo, hi, it = carry
                mid = 0.5 * (lo + hi)
                ok = ess_at(mid) >= target
                return (jnp.where(ok, mid, lo), jnp.where(ok, hi, mid),
                        it + 1)

            full = ess_at(1.0) >= target
            lo, hi, _ = jax.lax.while_loop(
                cond, body, (beta, jnp.asarray(1.0), 0)
            )
            return jnp.where(full, 1.0, lo)

        @jax.jit
        def stage(carry, key):
            particles, beta, log_Z, done = carry
            k_res, k_move = jax.random.split(key)
            loglik = log_lik_v(particles)                      # (n,)
            new_beta = next_beta(beta, loglik)
            delta = new_beta - beta
            log_w = delta * loglik
            # evidence increment: log mean exp of the incremental weights
            log_Z_inc = (
                jax.scipy.special.logsumexp(log_w) - jnp.log(float(n))
            )
            idx = _systematic_resample(k_res, log_w, n)
            particles = jnp.where(done, particles, particles[idx])

            # rejuvenation: HMC at the new tempered posterior
            pot = potential_at(new_beta)
            inv_mass = jnp.maximum(
                jnp.var(particles, axis=0), 1e-6
            )

            def move(u, k):
                # carry (pot, grad) across the moves: one value_and_grad
                # per leapfrog for the whole rejuvenation sweep
                potv, g = jax.value_and_grad(pot)(u)

                def one(carry, kk):
                    u, potv, g = carry
                    u, _, potv, g = _hmc_step(
                        pot, u, kk, self.hmc_step_size, inv_mass,
                        self.hmc_leapfrog, potv, g,
                    )
                    return (u, potv, g), None

                (u, _, _), _ = jax.lax.scan(
                    one, (u, potv, g), jax.random.split(k, self.num_moves)
                )
                return u

            moved = jax.vmap(move)(
                particles, jax.random.split(k_move, n)
            )
            particles = jnp.where(done, particles, moved)
            log_Z = jnp.where(done, log_Z, log_Z + log_Z_inc)
            new_done = done | (new_beta >= 1.0)
            return (
                particles,
                jnp.where(done, beta, new_beta),
                log_Z,
                new_done,
            ), jnp.where(done, jnp.nan, new_beta)

        carry = (particles, jnp.asarray(0.0), jnp.asarray(0.0),
                 jnp.asarray(False))
        keys = jax.random.split(k_run, self.max_stages)

        @jax.jit
        def run_all(carry, keys):
            return jax.lax.scan(stage, carry, keys)

        (particles, beta, log_Z, done), betas = run_all(carry, keys)
        if not bool(jax.device_get(done)):
            raise RuntimeError(
                f"SMC did not reach beta=1 in {self.max_stages} stages "
                f"(beta={float(jax.device_get(beta)):.4f}); increase "
                "max_stages or target_ess"
            )
        self._particles = particles
        self._log_Z = float(jax.device_get(log_Z))
        self._betas = np.asarray(jax.device_get(betas))
        return self

    def get_samples(self):
        out = jax.vmap(self.tempered.unflatten)(self._particles)
        return {k: np.asarray(jax.device_get(v)) for k, v in out.items()}

    def log_evidence(self):
        """log Z.  The tempered weights used the BASELINED likelihood
        (l - C); over the full 0->1 schedule that under-counts by exactly
        C = ``log_lik_offset``, added back here."""
        return self._log_Z + self.tempered.log_lik_offset

    @property
    def temperature_schedule(self):
        b = self._betas
        return b[np.isfinite(b)]


class BridgedSMC:
    """Variational-bridge tempered SMC (annealed importance sampling with
    adaptive tempering and HMC rejuvenation) on a WHITENED `ModelInfo`.

    Prior-to-posterior tempering degenerates with data size: the stage
    count grows with the sd of the prior-predictive log-likelihood, which
    scales with Ng x Nc (the r3 bench could not run Ng=50 x Nc=500 in
    budget; >400 stages).  This sampler instead tempers from the
    VARIATIONAL start:

        gamma_beta(v) = N(v; 0, I)^(1-beta) * exp(-pot(v))^beta

    where ``pot`` is the potential of an SVI-warm-started,
    Fisher/Hessian-whitened model (`mcmc.init_model` +
    `mcmc.block_precondition` — the same geometry NUTS uses).  At beta=0
    the start distribution is exact and NORMALIZED (Z_0 = 1); the number
    of stages is set by how far the true posterior is from its Gaussian
    approximation — independent of data size (more data usually makes the
    posterior MORE Gaussian, so scaling IMPROVES the bridge).

    log-evidence: log Z = logZ_accum + log_offset + log_det_scale, where
    the last two undo the potential's baseline shift and the whitening
    change of variables.  TPU-first: particles are one vmap axis, every
    stage is fused XLA, sharding as in `SMC`.
    """

    def __init__(self, model_info, num_particles=512, num_moves=3,
                 target_ess=0.5, hmc_step_size=0.25, hmc_leapfrog=8,
                 max_stages=50):
        self.info = model_info
        self.num_particles = num_particles
        self.num_moves = num_moves
        self.target_ess = target_ess
        self.hmc_step_size = hmc_step_size
        self.hmc_leapfrog = hmc_leapfrog
        self.max_stages = max_stages
        self._particles = None
        self._log_Z = None
        self._betas = None

    def run(self, key, mesh=None, particle_axis="particles"):
        info = self.info
        dim = info.init_u.shape[0]
        n = self.num_particles
        pot = info.potential_fn

        k_prior, k_run = jax.random.split(key)
        particles = jax.random.normal(k_prior, (n, dim))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            particles = jax.device_put(
                particles, NamedSharding(mesh, P(particle_axis))
            )

        def log_ratio(v):
            # log [exp(-pot) / N(0, I)]; the N constant matters for logZ
            return -(pot(v)) + 0.5 * jnp.sum(v * v) + 0.5 * dim * jnp.log(
                2.0 * jnp.pi
            )

        log_ratio_v = jax.vmap(log_ratio)

        def potential_at(beta):
            def tempered_pot(v):
                return (1.0 - beta) * 0.5 * jnp.sum(v * v) + beta * pot(v)
            return tempered_pot

        def next_beta(beta, lr):
            target = self.target_ess * n

            def ess_at(b):
                return _ess((b - beta) * lr)

            def cond(carry):
                lo, hi, it = carry
                return (it < 30) & ((hi - lo) > 1e-4)

            def body(carry):
                lo, hi, it = carry
                mid = 0.5 * (lo + hi)
                ok = ess_at(mid) >= target
                return (jnp.where(ok, mid, lo), jnp.where(ok, hi, mid),
                        it + 1)

            full = ess_at(1.0) >= target
            lo, hi, _ = jax.lax.while_loop(
                cond, body, (beta, jnp.asarray(1.0), 0)
            )
            return jnp.where(full, 1.0, lo)

        @jax.jit
        def stage(carry, key):
            particles, beta, log_Z, done = carry
            k_res, k_move = jax.random.split(key)
            lr = log_ratio_v(particles)                       # (n,)
            new_beta = next_beta(beta, lr)
            delta = new_beta - beta
            log_w = delta * lr
            log_Z_inc = (
                jax.scipy.special.logsumexp(log_w) - jnp.log(float(n))
            )
            idx = _systematic_resample(k_res, log_w, n)
            particles = jnp.where(done, particles, particles[idx])

            tpot = potential_at(new_beta)
            inv_mass = jnp.maximum(jnp.var(particles, axis=0), 1e-6)

            def move(u, k):
                potv, g = jax.value_and_grad(tpot)(u)

                def one(carry, kk):
                    u, potv, g = carry
                    u, _, potv, g = _hmc_step(
                        tpot, u, kk, self.hmc_step_size, inv_mass,
                        self.hmc_leapfrog, potv, g,
                    )
                    return (u, potv, g), None

                (u, _, _), _ = jax.lax.scan(
                    one, (u, potv, g), jax.random.split(k, self.num_moves)
                )
                return u

            moved = jax.vmap(move)(particles, jax.random.split(k_move, n))
            particles = jnp.where(done, particles, moved)
            log_Z = jnp.where(done, log_Z, log_Z + log_Z_inc)
            new_done = done | (new_beta >= 1.0)
            return (
                particles, jnp.where(done, beta, new_beta), log_Z, new_done,
            ), jnp.where(done, jnp.nan, new_beta)

        carry = (particles, jnp.asarray(0.0), jnp.asarray(0.0),
                 jnp.asarray(False))
        keys = jax.random.split(k_run, self.max_stages)

        @jax.jit
        def run_all(carry, keys):
            return jax.lax.scan(stage, carry, keys)

        (particles, beta, log_Z, done), betas = run_all(carry, keys)
        if not bool(jax.device_get(done)):
            raise RuntimeError(
                f"bridged SMC did not reach beta=1 in {self.max_stages} "
                f"stages (beta={float(jax.device_get(beta)):.4f}); the "
                "variational start may be poor — more SVI steps, or "
                "increase max_stages"
            )
        self._particles = particles
        self._log_Z = float(jax.device_get(log_Z))
        self._betas = np.asarray(jax.device_get(betas))
        return self

    def get_samples(self):
        out = jax.vmap(self.info.unflatten)(self._particles)
        return {k: np.asarray(jax.device_get(v)) for k, v in out.items()}

    def log_evidence(self):
        return self._log_Z + self.info.log_offset + self.info.log_det_scale

    @property
    def temperature_schedule(self):
        b = self._betas
        return b[np.isfinite(b)]
