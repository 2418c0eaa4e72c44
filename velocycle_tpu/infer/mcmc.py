"""MCMC inference engines: HMC and NUTS, fully compiled, chain-parallel.

North-star additions over the SVI-only reference (BASELINE.json: "NUTS/HMC
posterior on phase model with S^1 wrapping bijector, 256 chains sharded
over pod").  TPU-first design:

  * The model's joint density is lowered once to a **potential function**
    over a flat unconstrained vector via the effect handlers +
    `constraints.biject_to` bijections (positive -> softplus,
    unit-interval -> sigmoid, S^1 -> wrap); the change-of-variables log-dets
    are added automatically.  Circular sites get the wrapping treatment the
    reference avoids with its Euclidean phi_xy trick — both
    parametrizations are supported.
  * One leapfrog step = one fused XLA region (grad of the potential is the
    same compiled graph SVI differentiates).  Warmup (dual-averaging step
    size + diagonal mass estimation) and sampling run under `lax.scan`; the
    entire run is a single jitted program per phase.
  * Chains are a `vmap` axis — shard it over the mesh
    (`parallel.make_mesh(("chains",))`) and every chain runs SPMD with zero
    cross-chain communication.
  * NUTS is the iterative multinomial variant (Hoffman & Gelman 2014, with
    multinomial state sampling a la Betancourt 2017) with static maximum
    tree depth, implemented with `lax.while_loop` — compiler-friendly
    control flow, no recursion.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import constraints as C
from ..core import handlers

__all__ = ["init_model", "hmc", "nuts", "MCMC"]


# ---------------------------------------------------------------------------
# model -> potential function over a flat unconstrained vector
# ---------------------------------------------------------------------------

class ModelInfo(NamedTuple):
    potential_fn: callable        # (flat_u) -> -log p(u)  [unconstrained]
    unflatten: callable           # flat_u -> {site: constrained value}
    init_u: jnp.ndarray           # a flat init point
    site_meta: dict               # {site: (shape, size, constraint)}


def init_model(model, *args, key=None, init_strategy="prior", **kwargs):
    """Trace the model once to discover latent sites, build bijections, and
    return a `ModelInfo` with a flat potential function."""
    if key is None:
        key = jax.random.PRNGKey(0)
    tr = handlers.trace(handlers.seed(model, key)).get_trace(*args, **kwargs)

    site_meta = {}
    init_parts = []
    for name, site in tr.items():
        if site["type"] != "sample" or site["is_observed"]:
            continue
        if site.get("infer", {}).get("is_auxiliary"):
            continue
        fn = site["fn"]
        if not getattr(fn, "has_rsample", True) and getattr(
            fn, "support", "real"
        ) not in ("real", "positive", "unit_interval", "circular"):
            raise ValueError(f"site {name!r} has unsupported support")
        value = jnp.asarray(site["value"], jnp.float32)
        constraint = C.biject_to(getattr(fn, "support", "real"))
        site_meta[name] = (value.shape, int(value.size), constraint)
        u0 = constraint.inverse(value)
        if init_strategy == "zero":
            u0 = jnp.zeros_like(u0)
        init_parts.append(u0.reshape(-1))
    init_u = jnp.concatenate(init_parts) if init_parts else jnp.zeros((0,))

    def unflatten(flat_u):
        out = {}
        i = 0
        for name, (shape, size, constraint) in site_meta.items():
            u = flat_u[i:i + size].reshape(shape)
            out[name] = constraint.forward(u)
            i += size
        return out

    def potential_fn(flat_u):
        values = {}
        log_det = 0.0
        i = 0
        for name, (shape, size, constraint) in site_meta.items():
            u = flat_u[i:i + size].reshape(shape)
            values[name] = constraint.forward(u)
            log_det = log_det + constraint.log_abs_det_jacobian(u).sum()
            i += size
        sub = handlers.substitute(model, data=values)
        tr = handlers.trace(
            handlers.seed(sub, jax.random.PRNGKey(0))
        ).get_trace(*args, **kwargs)
        logp = 0.0
        for name, site in tr.items():
            if site["type"] != "sample":
                continue
            if site.get("infer", {}).get("is_auxiliary"):
                continue
            logp = logp + site["fn"].log_prob(site["value"]).sum()
        return -(logp + log_det)

    return ModelInfo(potential_fn, unflatten, init_u, site_meta)


# ---------------------------------------------------------------------------
# leapfrog + dual averaging
# ---------------------------------------------------------------------------

def _leapfrog(potential_grad, q, p, step_size, inv_mass, n_steps):
    """``n_steps`` leapfrog steps under a diagonal mass matrix."""

    def body(_, qp):
        q, p = qp
        p = p - 0.5 * step_size * potential_grad(q)
        q = q + step_size * inv_mass * p
        p = p - 0.5 * step_size * potential_grad(q)
        return (q, p)

    return jax.lax.fori_loop(0, n_steps, body, (q, p))


class DAState(NamedTuple):
    log_step: jnp.ndarray
    log_step_avg: jnp.ndarray
    h_sum: jnp.ndarray
    mu: jnp.ndarray
    t: jnp.ndarray


def _da_init(step_size):
    log_step = jnp.log(step_size)
    return DAState(log_step, jnp.zeros(()), jnp.zeros(()),
                   jnp.log(10.0) + log_step, jnp.zeros(()))


def _da_update(state, accept_prob, target=0.8, gamma=0.05, t0=10.0,
               kappa=0.75):
    t = state.t + 1.0
    h_sum = state.h_sum + (target - accept_prob)
    log_step = state.mu - jnp.sqrt(t) / gamma * h_sum / (t + t0)
    eta = t ** (-kappa)
    log_step_avg = eta * log_step + (1 - eta) * state.log_step_avg
    return DAState(log_step, log_step_avg, h_sum, state.mu, t)


# ---------------------------------------------------------------------------
# HMC
# ---------------------------------------------------------------------------

def _kinetic(p, inv_mass):
    return 0.5 * jnp.sum(p * p * inv_mass)


def _hmc_step(potential_fn, q, key, step_size, inv_mass, num_leapfrog):
    grad = jax.grad(potential_fn)
    k_mom, k_acc = jax.random.split(key)
    p = jax.random.normal(k_mom, q.shape) / jnp.sqrt(inv_mass)
    energy0 = potential_fn(q) + _kinetic(p, inv_mass)
    q_new, p_new = _leapfrog(grad, q, p, step_size, inv_mass, num_leapfrog)
    energy1 = potential_fn(q_new) + _kinetic(p_new, inv_mass)
    delta = energy0 - energy1
    delta = jnp.where(jnp.isfinite(delta), delta, -jnp.inf)
    accept_prob = jnp.minimum(1.0, jnp.exp(delta))
    accept = jax.random.uniform(k_acc) < accept_prob
    q = jnp.where(accept, q_new, q)
    return q, accept_prob


# ---------------------------------------------------------------------------
# NUTS (iterative, multinomial, static max depth)
# ---------------------------------------------------------------------------

class _TreeState(NamedTuple):
    q_minus: jnp.ndarray
    p_minus: jnp.ndarray
    q_plus: jnp.ndarray
    p_plus: jnp.ndarray
    q_prop: jnp.ndarray     # current proposal (multinomial over the tree)
    log_weight: jnp.ndarray  # log sum exp of -energy over the tree
    sum_p: jnp.ndarray      # sum of momenta for the U-turn check
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray
    n_steps: jnp.ndarray


def _nuts_step(potential_fn, q0, key, step_size, inv_mass, max_depth=8,
               max_delta_energy=1000.0):
    """One NUTS transition.  Doubling is implemented iteratively: at each
    depth we extend the trajectory by 2^depth leapfrog steps in a random
    direction, accumulating a multinomial proposal, and stop on a U-turn or
    divergence."""
    grad = jax.grad(potential_fn)
    k_mom, k_dir, k_prop = jax.random.split(key, 3)
    p0 = jax.random.normal(k_mom, q0.shape) / jnp.sqrt(inv_mass)
    energy0 = potential_fn(q0) + _kinetic(p0, inv_mass)

    def leapfrog1(q, p, direction):
        eps = step_size * direction
        p = p - 0.5 * eps * grad(q)
        q = q + eps * inv_mass * p
        p = p - 0.5 * eps * grad(q)
        return q, p

    def extend(carry, depth):
        state, key = carry
        key, k_dir, k_sel, k_swap = jax.random.split(key, 4)
        direction = jnp.where(jax.random.bernoulli(k_dir), 1.0, -1.0)
        n_new = 2 ** depth

        # integrate 2^depth steps from the chosen end, accumulating a
        # multinomial proposal over the new subtree
        def sub_body(i, sub):
            (q, p, log_w_new, q_prop_new, sum_p_new, turning, diverging,
             sum_acc, key) = sub
            q, p = leapfrog1(q, p, direction)
            energy = potential_fn(q) + _kinetic(p, inv_mass)
            delta = energy - energy0
            diverging = diverging | (delta > max_delta_energy)
            log_w_i = jnp.where(diverging, -jnp.inf, -delta)
            accept_i = jnp.minimum(1.0, jnp.exp(-delta))
            sum_acc = sum_acc + jnp.where(diverging, 0.0, accept_i)
            # multinomial within the new subtree
            key, k_i = jax.random.split(key)
            log_w_tot = jnp.logaddexp(log_w_new, log_w_i)
            take = jnp.log(jax.random.uniform(k_i)) < (log_w_i - log_w_tot)
            q_prop_new = jnp.where(take & ~diverging, q, q_prop_new)
            sum_p_new = sum_p_new + p
            return (q, p, log_w_tot, q_prop_new, sum_p_new, turning,
                    diverging, sum_acc, key)

        q_start = jnp.where(direction > 0, state.q_plus, state.q_minus)
        p_start = jnp.where(direction > 0, state.p_plus, state.p_minus)
        sub0 = (q_start, p_start, -jnp.inf, q_start,
                jnp.zeros_like(q_start), jnp.asarray(False),
                state.diverging, jnp.zeros(()), key)
        (q_end, p_end, log_w_new, q_prop_new, sum_p_new, _, diverging,
         sum_acc_new, key) = jax.lax.fori_loop(0, n_new, sub_body, sub0)

        # update tree ends
        q_minus = jnp.where(direction > 0, state.q_minus, q_end)
        p_minus = jnp.where(direction > 0, state.p_minus, p_end)
        q_plus = jnp.where(direction > 0, q_end, state.q_plus)
        p_plus = jnp.where(direction > 0, p_end, state.p_plus)

        # multinomial merge of old tree and new subtree (biased progressive:
        # accept new with prob w_new / w_old, as in Betancourt 2017)
        log_w_tot = jnp.logaddexp(state.log_weight, log_w_new)
        take_new = (
            jnp.log(jax.random.uniform(k_sel))
            < (log_w_new - state.log_weight)
        )
        q_prop = jnp.where(take_new & ~diverging, q_prop_new, state.q_prop)

        # U-turn check across the full trajectory (generalized criterion)
        sum_p = state.sum_p + sum_p_new
        dq = q_plus - q_minus
        turning = (
            (jnp.dot(dq, inv_mass * p_minus) < 0)
            | (jnp.dot(dq, inv_mass * p_plus) < 0)
        )
        stop = state.turning | turning | diverging
        new_state = _TreeState(
            q_minus, p_minus, q_plus, p_plus,
            jnp.where(stop & ~diverging, state.q_prop, q_prop),
            jnp.where(stop, state.log_weight, log_w_tot),
            sum_p,
            state.turning | turning,
            diverging,
            state.sum_accept + sum_acc_new,
            state.n_steps + jnp.where(stop, 0, n_new),
        )
        # freeze the state once stopped
        frozen = jax.tree_util.tree_map(
            lambda old, new: jnp.where(state.turning | state.diverging,
                                       old, new),
            state, new_state,
        )
        return (frozen, key), None

    init = _TreeState(
        q0, p0, q0, p0, q0, -(potential_fn(q0) + _kinetic(p0, inv_mass))
        - (-energy0) + 0.0 * energy0,  # = 0: log weight of the root
        p0, jnp.asarray(False), jnp.asarray(False), jnp.zeros(()),
        jnp.ones(()),
    )
    # root log weight: exp(-(E - E0)) = 1 -> log 1 = 0
    init = init._replace(log_weight=jnp.zeros(()))
    (final, _), _ = jax.lax.scan(
        extend, (init, k_prop), jnp.arange(max_depth)
    )
    accept_prob = final.sum_accept / jnp.maximum(final.n_steps, 1.0)
    return final.q_prop, accept_prob


# ---------------------------------------------------------------------------
# warmup + sampling drivers
# ---------------------------------------------------------------------------

def _warmup_and_sample(step_fn, potential_fn, q0, key, num_warmup,
                       num_samples, step_size, adapt_mass):
    """Generic driver: dual-averaging warmup (with a crude diagonal mass
    estimate from the second half of warmup), then sampling.  Entirely
    `lax.scan`; returns (samples (num_samples, dim), accept_probs)."""
    dim = q0.shape[0]
    inv_mass0 = jnp.ones((dim,))

    def warm_body(carry, key):
        q, da, inv_mass, w_mean, w_m2, count = carry
        q, accept_prob = step_fn(q, key, jnp.exp(da.log_step), inv_mass)
        da = _da_update(da, accept_prob)
        # Welford accumulation for the mass matrix
        count = count + 1
        delta = q - w_mean
        w_mean = w_mean + delta / count
        w_m2 = w_m2 + delta * (q - w_mean)
        return (q, da, inv_mass, w_mean, w_m2, count), accept_prob

    da0 = _da_init(step_size)
    keys_w = jax.random.split(key, num_warmup + num_samples + 1)
    half = num_warmup // 2

    # phase 1: adapt step size only
    carry = (q0, da0, inv_mass0, jnp.zeros((dim,)), jnp.zeros((dim,)),
             jnp.zeros(()))
    carry, _ = jax.lax.scan(warm_body, carry, keys_w[:half])
    q, da, inv_mass, _, _, _ = carry
    # phase 2: adapt both; mass from phase-2 variance
    carry = (q, da, inv_mass, jnp.zeros((dim,)), jnp.zeros((dim,)),
             jnp.zeros(()))
    carry, _ = jax.lax.scan(warm_body, carry, keys_w[half:num_warmup])
    q, da, inv_mass, w_mean, w_m2, count = carry
    if adapt_mass:
        var = w_m2 / jnp.maximum(count - 1.0, 1.0)
        inv_mass = jnp.where(var > 1e-10, var, 1.0)
    final_step = jnp.exp(da.log_step_avg)

    def sample_body(q, key):
        q, accept_prob = step_fn(q, key, final_step, inv_mass)
        return q, (q, accept_prob)

    _, (samples, accepts) = jax.lax.scan(
        sample_body, q, keys_w[num_warmup:num_warmup + num_samples]
    )
    return samples, accepts, final_step, inv_mass


def hmc(model_info: ModelInfo, key, num_warmup=500, num_samples=500,
        step_size=0.1, num_leapfrog=16, adapt_mass=True):
    """Single-chain HMC on a `ModelInfo`.  vmap for chains."""

    def step_fn(q, k, eps, inv_mass):
        return _hmc_step(model_info.potential_fn, q, k, eps, inv_mass,
                         num_leapfrog)

    return _warmup_and_sample(
        step_fn, model_info.potential_fn, model_info.init_u, key,
        num_warmup, num_samples, step_size, adapt_mass,
    )


def nuts(model_info: ModelInfo, key, num_warmup=500, num_samples=500,
         step_size=0.1, max_depth=8, adapt_mass=True):
    """Single-chain NUTS on a `ModelInfo`.  vmap for chains."""

    def step_fn(q, k, eps, inv_mass):
        return _nuts_step(model_info.potential_fn, q, k, eps, inv_mass,
                          max_depth)

    return _warmup_and_sample(
        step_fn, model_info.potential_fn, model_info.init_u, key,
        num_warmup, num_samples, step_size, adapt_mass,
    )


# ---------------------------------------------------------------------------
# user-facing driver
# ---------------------------------------------------------------------------

class MCMC:
    """Multi-chain MCMC driver.

    Chains run as a vmapped batch; on a mesh, shard the chain axis
    (`parallel.make_mesh(("chains",))` + device_put of the key batch) and
    the same program runs one chain group per device.

    Example::

        mcmc = MCMC(model, kernel="nuts", num_warmup=500, num_samples=500,
                    num_chains=4)
        mcmc.run(jax.random.PRNGKey(0), data)
        samples = mcmc.get_samples()          # {site: (chains*samples, ...)}
    """

    def __init__(self, model, kernel="nuts", num_warmup=500,
                 num_samples=500, num_chains=1, step_size=0.1,
                 num_leapfrog=16, max_depth=8, adapt_mass=True,
                 init_jitter=1.0):
        self.model = model
        self.kernel = kernel
        self.num_warmup = num_warmup
        self.num_samples = num_samples
        self.num_chains = num_chains
        self.step_size = step_size
        self.num_leapfrog = num_leapfrog
        self.max_depth = max_depth
        self.adapt_mass = adapt_mass
        self.init_jitter = init_jitter
        self._samples = None
        self._accepts = None
        self.model_info = None

    def run(self, key, *args, **kwargs):
        k_init, k_run = jax.random.split(key)
        info = init_model(self.model, *args, key=k_init, **kwargs)
        self.model_info = info

        def one_chain(chain_key):
            kj, ks = jax.random.split(chain_key)
            q0 = info.init_u + self.init_jitter * jax.random.normal(
                kj, info.init_u.shape
            )
            chain_info = info._replace(init_u=q0)
            if self.kernel == "nuts":
                return nuts(
                    chain_info, ks, self.num_warmup, self.num_samples,
                    self.step_size, self.max_depth, self.adapt_mass,
                )[:2]
            return hmc(
                chain_info, ks, self.num_warmup, self.num_samples,
                self.step_size, self.num_leapfrog, self.adapt_mass,
            )[:2]

        chain_keys = jax.random.split(k_run, self.num_chains)
        samples_u, accepts = jax.jit(jax.vmap(one_chain))(chain_keys)
        self._samples_u = samples_u      # (chains, samples, dim)
        self._accepts = accepts
        return self

    def get_samples(self, group_by_chain=False):
        """Constrained samples per site."""
        info = self.model_info
        flat = self._samples_u
        if not group_by_chain:
            flat = flat.reshape(-1, flat.shape[-1])
            out = jax.vmap(info.unflatten)(flat)
        else:
            out = jax.vmap(jax.vmap(info.unflatten))(flat)
        return {k: np.asarray(jax.device_get(v)) for k, v in out.items()}

    def accept_rate(self):
        return float(jnp.mean(self._accepts))

    def summary(self):
        samples = self.get_samples(group_by_chain=True)
        out = {}
        for name, arr in samples.items():
            c, n = arr.shape[:2]
            flat = arr.reshape(c * n, -1)
            mean = flat.mean(0)
            sd = flat.std(0)
            # split-Rhat over chains
            rhat = _split_rhat(arr.reshape(c, n, -1))
            out[name] = {"mean": mean, "sd": sd, "rhat": rhat}
        return out


def _split_rhat(x):
    """Split-R-hat per scalar parameter; x: (chains, samples, dim)."""
    c, n, d = x.shape
    half = n // 2
    halves = np.concatenate([x[:, :half, :], x[:, half:2 * half, :]], 0)
    m, hn = halves.shape[0], halves.shape[1]
    chain_means = halves.mean(1)
    chain_vars = halves.var(1, ddof=1)
    W = chain_vars.mean(0)
    B = hn * chain_means.var(0, ddof=1)
    var_est = (hn - 1) / hn * W + B / hn
    return np.sqrt(var_est / np.maximum(W, 1e-12))
