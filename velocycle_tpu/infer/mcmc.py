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

_DEBUG = False


# ---------------------------------------------------------------------------
# model -> potential function over a flat unconstrained vector
# ---------------------------------------------------------------------------

class ModelInfo(NamedTuple):
    potential_fn: callable        # (flat_u) -> -log p(u)  [unconstrained]
    unflatten: callable           # flat_u -> {site: constrained value}
    init_u: jnp.ndarray           # a flat init point
    site_meta: dict               # {site: (shape, size, constraint)}
    wrap_fn: callable = None      # flat_u -> flat_u with S^1 coords wrapped


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

    circular_mask_parts = []
    for name, (shape, size, constraint) in site_meta.items():
        circular_mask_parts.append(
            jnp.full((size,), constraint.name == "circular")
        )
    circular_mask = (
        jnp.concatenate(circular_mask_parts) if circular_mask_parts
        else jnp.zeros((0,), bool)
    )

    def wrap_fn(flat_u):
        """Wrap circular coordinates back into [-pi, pi) — a measure-
        preserving move for periodic potentials that keeps warmup variance
        estimates finite when chains drift across period copies."""
        import math

        wrapped = jnp.mod(flat_u + math.pi, 2.0 * math.pi) - math.pi
        return jnp.where(circular_mask, wrapped, flat_u)

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

    return ModelInfo(potential_fn, unflatten, init_u, site_meta, wrap_fn)


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
    # a NaN accept stat (from a divergent transition) must not poison the
    # averages — treat it as a full rejection
    accept_prob = jnp.where(jnp.isfinite(accept_prob), accept_prob, 0.0)
    t = state.t + 1.0
    h_sum = state.h_sum + (target - accept_prob)
    log_step = state.mu - jnp.sqrt(t) / gamma * h_sum / (t + t0)
    # keep the step within sane bounds: an unlucky warmup realization in a
    # high-curvature region (funnel neck) must not drive the step to
    # numerical zero and freeze the chain
    log_step = jnp.clip(log_step, jnp.log(1e-5), jnp.log(1e2))
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
    delta = jnp.where(
        jnp.isfinite(delta) & jnp.isfinite(jnp.sum(q_new)), delta, -jnp.inf
    )
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


def _popcount(i, nbits=16):
    return sum(((i >> k) & 1) for k in range(nbits))


def _trailing_zeros(i, nbits=16):
    """Trailing zeros of a positive traced int."""
    tz = jnp.zeros((), jnp.int32)
    done = jnp.asarray(False)
    for k in range(nbits):
        bit = (i >> k) & 1
        done = done | (bit == 1)
        tz = tz + jnp.where(done, 0, 1)
    return tz


def _nuts_step(potential_fn, q0, key, step_size, inv_mass, max_depth=8,
               max_delta_energy=1000.0):
    """One NUTS transition: iterative multinomial NUTS (Hoffman & Gelman
    2014; multinomial state selection and generalized momentum-sum U-turn
    criterion per Betancourt 2017), with per-subtree U-turn checks done
    iteratively via a checkpoint stack (Phan & Pradhan's iterative
    formulation, re-derived):

    Within a new subtree of 2^depth leapfrog leaves, leaf j (0-based, in
    build order) pushes (momentum r_j, prefix momentum sum before j) into
    checkpoint slot popcount(j) when j is even; at odd leaf b every
    complete binary subtree ending at b — spans [b+1-2^k, b] for
    k=1..tz(b+1) — is checked against slots
    [popcount(m'-1), popcount(m'-1)+K-1] (b+1 = m'*2^K), which provably
    hold exactly those spans' start checkpoints (no overwrites: any even
    leaf inside a span has a strictly larger popcount than the span
    start).  Criterion per span with momentum sum R: turning iff
    R.(M^-1 r_start) < 0 or R.(M^-1 r_end) < 0.
    """
    grad = jax.grad(potential_fn)
    k_mom, k_prop = jax.random.split(key)
    p0 = jax.random.normal(k_mom, q0.shape) / jnp.sqrt(inv_mass)
    energy0 = potential_fn(q0) + _kinetic(p0, inv_mass)
    dim = q0.shape[0]
    n_slots = max_depth + 1

    def leapfrog1(q, p, direction):
        eps = step_size * direction
        p = p - 0.5 * eps * grad(q)
        q = q + eps * inv_mass * p
        p = p - 0.5 * eps * grad(q)
        return q, p

    def span_turning(R, r_a, r_b):
        return (jnp.dot(R, inv_mass * r_a) < 0) | (
            jnp.dot(R, inv_mass * r_b) < 0
        )

    def extend(carry, depth):
        state, key = carry
        key, k_dir, k_sel, k_sub = jax.random.split(key, 4)
        direction = jnp.where(jax.random.bernoulli(k_dir), 1.0, -1.0)
        n_new = 2 ** depth

        q_start = jnp.where(direction > 0, state.q_plus, state.q_minus)
        p_start = jnp.where(direction > 0, state.p_plus, state.p_minus)

        def sub_body(i, sub):
            (q, p, log_w, q_prop, S, ckpt_r, ckpt_S, turning, diverging,
             sum_acc, key) = sub
            q, p = leapfrog1(q, p, direction)
            energy = potential_fn(q) + _kinetic(p, inv_mass)
            delta = energy - energy0
            diverging = diverging | (delta > max_delta_energy) | (
                ~jnp.isfinite(delta)
            )
            log_w_i = jnp.where(diverging, -jnp.inf, -delta)
            sum_acc = sum_acc + jnp.where(
                diverging, 0.0, jnp.minimum(1.0, jnp.exp(-delta))
            )
            # multinomial within the subtree
            key, k_i = jax.random.split(key)
            log_w_tot = jnp.logaddexp(log_w, log_w_i)
            take = jnp.log(jax.random.uniform(k_i)) < (log_w_i - log_w_tot)
            q_prop = jnp.where(take & ~diverging, q, q_prop)
            log_w = log_w_tot

            # checkpoint push at even leaves (prefix sum BEFORE this leaf)
            slot = _popcount(i)
            is_even = (i % 2) == 0
            ckpt_r = jnp.where(
                is_even,
                ckpt_r.at[slot].set(p), ckpt_r,
            )
            ckpt_S = jnp.where(
                is_even,
                ckpt_S.at[slot].set(S), ckpt_S,
            )
            S = S + p

            # U-turn checks at odd leaves for all complete subtrees ending
            # here: slots [idx_min, idx_max]
            K = _trailing_zeros(i + 1)
            m_prime = (i + 1) >> K
            idx_min = _popcount(m_prime - 1)
            idx_max = idx_min + K - 1

            def check_slot(s, turning):
                in_range = (s >= idx_min) & (s <= idx_max)
                R = S - ckpt_S[s]
                t = span_turning(R, ckpt_r[s], p)
                return turning | (in_range & t)

            is_odd = (i % 2) == 1
            turning_new = jax.lax.fori_loop(
                0, n_slots, check_slot, jnp.asarray(False)
            )
            turning = turning | (is_odd & turning_new)
            return (q, p, log_w, q_prop, S, ckpt_r, ckpt_S, turning,
                    diverging, sum_acc, key)

        sub0 = (
            q_start, p_start, -jnp.inf, q_start, jnp.zeros((dim,)),
            jnp.zeros((n_slots, dim)), jnp.zeros((n_slots, dim)),
            jnp.asarray(False), state.diverging, jnp.zeros(()), k_sub,
        )
        (q_end, p_end, log_w_new, q_prop_new, S_new, _, _, sub_turning,
         diverging, sum_acc_new, _) = jax.lax.fori_loop(
            0, n_new, sub_body, sub0
        )

        # update trajectory ends
        q_minus = jnp.where(direction > 0, state.q_minus, q_end)
        p_minus = jnp.where(direction > 0, state.p_minus, p_end)
        q_plus = jnp.where(direction > 0, q_end, state.q_plus)
        p_plus = jnp.where(direction > 0, p_end, state.p_plus)

        # biased-progressive multinomial merge: accept the new subtree's
        # proposal with prob min(1, w_new / w_old)
        log_w_tot = jnp.logaddexp(state.log_weight, log_w_new)
        take_new = (
            jnp.log(jax.random.uniform(k_sel))
            < (log_w_new - state.log_weight)
        )
        q_prop = jnp.where(take_new & ~diverging, q_prop_new, state.q_prop)
        if _DEBUG:
            jax.debug.print(
                "depth={d} lwnew={w:.3f} take={t} subturn={st} q_end0={q:.3f}",
                d=depth, w=log_w_new, t=take_new, st=sub_turning, q=q_end[0],
            )

        # full-trajectory U-turn (generalized momentum-sum criterion)
        sum_p = state.sum_p + S_new
        traj_turning = span_turning(sum_p, p_minus, p_plus)
        invalid = sub_turning | traj_turning | diverging
        if _DEBUG:
            jax.debug.print("  trajturn={tt} invalid={iv} frozen_before={fb}",
                            tt=traj_turning, iv=invalid,
                            fb=state.turning | state.diverging)

        new_state = _TreeState(
            q_minus, p_minus, q_plus, p_plus,
            # a turning/diverging subtree's proposal is rejected
            jnp.where(invalid, state.q_prop, q_prop),
            jnp.where(invalid, state.log_weight, log_w_tot),
            sum_p,
            state.turning | invalid,
            diverging,
            state.sum_accept + sum_acc_new,
            state.n_steps + n_new,
        )
        # once stopped, freeze everything
        frozen = jax.tree_util.tree_map(
            lambda old, new: jnp.where(
                state.turning | state.diverging, old, new
            ),
            state, new_state,
        )
        return (frozen, key), None

    init = _TreeState(
        q0, p0, q0, p0, q0,
        jnp.zeros(()),            # root log weight: exp(-(E0-E0)) = 1
        p0, jnp.asarray(False), jnp.asarray(False), jnp.zeros(()),
        jnp.ones(()),
    )
    (final, _), _ = jax.lax.scan(
        extend, (init, k_prop), jnp.arange(max_depth)
    )
    accept_prob = final.sum_accept / jnp.maximum(final.n_steps - 1.0, 1.0)
    return final.q_prop, accept_prob


# ---------------------------------------------------------------------------
# warmup + sampling drivers
# ---------------------------------------------------------------------------

def _warmup_and_sample(step_fn, potential_fn, q0, key, num_warmup,
                       num_samples, step_size, adapt_mass, wrap_fn=None):
    """Generic driver: dual-averaging warmup (with a crude diagonal mass
    estimate from the second half of warmup), then sampling.  Entirely
    `lax.scan`; returns (samples (num_samples, dim), accept_probs)."""
    dim = q0.shape[0]
    inv_mass0 = jnp.ones((dim,))

    if wrap_fn is None:
        wrap_fn = lambda q: q

    def warm_body(carry, key):
        q, da, inv_mass, w_mean, w_m2, count = carry
        q_new, accept_prob = step_fn(q, key, jnp.exp(da.log_step), inv_mass)
        # reject non-finite states outright: NaN must never become an
        # absorbing state of the chain
        q = jnp.where(jnp.isfinite(q_new).all(), q_new, q)
        q = wrap_fn(q)
        da = _da_update(da, accept_prob)
        # Welford accumulation for the mass matrix
        count = count + 1
        delta = q - w_mean
        w_mean = w_mean + delta / count
        w_m2 = w_m2 + delta * (q - w_mean)
        return (q, da, inv_mass, w_mean, w_m2, count), accept_prob

    da0 = _da_init(step_size)
    # three warmup windows (Stan-style): (1) step-size only, (2) step size
    # + variance collection, (3) re-adapt the step size under the NEW mass
    # (switching the metric invalidates the old step size)
    n1 = max(num_warmup * 2 // 5, 1)
    n2 = max(num_warmup * 2 // 5, 1)
    n3 = max(num_warmup - n1 - n2, 1)
    keys_w = jax.random.split(key, n1 + n2 + n3 + num_samples)

    carry = (q0, da0, inv_mass0, jnp.zeros((dim,)), jnp.zeros((dim,)),
             jnp.zeros(()))
    carry, _ = jax.lax.scan(warm_body, carry, keys_w[:n1])
    q, da, inv_mass, _, _, _ = carry

    carry = (q, da, inv_mass, jnp.zeros((dim,)), jnp.zeros((dim,)),
             jnp.zeros(()))
    carry, _ = jax.lax.scan(warm_body, carry, keys_w[n1:n1 + n2])
    q, da, inv_mass, w_mean, w_m2, count = carry
    if adapt_mass:
        var = w_m2 / jnp.maximum(count - 1.0, 1.0)
        # Stan-style shrinkage toward a small diagonal: protects against a
        # slow warmup chain collapsing the metric (tiny variance -> tiny
        # mass -> frozen sampling)
        var = (count / (count + 5.0)) * var + 1e-3 * (5.0 / (count + 5.0))
        inv_mass = jnp.where(jnp.isfinite(var) & (var > 0), var, 1.0)

    carry = (q, _da_init(jnp.exp(da.log_step_avg)), inv_mass,
             jnp.zeros((dim,)), jnp.zeros((dim,)), jnp.zeros(()))
    carry, _ = jax.lax.scan(warm_body, carry, keys_w[n1 + n2:n1 + n2 + n3])
    q, da, inv_mass, _, _, _ = carry
    final_step = jnp.exp(da.log_step_avg)

    def sample_body(q, key):
        q_new, accept_prob = step_fn(q, key, final_step, inv_mass)
        q = jnp.where(jnp.isfinite(q_new).all(), q_new, q)
        q = wrap_fn(q)
        return q, (q, accept_prob)

    _, (samples, accepts) = jax.lax.scan(
        sample_body, q, keys_w[n1 + n2 + n3:]
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
        model_info.wrap_fn,
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
        model_info.wrap_fn,
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

    def run(self, key, *args, mesh=None, chain_axis="chains", **kwargs):
        """Run the chains.  With ``mesh=`` (a `jax.sharding.Mesh` carrying
        ``chain_axis``), the chain-key batch is sharded over that axis and
        the jitted vmap compiles to an SPMD program — one chain group per
        device, zero cross-chain communication (chains are independent).
        Combine with cell-sharded model data for a 2-axis (cells, chains)
        mesh: the potential's cell reductions lower to psum over the cells
        axis while chains stay parallel."""
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
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            chain_keys = jax.device_put(
                chain_keys, NamedSharding(mesh, P(chain_axis))
            )
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
