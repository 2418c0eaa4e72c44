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

__all__ = ["init_model", "hmc", "nuts", "MCMC", "effective_sample_size",
           "block_precondition"]

_DEBUG = False


# ---------------------------------------------------------------------------
# model -> potential function over a flat unconstrained vector
# ---------------------------------------------------------------------------

class ModelInfo(NamedTuple):
    potential_fn: callable        # (flat_u) -> -log p(u) + log_offset
    unflatten: callable           # flat_u -> {site: constrained value}
    init_u: jnp.ndarray           # a flat init point
    site_meta: dict               # {site: (shape, size, constraint)}
    wrap_fn: callable = None      # flat_u -> flat_u with S^1 coords wrapped
    log_offset: float = 0.0       # constant subtracted from -potential (the
    #                               per-element baseline sum; add back when
    #                               an ABSOLUTE log density is needed)
    log_det_scale: float = 0.0    # log |det d(original u)/d(these coords)|
    #                               (block_precondition sets it; needed for
    #                               absolute integrals, e.g. bridged-SMC
    #                               log-evidence)


def init_model(model, *args, key=None, init_strategy="prior",
               init_values=None, subtract_baseline=True, **kwargs):
    """Trace the model once to discover latent sites, build bijections, and
    return a `ModelInfo` with a flat potential function.

    ``init_values`` maps site names to CONSTRAINED initial values (e.g. a
    converged SVI guide's locs) — the recommended warm start for posteriors
    far tighter than the prior: a prior-drawn init can sit many thousands
    of posterior standard deviations from the typical set, which no
    fixed-depth NUTS warmup can traverse.

    ``subtract_baseline`` (default True) subtracts each sample site's
    ELEMENTWISE log-prob at the init point — a precomputed constant — from
    the site's log-prob before the reduction.  This is a pure constant
    shift of the potential (same posterior, same gradients; the shift is
    recorded in ``log_offset``) but it is load-bearing for float32
    samplers: on a Ng x Nc count model the raw joint reduces ~1e4-1e5
    terms to a sum of magnitude ~1e4-1e5, and float32 tree-reduction
    rounding at that magnitude injects O(0.1-3) nats of state-dependent
    noise into every Metropolis energy difference.  Measured on the
    bench phase model (Ng=50 x Nc=500): raw-f32 potential noise 0.25 std /
    3.2 max nats vs an exact f64 reference — enough to pin NUTS accept
    statistics below the 0.8 dual-averaging target at ANY step size,
    crashing the step size to its floor and freezing all chains (the
    round-3 "R-hat 135" pathology).  Baselined, the summed magnitude is
    O(1e2) and the noise drops ~2 orders of magnitude.  TPU-first: this
    is how you get f64-grade MCMC acceptance arithmetic out of an
    f32-only accelerator.

    MEMORY COST: the baseline is a full (site-shaped) float32 array per
    observed site, captured in the potential closure — for an (Ng, Nc)
    count model this roughly doubles the count matrix's HBM residency
    (e.g. ~840 MB extra at Stereo-seq scale 2048 x 102,400).  At that
    scale pass ``subtract_baseline=False`` (and accept the f32 noise, or
    condition the large plates) if HBM is the binding constraint.
    """
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
        if init_values is not None and name in init_values:
            value = jnp.asarray(init_values[name], jnp.float32).reshape(
                value.shape
            )
        constraint = C.biject_to(getattr(fn, "support", "real"))
        site_meta[name] = (value.shape, int(value.size), constraint)
        u0 = constraint.inverse(value)
        if init_strategy == "zero" and (
            init_values is None or name not in init_values
        ):
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

    # -- per-element baselines at the init point (see docstring) ----------
    baselines = {}
    log_offset = 0.0
    if subtract_baseline:
        with jax.default_matmul_precision("highest"):
            values0 = unflatten(init_u)
            sub0 = handlers.substitute(model, data=values0)
            tr0 = handlers.trace(
                handlers.seed(sub0, jax.random.PRNGKey(0))
            ).get_trace(*args, **kwargs)
        for name, site in tr0.items():
            if site["type"] != "sample":
                continue
            if site.get("infer", {}).get("is_auxiliary"):
                continue
            lp0 = jax.lax.stop_gradient(site["fn"].log_prob(site["value"]))
            baselines[name] = lp0
            # exact constant, accumulated in f64 on the host
            log_offset += float(
                np.sum(np.asarray(jax.device_get(lp0), np.float64))
            )

    def potential_fn(flat_u):
        # full-precision matmuls: on TPU, XLA lowers f32 matmuls to bf16
        # MXU passes by default — fine for SVI's stochastic gradients,
        # fatal for Metropolis energy differences (bf16 rounding in
        # ElogS = nu @ zeta^T injects O(0.1-1) nats of state-dependent
        # noise into the joint).  The matmuls here are tiny relative to
        # the elementwise NB work, so "highest" costs ~nothing.
        with jax.default_matmul_precision("highest"):
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
                lp = site["fn"].log_prob(site["value"])
                b = baselines.get(name)
                if b is not None:
                    lp = lp - b  # same trace, same shapes by construction
                logp = logp + lp.sum()
            return -(logp + log_det)

    return ModelInfo(potential_fn, unflatten, init_u, site_meta, wrap_fn,
                     log_offset)


def block_precondition(info: ModelInfo, blocks):
    """Whiten a `ModelInfo` with a per-site linear preconditioner.

    ``blocks`` maps site names to either a per-coordinate variance vector
    (diagonal scaling) or an SPD covariance of shape ``(B, k, k)`` for a
    site of shape ``(B, k)`` — e.g. per-gene harmonic-coefficient
    covariances from the analytic GLM Fisher information.  The returned
    ModelInfo's coordinates are ``v`` with ``u = L v`` (+ the original
    init as offset), where ``L`` is the (block) Cholesky factor: the
    whitened posterior is near-isotropic, so a diagonal-metric
    NUTS/HMC mixes at depth ~log2(residual condition number) instead of
    being pinned by the stiffest eigendirection of a correlated block
    (a DIAGONAL mass matrix cannot whiten within-block correlation, no
    matter how well adapted).

    Circular (wrapped) coordinates must not be block-preconditioned —
    wrapping is only measure-preserving under a per-coordinate scaling.
    """
    import numpy as np_

    mats = {}
    log_det_scale = 0.0
    for name, (shape, size, constraint) in info.site_meta.items():
        if name in blocks:
            b = np_.asarray(jax.device_get(blocks[name]), np_.float64)
            if b.ndim == 3 and b.shape[-1] == b.shape[-2]:
                if constraint.name == "circular":
                    raise ValueError(
                        f"site {name!r} is circular; only DIAGONAL "
                        "preconditioning is valid for wrapped "
                        "coordinates (pass a variance vector, not "
                        "covariance blocks — wrapping is only measure-"
                        "preserving under a per-coordinate scaling)"
                    )
                L = np_.linalg.cholesky(
                    b + 1e-12 * np_.eye(b.shape[-1])
                )
                log_det_scale += float(
                    np_.sum(np_.log(np_.diagonal(L, axis1=-2, axis2=-1)))
                )
                mats[name] = ("block", jnp.asarray(L, jnp.float32))
            else:
                d = np_.sqrt(np_.asarray(b, np_.float64)).reshape(-1)
                log_det_scale += float(np_.sum(np_.log(d)))
                mats[name] = (
                    "diag", jnp.asarray(d, jnp.float32)
                )

    def transform(v):
        """whitened flat v -> original flat u (around the init point)."""
        parts = []
        i = 0
        for name, (shape, size, _) in info.site_meta.items():
            vs = v[i:i + size]
            kind = mats.get(name)
            if kind is None:
                parts.append(vs)
            elif kind[0] == "diag":
                parts.append(kind[1] * vs)
            else:
                L = kind[1]
                B, k = L.shape[0], L.shape[1]
                parts.append(
                    jnp.einsum("bij,bj->bi", L, vs.reshape(B, k)).reshape(-1)
                )
            i += size
        return jnp.concatenate(parts) + info.init_u

    # circular coords keep their (diagonal) scale for wrapping
    scale_parts = []
    circ_parts = []
    for name, (shape, size, constraint) in info.site_meta.items():
        kind = mats.get(name)
        scale_parts.append(
            kind[1] if kind is not None and kind[0] == "diag"
            else jnp.ones((size,))
        )
        circ_parts.append(jnp.full((size,), constraint.name == "circular"))
    scales = jnp.concatenate(scale_parts)
    circ = jnp.concatenate(circ_parts)
    init_off = info.init_u

    def wrap_fn(v):
        import math

        u = scales * v + init_off
        wrapped = jnp.mod(u + math.pi, 2.0 * math.pi) - math.pi
        v_wrapped = (wrapped - init_off) / scales
        return jnp.where(circ, v_wrapped, v)

    has_circ = bool(jax.device_get(circ.any()))
    return ModelInfo(
        potential_fn=lambda v: info.potential_fn(transform(v)),
        unflatten=lambda v: info.unflatten(transform(v)),
        init_u=jnp.zeros_like(info.init_u),
        site_meta=info.site_meta,
        wrap_fn=wrap_fn if has_circ else None,
        log_offset=info.log_offset,
        log_det_scale=info.log_det_scale + log_det_scale,
    )


# ---------------------------------------------------------------------------
# leapfrog + dual averaging
# ---------------------------------------------------------------------------

def _leapfrog(potential_vg, q, p, pot, grad, step_size, inv_mass, n_steps):
    """``n_steps`` leapfrog steps under a diagonal mass matrix.

    Cached-gradient formulation: the gradient at the current position is
    carried through the loop, so each step costs exactly ONE
    `value_and_grad` evaluation (the classic 2-grads-plus-1-potential
    version inlines the potential graph three times per step — tripling
    both XLA compile time and runtime FLOPs; compile time is the dominant
    cost of MCMC on this rig, see MCMC.run)."""

    def body(_, state):
        q, p, pot, grad = state
        p_half = p - 0.5 * step_size * grad
        q = q + step_size * inv_mass * p_half
        pot, grad = potential_vg(q)
        p = p_half - 0.5 * step_size * grad
        return (q, p, pot, grad)

    return jax.lax.fori_loop(0, n_steps, body, (q, p, pot, grad))


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
    log_step_c = jnp.clip(log_step, jnp.log(1e-5), jnp.log(1e2))
    # anti-windup: while the clip binds, cap the integral error at the
    # value consistent with the bound.  Without this a chain that crashed
    # to the floor keeps accumulating h_sum and needs O(h_sum/0.2) good
    # steps to recover — in practice it never does within a warmup window
    # (the r3 "2/16 chains frozen in sampling" tail), whereas with the
    # cap a run of high accepts lifts it off the floor in ~20 steps.
    h_sum = jnp.where(
        log_step_c == log_step, h_sum,
        gamma * (state.mu - log_step_c) * (t + t0) / jnp.sqrt(t),
    )
    eta = t ** (-kappa)
    log_step_avg = eta * log_step_c + (1 - eta) * state.log_step_avg
    return DAState(log_step_c, log_step_avg, h_sum, state.mu, t)


# ---------------------------------------------------------------------------
# HMC
# ---------------------------------------------------------------------------

def _kinetic(p, inv_mass):
    return 0.5 * jnp.sum(p * p * inv_mass)


def _hmc_step(potential_fn, q, key, step_size, inv_mass, num_leapfrog,
              pot=None, grad=None):
    """One HMC transition.  Pass ``pot``/``grad`` (the potential value and
    gradient at ``q``, e.g. carried from the previous step) to avoid the
    extra evaluation; returns them for the new state so callers can chain.

    Returns (q, accept_prob, pot, grad).
    """
    vg = jax.value_and_grad(potential_fn)
    if pot is None or grad is None:
        pot, grad = vg(q)
    k_mom, k_acc = jax.random.split(key)
    p = jax.random.normal(k_mom, q.shape) / jnp.sqrt(inv_mass)
    energy0 = pot + _kinetic(p, inv_mass)
    q_new, p_new, pot_new, grad_new = _leapfrog(
        vg, q, p, pot, grad, step_size, inv_mass, num_leapfrog
    )
    energy1 = pot_new + _kinetic(p_new, inv_mass)
    delta = energy0 - energy1
    delta = jnp.where(
        jnp.isfinite(delta) & jnp.isfinite(jnp.sum(q_new)), delta, -jnp.inf
    )
    accept_prob = jnp.minimum(1.0, jnp.exp(delta))
    accept = jax.random.uniform(k_acc) < accept_prob
    q = jnp.where(accept, q_new, q)
    pot = jnp.where(accept, pot_new, pot)
    grad = jnp.where(accept, grad_new, grad)
    return q, accept_prob, pot, grad


# ---------------------------------------------------------------------------
# NUTS (iterative, multinomial, static max depth)
# ---------------------------------------------------------------------------

class _TreeState(NamedTuple):
    q_minus: jnp.ndarray
    p_minus: jnp.ndarray
    g_minus: jnp.ndarray    # potential gradient at q_minus (carried so a
    q_plus: jnp.ndarray     # subtree extension costs 1 value_and_grad per
    p_plus: jnp.ndarray     # leapfrog, not 3 potential evaluations)
    g_plus: jnp.ndarray
    q_prop: jnp.ndarray     # current proposal (multinomial over the tree)
    pot_prop: jnp.ndarray   # potential value at q_prop
    g_prop: jnp.ndarray     # potential gradient at q_prop
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
               max_delta_energy=1000.0, pot0=None, grad0=None):
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
    vg = jax.value_and_grad(potential_fn)
    if pot0 is None or grad0 is None:
        pot0, grad0 = vg(q0)
    k_mom, k_prop = jax.random.split(key)
    p0 = jax.random.normal(k_mom, q0.shape) / jnp.sqrt(inv_mass)
    energy0 = pot0 + _kinetic(p0, inv_mass)
    dim = q0.shape[0]
    n_slots = max_depth + 1

    def leapfrog1(q, p, g, direction):
        eps = step_size * direction
        p_half = p - 0.5 * eps * g
        q = q + eps * inv_mass * p_half
        pot, g = vg(q)
        p = p_half - 0.5 * eps * g
        return q, p, pot, g

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
        g_start = jnp.where(direction > 0, state.g_plus, state.g_minus)

        def sub_body(i, sub):
            (q, p, pot, g, log_w, q_prop, pot_prop, g_prop, S, ckpt_r,
             ckpt_S, turning, diverging, sum_acc, key) = sub
            q, p, pot, g = leapfrog1(q, p, g, direction)
            energy = pot + _kinetic(p, inv_mass)
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
            keep_new = take & ~diverging
            q_prop = jnp.where(keep_new, q, q_prop)
            pot_prop = jnp.where(keep_new, pot, pot_prop)
            g_prop = jnp.where(keep_new, g, g_prop)
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
            return (q, p, pot, g, log_w, q_prop, pot_prop, g_prop, S,
                    ckpt_r, ckpt_S, turning, diverging, sum_acc, key)

        pot_start = jnp.zeros(())  # placeholder; first leaf overwrites prop
        sub0 = (
            q_start, p_start, pot_start, g_start, -jnp.inf,
            q_start, pot_start, g_start, jnp.zeros((dim,)),
            jnp.zeros((n_slots, dim)), jnp.zeros((n_slots, dim)),
            jnp.asarray(False), state.diverging, jnp.zeros(()), k_sub,
        )
        (q_end, p_end, _, g_end, log_w_new, q_prop_new, pot_prop_new,
         g_prop_new, S_new, _, _, sub_turning, diverging, sum_acc_new,
         _) = jax.lax.fori_loop(0, n_new, sub_body, sub0)

        # update trajectory ends
        q_minus = jnp.where(direction > 0, state.q_minus, q_end)
        p_minus = jnp.where(direction > 0, state.p_minus, p_end)
        g_minus = jnp.where(direction > 0, state.g_minus, g_end)
        q_plus = jnp.where(direction > 0, q_end, state.q_plus)
        p_plus = jnp.where(direction > 0, p_end, state.p_plus)
        g_plus = jnp.where(direction > 0, g_end, state.g_plus)

        # biased-progressive multinomial merge: accept the new subtree's
        # proposal with prob min(1, w_new / w_old)
        log_w_tot = jnp.logaddexp(state.log_weight, log_w_new)
        take_new = (
            jnp.log(jax.random.uniform(k_sel))
            < (log_w_new - state.log_weight)
        )
        keep_new = take_new & ~diverging
        q_prop = jnp.where(keep_new, q_prop_new, state.q_prop)
        pot_prop = jnp.where(keep_new, pot_prop_new, state.pot_prop)
        g_prop = jnp.where(keep_new, g_prop_new, state.g_prop)
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
            q_minus, p_minus, g_minus, q_plus, p_plus, g_plus,
            # a turning/diverging subtree's proposal is rejected
            jnp.where(invalid, state.q_prop, q_prop),
            jnp.where(invalid, state.pot_prop, pot_prop),
            jnp.where(invalid, state.g_prop, g_prop),
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
        q0, p0, grad0, q0, p0, grad0, q0, pot0, grad0,
        jnp.zeros(()),            # root log weight: exp(-(E0-E0)) = 1
        p0, jnp.asarray(False), jnp.asarray(False), jnp.zeros(()),
        jnp.ones(()),
    )
    (final, _), _ = jax.lax.scan(
        extend, (init, k_prop), jnp.arange(max_depth)
    )
    accept_prob = final.sum_accept / jnp.maximum(final.n_steps - 1.0, 1.0)
    return final.q_prop, accept_prob, final.pot_prop, final.g_prop


# ---------------------------------------------------------------------------
# warmup + sampling drivers
# ---------------------------------------------------------------------------

def _warmup_and_sample(step_fn, potential_fn, q0, key, num_warmup,
                       num_samples, step_size, adapt_mass, wrap_fn=None,
                       inv_mass0=None, q_safe=None):
    """Generic driver: dual-averaging warmup (with a crude diagonal mass
    estimate from the second half of warmup), then sampling.

    The three Stan-style warmup windows — (1) step-size only, (2) step size
    + variance collection, (3) re-adapt the step size under the NEW mass —
    and the sampling phase all run inside ONE `lax.scan` whose body is the
    only copy of the transition kernel in the program; window transitions
    are data (step-index comparisons), not separate scans.  XLA compile
    time on this model family is dominated by copies of the potential
    graph, so 4 scans -> 1 cuts cold-start ~4x; the dropped warmup draws
    are sliced off on the host side.

    ``step_fn(q, key, eps, inv_mass, pot, grad)`` must return
    ``(q', accept_prob, pot', grad')`` (cached-gradient chaining: exactly
    one value_and_grad per leapfrog across the whole chain).

    Returns (samples (num_samples, dim), accept_probs, final_step,
    inv_mass).
    """
    dim = q0.shape[0]
    if inv_mass0 is None:
        inv_mass0 = jnp.ones((dim,))
    # the initial metric (e.g. a variational preconditioner: per-coordinate
    # posterior variances from a converged guide) matters enormously for
    # anisotropic posteriors — with a unit metric the stiffest coordinate
    # pins the step size and window-2 variance collection never sees the
    # soft directions equilibrate, so adaptation cannot bootstrap itself

    if wrap_fn is None:
        wrap_fn = lambda q: q

    # window boundaries (static Python ints)
    n1 = max(num_warmup * 2 // 5, 1)
    n2 = max(num_warmup * 2 // 5, 1)
    n3 = max(num_warmup - n1 - n2, 1)
    warm_end = n1 + n2 + n3
    total = warm_end + num_samples

    pot0, grad0 = jax.value_and_grad(potential_fn)(q0)
    if q_safe is None:
        q_safe, pot_safe, grad_safe = q0, pot0, grad0
    else:
        pot_safe, grad_safe = jax.value_and_grad(potential_fn)(q_safe)

    def body(carry, xs):
        key, i = xs
        q, pot, grad, da, inv_mass, w_mean, w_m2, count = carry

        # -- window-2 -> window-3 boundary: switch the metric, reset DA ----
        at_mass_switch = (i == n1 + n2) & adapt_mass
        var = w_m2 / jnp.maximum(count - 1.0, 1.0)
        # Stan-style shrinkage toward a small diagonal: protects against a
        # slow warmup chain collapsing the metric (tiny variance -> tiny
        # mass -> frozen sampling)
        var = (count / (count + 5.0)) * var + 1e-3 * (5.0 / (count + 5.0))
        var = jnp.where(jnp.isfinite(var) & (var > 0), var, 1.0)
        # frozen-chain guard: a chain that barely moved in window 2 hands
        # window 3 a collapsed metric (the r3 pathology: collected var
        # ~4e-5 in a unit-whitened space).  Adopting a metric that shrinks
        # the typical coordinate by >1e4x relative to the one the chain
        # was actually sampling under is never evidence, only freeze —
        # keep the previous metric and let window-3 DA re-adapt instead.
        at_mass_switch = at_mass_switch & (
            jnp.median(var / jnp.maximum(inv_mass, 1e-30)) > 1e-4
        )
        inv_mass = jnp.where(at_mass_switch, var, inv_mass)
        da = jax.tree_util.tree_map(
            lambda new, old: jnp.where(at_mass_switch, new, old),
            _da_init(jnp.exp(da.log_step_avg)), da,
        )

        # -- warmup rescue: a chain whose init fell off a numerical cliff
        # (e.g. a dispersion coordinate in its overflow region) rejects
        # every proposal, and dual averaging drives its step size to the
        # floor — the chain is dead at any eps.  At window boundaries,
        # restart such chains from the known-good init point with fresh DA
        # state and metric.  Warmup draws are discarded, so this is free
        # of detailed-balance concerns.  (Runs AFTER the metric switch so
        # a rescued chain is not handed the frozen chain's garbage
        # variances or a clobbered DA state.)
        # "stuck" = the step size fell >150x below its initial value: a
        # chain whose jittered init landed on a numerical cliff (e.g. a
        # dispersion coordinate near r -> 0) rejects at ANY eps, so DA
        # keeps falling; a healthy chain's adapted eps stays within an
        # order of magnitude of a sane init.  (A fixed absolute floor is
        # knife-edged: the r3 freeze sat at eps ~1e-4, just above a 3e-5
        # threshold, and was never rescued.)
        at_boundary = (i == n1) | (i == n1 + n2)
        stuck = at_boundary & (
            da.log_step < jnp.log(step_size) - 5.0
        )
        q = jnp.where(stuck, q_safe, q)
        pot = jnp.where(stuck, pot_safe, pot)
        grad = jnp.where(stuck, grad_safe, grad)
        inv_mass = jnp.where(stuck, inv_mass0, inv_mass)
        da = jax.tree_util.tree_map(
            lambda new, old: jnp.where(stuck, new, old),
            _da_init(step_size), da,
        )

        in_warmup = i < warm_end
        eps = jnp.where(in_warmup, jnp.exp(da.log_step),
                        jnp.exp(da.log_step_avg))
        q_new, accept_prob, pot_new, grad_new = step_fn(
            q, key, eps, inv_mass, pot, grad
        )
        # reject non-finite states outright: NaN must never become an
        # absorbing state of the chain
        ok = jnp.isfinite(q_new).all()
        q = jnp.where(ok, q_new, q)
        pot = jnp.where(ok, pot_new, pot)
        grad = jnp.where(ok, grad_new, grad)
        # wrapping is a period shift on circular coords: the (periodic)
        # potential and its gradient are unchanged, so pot/grad stay valid
        q = wrap_fn(q)

        da_next = _da_update(da, accept_prob)
        da = jax.tree_util.tree_map(
            lambda new, old: jnp.where(in_warmup, new, old), da_next, da,
        )

        # Welford accumulation for the mass matrix, window 2 only
        collect = (i >= n1) & (i < n1 + n2)
        count = count + jnp.where(collect, 1.0, 0.0)
        safe_count = jnp.maximum(count, 1.0)
        delta = q - w_mean
        w_mean = w_mean + jnp.where(collect, delta / safe_count, 0.0)
        w_m2 = w_m2 + jnp.where(collect, delta * (q - w_mean), 0.0)

        return (q, pot, grad, da, inv_mass, w_mean, w_m2, count), (
            q, accept_prob,
        )

    keys = jax.random.split(key, total)
    carry = (q0, pot0, grad0, _da_init(step_size), inv_mass0,
             jnp.zeros((dim,)), jnp.zeros((dim,)), jnp.zeros(()))
    carry, (qs, accepts) = jax.lax.scan(
        body, carry, (keys, jnp.arange(total))
    )
    _, _, _, da, inv_mass, _, _, _ = carry
    final_step = jnp.exp(da.log_step_avg)
    return qs[warm_end:], accepts[warm_end:], final_step, inv_mass


def hmc(model_info: ModelInfo, key, num_warmup=500, num_samples=500,
        step_size=0.1, num_leapfrog=16, adapt_mass=True, inv_mass0=None,
        q_safe=None):
    """Single-chain HMC on a `ModelInfo`.  vmap for chains."""

    def step_fn(q, k, eps, inv_mass, pot, grad):
        return _hmc_step(model_info.potential_fn, q, k, eps, inv_mass,
                         num_leapfrog, pot, grad)

    return _warmup_and_sample(
        step_fn, model_info.potential_fn, model_info.init_u, key,
        num_warmup, num_samples, step_size, adapt_mass,
        model_info.wrap_fn, inv_mass0, q_safe,
    )


def nuts(model_info: ModelInfo, key, num_warmup=500, num_samples=500,
         step_size=0.1, max_depth=8, adapt_mass=True, inv_mass0=None,
         q_safe=None):
    """Single-chain NUTS on a `ModelInfo`.  vmap for chains."""

    def step_fn(q, k, eps, inv_mass, pot, grad):
        return _nuts_step(model_info.potential_fn, q, k, eps, inv_mass,
                          max_depth, pot0=pot, grad0=grad)

    return _warmup_and_sample(
        step_fn, model_info.potential_fn, model_info.init_u, key,
        num_warmup, num_samples, step_size, adapt_mass,
        model_info.wrap_fn, inv_mass0, q_safe,
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
                 init_jitter=1.0, init_values=None, inv_mass=None,
                 preconditioner=None):
        """``init_values``: {site: constrained value} warm start (e.g. SVI
        guide locs) — see `init_model`.  Pair it with a small
        ``init_jitter`` (the jitter is in unconstrained space).

        ``inv_mass``: {site: per-coordinate variance in UNCONSTRAINED
        space} — the initial diagonal metric (variational preconditioning:
        a converged guide's scales, mapped through the bijector Jacobian).
        Sites not in the dict get 1.0.  With ``adapt_mass=True`` window-2
        adaptation refines it from real samples.

        ``preconditioner``: {site: covariance} linear whitening — per-site
        variance vectors or per-block (B, k, k) SPD covariances (e.g. the
        analytic GLM Fisher information inverse for harmonic-coefficient
        blocks) — see `block_precondition`.  Unlike ``inv_mass`` this
        removes WITHIN-block correlation, which no diagonal metric can.
        ``init_jitter`` then acts in whitened coordinates, i.e. in units
        of approximate posterior sds."""
        self.model = model
        self.init_values = init_values
        self.inv_mass = inv_mass
        self.preconditioner = preconditioner
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
        self._compiled = None
        self._compiled_args = None

    def run(self, key, *args, mesh=None, chain_axis="chains", **kwargs):
        """Run the chains.  With ``mesh=`` (a `jax.sharding.Mesh` carrying
        ``chain_axis``), the chain-key batch is sharded over that axis and
        the jitted vmap compiles to an SPMD program — one chain group per
        device, zero cross-chain communication (chains are independent).
        Combine with cell-sharded model data for a 2-axis (cells, chains)
        mesh: the potential's cell reductions lower to psum over the cells
        axis while chains stay parallel.

        Repeated ``run`` calls with the SAME ``*args``/``**kwargs`` objects
        reuse the compiled sampler (cold-start on this model family is
        XLA-compile-dominated; re-jitting per run would pay it every
        time).  Passing different argument objects rebuilds the program.
        """
        k_init, k_run = jax.random.split(key)
        flat_args = jax.tree_util.tree_leaves(
            (args, kwargs, self.init_values, self.inv_mass,
             self.preconditioner)
        )
        reusable = (
            self._compiled is not None
            and self._compiled_args is not None
            and len(flat_args) == len(self._compiled_args)
            and all(a is b for a, b in zip(flat_args, self._compiled_args))
        )
        if not reusable:
            info = init_model(self.model, *args, key=k_init,
                              init_values=self.init_values, **kwargs)
            if self.preconditioner is not None:
                info = block_precondition(info, self.preconditioner)
            self.model_info = info

            inv_mass0 = None
            if self.inv_mass is not None:
                parts = []
                for name, (shape, size, _) in info.site_meta.items():
                    v = self.inv_mass.get(name)
                    parts.append(
                        jnp.ones((size,)) if v is None
                        else jnp.asarray(v, jnp.float32).reshape(-1)
                    )
                inv_mass0 = jnp.concatenate(parts)
                # jitter scaled by the preconditioner: over-dispersed
                # starts relative to the (approximate) posterior, not an
                # isotropic ball that may be 1000 sds wide on stiff coords
                jitter_scale = jnp.sqrt(inv_mass0)
            else:
                jitter_scale = 1.0

            def one_chain(chain_key):
                kj, ks = jax.random.split(chain_key)
                q0 = info.init_u + (
                    self.init_jitter * jitter_scale * jax.random.normal(
                        kj, info.init_u.shape
                    )
                )
                chain_info = info._replace(init_u=q0)
                if self.kernel == "nuts":
                    return nuts(
                        chain_info, ks, self.num_warmup, self.num_samples,
                        self.step_size, self.max_depth, self.adapt_mass,
                        inv_mass0, q_safe=info.init_u,
                    )[:2]
                return hmc(
                    chain_info, ks, self.num_warmup, self.num_samples,
                    self.step_size, self.num_leapfrog, self.adapt_mass,
                    inv_mass0, q_safe=info.init_u,
                )[:2]

            self._compiled = jax.jit(jax.vmap(one_chain))
            self._compiled_args = flat_args

        chain_keys = jax.random.split(k_run, self.num_chains)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            chain_keys = jax.device_put(
                chain_keys, NamedSharding(mesh, P(chain_axis))
            )
        samples_u, accepts = self._compiled(chain_keys)
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
            x = arr.reshape(c, n, -1)
            # split-Rhat over chains
            rhat = _split_rhat(x)
            ess = effective_sample_size(x)
            out[name] = {"mean": mean, "sd": sd, "rhat": rhat, "ess": ess}
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


def _autocov_fft(x):
    """Per-chain autocovariance via FFT; x: (chains, samples, dim) ->
    (chains, samples, dim), biased (normalized by n, the convention the
    split-ESS estimator below expects)."""
    c, n, d = x.shape
    xc = x - x.mean(1, keepdims=True)
    m = 1 << (2 * n - 1).bit_length()          # zero-pad to avoid wraparound
    f = np.fft.rfft(xc, n=m, axis=1)
    acov = np.fft.irfft(f * np.conj(f), n=m, axis=1)[:, :n, :]
    return acov / n


def effective_sample_size(x):
    """Split-chain bulk ESS per scalar parameter (Vehtari et al. 2021 /
    Stan's estimator: multi-chain autocorrelation from within/between-chain
    variances, Geyer initial-monotone-positive-sequence truncation).

    x: (chains, samples, dim) numpy array -> (dim,) ESS estimates.
    """
    x = np.asarray(x, np.float64)
    c, n, d = x.shape
    half = n // 2
    if half < 2:
        return np.full((d,), np.nan)
    x = np.concatenate([x[:, :half, :], x[:, half:2 * half, :]], 0)
    m, n = 2 * c, half

    acov = _autocov_fft(x)                      # (m, n, d)
    chain_var = acov[:, 0, :] * n / (n - 1.0)   # unbiased per-chain var
    W = chain_var.mean(0)
    mean_acov = acov.mean(0)                    # (n, d)
    if m > 1:
        B_over_n = x.mean(1).var(0, ddof=1)
        var_plus = W * (n - 1.0) / n + B_over_n
    else:
        var_plus = W * (n - 1.0) / n
    var_plus = np.maximum(var_plus, 1e-300)

    rho = 1.0 - (W[None, :] - mean_acov) / var_plus[None, :]   # (n, d)
    rho[0] = 1.0
    # Geyer pairs P_k = rho_{2k} + rho_{2k+1}; truncate at first negative
    # pair, then enforce monotone non-increase
    n_pairs = n // 2
    pairs = rho[0:2 * n_pairs:2] + rho[1:2 * n_pairs:2]        # (n_pairs, d)
    pos = pairs > 0
    first_neg = np.where(
        pos.all(0), n_pairs, np.argmin(pos, axis=0)
    )
    keep = np.arange(n_pairs)[:, None] < first_neg[None, :]
    pairs = np.where(keep, pairs, 0.0)
    pairs = np.minimum.accumulate(pairs + 1e300 * (~keep), axis=0)
    pairs = np.where(keep, pairs, 0.0)
    tau = np.maximum(-1.0 + 2.0 * pairs.sum(0), 1.0 / (m * n))
    return np.minimum(m * n / tau, m * n * np.log10(max(m * n, 10.0)))
