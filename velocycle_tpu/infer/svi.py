"""Stochastic Variational Inference, compiled.

Functional SVI replacing the reference's `pyro.infer.SVI` + param store
(`/root/reference/velocycle/phase_inference_model.py:162-169`).  The param
"store" is an explicit pytree of *unconstrained* leaves; one `jit`-compiled
`update` closes over model/guide/loss and performs

    params -> constrain -> guide trace -> model replay -> ELBO -> grad -> adam

as a single XLA program.  `fit()` runs the hot loop with device-side losses
(one scalar fetch per `log_every`, not per step — the reference syncs
host<->device every step: `phase_inference_model.py:170`).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import handlers
from .elbo import Trace_ELBO

__all__ = ["SVI", "init_params"]


class _ParamCollector(handlers.Messenger):
    """Collect param init values + constraints from a guide execution."""

    def __enter__(self):
        super().__enter__()
        self.params = {}
        self.constraints = {}
        return self

    def process_message(self, msg):
        if msg["type"] == "param" and msg["name"] not in self.params:
            init = msg["init"]
            if callable(init):
                init = init()
            self.params[msg["name"]] = jnp.asarray(init, jnp.float32)
            self.constraints[msg["name"]] = msg["constraint"]


def init_params(guide, key, *args, **kwargs):
    """Run ``guide`` once to harvest parameter inits and constraints.

    Returns (unconstrained_params, constraints) where constraints maps
    name -> Constraint or None.
    """
    with _ParamCollector() as collector:
        handlers.trace(handlers.seed(guide, key)).get_trace(*args, **kwargs)
    unconstrained = {}
    for name, value in collector.params.items():
        c = collector.constraints[name]
        unconstrained[name] = c.inverse(value) if c is not None else value
    return unconstrained, collector.constraints


def constrain(unconstrained, constraints):
    out = {}
    for name, u in unconstrained.items():
        c = constraints.get(name)
        out[name] = c.forward(u) if c is not None else u
    return out


class SVIState:
    """Pytree of (step, params, opt_state, key)."""

    def __init__(self, step, params, opt_state, key):
        self.step = step
        self.params = params
        self.opt_state = opt_state
        self.key = key

    def tree_flatten(self):
        return (self.step, self.params, self.opt_state, self.key), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    SVIState, SVIState.tree_flatten, SVIState.tree_unflatten
)


class SVI:
    def __init__(self, model, guide, optim, loss=None):
        self.model = model
        self.guide = guide
        self.optim = optim
        self.loss = loss if loss is not None else Trace_ELBO()
        self.constraints = None

    # -- functional API ----------------------------------------------------
    def init(self, key, *args, **kwargs):
        key_init, key_state = jax.random.split(key)
        params, self.constraints = init_params(
            self.guide, key_init, *args, **kwargs
        )
        opt_state = self.optim.init(params)
        return SVIState(jnp.zeros((), jnp.int32), params, opt_state, key_state)

    def loss_fn(self, params, key, *args, **kwargs):
        constrained = constrain(params, self.constraints)
        guide = handlers.substitute(self.guide, data=constrained)
        model = handlers.substitute(self.model, data=constrained)
        return self.loss.loss(key, model, guide, *args, **kwargs)

    def _update_impl(self, state, *args, **kwargs):
        key, sub = jax.random.split(state.key)
        loss, grads = jax.value_and_grad(self.loss_fn)(
            state.params, sub, *args, **kwargs
        )
        updates, opt_state = self.optim.update(
            grads, state.opt_state, state.params
        )
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        return SVIState(state.step + 1, params, opt_state, key), loss

    @partial(jax.jit, static_argnums=(0,))
    def update(self, state, *args, **kwargs):
        """One jitted SVI step (use `update_chunk` for the scanned fast
        path)."""
        return self._update_impl(state, *args, **kwargs)

    def init_sharded(self, key, mesh, *args, **kwargs):
        """`init`, then lay the state out over a device mesh: per-cell
        params sharded on the ``cells`` axis, everything else replicated.
        Optimizer state inherits the param shardings (jitted `optim.init`
        propagates input shardings).  With data sharded via
        `parallel.shard_phase_data`/`shard_velocity_data`, the unchanged
        `update`/`update_chunk` compile to SPMD programs whose ELBO and
        gradient reductions are XLA-inserted `psum`s over ICI."""
        from ..parallel.sharding import replicate, shard_params

        state = self.init(key, *args, **kwargs)
        params = shard_params(state.params, mesh)
        opt_state = jax.jit(self.optim.init)(params)
        return SVIState(
            replicate(state.step, mesh), params, opt_state,
            replicate(state.key, mesh),
        )

    def get_params(self, state):
        return constrain(state.params, self.constraints)

    @partial(jax.jit, static_argnums=(0, 2))
    def update_chunk(self, state, num_steps, *args, **kwargs):
        """``num_steps`` SVI updates as ONE XLA program via `lax.scan`.

        This is the TPU hot path: zero Python dispatch between steps, loss
        history stays device-side (the reference syncs host<->device every
        step, `phase_inference_model.py:170`).
        """

        def body(state, _):
            state, loss = self._update_impl(state, *args, **kwargs)
            return state, loss

        return jax.lax.scan(body, state, None, length=num_steps)

    # -- convenience driver ------------------------------------------------
    def run(self, key, num_steps, *args, log_every=0, callback=None,
            early_exit=False, early_exit_patience=200, chunk_size=None,
            **kwargs):
        """Run ``num_steps`` updates; returns (state, losses ndarray).

        Steps execute in scanned chunks (`update_chunk`), with host-side
        checks only at chunk boundaries.  `early_exit` reproduces the
        reference heuristic: after ``early_exit_patience`` steps, stop when
        |mean(last 100) - mean(last 10)| < 5
        (`/root/reference/velocycle/phase_inference_model.py:174-178`).
        """
        import numpy as np

        if chunk_size is None:
            chunk_size = 100 if (early_exit or log_every or callback) else (
                min(num_steps, 1000)
            )
        state = self.init(key, *args, **kwargs)
        losses = []
        done = 0
        while done < num_steps:
            n = min(chunk_size, num_steps - done)
            state, chunk_losses = self.update_chunk(state, n, *args, **kwargs)
            losses.append(np.asarray(jax.device_get(chunk_losses)))
            done += n
            flat_tail = losses[-1]
            if log_every:
                print(
                    f"step {done}: elbo loss = {float(flat_tail[-1]):.3f}"
                )
            if callback is not None:
                callback(done, state, flat_tail[-1])
            if early_exit and done > early_exit_patience:
                recent = np.concatenate(losses)[-100:]
                if abs(recent.mean() - recent[-10:].mean()) < 5:
                    break
        return state, np.concatenate(losses)
