"""Effect handlers: JAX-compatible probabilistic-program transforms.

This is the TPU-native replacement for the slice of Pyro the reference uses
(`pyro.sample/param/plate/deterministic`, `poutine.{trace,replay,condition,
block,substitute}` — SURVEY.md §2.4).  Handlers run at *trace time* only:
a model is a pure Python function calling `sample`/`param`/`deterministic`;
interpreting it under a handler stack produces a pytree trace of jnp values.
Everything the handlers do disappears after `jax.jit` tracing — the compiled
step is one fused XLA computation with no Python in the hot loop (unlike the
reference, which re-executes Pyro's handler stack on every SVI step:
`/root/reference/velocycle/phase_inference_model.py:168-169`).

PRNG: `seed` splits a single key deterministically per site via
`random.fold_in(key, stable_site_hash)`, so traces are bit-reproducible for a
given key regardless of site ordering changes elsewhere.
"""
from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp

__all__ = [
    "sample",
    "param",
    "factor",
    "deterministic",
    "plate",
    "trace",
    "seed",
    "substitute",
    "condition",
    "replay",
    "block",
    "scale",
    "Trace",
    "check_plate_shapes",
]

_STACK = []


def _site_hash(name: str) -> int:
    """Stable 31-bit hash of a site name (Python's hash() is salted)."""
    return int.from_bytes(
        hashlib.blake2s(name.encode(), digest_size=4).digest(), "little"
    ) & 0x7FFFFFFF


class Trace(dict):
    """An ordered dict of site-name -> message dicts."""

    def log_prob_sum(self, site_filter=lambda name, site: True):
        total = 0.0
        for name, site in self.items():
            if site["type"] == "sample" and site_filter(name, site):
                lp = site["fn"].log_prob(site["value"]).sum()
                total = total + lp * site.get("scale", 1.0)
        return total

    def nodes(self):
        return self


def _apply_stack(msg):
    # process top-down (outermost handler last in _STACK processes first)
    pointer = 0
    for pointer, handler in enumerate(reversed(_STACK)):
        handler.process_message(msg)
        if msg.get("stop"):
            break
    default_process(msg)
    # postprocess bottom-up over the handlers that saw the message
    for handler in _STACK[len(_STACK) - pointer - 1:]:
        handler.postprocess_message(msg)
    return msg


def default_process(msg):
    if msg["type"] == "sample" and msg["value"] is None:
        key = msg.get("key")
        if key is None:
            raise RuntimeError(
                f"Site {msg['name']!r} has no value and no PRNG key — wrap "
                "the model in handlers.seed(model, key)."
            )
        msg["value"] = msg["fn"].sample(key)


def sample(name, fn, obs=None, infer=None):
    """Sample (or observe) a random variable named ``name``."""
    if not _STACK:
        raise RuntimeError(
            "sample() outside of an effect-handler context; wrap the model "
            "with handlers.seed / handlers.trace."
        )
    msg = {
        "type": "sample",
        "name": name,
        "fn": fn,
        "value": obs,
        "is_observed": obs is not None,
        "infer": infer or {},
        "key": None,
        "hidden": False,
    }
    _apply_stack(msg)
    return msg["value"]


def param(name, init=None, constraint=None, event_dim=None):
    """Learnable parameter.  Under `substitute` (SVI apply path) the stored
    value is returned; under a collecting handler (init path) ``init`` is
    recorded.  ``constraint`` is a `core.constraints` object."""
    if not _STACK:
        raise RuntimeError("param() outside of an effect-handler context.")
    msg = {
        "type": "param",
        "name": name,
        "value": None,
        "init": init,
        "constraint": constraint,
        "hidden": False,
    }
    _apply_stack(msg)
    if msg["value"] is None:
        msg["value"] = init if not callable(init) else init()
    return msg["value"]


def factor(name, log_factor):
    """Add ``log_factor`` to the model joint density (an observed site whose
    log_prob *is* the factor).  Used for analytically-enumerated mixtures —
    the TPU-native replacement for pyro's parallel enumeration
    (`/root/reference/velocycle/phase_inference_model.py:390-447`):
    static shapes, no dynamic enumeration machinery."""
    from .distributions import Delta

    unit = jnp.zeros(())
    return sample(
        name, Delta(unit, log_density=jnp.sum(log_factor)), obs=unit
    )


def deterministic(name, value):
    """Record a deterministic quantity in the trace."""
    if not _STACK:
        return value
    msg = {
        "type": "deterministic",
        "name": name,
        "value": value,
        "fn": None,
        "is_observed": True,
        "hidden": False,
    }
    _apply_stack(msg)
    return msg["value"]


class Messenger:
    def __init__(self, fn=None):
        self.fn = fn

    def __enter__(self):
        _STACK.append(self)
        return self

    def __exit__(self, *exc):
        assert _STACK[-1] is self
        _STACK.pop()

    def process_message(self, msg):
        pass

    def postprocess_message(self, msg):
        pass

    def __call__(self, *args, **kwargs):
        with self:
            return self.fn(*args, **kwargs)


class trace(Messenger):
    """Record all sites into a `Trace`."""

    def __enter__(self):
        super().__enter__()
        self.trace = Trace()
        return self

    def postprocess_message(self, msg):
        if msg.get("hidden"):
            return
        name = msg["name"]
        if msg["type"] in ("sample", "deterministic", "param"):
            self.trace[name] = msg.copy()

    def get_trace(self, *args, **kwargs):
        self(*args, **kwargs)
        return self.trace


class seed(Messenger):
    """Provide deterministic per-site PRNG keys from one root key."""

    def __init__(self, fn=None, key=None):
        super().__init__(fn)
        if key is None:
            raise ValueError("seed requires a PRNG key")
        self.key = key

    def process_message(self, msg):
        if msg["type"] == "sample" and msg["key"] is None:
            msg["key"] = jax.random.fold_in(self.key, _site_hash(msg["name"]))


class substitute(Messenger):
    """Fix the values of named sample/param sites."""

    def __init__(self, fn=None, data=None):
        super().__init__(fn)
        self.data = data or {}

    def process_message(self, msg):
        if msg["name"] in self.data and msg["value"] is None:
            msg["value"] = self.data[msg["name"]]


class condition(Messenger):
    """Like substitute, but marks the sites observed (pyro poutine.condition;
    used by the fit drivers to pin stage-1 posteriors in stage 2:
    `/root/reference/velocycle/velocity_inference_model.py:60-66`)."""

    def __init__(self, fn=None, data=None):
        super().__init__(fn)
        self.data = data or {}

    def process_message(self, msg):
        if msg["type"] == "sample" and msg["name"] in self.data:
            msg["value"] = self.data[msg["name"]]
            msg["is_observed"] = True


class replay(Messenger):
    """Reuse sampled values from a previous trace (guide -> model replay)."""

    def __init__(self, fn=None, guide_trace=None):
        super().__init__(fn)
        self.guide_trace = guide_trace

    def process_message(self, msg):
        if (
            msg["type"] == "sample"
            and not msg["is_observed"]
            and msg["name"] in self.guide_trace
        ):
            guide_msg = self.guide_trace[msg["name"]]
            if guide_msg["type"] == "sample":
                msg["value"] = guide_msg["value"]


class block(Messenger):
    """Hide selected sites from outer handlers (poutine.block equivalent:
    conditioned sites are hidden from the guide so they contribute no log q,
    `/root/reference/velocycle/phase_inference_model.py:115`)."""

    def __init__(self, fn=None, hide=None, hide_fn=None):
        super().__init__(fn)
        if hide_fn is None:
            hide_set = set(hide or [])
            hide_fn = lambda msg: msg["name"] in hide_set
        self.hide_fn = hide_fn

    def process_message(self, msg):
        if self.hide_fn(msg):
            msg["hidden"] = True


class scale(Messenger):
    """Multiply selected sites' log-prob contributions by ``scale_factor``
    (pyro ``poutine.scale`` equivalent).  Used by the minibatch SVI path to
    upweight cell-local terms so each block step is an unbiased full-ELBO
    estimate (`infer.minibatch`).  ``site_filter(name)`` selects sites; by
    default every sample site is scaled."""

    def __init__(self, fn=None, scale_factor=1.0, site_filter=None):
        super().__init__(fn)
        self.scale_factor = scale_factor
        self.site_filter = site_filter

    def process_message(self, msg):
        if msg["type"] != "sample":
            return
        if self.site_filter is not None and not self.site_filter(msg["name"]):
            return
        msg["scale"] = msg.get("scale", 1.0) * self.scale_factor


class enum(Messenger):
    """Parallel enumeration of marked discrete sites (pyro
    ``config_enumerate``/``TraceEnum_ELBO`` equivalent, the mechanism the
    reference's LBA model relies on,
    `/root/reference/velocycle/phase_inference_model.py:397,425`).

    A sample site declared with ``infer={"enumerate": "parallel"}`` whose
    value is not already fixed (replay/condition/substitute) gets its full
    support stacked on a NEW leading axis instead of being sampled:
    the j-th enumerated site (in trace order) takes shape
    ``(K_j,) + (1,)*j + batch_shape`` so successive sites broadcast into a
    joint ``(K_{n-1}, ..., K_0)`` prefix, right-aligned against the model's
    ordinary batch dims.  `infer.TraceEnum_ELBO` then sums the discrete
    variables out of the model log-joint exactly.
    """

    def __enter__(self):
        super().__enter__()
        self.count = 0
        self._batch_ndim = None
        return self

    def process_message(self, msg):
        if (
            msg["type"] != "sample"
            or msg["is_observed"]
            or msg["value"] is not None
            or msg.get("infer", {}).get("enumerate") != "parallel"
        ):
            return
        support = msg["fn"].enumerate_support()  # (K,) + batch_shape
        K = support.shape[0]
        batch = support.shape[1:]
        # the (1,)*count prefix only forms a correct joint enum block when
        # every enumerated site shares one batch ndim — differing ndims
        # would collide enum axes with batch axes (silently mis-joined
        # enumeration at worst); fail loudly instead
        if self._batch_ndim is None:
            self._batch_ndim = len(batch)
        elif len(batch) != self._batch_ndim:
            raise ValueError(
                f"enumerated site {msg['name']!r} has batch ndim "
                f"{len(batch)} but an earlier enumerated site had "
                f"{self._batch_ndim}; give all enumerated sites the same "
                "batch ndim (broadcast their distribution parameters)"
            )
        msg["value"] = support.reshape((K,) + (1,) * self.count + batch)
        msg["infer"]["_enumerated"] = True
        self.count += 1


class plate(Messenger):
    """Named batch dimension.  TPU-first design: plates are *declarative* —
    broadcasting does the real work (the reference's tensors are already
    shaped for its pyro plates, `preprocessing.py:168-205`), and the plate
    records (name, size, dim) on each enclosed site's ``cond_indep_stack``
    so `check_plate_shapes` can verify that every site's value actually
    carries its declared plate sizes — the runnable replacement for pyro's
    `format_shapes` eyeballing (`/root/reference/velocycle/plots.py:13-31`).

    Usable as a context manager::

        with plate("genes", Ng, dim=-2):
            nu = sample("nu", Normal(mu, sd).to_event(1))
    """

    def __init__(self, name, size, dim=None):
        super().__init__(None)
        self.name = name
        self.size = size
        self.dim = dim

    def process_message(self, msg):
        msg.setdefault("cond_indep_stack", []).append(
            (self.name, self.size, self.dim)
        )


def check_plate_shapes(fn, *args, key=None, **kwargs):
    """Verify plate/shape consistency of a model or guide.

    Traces ``fn`` and checks, for every sample site, that

      * each declared plate's ``size`` appears among the site's value
        dimensions (size-1 plates broadcast and always pass), and
      * ``fn.log_prob(value)`` evaluates to finite values whose shape is
        broadcast-compatible with the value's batch shape.

    Returns a list of human-readable violation strings (empty = clean) —
    the runnable equivalent of eyeballing pyro's ``format_shapes`` output
    (`/root/reference/velocycle/plots.py:13-31`).
    """
    import numpy as np

    if key is None:
        key = jax.random.PRNGKey(0)
    tr = trace(seed(fn, key)).get_trace(*args, **kwargs)
    problems = []
    for name, site in tr.items():
        if site["type"] != "sample":
            continue
        shape = tuple(np.shape(site["value"]))
        for pname, size, dim in site.get("cond_indep_stack", []):
            if size <= 1:
                continue
            if size not in shape:
                problems.append(
                    f"site {name!r}: plate {pname!r} (size {size}) does "
                    f"not appear in value shape {shape}"
                )
        fn_ = site.get("fn")
        if fn_ is not None:
            lp = fn_.log_prob(site["value"])
            lp_shape = tuple(np.shape(lp))
            # log_prob batch dims must align with the value's leading dims
            # (event dims are summed out by to_event)
            ok = len(lp_shape) <= len(shape) and all(
                a == b or a == 1 or b == 1
                for a, b in zip(lp_shape, shape)
            )
            if not ok:
                problems.append(
                    f"site {name!r}: log_prob shape {lp_shape} does not "
                    f"align with value shape {shape}"
                )
    return problems


def uncondition():
    """Strip observations: used by Predictive to generate from the model."""

    class _Uncondition(Messenger):
        def process_message(self, msg):
            if msg["type"] == "sample" and msg["is_observed"]:
                msg["is_observed"] = False
                msg["value"] = None

    return _Uncondition()
