"""First-run UX: persistent-compile-cache warming.

Cold-compiling the flagship configurations takes real time on TPU
(measured through the remote-compile relay: ~40-55 s for the fused
phase-model SVI program at Stereo-seq scale, similar for a NUTS kernel —
`docs/performance.md`).  XLA's persistent compilation cache removes that
cost for every process after the first, keyed on the compiled HLO — so a
warmup pass must compile the SAME programs a real fit will run:
`SVI.update_chunk` traces a `lax.scan` whose length is a static argument,
meaning the chunk lengths must match (`infer/svi.py:153-205` uses
min(num_steps, 1000) plus a remainder chunk).

Typical use, once per machine (or after a jax/libtpu upgrade)::

    import velocycle_tpu as vc
    vc.enable_compile_cache()            # ~/.cache/velocycle_tpu/xla
    mp = vc.preprocess_for_phase_estimation(...)
    vc.warmup(mp, num_steps=5000)        # compiles fit + predictive
    ...                                  # every later fit starts hot

`enable_compile_cache` alone is enough if you don't mind the first real
fit paying the compile; `warmup` just fronts the cost at a moment you
choose.  The cache also dedups identical programs within one process
(e.g. repeated fits in a notebook), which jit's in-memory cache already
handles — the persistent cache is about the NEXT process.
"""
from __future__ import annotations

import os
import time

import jax

__all__ = ["enable_compile_cache", "warmup"]


def enable_compile_cache(cache_dir=None, min_compile_seconds=1.0):
    """Turn on XLA's persistent compilation cache.

    Args:
      cache_dir: where compiled programs live; defaults to
        ``$VELOCYCLE_TPU_CACHE`` or ``~/.cache/velocycle_tpu/xla``.
      min_compile_seconds: only persist programs that took at least this
        long to compile (keeps the cache free of trivial kernels).

    Returns the cache directory path.
    """
    if cache_dir is None:
        cache_dir = os.environ.get(
            "VELOCYCLE_TPU_CACHE",
            os.path.join(
                os.path.expanduser("~"), ".cache", "velocycle_tpu", "xla"
            ),
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(min_compile_seconds),
    )
    return cache_dir


def _chunk_lengths(num_steps, chunk_size=None):
    """The distinct `lax.scan` lengths `SVI.run` will compile for a
    ``num_steps`` fit (`infer/svi.py:182-193`)."""
    if chunk_size is None:
        chunk_size = min(num_steps, 1000)
    lengths = {min(chunk_size, num_steps)}
    rem = num_steps % chunk_size
    if num_steps > chunk_size and rem:
        lengths.add(rem)
    return sorted(lengths)


def warmup(metaparams, condition_on=None, num_steps=1000, chunk_size=None,
           predictive=True, num_posterior_samples=None, key=None,
           cache_dir=None, verbose=True):
    """Compile (and persist) the programs a fit of this configuration runs.

    Builds the exact model/guide pair the fit drivers build (including
    ``condition_on`` handling — conditioning changes the traced program)
    and compiles:

      * the scanned SVI update chunk(s) for a ``num_steps`` fit;
      * (optionally) the vmapped posterior-predictive program.

    Args:
      metaparams: a `Metapars` from either ``preprocess_for_*`` call.
      condition_on: the same dict you will pass to the fit driver.
      num_steps: the step count of the real fit (chunk lengths derive
        from it — a mismatched ``num_steps`` with the same chunking still
        hits the cache for the main 1000-step chunk).
      predictive: also compile the posterior-sampling program.
      num_posterior_samples: batch size of the predictive program; match
        the driver's ``min(n_per_bin, num_samples)`` (default 500).
      cache_dir: forwarded to `enable_compile_cache`; pass ``False`` to
        skip touching the persistent-cache config.

    Returns {program_name: seconds} compile timings.
    """
    from .core import handlers
    from .infer import SVI, Trace_ELBO, clipped_adam
    from .infer.predictive import Predictive

    if cache_dir is not False:
        enable_compile_cache(cache_dir)
    if key is None:
        key = jax.random.PRNGKey(0)

    condition = dict(condition_on or {})
    model, guide = metaparams.model_fn, metaparams.guide_fn
    if condition:
        model = handlers.condition(model, data=condition)
        guide = handlers.block(guide, hide=list(condition.keys()))

    svi = SVI(model, guide, clipped_adam(
        lr=0.05, betas=(0.80, 0.99),
        lrd=0.1 ** (1.0 / max(num_steps, 1)),
    ), Trace_ELBO())
    state = svi.init(key, metaparams.data)

    timings = {}
    for n in _chunk_lengths(num_steps, chunk_size):
        t0 = time.perf_counter()
        new_state, losses = svi.update_chunk(state, n, metaparams.data)
        jax.device_get(losses[-1])  # force execution through the relay
        timings[f"svi_chunk_{n}"] = time.perf_counter() - t0
        if verbose:
            print(f"warmup: svi chunk length {n} ready in "
                  f"{timings[f'svi_chunk_{n}']:.1f}s")

    if predictive:
        data = metaparams.data
        if getattr(data, "use_fused_nb", False):
            # the drivers replay posterior sampling through the plain
            # path (`fit.py:168-172`) — warm that program, not the fused
            data = data.replace(use_fused_nb=False)
        n_samples = num_posterior_samples or 500
        params = svi.get_params(new_state)
        pred = Predictive(model, guide=guide, params=params,
                          num_samples=n_samples)
        t0 = time.perf_counter()
        out = pred(jax.random.fold_in(key, 1), data)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        timings["predictive"] = time.perf_counter() - t0
        if verbose:
            print(f"warmup: predictive ({n_samples} draws) ready in "
                  f"{timings['predictive']:.1f}s")
    return timings
