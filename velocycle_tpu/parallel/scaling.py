"""Weak-scaling measurement harness (BASELINE target: >= 0.8 efficiency).

Weak scaling holds the per-device work constant (cells/device) while
growing the mesh; ideal step time is flat, and

    efficiency(n) = t_step(1 device) / t_step(n devices)

The harness times the *same* jitted SVI program over cell-sharded data on
1, 2, 4, ... device submeshes.  On real multi-chip hardware this measures
ICI collective overhead (the gene-parameter gradient all-reduce).  On the
CPU-virtual-device test rig the devices share physical cores, so absolute
efficiencies are pessimistic — the harness still validates that the SPMD
program compiles, runs, and reduces correctly at every mesh size.
"""
from __future__ import annotations

import time

import numpy as np
import jax

from .mesh import make_mesh
from .sharding import shard_phase_data

__all__ = ["phase_weak_scaling", "format_report"]


def phase_weak_scaling(per_device_cells=512, Ng=64, n_harmonics=1,
                       steps=50, device_counts=None, seed=0, repeats=3):
    """Weak-scaling report for the phase-stage SVI step.

    Returns a list of dicts: {devices, Nc, steps_per_s, step_ms,
    efficiency} — efficiency normalized to the smallest mesh measured.
    """
    from .. import Cycle, Phases, preprocess_for_phase_estimation
    from ..infer import SVI, Trace_ELBO, clipped_adam
    from ..simulate import simulate_data

    n_dev = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]

    rows = []
    for n in device_counts:
        Nc = per_device_cells * n
        adata = simulate_data(Nc=Nc, Ng=Ng, omegas_to_test=(0.4,),
                              seed=seed)
        cycle = Cycle.trivial_prior(list(adata.var.index),
                                    harmonics=n_harmonics)
        phases = Phases.from_angles(
            np.asarray(adata.obs["simulated_phis"].values),
            cell_names=list(adata.obs.index),
        )
        mp = preprocess_for_phase_estimation(
            adata, cycle, phases, n_harmonics=n_harmonics,
            with_delta_nu=False,
        )
        mesh = make_mesh(("cells",), devices=jax.devices()[:n])
        data = shard_phase_data(mp.data, mesh)
        svi = SVI(mp.model_fn, mp.guide_fn, clipped_adam(), Trace_ELBO())
        state = svi.init_sharded(jax.random.PRNGKey(0), mesh, data)

        # compile + warm
        state, losses = svi.update_chunk(state, steps, data)
        jax.block_until_ready(jax.device_get(losses[-1]))
        best = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            state, losses = svi.update_chunk(state, steps, data)
            jax.block_until_ready(jax.device_get(losses[-1]))
            best = min(best, time.perf_counter() - t0)
        rows.append({
            "devices": n,
            "Nc": Nc,
            "steps_per_s": steps / best,
            "step_ms": best / steps * 1e3,
        })
    t1 = rows[0]["step_ms"]
    for r in rows:
        r["efficiency"] = t1 / r["step_ms"]
    return rows


def format_report(rows):
    lines = ["devices    Nc  steps/s  step_ms  efficiency"]
    for r in rows:
        lines.append(
            f"{r['devices']:>7} {r['Nc']:>5} {r['steps_per_s']:>8.1f} "
            f"{r['step_ms']:>8.3f} {r['efficiency']:>10.2f}"
        )
    return "\n".join(lines)
