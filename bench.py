"""Benchmark: phase-inference SVI throughput (ELBO evals/s).

Mirrors BASELINE.md config #1 — the Capolupo fibroblasts one-sample,
Medium-gene-set phase fit: the reference runs 5000 full-batch SVI steps over
a ~200-gene x ~2000-cell matrix at ~37.9 ELBO evals/s on a 2019 MBP CPU
(`tutorials/Tutorial_Capolupo_HumanFibroblasts_OneSample_MedGeneSet.ipynb`
cells 28-29).  The tutorial dataset blobs are absent from the mount
(.MISSING_LARGE_BLOBS), so the benchmark simulates a matched-size NB count
matrix (Ng=200 genes, Nc=2000 cells, H=2 harmonics) host-side and measures
steps/s of the compiled SVI update.

Two measurement paths:
  * python-loop over the jitted single `update` — robust everywhere;
  * `lax.scan`-fused chunk (`update_chunk`) — the TPU fast path (zero
    per-step dispatch), probed in a watchdogged subprocess because the
    remote-TPU relay in this environment can wedge on long While programs;
    a hang there must not take down the whole benchmark.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import subprocess
import sys
import time

BASELINE_EVALS_PER_S = 37.9  # reference CPU anchor (BASELINE.md row 1)
NG, NC, H = 200, 2000, 2
LOOP_STEPS = 100
SCAN_STEPS = 2000
SCAN_TIMEOUT_S = 240


def _setup():
    import jax
    import numpy as np

    from velocycle_tpu import (
        Cycle, Phases, preprocess_for_phase_estimation,
    )
    from velocycle_tpu.infer import SVI, Trace_ELBO, clipped_adam
    from velocycle_tpu.simulate import simulate_data

    adata = simulate_data(Nc=NC, Ng=NG, omegas_to_test=(0.4,), seed=7)
    cycle = Cycle.trivial_prior(list(adata.var.index), harmonics=H)
    phases = Phases.from_angles(
        np.asarray(adata.obs["simulated_phis"].values),
        cell_names=list(adata.obs.index),
    )
    mp = preprocess_for_phase_estimation(
        adata, cycle, phases, n_harmonics=H, with_delta_nu=False,
    )
    svi = SVI(mp.model_fn, mp.guide_fn, clipped_adam(), Trace_ELBO())
    state = svi.init(jax.random.PRNGKey(0), mp.data)
    return jax, svi, state, mp


def _scan_worker():
    """Measure the scan-fused path; prints one float (steps/s)."""
    jax, svi, state, mp = _setup()
    # single compile + single execution: include compile in the wall time
    # and amortize it over a long chunk (conservative lower bound)
    t0 = time.perf_counter()
    state, losses = svi.update_chunk(state, SCAN_STEPS, mp.data)
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0
    print(json.dumps({"steps_per_s": SCAN_STEPS / dt}))


def main():
    jax, svi, state, mp = _setup()

    # robust path: python loop over the jitted update
    state, loss = svi.update(state, mp.data)
    jax.block_until_ready(loss)  # compile
    t0 = time.perf_counter()
    for _ in range(LOOP_STEPS):
        state, loss = svi.update(state, mp.data)
    jax.block_until_ready(loss)
    loop_rate = LOOP_STEPS / (time.perf_counter() - t0)

    # fast path: scan-fused chunk in a watchdogged subprocess
    scan_rate = None
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scan-worker"],
            capture_output=True, text=True, timeout=SCAN_TIMEOUT_S,
        )
        for line in proc.stdout.splitlines():
            try:
                scan_rate = json.loads(line)["steps_per_s"]
            except (json.JSONDecodeError, KeyError):
                continue
    except (subprocess.TimeoutExpired, OSError):
        pass

    evals_per_s = max(loop_rate, scan_rate or 0.0)
    path = "scan" if (scan_rate or 0.0) >= loop_rate else "python-loop"
    print(json.dumps({
        "metric": "phase_svi_elbo_evals_per_s",
        "value": round(evals_per_s, 2),
        "unit": (
            f"ELBO evals/s (Ng={NG}, Nc={NC}, H={H}, NB likelihood, "
            f"{path} path)"
        ),
        "vs_baseline": round(evals_per_s / BASELINE_EVALS_PER_S, 2),
    }))


if __name__ == "__main__":
    if "--scan-worker" in sys.argv:
        _scan_worker()
    else:
        main()
