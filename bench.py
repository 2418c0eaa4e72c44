"""Benchmark: SVI / MCMC throughput against every BASELINE.md row.

Rows (reference anchors from the executed tutorial notebooks, 2019 MBP CPU):

  phase_1s      phase SVI, one sample, Ng=200 x Nc=2000, H=2   (37.9 evals/s)
  velo_const_1s velocity SVI, constant omega, same data         (32.4)
  velo_per_1s   velocity SVI, periodic omega (1 harmonic)       (32.4)
  phase_2s      phase SVI, two samples (Nc=4000, delta_nu on)   (12.1)
  velo_const_2s velocity SVI, const omega, two-sample           ( 9.1)
  velo_per_2s   velocity SVI, periodic omega, two-sample        ( 9.1)
  nuts          NUTS samples/s, phase model, 8 chains           (no anchor —
                the reference has no MCMC)
  smc           SMC particle-moves/s, adaptive tempering        (no anchor)
  phase_scale   phase SVI at Stereo-seq scale (2048 x 102400,
                fused Pallas NB kernel)                          (no anchor)

Measurement: the `lax.scan`-fused chunk path (`SVI.update_chunk`) with the
Pallas fused NB kernels enabled — the TPU hot path.  Steps/s == ELBO
evals/s (each step is one full-batch ELBO + backward + ClippedAdam update,
same as the reference).

All measurements run in a watchdogged worker subprocess that streams one
JSON line per row: the remote-TPU relay in this environment occasionally
wedges (hangs that survive the client), so the parent enforces a global
timeout and emits whatever rows completed.  Headline = phase_1s, the
BASELINE.md row 1 config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""
import json
import os
import subprocess
import sys
import time

BASELINES = {
    "phase_1s": 37.9,
    "velo_const_1s": 32.4,
    "velo_per_1s": 32.4,
    "phase_2s": 12.1,
    "velo_const_2s": 9.1,
    "velo_per_2s": 9.1,
}
WORKER_TIMEOUT_S = 1500
CHUNK, REPS = 500, 4


def _emit(row):
    print("ROW " + json.dumps(row), flush=True)


def _bench_svi(svi, data, label, chunk=CHUNK, reps=REPS):
    import jax

    state = svi.init(jax.random.PRNGKey(0), data)
    t0 = time.perf_counter()
    state, losses = svi.update_chunk(state, chunk, data)
    last = float(jax.device_get(losses[-1]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        state, losses = svi.update_chunk(state, chunk, data)
    last = float(jax.device_get(losses[-1]))
    dt = time.perf_counter() - t0
    rate = reps * chunk / dt
    _emit({
        "row": label, "evals_per_s": round(rate, 1),
        "compile_s": round(compile_s, 1), "final_loss": round(last, 1),
    })
    return rate


def _sim(Nc, Ng, H, seed, two_sample=False):
    import numpy as np

    from velocycle_tpu import Cycle, Phases
    from velocycle_tpu.simulate import simulate_data

    adata = simulate_data(Nc=Nc, Ng=Ng, omegas_to_test=(0.4,), seed=seed)
    cycle = Cycle.trivial_prior(list(adata.var.index), harmonics=H)
    phases = Phases.from_angles(
        np.asarray(adata.obs["simulated_phis"].values),
        cell_names=list(adata.obs.index),
    )
    design = None
    if two_sample:
        design = np.asarray(
            (np.arange(Nc) % 2)[:, None] == np.arange(2)[None, :], np.int64
        )
    return adata, cycle, phases, design


def _phase_row(label, Nc, two_sample, seed):
    from velocycle_tpu import preprocess_for_phase_estimation
    from velocycle_tpu.infer import SVI, Trace_ELBO, clipped_adam

    adata, cycle, phases, design = _sim(Nc, 200, 2, seed, two_sample)
    mp = preprocess_for_phase_estimation(
        adata, cycle, phases, n_harmonics=2, design_mtx=design,
        with_delta_nu=two_sample, use_fused_nb=True,
    )
    svi = SVI(mp.model_fn, mp.guide_fn, clipped_adam(), Trace_ELBO())
    _bench_svi(svi, mp.data, label)


def _velocity_row(label, Nc, omega_h, two_sample, seed):
    import numpy as np

    from velocycle_tpu import (
        AngularSpeed, preprocess_for_velocity_estimation,
    )
    from velocycle_tpu.infer import SVI, Trace_ELBO, clipped_adam

    adata, cycle, phases, design = _sim(Nc, 200, 2, seed, two_sample)
    conds = ["d0", "d3"] if two_sample else ["cond"]
    speed = AngularSpeed.trivial_prior(conds, harmonics=omega_h)
    mp = preprocess_for_velocity_estimation(
        adata, cycle, phases, speed,
        condition_design_mtx=design, batch_design_mtx=design,
        n_harmonics=2, with_delta_nu=two_sample, model_type="lrmn",
        use_fused_nb=True,
    )
    svi = SVI(mp.model_fn, mp.guide_fn, clipped_adam(), Trace_ELBO())
    _bench_svi(svi, mp.data, label)


def _nuts_row():
    import jax
    import numpy as np

    from velocycle_tpu import preprocess_for_phase_estimation
    from velocycle_tpu.core import handlers
    from velocycle_tpu.infer.mcmc import MCMC

    adata, cycle, phases, _ = _sim(500, 50, 1, 13)
    mp = preprocess_for_phase_estimation(
        adata, cycle, phases, n_harmonics=1, with_delta_nu=False,
    )
    # gene-parameter posterior with phases pinned (the conditioned workflow)
    model = handlers.condition(
        mp.model_fn, data={"phi_xy": mp.data.phixy_prior}
    )
    chains, samples = 8, 100
    m = MCMC(model, kernel="nuts", num_warmup=100, num_samples=samples,
             num_chains=chains, max_depth=6)
    t0 = time.perf_counter()
    m.run(jax.random.PRNGKey(0), mp.data)
    _ = m.get_samples()
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()  # same shapes: compiled program is reused
    m.run(jax.random.PRNGKey(1), mp.data)
    _ = m.get_samples()
    dt = time.perf_counter() - t0
    _emit({
        "row": "nuts", "samples_per_s": round(chains * samples / dt, 1),
        "cold_s": round(cold, 1),
        "accept_rate": round(m.accept_rate(), 3),
        "note": "warm run (sampling incl. 100-step warmup phase); 8 "
                "chains x 100 samples, Ng=50 phase model, phases "
                "conditioned",
    })


def _smc_row():
    import jax

    from velocycle_tpu import preprocess_for_phase_estimation
    from velocycle_tpu.core import handlers
    from velocycle_tpu.infer.smc import SMC

    adata, cycle, phases, _ = _sim(500, 50, 1, 14)
    mp = preprocess_for_phase_estimation(
        adata, cycle, phases, n_harmonics=1, with_delta_nu=False,
    )
    model = handlers.condition(
        mp.model_fn, data={"phi_xy": mp.data.phixy_prior}
    )
    n = 256
    smc = SMC(model, num_particles=n, num_moves=2)
    t0 = time.perf_counter()
    smc.run(jax.random.PRNGKey(0), mp.data)
    dt = time.perf_counter() - t0
    stages = len(smc.temperature_schedule)
    _emit({
        "row": "smc",
        "particle_moves_per_s": round(n * stages * 2 / dt, 1),
        "stages": int(stages),
        "log_evidence": round(smc.log_evidence(), 1),
        "note": f"incl. compile; {n} particles, adaptive tempering, "
                "2 HMC moves/stage, Ng=50 phase model",
    })


def _scale_row():
    """Stereo-seq-class phase fit: 2048 genes x 102400 cells, fused."""
    import jax
    import jax.numpy as jnp

    from velocycle_tpu.models import phase as phase_mod
    from velocycle_tpu.models.metapars import PhaseData
    from velocycle_tpu.infer import SVI, Trace_ELBO, clipped_adam

    from jax.scipy.special import gammaln

    Ng, Nc, H = 2048, 102400, 2
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    S = jnp.floor(jnp.exp(jax.random.normal(ks[0], (Ng, Nc)) * 0.8 + 1.0))
    ang = jax.random.normal(ks[1], (Nc,)) * 2.0
    data = PhaseData(
        S=S, logS=S,
        lgamma_k_sum=jax.jit(lambda s: gammaln(s + 1.0).sum())(S),
        count_factor=jax.random.normal(ks[2], (Nc,)) * 0.1,
        mu_nu=jnp.zeros((Ng, 2 * H + 1)),
        sd_nu=jnp.full((Ng, 2 * H + 1), 0.5),
        phixy_prior=jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1),
        Db=jnp.ones((1, Nc)),
        mu_dnu=jnp.zeros(()), sd_dnu=jnp.full((1, 1), 0.1),
        gamma_alpha=jnp.ones(()), gamma_beta=jnp.full((), 2.0),
        sigma_gc=jnp.full((), 0.5), beta0=jnp.full((), 0.1),
        beta1=jnp.full((), 0.9),
        Ng=Ng, Nc=Nc, Nb=1, num_harmonics_S=H,
        noisemodel="NegativeBinomial", with_delta_nu=False,
        use_fused_nb=True,
    )
    svi = SVI(phase_mod.phase_model, phase_mod.phase_guide, clipped_adam(),
              Trace_ELBO())
    _bench_svi(svi, data, "phase_scale", chunk=25, reps=4)


def _worker():
    import jax

    # persistent compile cache: dedups identical HLO (e.g. the second NUTS
    # run) and survives across bench invocations
    jax.config.update("jax_compilation_cache_dir", "/tmp/velocycle_tpu_cc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    _phase_row("phase_1s", 2000, False, 7)
    _velocity_row("velo_const_1s", 2000, 0, False, 7)
    _velocity_row("velo_per_1s", 2000, 1, False, 7)
    _phase_row("phase_2s", 4000, True, 8)
    _velocity_row("velo_const_2s", 4000, 0, True, 8)
    _velocity_row("velo_per_2s", 4000, 1, True, 8)
    _nuts_row()
    _smc_row()
    _scale_row()


def main():
    import threading

    rows = {}

    def _reader(pipe):
        for line in pipe:
            if line.startswith("ROW "):
                try:
                    row = json.loads(line[4:])
                    rows[row.pop("row")] = row
                except json.JSONDecodeError:
                    pass

    try:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        t = threading.Thread(target=_reader, args=(proc.stdout,),
                             daemon=True)
        t.start()
        try:
            proc.wait(timeout=WORKER_TIMEOUT_S)
        except subprocess.TimeoutExpired:
            proc.kill()  # emit whatever rows completed
        t.join(timeout=10)
    except OSError:
        pass

    headline = rows.get("phase_1s", {}).get("evals_per_s", 0.0)
    for name, anchor in BASELINES.items():
        if name in rows and "evals_per_s" in rows[name]:
            rows[name]["vs_baseline"] = round(
                rows[name]["evals_per_s"] / anchor, 1
            )
    print(json.dumps({
        "metric": "phase_svi_elbo_evals_per_s",
        "value": headline,
        "unit": (
            "ELBO evals/s (Ng=200, Nc=2000, H=2, NB, fused Pallas kernel, "
            "lax.scan chunk path; extra: all 6 BASELINE rows + NUTS + "
            "2048x102400 scale row)"
        ),
        "vs_baseline": round(headline / BASELINES["phase_1s"], 2),
        "extra": rows,
    }))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        _worker()
    else:
        main()
