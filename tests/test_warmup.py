"""`warmup` / `enable_compile_cache`: first-run compile-cost UX.

Cold compiles at the flagship configs run 40-55 s through the TPU relay
(`docs/performance.md`); `warmup` fronts that cost by compiling the exact
programs a fit will run.  These tests verify the chunk-length derivation
matches `SVI.run`'s chunking (the cache is HLO-keyed, so lengths must
match) and that a warmup pass runs end-to-end on a tiny config.
"""
import numpy as np
import jax
import pytest

from velocycle_tpu import (
    Cycle, Phases, enable_compile_cache, warmup,
    preprocess_for_phase_estimation,
)
from velocycle_tpu.simulate import simulate_data
from velocycle_tpu.warmup import _chunk_lengths


def test_chunk_lengths_match_svi_run():
    # SVI.run: chunk_size = min(num_steps, 1000), then a remainder chunk
    assert _chunk_lengths(500) == [500]
    assert _chunk_lengths(1000) == [1000]
    assert _chunk_lengths(3000) == [1000]        # 3 x 1000, no remainder
    assert _chunk_lengths(2500) == [500, 1000]   # 2 x 1000 + 500
    assert _chunk_lengths(25, chunk_size=10) == [5, 10]


def test_enable_compile_cache_configures_jax(tmp_path):
    d = str(tmp_path / "cc")
    got = enable_compile_cache(d, min_compile_seconds=2.0)
    assert got == d
    assert jax.config.jax_compilation_cache_dir == d
    import os

    assert os.path.isdir(d)


def test_warmup_compiles_fit_programs(tmp_path):
    adata = simulate_data(Nc=30, Ng=10, seed=7)
    cycle = Cycle.trivial_prior(list(adata.var.index), harmonics=1)
    phases = Phases.from_angles(
        adata.obs["simulated_phis"].values,
        cell_names=list(adata.obs.index),
    )
    mp = preprocess_for_phase_estimation(
        adata, cycle, phases, n_harmonics=1, with_delta_nu=False,
    )
    timings = warmup(
        mp, num_steps=25, chunk_size=10, num_posterior_samples=4,
        cache_dir=str(tmp_path / "cc"), verbose=False,
    )
    assert set(timings) == {"svi_chunk_5", "svi_chunk_10", "predictive"}
    assert all(t > 0 for t in timings.values())


def test_warmup_respects_conditioning(tmp_path):
    """Conditioning changes the traced program; warmup must build the same
    conditioned model/guide the driver builds."""
    adata = simulate_data(Nc=30, Ng=10, seed=7)
    cycle = Cycle.trivial_prior(list(adata.var.index), harmonics=1)
    phases = Phases.from_angles(
        adata.obs["simulated_phis"].values,
        cell_names=list(adata.obs.index),
    )
    mp = preprocess_for_phase_estimation(
        adata, cycle, phases, n_harmonics=1, with_delta_nu=False,
    )
    phi_xy = np.stack(
        [np.cos(adata.obs["simulated_phis"]),
         np.sin(adata.obs["simulated_phis"])], axis=-1,
    ).astype(np.float32)
    timings = warmup(
        mp, condition_on={"phi_xy": phi_xy}, num_steps=10,
        predictive=False, cache_dir=False, verbose=False,
    )
    assert "svi_chunk_10" in timings
