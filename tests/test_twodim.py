"""2-D extension: simulator sanity + two-stage fit recovers the simulated
expression and velocity fields (`run_simulations.py` metrics)."""
import numpy as np
import jax
import pytest

from velocycle_tpu.twodim import (
    evaluate_fit,
    generate_adata,
    prepare_data,
    train_velo2d,
)



pytestmark = pytest.mark.slow  # heavy fits/samplers: fast lane skips this module

@pytest.fixture(scope="module")
def sim2d():
    return generate_adata(n_cells=200, n_genes=24, seed=0)


def test_simulator_outputs(sim2d):
    assert sim2d.shape == (200, 24)
    assert set(["spliced", "unspliced", "ElogS", "ElogU"]) <= set(
        sim2d.layers
    )
    assert sim2d.uns["w_omega"].shape[0] == 2
    assert np.isfinite(sim2d.layers["ElogU"]).all()
    # both branches populated
    assert 0.2 < sim2d.obs["upper_branch"].mean() < 0.8


def test_two_stage_fit_recovers_fields(sim2d):
    pd = prepare_data(sim2d)
    assert pd.design_s.shape[0] == 6 * 6 + 1
    results, losses_s, losses_u = train_velo2d(
        pd, n_steps_s=600, n_steps_u=600, key=jax.random.PRNGKey(0)
    )
    assert losses_s[-1] < losses_s[0]
    assert losses_u[-1] < losses_u[0]
    corrs = evaluate_fit(sim2d, results)
    assert corrs["ElogS"] > 0.9, corrs
    assert corrs["ElogU"] > 0.6, corrs
    assert corrs["log_beta"] > 0.4, corrs
