"""Preprocessing: gene filtering, design matrices, metapar assembly."""
import numpy as np
import pandas as pd
import pytest

from velocycle_tpu.anndata_lite import AnnDataLite
from velocycle_tpu.containers import AngularSpeed, Cycle, Phases
from velocycle_tpu.preprocessing import (
    filter_shared_genes,
    make_design_matrix,
    normalize_total,
    preprocess_for_phase_estimation,
    preprocess_for_velocity_estimation,
)


def _adata(nc=20, ng=8, seed=0, batches=("a", "b")):
    rng = np.random.default_rng(seed)
    S = rng.poisson(5.0, size=(nc, ng)).astype(np.int64)
    U = rng.poisson(2.0, size=(nc, ng)).astype(np.int64)
    genes = [f"G{i}" for i in range(ng)]
    cells = [f"c{i}" for i in range(nc)]
    obs = pd.DataFrame(
        {"batch": np.resize(list(batches), nc)}, index=cells
    )
    return AnnDataLite(
        X=S, obs=obs, var=pd.DataFrame(index=genes),
        layers={"spliced": S, "unspliced": U},
    )


def test_make_design_matrix():
    ad = _adata(nc=6, batches=("x", "y", "z"))
    D = make_design_matrix(ad, "batch")
    assert D.shape == (6, 3)
    np.testing.assert_array_equal(D.sum(1), 1)
    # first-appearance ordering: x, y, z
    assert D[0, 0] == 1 and D[1, 1] == 1 and D[2, 2] == 1
    with pytest.raises(ValueError):
        make_design_matrix(ad, "nope")


def test_normalize_total():
    ad = _adata()
    normalize_total(ad)
    assert "S_sz" in ad.layers and "U_sz" in ad.layers
    totals = ad.layers["S_sz"].sum(1)
    np.testing.assert_allclose(totals, totals[0], rtol=1e-6)


def test_filter_shared_genes_intersection():
    ad = _adata(ng=8)
    cycle = Cycle.trivial_prior(["G2", "G5", "G7", "NOPE"], harmonics=1)
    new_cycle, new_ad = filter_shared_genes(cycle, ad)
    assert new_cycle.genes == ["G2", "G5", "G7"]
    assert list(new_ad.var.index) == ["G2", "G5", "G7"]
    assert new_ad.layers["spliced"].shape == (20, 3)


def test_filter_shared_genes_union():
    ad = _adata(ng=4)
    cycle = Cycle.trivial_prior(["G1", "G2"], harmonics=1)
    new_cycle, new_ad = filter_shared_genes(cycle, ad, filter_type="union")
    assert new_cycle.genes == ["G0", "G1", "G2", "G3"]
    # extended genes get the flat-extension std
    assert new_cycle.stds["G0"].iloc[0] == 10.0
    cycle_bad = Cycle.trivial_prior(["G1", "MISSING"], harmonics=1)
    with pytest.raises(ValueError):
        filter_shared_genes(cycle_bad, ad, filter_type="union")


def test_preprocess_for_phase_estimation_shapes():
    ad = _adata(nc=20, ng=8)
    cycle = Cycle.trivial_prior([f"G{i}" for i in range(8)], harmonics=2)
    phases = Phases.flat_prior(ad)
    D = make_design_matrix(ad, "batch")
    mp = preprocess_for_phase_estimation(ad, cycle, phases, D)
    d = mp.data
    assert d.S.shape == (8, 20)
    assert d.mu_nu.shape == (8, 5)
    assert d.phixy_prior.shape == (20, 2)
    assert d.Db.shape == (2, 20)
    assert d.count_factor.shape == (20,)
    assert d.Ng == 8 and d.Nc == 20 and d.Nb == 2
    assert mp.model_fn is not None and mp.guide_fn is not None
    # metapars passthrough
    assert mp.Ng == 8
    with pytest.raises(ValueError):
        preprocess_for_phase_estimation(
            ad, cycle, phases, D, gene_selection_model="gmm"
        )


def test_preprocess_for_velocity_estimation_shapes():
    ad = _adata(nc=20, ng=8)
    cycle = Cycle.trivial_prior([f"G{i}" for i in range(8)], harmonics=2)
    phases = Phases.flat_prior(ad)
    speed = AngularSpeed.trivial_prior(["cond"], harmonics=1)
    mp = preprocess_for_velocity_estimation(ad, cycle, phases, speed)
    d = mp.data
    assert d.S.shape == (8, 20) and d.U.shape == (8, 20)
    assert d.mu_nuomega.shape == (1, 3)
    assert d.Nhw == 3 and d.Nx == 1
    assert d.mu_gamma.shape == (8,)
    assert d.model_type == "lrmn"
    mp2 = preprocess_for_velocity_estimation(
        ad, cycle, phases, speed, model_type="fourier"
    )
    assert mp2.guide_fn.__name__ == "velocity_guide"
