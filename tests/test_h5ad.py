"""`.h5ad` IO: the distribution format of the reference datasets.

Every reference tutorial starts from an `.h5ad` file
(`/root/reference/README.md:47-49` — GEO GSE250148); `read_h5ad` makes the
framework runnable on those files without an `anndata` dependency.  The
round-trip test goes through our own writer; the spec test reads a file
hand-built with raw h5py following the anndata 0.8+ on-disk encoding, so
reader and writer bugs cannot cancel out.
"""
import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from velocycle_tpu import read_h5ad, write_h5ad
from velocycle_tpu.anndata_lite import AnnDataLite, as_dense
from velocycle_tpu.simulate import simulate_data

h5py = pytest.importorskip("h5py")


def test_roundtrip_simulated(tmp_path):
    adata = simulate_data(Nc=40, Ng=12, seed=3)
    adata.layers["spliced"] = sp.csr_matrix(
        np.asarray(adata.layers["spliced"])
    )
    adata.obs["phase_class"] = pd.Categorical(
        np.where(np.arange(40) % 2 == 0, "S", "G2M")
    )
    path = tmp_path / "sim.h5ad"
    write_h5ad(adata, str(path))

    back = read_h5ad(str(path))
    assert back.shape == adata.shape
    assert list(back.obs.index) == list(adata.obs.index)
    assert list(back.var.index) == list(adata.var.index)
    assert sp.issparse(back.layers["spliced"])
    np.testing.assert_array_equal(
        as_dense(back.layers["spliced"]), as_dense(adata.layers["spliced"])
    )
    np.testing.assert_array_equal(
        np.asarray(back.layers["unspliced"]),
        np.asarray(adata.layers["unspliced"]),
    )
    np.testing.assert_allclose(
        back.obs["simulated_phis"].values,
        adata.obs["simulated_phis"].values,
    )
    assert list(back.obs["phase_class"]) == list(adata.obs["phase_class"])
    np.testing.assert_allclose(
        np.asarray(back.uns["simulated_nu"]),
        np.asarray(adata.uns["simulated_nu"]),
    )


def test_read_spec_file_csc_categorical_nullable(tmp_path):
    """A file written with raw h5py per the anndata spec: CSC X,
    categorical + nullable-integer obs columns, nested uns."""
    path = tmp_path / "spec.h5ad"
    X = sp.random(6, 4, density=0.5, random_state=0, format="csc")
    with h5py.File(path, "w") as f:
        g = f.create_group("X")
        g.attrs["encoding-type"] = "csc_matrix"
        g.attrs["encoding-version"] = "0.1.0"
        g.attrs["shape"] = np.array([6, 4], np.int64)
        g.create_dataset("data", data=X.data)
        g.create_dataset("indices", data=X.indices)
        g.create_dataset("indptr", data=X.indptr)

        obs = f.create_group("obs")
        obs.attrs["encoding-type"] = "dataframe"
        obs.attrs["_index"] = "cell_id"
        obs.attrs["column-order"] = np.asarray(
            ["batch", "n_counts"], dtype=object
        )
        obs.create_dataset(
            "cell_id", data=np.asarray([f"c{i}" for i in range(6)],
                                       dtype=object)
        )
        cat = obs.create_group("batch")
        cat.attrs["encoding-type"] = "categorical"
        cat.create_dataset("categories", data=np.asarray(["a", "b"],
                                                         dtype=object))
        cat.create_dataset("codes", data=np.array([0, 0, 1, 1, 0, 1],
                                                  np.int8))
        nullable = obs.create_group("n_counts")
        nullable.attrs["encoding-type"] = "nullable-integer"
        nullable.create_dataset("values", data=np.arange(6))
        nullable.create_dataset(
            "mask", data=np.array([0, 0, 0, 1, 0, 0], bool)
        )

        var = f.create_group("var")
        var.attrs["encoding-type"] = "dataframe"
        var.attrs["_index"] = "_index"
        var.create_dataset(
            "_index", data=np.asarray([f"G{i}" for i in range(4)],
                                      dtype=object)
        )

        uns = f.create_group("uns")
        sub = uns.create_group("meta")
        sub.create_dataset("note", data="hello")
        uns.create_dataset("scale", data=1.5)

    adata = read_h5ad(str(path))
    assert adata.shape == (6, 4)
    assert sp.issparse(adata.X)
    np.testing.assert_allclose(as_dense(adata.X), X.toarray())
    assert list(adata.obs.index) == [f"c{i}" for i in range(6)]
    assert list(adata.obs["batch"]) == ["a", "a", "b", "b", "a", "b"]
    assert adata.obs["n_counts"].iloc[3] is None
    assert adata.obs["n_counts"].iloc[2] == 2
    assert adata.uns["meta"]["note"] == "hello"
    assert float(adata.uns["scale"]) == 1.5


def test_read_then_preprocess(tmp_path):
    """The workflow entry point: load .h5ad, preprocess, get Metapars."""
    from velocycle_tpu import Cycle, Phases, preprocess_for_phase_estimation

    adata = simulate_data(Nc=30, Ng=10, seed=5)
    path = tmp_path / "wf.h5ad"
    write_h5ad(adata, str(path))
    loaded = read_h5ad(str(path))

    cycle = Cycle.trivial_prior(list(loaded.var.index), harmonics=1)
    phases = Phases.from_angles(
        loaded.obs["simulated_phis"].values,
        cell_names=list(loaded.obs.index),
    )
    mp = preprocess_for_phase_estimation(
        loaded, cycle, phases, n_harmonics=1, with_delta_nu=False,
    )
    assert mp.data.S.shape == (10, 30)
    np.testing.assert_array_equal(
        np.asarray(mp.data.S),
        np.asarray(adata.layers["spliced"]).T,
    )
