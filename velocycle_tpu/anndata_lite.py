"""Minimal AnnData-compatible container + .h5ad reader/writer.

The execution environment has no `anndata`/`scanpy`; the preprocessing layer
only touches a small surface of the AnnData API (`.layers`, `.obs`, `.var`,
`.shape`, column subsetting — see
`/root/reference/velocycle/preprocessing.py:95-156`).  `AnnDataLite`
implements exactly that surface and duck-types with a real AnnData object
wherever one is available (all velocycle_tpu code accepts either).

`read_h5ad` / `write_h5ad` cover the on-disk format every reference
tutorial starts from (`/root/reference/README.md:47-49` — GEO GSE250148
ships `.h5ad` files): X and layers (dense, CSR or CSC), obs/var dataframes
(string/numeric/bool/categorical columns per the anndata 0.8+ encoding
spec), and uns scalars/arrays.  h5py-based, no anndata dependency.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import scipy.sparse as sp

__all__ = ["AnnDataLite", "as_dense", "read_h5ad", "write_h5ad"]


def as_dense(x):
    """Dense float/np view of a layer that may be scipy-sparse."""
    if sp.issparse(x):
        return np.asarray(x.todense())
    return np.asarray(x)


class AnnDataLite:
    """cells x genes data matrix with obs/var annotations and layers."""

    def __init__(self, X=None, obs=None, var=None, layers=None, uns=None):
        if X is not None:
            X = X if sp.issparse(X) else np.asarray(X)
        self.X = X
        n_obs = None
        n_var = None
        if X is not None:
            n_obs, n_var = X.shape
        if obs is None:
            obs = pd.DataFrame(index=pd.RangeIndex(n_obs or 0).astype(str))
        if var is None:
            var = pd.DataFrame(index=pd.RangeIndex(n_var or 0).astype(str))
        self.obs = obs if isinstance(obs, pd.DataFrame) else pd.DataFrame(obs)
        self.var = var if isinstance(var, pd.DataFrame) else pd.DataFrame(var)
        self.layers = dict(layers or {})
        self.uns = dict(uns or {})

    @property
    def shape(self):
        return (self.obs.shape[0], self.var.shape[0])

    @property
    def n_obs(self):
        return self.shape[0]

    @property
    def n_vars(self):
        return self.shape[1]

    def copy(self):
        return AnnDataLite(
            X=None if self.X is None else (
                self.X.copy() if sp.issparse(self.X) else np.array(self.X)
            ),
            obs=self.obs.copy(),
            var=self.var.copy(),
            layers={k: (v.copy() if sp.issparse(v) else np.array(v))
                    for k, v in self.layers.items()},
            uns=dict(self.uns),
        )

    def _var_indexer(self, key):
        if isinstance(key, (list, np.ndarray, pd.Index)):
            arr = np.asarray(key)
            if arr.dtype.kind in "UO":  # gene names
                idx = self.var.index.get_indexer(arr)
                if (idx < 0).any():
                    missing = arr[idx < 0]
                    raise KeyError(f"genes not found: {missing[:5]}")
                return idx
            return arr
        return key

    def __getitem__(self, key):
        """Supports adata[:, genes] and adata[cells_mask, :]."""
        if isinstance(key, tuple):
            okey, vkey = key
        else:
            okey, vkey = key, slice(None)
        vidx = self._var_indexer(vkey)
        if isinstance(okey, (list, np.ndarray, pd.Index)):
            oarr = np.asarray(okey)
            if oarr.dtype.kind in "UO":
                oidx = self.obs.index.get_indexer(oarr)
            else:
                oidx = oarr
        else:
            oidx = okey

        def _sub(m):
            if m is None:
                return None
            m2 = m[oidx] if not isinstance(oidx, slice) or oidx != slice(None) else m
            if sp.issparse(m2):
                m2 = m2.tocsc()[:, vidx].tocsr() if not _is_full(vidx, m.shape[1]) else m2
            else:
                m2 = m2[:, vidx] if not _is_full(vidx, m.shape[1]) else m2
            return m2

        out = AnnDataLite(
            X=_sub(self.X),
            obs=self.obs.iloc[oidx] if not _is_full(oidx, self.obs.shape[0]) else self.obs,
            var=self.var.iloc[vidx] if not _is_full(vidx, self.var.shape[0]) else self.var,
            layers={k: _sub(v) for k, v in self.layers.items()},
            uns=dict(self.uns),
        )
        return out

    def __repr__(self):
        return (
            f"AnnDataLite(n_obs={self.n_obs}, n_vars={self.n_vars}, "
            f"layers={list(self.layers)})"
        )


def _is_full(idx, n):
    return isinstance(idx, slice) and idx == slice(None)


# ---------------------------------------------------------------------------
# .h5ad IO (anndata 0.8+ element encodings, h5py only)
# ---------------------------------------------------------------------------

def _decode(x):
    """bytes -> str, recursively for arrays."""
    if isinstance(x, bytes):
        return x.decode()
    if isinstance(x, np.ndarray) and x.dtype.kind in ("S", "O"):
        return np.array([v.decode() if isinstance(v, bytes) else v
                         for v in x.ravel()]).reshape(x.shape)
    return x


def _read_matrix(node):
    """Dense dataset, or csr/csc group {data, indices, indptr} + shape."""
    import h5py

    if isinstance(node, h5py.Dataset):
        return np.asarray(node)
    enc = node.attrs.get("encoding-type", "")
    enc = enc.decode() if isinstance(enc, bytes) else enc
    shape = tuple(int(s) for s in node.attrs["shape"])
    parts = (np.asarray(node["data"]), np.asarray(node["indices"]),
             np.asarray(node["indptr"]))
    if enc.startswith("csc") or (not enc and len(parts[2]) == shape[1] + 1):
        return sp.csc_matrix(parts, shape=shape).tocsr()
    return sp.csr_matrix(parts, shape=shape)


def _read_series(node):
    """One obs/var column: dataset, or categorical/nullable group."""
    import h5py

    if isinstance(node, h5py.Dataset):
        return _decode(np.asarray(node))
    enc = node.attrs.get("encoding-type", "")
    enc = enc.decode() if isinstance(enc, bytes) else enc
    if "categories" in node:                     # categorical (0.8+)
        cats = _decode(np.asarray(node["categories"]))
        codes = np.asarray(node["codes"])
        return pd.Categorical.from_codes(codes, categories=cats)
    if "values" in node:                         # nullable int/bool
        values = np.asarray(node["values"])
        if "mask" in node:
            mask = np.asarray(node["mask"], bool)
            out = values.astype(object)
            out[mask] = None
            return out
        return values
    raise ValueError(f"unsupported column encoding {enc!r}")


def _read_dataframe(group):
    """An obs/var group: `_index` attr names the index column."""
    idx_col = group.attrs.get("_index", "_index")
    idx_col = idx_col.decode() if isinstance(idx_col, bytes) else idx_col
    order = group.attrs.get("column-order", None)
    if order is not None:
        order = [c.decode() if isinstance(c, bytes) else c for c in order]
    else:
        order = [k for k in group.keys() if k != idx_col]
    index = pd.Index(_decode(np.asarray(group[idx_col])))
    df = pd.DataFrame(index=index)
    for col in order:
        if col in group:
            df[col] = _read_series(group[col])
    return df


def _read_uns(group):
    import h5py

    out = {}
    for k, v in group.items():
        if isinstance(v, h5py.Dataset):
            val = _decode(v[()])
            out[k] = val
        else:
            out[k] = _read_uns(v)
    return out


def read_h5ad(path):
    """Load an `.h5ad` file into an `AnnDataLite`.

    Supports the subset of the anndata on-disk spec the VeloCycle
    workflows touch: `X` and `layers/*` as dense arrays or CSR/CSC groups
    (CSC is converted to CSR), `obs`/`var` dataframes with string,
    numeric, boolean, categorical and nullable columns, and `uns`
    scalars/arrays (nested dicts preserved).  `obsm`/`varm`/`obsp` are
    ignored — nothing downstream reads them.
    """
    import h5py

    with h5py.File(path, "r") as f:
        X = _read_matrix(f["X"]) if "X" in f else None
        layers = {}
        if "layers" in f:
            for name in f["layers"]:
                layers[name] = _read_matrix(f["layers"][name])
        obs = _read_dataframe(f["obs"]) if "obs" in f else None
        var = _read_dataframe(f["var"]) if "var" in f else None
        uns = _read_uns(f["uns"]) if "uns" in f else {}
    return AnnDataLite(X=X, obs=obs, var=var, layers=layers, uns=uns)


def _write_matrix(parent, name, m):
    if sp.issparse(m):
        m = m.tocsr()
        g = parent.create_group(name)
        g.attrs["encoding-type"] = "csr_matrix"
        g.attrs["encoding-version"] = "0.1.0"
        g.attrs["shape"] = np.asarray(m.shape, np.int64)
        g.create_dataset("data", data=m.data)
        g.create_dataset("indices", data=m.indices)
        g.create_dataset("indptr", data=m.indptr)
    else:
        parent.create_dataset(name, data=np.asarray(m))


def _write_dataframe(parent, name, df):
    g = parent.create_group(name)
    g.attrs["encoding-type"] = "dataframe"
    g.attrs["encoding-version"] = "0.2.0"
    g.attrs["_index"] = "_index"
    g.attrs["column-order"] = np.asarray(list(df.columns), dtype=object)
    g.create_dataset(
        "_index", data=np.asarray(df.index.astype(str), dtype=object)
    )
    for col in df.columns:
        s = df[col]
        if isinstance(s.dtype, pd.CategoricalDtype):
            cg = g.create_group(col)
            cg.attrs["encoding-type"] = "categorical"
            cg.attrs["encoding-version"] = "0.2.0"
            cg.create_dataset(
                "categories",
                data=np.asarray(s.cat.categories.astype(str), dtype=object),
            )
            cg.create_dataset("codes", data=np.asarray(s.cat.codes, np.int32))
        elif s.dtype.kind in ("U", "O"):
            g.create_dataset(
                col, data=np.asarray(s.astype(str), dtype=object)
            )
        else:
            g.create_dataset(col, data=np.asarray(s))


def write_h5ad(adata, path):
    """Write an AnnData(-Lite) to `.h5ad` (dense or CSR X/layers, obs/var
    dataframes, array/scalar uns).  Round-trips through `read_h5ad`."""
    import h5py

    with h5py.File(path, "w") as f:
        f.attrs["encoding-type"] = "anndata"
        f.attrs["encoding-version"] = "0.1.0"
        if adata.X is not None:
            _write_matrix(f, "X", adata.X)
        layers = f.create_group("layers")
        for name, m in adata.layers.items():
            _write_matrix(layers, name, m)
        _write_dataframe(f, "obs", adata.obs)
        _write_dataframe(f, "var", adata.var)
        uns = f.create_group("uns")

        def _put(group, d):
            for k, v in d.items():
                if isinstance(v, dict):
                    _put(group.create_group(k), v)
                elif isinstance(v, str):
                    group.create_dataset(k, data=v)
                else:
                    group.create_dataset(k, data=np.asarray(v))

        _put(uns, adata.uns)
