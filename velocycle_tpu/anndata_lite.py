"""Minimal AnnData-compatible container.

The execution environment has no `anndata`/`scanpy`; the preprocessing layer
only touches a small surface of the AnnData API (`.layers`, `.obs`, `.var`,
`.shape`, column subsetting — see
`/root/reference/velocycle/preprocessing.py:95-156`).  `AnnDataLite`
implements exactly that surface and duck-types with a real AnnData object
wherever one is available (all velocycle_tpu code accepts either).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import scipy.sparse as sp

__all__ = ["AnnDataLite", "as_dense"]


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
