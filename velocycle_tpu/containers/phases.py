"""Phases: per-cell position on the cell-cycle circle, with uncertainty.

Capability parity with `/root/reference/velocycle/phases.py:103-509`.  The
phase of cell ``c`` is stored as a 2-vector ``phi_xy`` (rows ``phi_x``,
``phi_y``; columns cells): its angle is the phase, its norm the
concentration of the projected-Normal prior/posterior.  Circular std uses
exact `scipy.special` Bessel ratios instead of the reference's
Abramowitz-Stegun polynomial tables (`phases.py:17-100`).

The MLE prior builder (`from_cycle_mle`) is a vectorized
(bins x genes x cells) jnp computation jitted once — the hot op is a
(bins x coeffs) @ (coeffs x genes) MXU matmul followed by a Poisson/NB
log-pmf reduction over genes.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import scipy.special as ssp

__all__ = ["Phases"]


class Phases:
    def __init__(self, phi_xy=None):
        self.phi_xy: pd.DataFrame = phi_xy
        self.pcs = None
        self.pca = None
        self.omegas = None

    def __len__(self):
        return self.shape[-1]

    @property
    def shape(self):
        return self.phi_xy.shape

    def copy(self):
        import copy as _copy

        return _copy.deepcopy(self)

    # -- setters / views ---------------------------------------------------
    def set_phixy(self, new_phixy):
        if isinstance(new_phixy, pd.DataFrame):
            self.phi_xy = new_phixy
            return
        arr = np.asarray(new_phixy)
        df = pd.DataFrame(arr)
        df.index = self.phi_xy.index
        df.columns = self.phi_xy.columns
        self.phi_xy = df

    def set_omegas(self, new_omegas):
        self.omegas = new_omegas

    @property
    def cells(self):
        return list(self.phi_xy.columns)

    @property
    def phi_xy_array(self):
        """(Nc, 2) f32 array: TPU-model layout."""
        return self.phi_xy.values.astype(np.float32).T

    @property
    def phi_xy_tensor(self):
        """(2, Nc) f32 array — reference orientation (`phases.py:276-283`)."""
        return self.phi_xy.values.astype(np.float32)

    @property
    def phis(self):
        """Per-cell phase angle in [0, 2*pi)."""
        v = self.phi_xy.values
        return np.mod(np.arctan2(v[1, :], v[0, :]), 2 * np.pi)

    directions = phis

    @property
    def concentrations(self):
        return np.sqrt((self.phi_xy.values ** 2).sum(0))

    @property
    def stds(self):
        """Circular std sqrt(1 - I1(k)/I0(k)) of the projected-Normal
        posterior (`phases.py:219-234`)."""
        k = self.concentrations
        return np.sqrt(1.0 - ssp.i1e(k) / ssp.i0e(k))

    # -- persistence (reference CSV format) --------------------------------
    def save(self, pathname):
        self.phi_xy.to_csv(pathname)

    @classmethod
    def load(cls, filepath):
        return cls(pd.read_csv(filepath, index_col=0))

    @classmethod
    def from_file(cls, filepath):
        return cls.load(filepath)

    # -- constructors ------------------------------------------------------
    @classmethod
    def from_array(cls, phi_xy_array, cell_names=None):
        arr = np.asarray(phi_xy_array)
        assert arr.shape[0] == 2, "phi_xy array must be (2, Nc)"
        if cell_names is not None:
            assert len(cell_names) == arr.shape[1]
        return cls(
            pd.DataFrame(arr, index=["phi_x", "phi_y"], columns=cell_names)
        )

    @classmethod
    def from_angles(cls, angles, concentration=1.0, cell_names=None):
        """Phases at given angles with uniform concentration."""
        a = np.asarray(angles)
        return cls.from_array(
            np.stack([np.cos(a), np.sin(a)]) * concentration, cell_names
        )

    @classmethod
    def flat_prior(cls, adata):
        """Zero-concentration (uninformative) prior for every cell."""
        return cls(
            pd.DataFrame(
                np.zeros((2, adata.shape[0])),
                index=["phi_x", "phi_y"],
                columns=adata.obs.index,
            )
        )

    @classmethod
    def from_pca_heuristic(
        cls,
        adata,
        genes_to_use=None,
        concentration=1.0,
        layer="S_sz",
        small_count=1e-1,
        normalize_pcs=True,
        zero_at_min_density=False,
        random_state=0,
        n_components=2,
    ):
        """PCA initialisation: the angle of (PC1, PC2) of log counts,
        optionally percentile-normalized, optionally zeroed at the largest
        angular density gap (`phases.py:307-382`).  Host-side numpy."""
        from sklearn.decomposition import PCA

        if layer not in adata.layers:
            raise ValueError(f"layer={layer!r} not in adata.layers")
        if genes_to_use is None:
            mat = adata.layers[layer]
        else:
            mask = [g in set(genes_to_use) for g in adata.var.index]
            mat = adata[:, np.where(mask)[0]].layers[layer]
        mat = np.asarray(mat.todense()) if hasattr(mat, "todense") else (
            np.asarray(mat)
        )
        X = np.log(mat + small_count)  # (cells, genes)

        pca = PCA(n_components, random_state=random_state)
        pcs = pca.fit_transform(X)

        if normalize_pcs:
            pcts = np.percentile(pcs, [0.5, 99.5, 50], 0)
            pcs = (pcs - pcts[2, :]) / (pcts[1, :] - pcts[0, :])

        angle = np.mod(np.arctan2(pcs[:, 1], pcs[:, 0]), 2 * np.pi)
        if zero_at_min_density:
            order = np.argsort(angle)
            gap_start = order[np.diff(angle[order]).argmax() + 1]
            angle = np.mod(angle - angle[gap_start], 2 * np.pi)

        out = cls(
            pd.DataFrame(
                np.stack([np.cos(angle), np.sin(angle)]) * concentration,
                index=["phi_x", "phi_y"],
                columns=adata.obs.index,
            )
        )
        out.pcs = pcs
        out.pca = pca
        return out

    @classmethod
    def from_lda_heuristic(
        cls,
        adata,
        labels="phase",
        concentration=1.0,
        layer="S_sz",
        normalize=True,
        genes_to_use=None,
    ):
        """Supervised LDA initialisation: the large/noisy-data path of the
        Stereo-seq workflow (`/root/reference/tutorials/
        Stereo_seq_BrainRG.ipynb` cells 68-73).  Fits a
        LinearDiscriminantAnalysis of the count layer against categorical
        cell-cycle labels (e.g. Seurat G1/S/G2M scores), percentile-
        normalizes the two discriminant axes exactly like the notebook
        (0.5/99.5 percentiles around the median), and takes the angle.

        Args:
          labels: `adata.obs` column name, or an array of per-cell labels
            with >= 3 classes (LDA yields ``n_classes - 1 >= 2`` axes).
        """
        from sklearn.discriminant_analysis import LinearDiscriminantAnalysis

        if isinstance(labels, str):
            labels = np.asarray(adata.obs[labels])
        if layer not in adata.layers:
            raise ValueError(f"layer={layer!r} not in adata.layers")
        if genes_to_use is None:
            mat = adata.layers[layer]
        else:
            mask = [g in set(genes_to_use) for g in adata.var.index]
            mat = adata[:, np.where(mask)[0]].layers[layer]
        mat = np.asarray(mat.todense()) if hasattr(mat, "todense") else (
            np.asarray(mat)
        )

        clf = LinearDiscriminantAnalysis()
        X = clf.fit_transform(mat, labels)
        if X.shape[1] < 2:
            raise ValueError(
                f"LDA produced {X.shape[1]} axis; need >= 3 label classes"
            )
        X = X[:, :2]
        if normalize:
            pcts = np.percentile(X, [0.5, 99.5, 50], 0)
            X = (X - pcts[2, :]) / (pcts[1, :] - pcts[0, :])
        angle = np.mod(np.arctan2(X[:, 1], X[:, 0]), 2 * np.pi)

        out = cls(
            pd.DataFrame(
                np.stack([np.cos(angle), np.sin(angle)]) * concentration,
                index=["phi_x", "phi_y"],
                columns=adata.obs.index,
            )
        )
        out.pcs = X
        out.pca = clf
        return out

    def from_cycle_mle(
        self,
        cycle,
        data,
        a=1.0,
        bins=100,
        concentration=10.0,
        noisemodel="Poisson",
        dispersion=0.3,
    ):
        """Grid MLE of each cell's phase against a fixed Cycle
        (`phases.py:471-509`): evaluate ElogS on a ``bins``-point phase grid
        and take the per-cell argmax of the summed count log-likelihood.
        In place (matches the reference's mutating API)."""
        import jax.numpy as jnp

        from ..ops.fourier import fourier_basis
        from ..ops.likelihoods import nb_logpmf, poisson_logpmf

        coeffs = jnp.asarray(cycle.means_tensor)            # (Nh, Ng)
        n_harm = cycle.harmonics
        counts = data.obs["n_scounts"].values
        log_counts = jnp.log(jnp.asarray(counts, jnp.float32)) * a  # (Nc,)

        grid = jnp.arange(bins, dtype=jnp.float32) / bins * 2 * jnp.pi
        basis = fourier_basis(grid, n_harm)                  # (bins, Nh)
        elog_grid = basis @ coeffs                           # (bins, Ng)

        layer = data.layers["spliced"]
        dat = np.asarray(
            layer.todense() if hasattr(layer, "todense") else layer
        ).astype(np.float32)                                 # (Nc, Ng)
        k = jnp.asarray(dat)

        # ElogS[b, c, g] = elog_grid[b, g] + log_counts[c]
        elog = elog_grid[:, None, :] + log_counts[None, :, None]
        if noisemodel == "Poisson":
            lp = poisson_logpmf(k[None, :, :], elog)
        elif noisemodel == "NegativeBinomial":
            lp = nb_logpmf(k[None, :, :], elog, dispersion)
        else:
            raise NotImplementedError(f"{noisemodel=} not supported")
        total = lp.sum(-1)                                   # (bins, Nc)
        mle = grid[jnp.argmax(total, axis=0)]                # (Nc,)
        xy = np.stack([np.cos(mle), np.sin(mle)]) * concentration
        self.set_phixy(xy)

    # -- alignment operations ---------------------------------------------
    def shift_zero(self, phase=None):
        """Subtract ``phase`` from every cell's angle.  In place."""
        if phase is None:
            raise ValueError("specify phase= for the desired shift")
        self.rotate(-float(phase))

    def rotate(self, angle=None):
        """Rotate all phi_xy vectors by ``angle``.  In place."""
        if angle is None:
            raise ValueError("specify angle= for the desired rotation")
        c, s = np.cos(angle), np.sin(angle)
        rot = np.array([[c, -s], [s, c]])
        self.set_phixy(rot @ self.phi_xy.values)

    def invert_direction(self):
        """Mirror phases across the x axis.  In place."""
        v = self.phi_xy.values.copy()
        v[1, :] = -v[1, :]
        self.set_phixy(v)

    def max_corr(self, counts, npoints=100):
        """Grid-search the rotation maximizing the *linear* correlation of
        the (wrapped) phase with a per-cell covariate, e.g. UMI counts
        (`phases.py:450-469`).  Returns (best_shift, best_corr, corrs)."""
        shifts = np.arange(npoints) / npoints * 2 * np.pi
        phis = self.phis
        corrs = []
        for s in shifts:
            x = np.mod(phis - s, 2 * np.pi)
            corrs.append(np.corrcoef(x, counts)[0, 1])
        best = int(np.argmax(corrs))
        return shifts[best], corrs[best], corrs
