"""Preprocessing: AnnData + prior containers -> device-ready metaparameters.

Functional parity with `/root/reference/velocycle/preprocessing.py:20-323`,
re-designed for the TPU data path:

  * All host work (sparse densification, design matrices, size factors) is
    numpy; the result is a single `PhaseData`/`VelocityData` flax.struct
    pytree whose array leaves are clean 2-D layouts — ``S, U: (Ng, Nc)``,
    ``nu priors: (Ng, Nh)``, ``phi_xy: (Nc, 2)``, designs ``(Nb|Nx, Nc)`` —
    instead of the reference's plate-broadcast singleton shapes
    (``(Nb,1,1,1,Nc)``, `preprocessing.py:277`).
  * One host->device transfer happens when jit consumes the pytree; nothing
    in the training step touches the host again.
  * The broken ``gene_selection_model="gmm"`` dispatch in the reference
    (NameError, `preprocessing.py:162-166`) is deliberately not reproduced;
    supported selectors are "all" and "lba".
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from .containers import AngularSpeed, Cycle, Phases, reorder
from .models.metapars import Metapars, PhaseData, VelocityData

__all__ = [
    "filter_shared_genes",
    "make_design_matrix",
    "normalize_total",
    "preprocess_for_phase_estimation",
    "preprocess_for_velocity_estimation",
    "invert_direction",
    "shift_zero",
]

# Joint (Cycle, Phases) gauge transforms are reachable here for parity with
# the reference, whose preprocessing star-imports them from the model module
# (`/root/reference/velocycle/preprocessing.py:14-17`; used as
# `preprocessing.invert_direction(...)` in Stereo_seq_BrainRG.ipynb cell 75).
from .alignment import invert_direction, shift_zero  # noqa: E402,F401


def _dense(x):
    if hasattr(x, "todense"):
        from . import native

        return native.csr_to_dense(x)
    return np.asarray(x)


def filter_shared_genes(cycle, data, filter_type="intersection"):
    """Subset a Cycle and an AnnData to a common, sorted gene set
    (`preprocessing.py:20-63`).

    "intersection" keeps genes present in both; "union" keeps all AnnData
    genes, extending the Cycle with flat priors for genes it lacks (and
    requires every Cycle gene to exist in the AnnData).
    """
    cycle_genes = set(cycle.genes)
    data_genes = set(data.var.index)
    if filter_type == "intersection":
        keep = np.sort(np.array(list(cycle_genes & data_genes)))
        new_data = data[:, list(keep)].copy()
        new_cycle = Cycle.from_array(
            means_array=cycle.means[keep].values,
            stds_array=cycle.stds[keep].values,
            gene_names=list(keep),
        )
    elif filter_type == "union":
        missing = cycle_genes - data_genes
        if missing:
            raise ValueError(
                f"Cycle genes not present in the AnnData: {sorted(missing)[:5]}"
            )
        keep = np.sort(np.array(list(cycle_genes | data_genes)))
        new_data = data[:, list(keep)].copy()
        new_cycle = cycle.copy()
        new_cycle.extend(names=sorted(data_genes - cycle_genes))
        new_cycle = reorder(new_cycle, list(keep))
    else:
        raise ValueError(f"invalid filter_type {filter_type!r}")
    return new_cycle, new_data


def make_design_matrix(adata, ids="batch"):
    """One-hot design matrix (Nc, Nk) from a categorical obs column
    (`preprocessing.py:65-93`).  Column order = order of first appearance."""
    if ids not in adata.obs.columns:
        raise ValueError(f"{ids!r} is not a column of adata.obs")
    values = np.asarray(adata.obs[ids])
    _, first_idx = np.unique(values, return_index=True)
    categories = values[np.sort(first_idx)]
    return (values[:, None] == categories[None, :]).astype(np.int64)


def normalize_total(adata):
    """Add size-normalized layers ``S_sz``/``U_sz`` and per-cell totals
    ``n_scounts``/``n_ucounts`` (`preprocessing.py:95-101`).  In place."""
    S = _dense(adata.layers["spliced"])
    U = _dense(adata.layers["unspliced"])
    adata.obs["n_scounts"] = S.sum(1)
    adata.obs["n_ucounts"] = U.sum(1)
    adata.layers["S_sz"] = S * (
        adata.obs["n_scounts"].mean() / adata.obs["n_scounts"].values
    )[:, None]
    adata.layers["U_sz"] = U * (
        adata.obs["n_ucounts"].mean() / adata.obs["n_ucounts"].values
    )[:, None]


def _basis_config(basis_kind, cycle_obj, phase_obj, n_harmonics,
                  spline_degree, spline_domain):
    """Static basis fields + phi prior for PhaseData/VelocityData.

    Validates that the Cycle prior's coefficient count matches the basis:
    ``2*n_harmonics + 1`` (fourier) or ``spline_n_basis + 1`` (spline, with
    ``spline_n_basis`` inferred from the prior).
    """
    n_coeffs = cycle_obj.means_array.shape[1]
    if basis_kind == "fourier":
        if n_coeffs != 2 * n_harmonics + 1:
            raise ValueError(
                f"Cycle prior has {n_coeffs} coefficient rows but "
                f"n_harmonics={n_harmonics} needs {2 * n_harmonics + 1}"
            )
        return {"basis_kind": "fourier"}
    if basis_kind != "spline":
        raise ValueError(
            f"{basis_kind=} is not valid; use 'fourier' or 'spline'"
        )
    spline_n_basis = n_coeffs - 1
    if spline_n_basis <= spline_degree:
        raise ValueError(
            f"spline basis needs > degree+2 = {spline_degree + 2} Cycle "
            f"coefficient rows (constant + n_basis), got {n_coeffs}"
        )
    phis = np.asarray(phase_obj.phis, np.float32).reshape(-1)
    if spline_domain is None:
        spline_domain = (float(phis.min()), float(phis.max()))
    lo, hi = float(spline_domain[0]), float(spline_domain[1])
    if not hi > lo:
        raise ValueError(f"empty spline domain {spline_domain}")
    return {
        "basis_kind": "spline",
        "spline_n_basis": spline_n_basis,
        "spline_degree": int(spline_degree),
        "spline_domain": (lo, hi),
        "phi_prior": phis,
    }


def _extract_counts(adata, normalize):
    """(S, U) as dense (Nc, Ng) float arrays."""
    if normalize:
        if "S_sz" not in adata.layers or "U_sz" not in adata.layers:
            normalize_total(adata)
        return (
            np.asarray(adata.layers["S_sz"], dtype=np.float32),
            np.asarray(adata.layers["U_sz"], dtype=np.float32),
        )
    return (
        _dense(adata.layers["spliced"]).astype(np.float32),
        _dense(adata.layers["unspliced"]).astype(np.float32),
    )


def _compact_counts(use_fused_nb, *counts):
    """Store integer-valued count matrices as int16 for the fused-kernel
    path: the (Ng, Nc) count stream is the kernels' dominant HBM read at
    scale, and 16-bit storage halves it (the kernels upcast per tile in
    VMEM; `ops/nb_kernels.py`).  Falls back to float32 when values are
    fractional (normalized layers) or exceed int16 range."""
    out = []
    for K in counts:
        if (
            use_fused_nb
            and np.all(K == np.floor(K))
            and K.min() >= 0
            and K.max() < np.iinfo(np.int16).max
        ):
            out.append(K.astype(np.int16))
        else:
            out.append(K)
    return out if len(out) > 1 else out[0]


def _lgamma_k_sum(use_fused_nb, *counts):
    """Dataset constant ``sum(lgamma(K+1))`` over the count matrices: lets
    the fused NB kernel skip one full-tile lgamma per step (the constant
    re-enters the log-likelihood outside the kernel)."""
    if not use_fused_nb:
        return None
    from scipy.special import gammaln

    total = 0.0
    for K in counts:
        total += float(gammaln(np.asarray(K, np.float64) + 1.0).sum())
    return np.float32(total)


def preprocess_for_phase_estimation(
    adata,
    cycle_obj: Cycle,
    phase_obj: Phases,
    design_mtx=None,
    n_harmonics: int = 2,
    gene_selection_model: str = "all",
    normalize: bool = False,
    noisemodel: str = "NegativeBinomial",
    with_delta_nu: bool = True,
    condition_on=None,
    mu_dnu: float = 0.0,
    sd_dnu=0.5,
    gamma_alpha: float = 1.0,
    gamma_beta: float = 2.0,
    beta0: float = 0.10,
    beta1: float = 0.90,
    basis_kind: str = "fourier",
    phi_parametrization: str = "xy",
    spline_degree: int = 3,
    spline_domain=None,
    use_fused_nb: bool = False,
):
    """Assemble `Metapars` for manifold-learning
    (`preprocessing.py:103-205`).

    Returns a `Metapars` whose ``.data`` is a `PhaseData` pytree; model and
    guide callables are chosen by ``gene_selection_model`` ("all" or "lba").

    ``basis_kind="spline"`` switches the S^1 Fourier model to a B-spline
    basis on an interval (the 1D-pancreas workflow the reference only
    demonstrates in `tutorials/1D_Pancreas_Analysis.ipynb`): the Cycle prior
    must then carry ``n_basis + 1`` coefficient rows (leading constant), the
    latent coordinate is ``phi ~ Uniform(spline_domain)`` initialized from
    ``phase_obj`` angles, and workflows with a known pseudotime condition
    the ``phi`` site.
    """
    from .models import (
        phase_guide, phase_guide_lba, phase_model, phase_model_lba,
    )

    S, U = _extract_counts(adata, normalize)
    s_umi = _dense(adata.layers["spliced"]).sum(1).astype(np.float32)
    count_factor = np.log(s_umi / s_umi.mean())

    adata.layers["logS"] = np.log(S + 1 + 1e-16)
    adata.layers["logU"] = np.log(U + 1 + 1e-16)

    if design_mtx is None:
        design_mtx = np.ones((adata.shape[0], 1), dtype=np.int64)
    design_mtx = np.asarray(design_mtx)

    if gene_selection_model == "all":
        model_fn, guide_fn = phase_model, phase_guide
    elif gene_selection_model == "lba":
        model_fn, guide_fn = phase_model_lba, phase_guide_lba
    else:
        raise ValueError(
            f"{gene_selection_model=} is not a valid model; use 'all'|'lba'"
        )

    Ng, Nc, Nb = len(cycle_obj), len(phase_obj), design_mtx.shape[-1]
    sd_dnu_arr = np.broadcast_to(
        np.asarray(sd_dnu, np.float32), (Nb,)
    ).reshape(Nb, 1)
    basis_cfg = _basis_config(
        basis_kind, cycle_obj, phase_obj, n_harmonics,
        spline_degree, spline_domain,
    )
    data = PhaseData(
        S=_compact_counts(use_fused_nb, S.T),
        logS=np.asarray(adata.layers["logS"], np.float32).T,
        count_factor=count_factor,
        mu_nu=cycle_obj.means_array,
        sd_nu=cycle_obj.stds_array,
        phixy_prior=phase_obj.phi_xy_array,
        Db=design_mtx.T.astype(np.float32),
        mu_dnu=np.float32(mu_dnu),
        sd_dnu=sd_dnu_arr,
        gamma_alpha=np.float32(gamma_alpha),
        gamma_beta=np.float32(gamma_beta),
        sigma_gc=np.float32(0.5),
        beta0=np.float32(beta0),
        beta1=np.float32(beta1),
        Ng=Ng,
        Nc=Nc,
        Nb=Nb,
        num_harmonics_S=n_harmonics,
        noisemodel=noisemodel,
        with_delta_nu=with_delta_nu,
        gene_selection_model=gene_selection_model,
        phi_parametrization=phi_parametrization,
        use_fused_nb=use_fused_nb,
        lgamma_k_sum=_lgamma_k_sum(use_fused_nb, S),
        **basis_cfg,
    )
    return Metapars(
        data=data,
        model_fn=model_fn,
        guide_fn=guide_fn,
        cycle_prior=cycle_obj,
        phase_prior=phase_obj,
        condition=list((condition_on or {}).keys()),
        extras={"condition_on": dict(condition_on or {})},
    )


def preprocess_for_velocity_estimation(
    adata,
    cycle_obj: Cycle,
    phase_obj: Phases,
    speed_obj: AngularSpeed,
    condition_design_mtx=None,
    batch_design_mtx=None,
    n_harmonics: int = 2,
    omega_n_harmonics: int | None = None,
    normalize: bool = False,
    behavior: str = "intersection",
    noisemodel: str = "NegativeBinomial",
    with_delta_nu: bool = True,
    condition_on=None,
    count_factor=0.0,
    mu_gamma: float = 0.0,
    sd_gamma: float = 0.5,
    mu_beta: float = 2.0,
    sd_beta: float = 3.0,
    mu_dnu: float = 0.0,
    sd_dnu=0.1,
    gamma_alpha: float = 1.0,
    gamma_beta: float = 2.0,
    model_type: str = "lrmn",
    rho_mean: float = 4.0,
    rho_std: float = 1.0,
    rho_scale: float = 1.0,
    rho_rank: int = 5,
    basis_kind: str = "fourier",
    phi_parametrization: str = "xy",
    spline_degree: int = 3,
    spline_domain=None,
    use_fused_nb: bool = False,
):
    """Assemble `Metapars` for velocity-learning
    (`preprocessing.py:207-323`).  Gene filtering against the Cycle happens
    here (`preprocessing.py:241`); ``model_type`` selects the mean-field or
    LRMN guide.

    ``basis_kind="spline"`` generalizes to a bounded 1-D manifold: the
    AngularSpeed prior's coefficient count becomes the speed-spline size
    (1 row = constant speed, the pancreas notebook's scalar omega).
    """
    from .models import velocity_guide, velocity_guide_lrmn, velocity_model

    if omega_n_harmonics is None:
        omega_n_harmonics = speed_obj.harmonics
    if basis_kind == "fourier" and speed_obj.harmonics != omega_n_harmonics:
        raise ValueError(
            f"speed prior has {speed_obj.harmonics} harmonics but "
            f"omega_n_harmonics={omega_n_harmonics}"
        )
    cycle_obj, adata = filter_shared_genes(
        cycle_obj, adata, filter_type=behavior
    )
    S, U = _extract_counts(adata, normalize)
    adata.layers["logS"] = np.log(S + 1 + 1e-16)
    adata.layers["logU"] = np.log(U + 1 + 1e-16)

    Nc = len(phase_obj)
    if condition_design_mtx is None:
        condition_design_mtx = np.ones((Nc, 1), dtype=np.int64)
    if batch_design_mtx is None:
        batch_design_mtx = np.ones((Nc, 1), dtype=np.int64)
    condition_design_mtx = np.asarray(condition_design_mtx)
    batch_design_mtx = np.asarray(batch_design_mtx)

    if model_type == "lrmn":
        guide_fn = velocity_guide_lrmn
    elif model_type in ("fourier", "meanfield", "all"):
        guide_fn = velocity_guide
    else:
        raise ValueError(
            f"{model_type=} is not valid; use 'lrmn' or 'fourier'"
        )
    model_fn = velocity_model

    Ng = len(cycle_obj)
    Nb = batch_design_mtx.shape[-1]
    Nx = condition_design_mtx.shape[-1]
    basis_cfg = _basis_config(
        basis_kind, cycle_obj, phase_obj, n_harmonics,
        spline_degree, spline_domain,
    )
    if basis_kind == "fourier":
        Nhw = 2 * omega_n_harmonics + 1
    else:
        # spline: the speed prior's coefficient count IS the omega basis
        # size (1 = constant speed; else constant + (Nhw-1)-fn spline)
        Nhw = speed_obj.means_array.shape[1]
        if Nhw != 1 and Nhw - 1 <= spline_degree:
            raise ValueError(
                f"speed spline needs 1 or > degree+2 coefficient rows, "
                f"got {Nhw} (degree {spline_degree})"
            )
    sd_dnu_arr = np.broadcast_to(
        np.asarray(sd_dnu, np.float32), (Nb,)
    ).reshape(Nb, 1)

    data = VelocityData(
        S=_compact_counts(use_fused_nb, S.T),
        U=_compact_counts(use_fused_nb, U.T),
        logS=np.asarray(adata.layers["logS"], np.float32).T,
        logU=np.asarray(adata.layers["logU"], np.float32).T,
        count_factor=np.broadcast_to(
            np.asarray(count_factor, np.float32), (Nc,)
        ).copy(),
        mu_nu=cycle_obj.means_array,
        sd_nu=cycle_obj.stds_array,
        phixy_prior=phase_obj.phi_xy_array,
        D=condition_design_mtx.T.astype(np.float32),
        Db=batch_design_mtx.T.astype(np.float32),
        mu_dnu=np.float32(mu_dnu),
        sd_dnu=sd_dnu_arr,
        mu_gamma=np.full((Ng,), mu_gamma, np.float32),
        sd_gamma=np.full((Ng,), sd_gamma, np.float32),
        mu_beta=np.full((Ng,), mu_beta, np.float32),
        sd_beta=np.full((Ng,), sd_beta, np.float32),
        mu_nuomega=speed_obj.means_array,  # (Nx, Nhw)
        sd_nuomega=speed_obj.stds_array,
        gamma_alpha=np.float32(gamma_alpha),
        gamma_beta=np.float32(gamma_beta),
        sigma_s_gc=np.float32(0.1),
        sigma_u_gc=np.float32(0.1),
        rho_mean=np.float32(rho_mean),
        rho_std=np.float32(rho_std),
        rho_scale=np.float32(rho_scale),
        Ng=Ng,
        Nc=Nc,
        Nb=Nb,
        Nx=Nx,
        Nhw=Nhw,
        num_harmonics_S=n_harmonics,
        omega_harmonics=omega_n_harmonics,
        noisemodel=noisemodel,
        with_delta_nu=with_delta_nu,
        model_type=model_type,
        rho_rank=rho_rank,
        phi_parametrization=phi_parametrization,
        use_fused_nb=use_fused_nb,
        lgamma_k_sum=_lgamma_k_sum(use_fused_nb, S, U),
        **basis_cfg,
    )
    return Metapars(
        data=data,
        model_fn=model_fn,
        guide_fn=guide_fn,
        cycle_prior=cycle_obj,
        phase_prior=phase_obj,
        speed_prior=speed_obj,
        condition=list((condition_on or {}).keys()),
        extras={"condition_on": dict(condition_on or {}), "adata": adata},
    )
