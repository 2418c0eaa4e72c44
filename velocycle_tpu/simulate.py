"""Ground-truth data simulation: the correctness fixture for the test suite.

Working replacement for the reference's `utils.simulate_data`
(`/root/reference/velocycle/utils.py:508-584`), which is broken as shipped
(missing imports, zeta_dphi unicode name mismatch — SURVEY.md §2.1).  Same
generative process, vectorized:

  (nu0, nu1_cos, nu1_sin, log_gamma, log_beta) ~ MVN(correlated)  per gene
  phi_c ~ Uniform(0, 2*pi)                                        per cell
  ElogS = nu . zeta(phi);  omega constant per dataset
  ElogU = -log_beta + log(relu(nu . zeta'(phi) * omega + gamma) + 1e-5)
          + ElogS
  shape_inv_g ~ Gamma(1, 2);  S,U ~ NB(exp(Elog*), shape_inv)

Host-side numpy by design: this is fixture code — it must not occupy the
accelerator (or, under a remote-TPU tunnel, pay per-dispatch latency) to
build test data.  NB sampling uses the exact Gamma-Poisson compound the
models assume.

Returns an `AnnDataLite` with spliced/unspliced layers and every ground
truth stored in obs/var/uns, so posterior-recovery tests can correlate
fitted vs simulated quantities (the strategy of the reference's only
quantitative harness, `tutorials/VeloCycle_2D/run_simulations.py:181-294`).
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from .anndata_lite import AnnDataLite

__all__ = ["simulate_data"]

# joint prior over (nu0, nu1_cos, nu1_sin, log_gamma, log_beta): the same
# means / correlation structure as the reference fixture (`utils.py:509-517`)
_MV_MEANS = np.array([0.4, 0.0, 0.0, 0.0, 2.0])
_CORR = np.array(
    [
        [1.00, 0.05, 0.05, 0.05, 0.30],
        [0.05, 1.00, 0.00, 0.00, 0.00],
        [0.05, 0.00, 1.00, 0.00, 0.00],
        [0.05, 0.00, 0.00, 1.00, 0.30],
        [0.30, 0.00, 0.00, 0.30, 1.00],
    ]
)
_STDS = np.array([1.2, 0.2, 0.2, 0.5, 1.0])


def _nb_sample(rng, mean, shape_inv):
    """Gamma-Poisson compound: Poisson(Gamma(1/r, rate=1/(r*mu))) — the NB
    parameterization the models use
    (`/root/reference/velocycle/phase_inference_model.py:393`)."""
    a = 1.0 / shape_inv
    lam = rng.gamma(shape=np.broadcast_to(a, mean.shape),
                    scale=shape_inv * mean)
    return rng.poisson(lam)


def simulate_data(Nc=5000, Ng=500, omegas_to_test=(0.4,), key=None,
                  seed=None, gamma_alpha=1.0, gamma_beta=2.0):
    """Simulate an NB count dataset with known phases/harmonics/kinetics.

    One block of ``Nc`` cells per omega in ``omegas_to_test`` (each block
    labelled in ``obs['batch']``), sharing the same genes and ground-truth
    gene parameters.  ``key`` (a jax PRNG key) or ``seed`` (int) selects
    the random stream.
    """
    if seed is None:
        seed = 0 if key is None else int(np.asarray(key)[-1])
    rng = np.random.default_rng(seed)

    cov = np.diag(_STDS) @ _CORR @ np.diag(_STDS)
    pars = rng.multivariate_normal(_MV_MEANS, cov, size=Ng)  # (Ng, 5)
    nu = pars[:, :3]                              # (Ng, 3): H=1 harmonics
    log_gamma = pars[:, 3]
    log_beta = pars[:, 4]
    shape_inv = rng.gamma(gamma_alpha, 1.0 / gamma_beta, size=Ng)

    phis = rng.uniform(0.0, 2.0 * np.pi, Nc)
    zeta = np.stack([np.ones(Nc), np.cos(phis), np.sin(phis)], -1)
    zeta_dphi = np.stack([np.zeros(Nc), -np.sin(phis), np.cos(phis)], -1)

    ElogS = nu @ zeta.T                           # (Ng, Nc)
    dEs = nu @ zeta_dphi.T

    S_blocks, U_blocks, ElogU_blocks = [], [], []
    r = shape_inv[:, None]
    for omega in omegas_to_test:
        ElogU = (
            -log_beta[:, None]
            + np.log(
                np.maximum(dEs * omega + np.exp(log_gamma)[:, None], 0.0)
                + 1e-5
            )
            + ElogS
        )
        S_blocks.append(_nb_sample(rng, np.exp(ElogS), r))
        U_blocks.append(_nb_sample(rng, np.exp(ElogU), r))
        ElogU_blocks.append(ElogU)

    n_blocks = len(omegas_to_test)
    S_all = np.hstack(S_blocks)                   # (Ng, Nc * n_blocks)
    U_all = np.hstack(U_blocks)
    gene_names = [f"G{i:05d}" for i in range(Ng)]
    batch = np.concatenate(
        [np.repeat(str(w), Nc) for w in omegas_to_test]
    )
    cell_names = [
        f"Velo{str(w).replace('.', '')}:C{i:05d}"
        for w in omegas_to_test
        for i in range(Nc)
    ]

    obs = pd.DataFrame(
        {
            "batch": batch,
            "simulated_phis": np.tile(phis, n_blocks),
            "simulated_omega": np.concatenate(
                [np.repeat(float(w), Nc) for w in omegas_to_test]
            ),
        },
        index=cell_names,
    )
    var = pd.DataFrame(
        {
            "simulated_shape_inv": shape_inv,
            "simulated_gammas": log_gamma,
            "simulated_betas": log_beta,
        },
        index=gene_names,
    )
    adata = AnnDataLite(
        X=S_all.T,
        obs=obs,
        var=var,
        layers={
            "spliced": S_all.T,
            "unspliced": U_all.T,
            "simulated_ElogS": np.tile(ElogS, n_blocks).T,
            "simulated_ElogU": np.hstack(ElogU_blocks).T,
        },
        uns={
            "simulated_nu": nu,
            "simulated_zeta": zeta,
            "simulated_zeta_dphi": zeta_dphi,
        },
    )
    return adata
