"""2-D benchmark driver: simulate -> two-stage fit -> ground-truth
correlations.

Parity with `tutorials/VeloCycle_2D/run_simulations.py:19-294` — the
reference's only quantitative accuracy harness.  Stage 1 fits the spliced
spline field (Velo2D_S + AutoNormal), freezes ``w_s``/``ElogS``, stage 2
fits kinetics + the velocity field (Velo2D_U + AutoNormal); results are
correlated against the simulator's ground truth across seeds.
"""
from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

from ..infer import SVI, Trace_ELBO, adam
from ..infer.autoguide import AutoNormal
from .models import Velo2DData, velo2d_s_model, velo2d_u_model
from .simulate import generate_adata, make_designs

__all__ = [
    "prepare_data", "train_velo2d", "evaluate_fit", "run_simulations",
]


def prepare_data(adata):
    """Build the device pytree from a simulated (or real) 2-D AnnData."""
    phi = np.stack([adata.obs["cell_x"].values, adata.obs["cell_y"].values])
    lo, hi = adata.uns["phi_lower"], adata.uns["phi_upper"]
    design_s, design_dx, design_dy, design_omega = make_designs(phi, lo, hi)
    S = np.asarray(adata.layers["spliced"]).T.astype(np.float32)
    U = np.asarray(adata.layers["unspliced"]).T.astype(np.float32)
    Ng, Nc = S.shape
    return Velo2DData(
        design_s=design_s.astype(np.float32),
        design_dx=design_dx.astype(np.float32),
        design_dy=design_dy.astype(np.float32),
        design_omega=design_omega.astype(np.float32),
        S=S,
        U=U,
        w_s=np.zeros((Ng, design_s.shape[0]), np.float32),
        ElogS=np.zeros_like(S),
        Ng=Ng,
        Nc=Nc,
        n_coef_s=design_s.shape[0],
        n_coef_omega=design_omega.shape[0],
    )


def train_velo2d(pd: Velo2DData, n_steps_s=1000, n_steps_u=1000,
                 lr_s=1e-2, lr_u=1e-2, key=None):
    """Two-stage SVI (`run_simulations.py:19-53`).  Returns
    (results dict, losses_s, losses_u)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    k_s, k_u = jax.random.split(key)

    guide_s = AutoNormal(velo2d_s_model)
    svi_s = SVI(velo2d_s_model, guide_s, adam(lr_s), Trace_ELBO())
    state_s, losses_s = svi_s.run(k_s, n_steps_s, pd)
    params_s = svi_s.get_params(state_s)
    w_s = np.asarray(jax.device_get(params_s["AutoNormal.locs.w_s"]))
    ElogS = w_s @ np.asarray(pd.design_s)

    pd_u = pd.replace(w_s=jnp.asarray(w_s), ElogS=jnp.asarray(ElogS))
    guide_u = AutoNormal(velo2d_u_model)
    svi_u = SVI(velo2d_u_model, guide_u, adam(lr_u), Trace_ELBO())
    state_u, losses_u = svi_u.run(k_u, n_steps_u, pd_u)
    params_u = svi_u.get_params(state_u)

    med = guide_u.median(params_u)
    w_omega = np.asarray(jax.device_get(med["w_omega"]))
    omega = w_omega @ np.asarray(pd.design_omega)
    log_beta = np.asarray(jax.device_get(med["log_beta"]))
    log_gamma = np.asarray(jax.device_get(med["log_gamma"]))
    dEs_dx = w_s @ np.asarray(pd.design_dx)
    dEs_dy = w_s @ np.asarray(pd.design_dy)
    ElogU = (
        -log_beta[:, None]
        + ElogS
        + np.log(np.maximum(
            dEs_dx * omega[0] + dEs_dy * omega[1]
            + np.exp(log_gamma)[:, None], 0.0,
        ) + 1e-5)
    )
    results = {
        "w_s": w_s, "ElogS": ElogS, "w_omega": w_omega, "omega": omega,
        "log_beta": log_beta, "log_gamma": log_gamma, "ElogU": ElogU,
    }
    return results, losses_s, losses_u


def evaluate_fit(adata, results):
    """Correlations vs simulated ground truth — the metrics of
    `run_simulations.py:253-294`."""
    true_omega = np.stack(
        [adata.obs["omega_x"].values, adata.obs["omega_y"].values]
    )
    out = {
        "omega_x": np.corrcoef(true_omega[0], results["omega"][0])[0, 1],
        "omega_y": np.corrcoef(true_omega[1], results["omega"][1])[0, 1],
        "ElogS": np.corrcoef(
            np.asarray(adata.layers["ElogS"]).T.ravel(),
            results["ElogS"].ravel(),
        )[0, 1],
        "ElogU": np.corrcoef(
            np.asarray(adata.layers["ElogU"]).T.ravel(),
            results["ElogU"].ravel(),
        )[0, 1],
        "log_beta": np.corrcoef(
            adata.var["log_beta"].values, results["log_beta"]
        )[0, 1],
        "log_gamma": np.corrcoef(
            adata.var["log_gamma"].values, results["log_gamma"]
        )[0, 1],
        "gamma_beta_ratio": np.corrcoef(
            np.exp(adata.var["log_gamma"].values
                   - adata.var["log_beta"].values),
            np.exp(results["log_gamma"] - results["log_beta"]),
        )[0, 1],
    }
    return {k: float(v) for k, v in out.items()}


def run_simulations(n_seeds=10, n_cells=1000, n_genes=200,
                    n_steps_s=1000, n_steps_u=1000, out_path=None):
    """Multi-seed closed loop: simulate -> fit -> correlate
    (`run_simulations.py:181-294`).  Writes JSON if ``out_path`` given."""
    all_corrs = {}
    for seed in range(n_seeds):
        adata = generate_adata(n_cells=n_cells, n_genes=n_genes, seed=seed)
        pd = prepare_data(adata)
        results, _, _ = train_velo2d(
            pd, n_steps_s=n_steps_s, n_steps_u=n_steps_u,
            key=jax.random.PRNGKey(seed),
        )
        corrs = evaluate_fit(adata, results)
        for k, v in corrs.items():
            all_corrs.setdefault(k, []).append(v)
    if out_path is not None:
        with open(out_path, "w") as f:
            json.dump(all_corrs, f, indent=2)
    return all_corrs
