"""2-D manifold velocity models.

Generalization of the S^1 Fourier model to an arbitrary 2-D latent manifold
with a spline velocity vector field — capability parity with
`tutorials/VeloCycle_2D/model_2d.py:7-110`:

  Velo2D_S:  w_s ~ Normal per gene over spline coefficients;
             ElogS = w_s @ design_s;  S ~ Poisson(exp(ElogS))
  Velo2D_U:  log_beta, log_gamma ~ Normal per gene;
             omega = w_omega @ design_omega  (2-component velocity field);
             ElogU = -log_beta + ElogS
                     + log(relu(dEs/dx * omega_x + dEs/dy * omega_y
                                + gamma) + 1e-5);
             U ~ Poisson(exp(ElogU))

TPU layouts: coefficients ``(Ng, n_coef)``, designs ``(n_coef, Nc)`` — the
hot ops are two MXU matmuls per model evaluation.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core import distributions as dist
from ..core.handlers import deterministic, plate, sample

__all__ = ["Velo2DData", "velo2d_s_model", "velo2d_u_model"]


@struct.dataclass
class Velo2DData:
    """Device-side designs/priors for the 2-D models (the jnp slice of the
    reference's params_dict, `run_simulations.py:113-178`)."""

    design_s: jnp.ndarray        # (n_coef_s, Nc) spline design (+const row)
    design_dx: jnp.ndarray       # (n_coef_s, Nc) d/dx design
    design_dy: jnp.ndarray       # (n_coef_s, Nc) d/dy design
    design_omega: jnp.ndarray    # (n_coef_w, Nc) velocity spline design
    S: jnp.ndarray               # (Ng, Nc)
    U: jnp.ndarray               # (Ng, Nc)
    w_s: jnp.ndarray             # (Ng, n_coef_s) frozen stage-1 weights
    ElogS: jnp.ndarray           # (Ng, Nc) frozen stage-1 expectation
    w_s_mean: jnp.ndarray = 0.0
    w_s_scale: jnp.ndarray = 1.0
    w_omega_mean: jnp.ndarray = 0.0
    w_omega_scale: jnp.ndarray = 1.0
    log_beta_mean: jnp.ndarray = 0.0
    log_beta_scale: jnp.ndarray = 1.0
    log_gamma_mean: jnp.ndarray = 0.0
    log_gamma_scale: jnp.ndarray = 1.0
    Ng: int = struct.field(pytree_node=False, default=0)
    Nc: int = struct.field(pytree_node=False, default=0)
    n_coef_s: int = struct.field(pytree_node=False, default=0)
    n_coef_omega: int = struct.field(pytree_node=False, default=0)


def velo2d_s_model(pd: Velo2DData):
    """Stage 1: learn the per-gene spline expression field."""
    with plate("genes", pd.Ng, dim=-2):
        w_s = sample(
            "w_s",
            dist.Normal(
                jnp.full((pd.Ng, pd.n_coef_s), pd.w_s_mean),
                jnp.full((pd.Ng, pd.n_coef_s), pd.w_s_scale),
            ).to_event(1),
        )  # (Ng, n_coef_s)
    ElogS = w_s @ pd.design_s  # (Ng, Nc)
    deterministic("ElogS", ElogS)
    with plate("cells", pd.Nc, dim=-1):
        sample("S", dist.Poisson(jnp.exp(ElogS)), obs=pd.S)


def velo2d_u_model(pd: Velo2DData):
    """Stage 2: learn kinetics + the 2-component velocity spline field,
    conditioned on the frozen stage-1 ``w_s``/``ElogS``."""
    with plate("genes", pd.Ng, dim=-2):
        log_beta = sample(
            "log_beta",
            dist.Normal(
                jnp.full((pd.Ng,), pd.log_beta_mean),
                jnp.full((pd.Ng,), pd.log_beta_scale),
            ),
        )
        log_gamma = sample(
            "log_gamma",
            dist.Normal(
                jnp.full((pd.Ng,), pd.log_gamma_mean),
                jnp.full((pd.Ng,), pd.log_gamma_scale),
            ),
        )
    gamma = jnp.exp(log_gamma)
    deterministic("gamma", gamma)

    w_omega = sample(
        "w_omega",
        dist.Normal(
            jnp.full((2, pd.n_coef_omega), pd.w_omega_mean),
            jnp.full((2, pd.n_coef_omega), pd.w_omega_scale),
        ).to_event(2),
    )  # (2, n_coef_omega)
    omega = w_omega @ pd.design_omega  # (2, Nc)
    deterministic("omega", omega)

    dEs_dx = pd.w_s @ pd.design_dx  # (Ng, Nc)
    dEs_dy = pd.w_s @ pd.design_dy
    ElogU = (
        -log_beta[:, None]
        + pd.ElogS
        + jnp.log(
            jnp.maximum(
                dEs_dx * omega[0][None, :]
                + dEs_dy * omega[1][None, :]
                + gamma[:, None],
                0.0,
            )
            + 1e-5
        )
    )
    deterministic("ElogU", ElogU)
    with plate("cells", pd.Nc, dim=-1):
        sample("U", dist.Poisson(jnp.exp(ElogU)), obs=pd.U)
