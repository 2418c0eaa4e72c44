"""Pyro-free reference fit: the reference's phase model + mean-field guide
in raw ``torch.distributions``, for producing the golden artifact on a rig
with torch but no pyro.

Site-for-site replication of the reference model
(`/root/reference/velocycle/phase_inference_model.py:343-395`) and guide
(`phase_inference_guide.py:10-56`):

  model:  nu        ~ Normal(mu_nu, sd_nu)          (Ng, Nh)
          phi_xy    ~ Normal(phixy_prior, 1)        (Nc, 2)
          shape_inv ~ Gamma(alpha, beta)            (Ng,)
          S | .     ~ GammaPoisson(1/r, 1/(r*mu)),  mu = exp(nu zeta^T + cf)
  guide:  nu        ~ Normal(nu_locs, nu_scales)    [learned]
          phi_xy    ~ Normal(phixy_locs, 1)         [learned locs, fixed sd]
          shape_inv ~ Delta(shape_inv_locs)         [log q = 0]

Optimizer: pyro ``ClippedAdam`` semantics — elementwise gradient clamp to
[-clip_norm, clip_norm], Adam(betas), and per-step multiplicative lr decay
``lrd`` (`Tutorial_*_OneSample.ipynb` cell 27).

Everything runs in float64, so the artifact is a numerically clean
independent-runtime reference: torch autograd + torch.distributions
(GammaPoisson log-pmf written out — five lines of lgamma) against JAX +
the hand-built effect-handler stack.  Both halves consume the SAME
`velocycle_tpu.preprocess_for_phase_estimation` data arrays, so the
comparison isolates the layers rebuilt from scratch (distributions, ELBO,
optimizer, posterior extraction); preprocessing parity has its own tests.

The velocity stage (`fit_torch_velocity`) does the same for the
velocity model + mean-field guide
(`/root/reference/velocycle/velocity_inference_model.py:304-388`,
`velocity_inference_guide.py:9-63`), conditioned on the phase-stage
artifact exactly as the tutorials condition stage 2 on stage-1 point
estimates (tutorial cell 39): free sites log_gamma, log_beta, nu_omega.

Usage:  python tools/reference_torch_fit.py [phase|velocity|both]
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from golden_vs_reference import (  # noqa: E402
    ARTIFACT, HARMONICS, NC, NG, NUM_STEPS, OMEGA_HARMONICS,
    SEED, VELOCITY_ARTIFACT, VELO_NUM_STEPS, make_dataset,
    make_velocity_metapars, _priors,
)


def build_shared_data():
    """The PhaseData arrays both halves fit (as float64 numpy)."""
    from velocycle_tpu import Cycle, Phases, preprocess_for_phase_estimation

    adata = make_dataset()
    nu_means, nu_stds, phi_init = _priors(adata)
    cycle = Cycle.from_array(nu_means, nu_stds, list(adata.var.index))
    phases = Phases.from_angles(phi_init, concentration=2.0,
                                cell_names=list(adata.obs.index))
    mp = preprocess_for_phase_estimation(
        adata, cycle, phases, n_harmonics=HARMONICS, with_delta_nu=False,
    )
    d = mp.data
    f = lambda x: np.asarray(x, np.float64)
    return {
        "S": f(d.S), "count_factor": f(d.count_factor),
        "mu_nu": f(d.mu_nu), "sd_nu": f(d.sd_nu),
        "phixy_prior": f(d.phixy_prior),
        "gamma_alpha": float(d.gamma_alpha), "gamma_beta": float(d.gamma_beta),
    }


def fit_torch(data, num_steps=NUM_STEPS, lr=0.05, betas=(0.80, 0.99),
              lrd=None, clip=10.0, seed=0):
    import torch
    import torch.distributions as td

    if lrd is None:
        lrd = 0.1 ** (1.0 / num_steps)
    torch.manual_seed(seed)
    dt = torch.float64
    S = torch.as_tensor(data["S"], dtype=dt)
    cf = torch.as_tensor(data["count_factor"], dtype=dt)
    mu_nu = torch.as_tensor(data["mu_nu"], dtype=dt)
    sd_nu = torch.as_tensor(data["sd_nu"], dtype=dt)
    pxy0 = torch.as_tensor(data["phixy_prior"], dtype=dt)
    alpha = torch.as_tensor(data["gamma_alpha"], dtype=dt)
    beta = torch.as_tensor(data["gamma_beta"], dtype=dt)
    Ng, Nh = mu_nu.shape

    # variational parameters (positive ones via softplus, like the repo)
    nu_locs = mu_nu.clone().requires_grad_(True)
    nu_scales_u = torch.log(torch.expm1(sd_nu)).requires_grad_(True)
    pxy_locs = pxy0.clone().requires_grad_(True)
    si0 = torch.full((Ng,), float(alpha / beta), dtype=dt)
    shape_inv_u = torch.log(torch.expm1(si0)).requires_grad_(True)
    params = [nu_locs, nu_scales_u, pxy_locs, shape_inv_u]

    opt = torch.optim.Adam(params, lr=lr, betas=betas)
    sched = torch.optim.lr_scheduler.MultiplicativeLR(
        opt, lr_lambda=lambda _: lrd
    )
    sp = torch.nn.functional.softplus
    lgamma = torch.lgamma

    def gamma_poisson_logpmf(k, a, b):
        """pyro GammaPoisson(concentration=a, rate=b) log-pmf (5 lines)."""
        return (
            lgamma(k + a) - lgamma(a) - lgamma(k + 1.0)
            + a * torch.log(b) - (a + k) * torch.log1p(b)
        )

    losses = []
    for step in range(num_steps):
        opt.zero_grad()
        nu_scales = sp(nu_scales_u)
        shape_inv = sp(shape_inv_u)

        # reparameterized single-sample ELBO (pyro Trace_ELBO semantics)
        q_nu = td.Normal(nu_locs, nu_scales)
        nu = q_nu.rsample()
        q_pxy = td.Normal(pxy_locs, torch.tensor(1.0, dtype=dt))
        pxy = q_pxy.rsample()
        log_q = q_nu.log_prob(nu).sum() + q_pxy.log_prob(pxy).sum()
        # Delta(shape_inv_locs): log q = 0 (pyro Delta convention)

        phi = torch.atan2(pxy[:, 1], pxy[:, 0])
        cols = [torch.ones_like(phi)]
        for h in range(1, HARMONICS + 1):
            cols += [torch.cos(h * phi), torch.sin(h * phi)]
        zeta = torch.stack(cols, dim=-1)                     # (Nc, Nh)

        elog = nu @ zeta.T + cf[None, :]                     # (Ng, Nc)
        a = 1.0 / shape_inv[:, None]
        b = 1.0 / (shape_inv[:, None] * torch.exp(elog))
        log_p = (
            td.Normal(mu_nu, sd_nu).log_prob(nu).sum()
            + td.Normal(pxy0, torch.tensor(1.0, dtype=dt)).log_prob(
                pxy).sum()
            + td.Gamma(alpha, beta).log_prob(shape_inv).sum()
            + gamma_poisson_logpmf(S, a, b).sum()
        )
        loss = -(log_p - log_q)
        loss.backward()
        for p in params:                     # ClippedAdam elementwise clamp
            p.grad.clamp_(-clip, clip)
        opt.step()
        sched.step()
        losses.append(float(loss))

    with torch.no_grad():
        return {
            "nu_mean": nu_locs.numpy(),
            "nu_sd": sp(nu_scales_u).numpy(),
            "phi_mean_angle": np.arctan2(
                pxy_locs[:, 1].numpy(), pxy_locs[:, 0].numpy()
            ),
            "shape_inv_mean": sp(shape_inv_u).numpy(),
            "losses": np.asarray(losses),
        }


def build_shared_velocity_data():
    """The VelocityData arrays + conditioning both halves fit (float64).

    Mirrors the reference's two-stage workflow: the velocity model
    (`/root/reference/velocycle/velocity_inference_model.py:304-388`) is
    conditioned on the phase-stage point estimates (nu, phi_xy, shape_inv
    — tutorial cell 39), leaving log_gamma / log_beta / nu_omega free with
    the mean-field guide (`velocity_inference_guide.py:9-63`).
    """
    mp, cond = make_velocity_metapars()
    d = mp.data
    f = lambda x: np.asarray(x, np.float64)
    return {
        "S": f(d.S), "U": f(d.U),
        "count_factor": np.broadcast_to(f(d.count_factor), (d.Nc,)),
        "mu_gamma": f(d.mu_gamma), "sd_gamma": f(d.sd_gamma),
        "mu_beta": f(d.mu_beta), "sd_beta": f(d.sd_beta),
        "mu_nuomega": f(d.mu_nuomega), "sd_nuomega": f(d.sd_nuomega),
        "nu": f(cond["nu"]), "phi_xy": f(cond["phi_xy"]),
        "shape_inv": f(cond["shape_inv"]),
    }


def fit_torch_velocity(data, num_steps=VELO_NUM_STEPS, lr=0.05,
                       betas=(0.80, 0.99), lrd=None, clip=10.0, seed=0):
    """Velocity model + mean-field guide, site-for-site in raw torch f64.

    Model (`velocity_inference_model.py:304-388`, conditioned sites as
    constants):
        log_gamma ~ Normal(mu_gamma, sd_gamma)     (Ng,)
        log_beta  ~ Normal(mu_beta, sd_beta)       (Ng,)
        nu_omega  ~ Normal(mu_nuomega, sd_nuomega) (Nx=1, Nhw)
        omega_c   = sum_h nu_omega[h] * zeta_w(phi_c)[h]
        ElogU     = -log_beta + log(relu((nu . zeta')(phi) * omega
                      + exp(log_gamma)) + 1e-5) + ElogS
        S, U | .  ~ GammaPoisson(1/r, 1/(r*exp(Elog*)))  [r conditioned]
    Guide (`velocity_inference_guide.py:9-63`): independent Normals with
    learned locs/scales for the three free sites.
    """
    import torch
    import torch.distributions as td

    if lrd is None:
        lrd = 0.1 ** (1.0 / num_steps)
    torch.manual_seed(seed)
    dt = torch.float64
    t = lambda x: torch.as_tensor(data[x], dtype=dt)
    S, U, cf = t("S"), t("U"), t("count_factor")
    mu_g, sd_g = t("mu_gamma"), t("sd_gamma")
    mu_b, sd_b = t("mu_beta"), t("sd_beta")
    mu_nw = t("mu_nuomega").reshape(-1)
    sd_nw = t("sd_nuomega").reshape(-1)
    nu, pxy, shape_inv = t("nu"), t("phi_xy"), t("shape_inv")

    # conditioned deterministic pipeline (constants w.r.t. free params)
    phi = torch.atan2(pxy[:, 1], pxy[:, 0])
    cols, dcols = [torch.ones_like(phi)], [torch.zeros_like(phi)]
    for h in range(1, HARMONICS + 1):
        cols += [torch.cos(h * phi), torch.sin(h * phi)]
        dcols += [-h * torch.sin(h * phi), h * torch.cos(h * phi)]
    zeta = torch.stack(cols, dim=-1)                     # (Nc, Nh)
    zeta_dphi = torch.stack(dcols, dim=-1)
    wcols = [torch.ones_like(phi)]
    for h in range(1, OMEGA_HARMONICS + 1):
        wcols += [torch.cos(h * phi), torch.sin(h * phi)]
    zeta_w = torch.stack(wcols, dim=-1)                  # (Nc, Nhw)
    ElogS = nu @ zeta.T + cf[None, :]                    # (Ng, Nc)
    dEs = nu @ zeta_dphi.T
    r = shape_inv[:, None]

    # variational parameters
    lg_locs = mu_g.clone().requires_grad_(True)
    lg_scales_u = torch.log(torch.expm1(sd_g)).requires_grad_(True)
    lb_locs = mu_b.clone().requires_grad_(True)
    lb_scales_u = torch.log(torch.expm1(sd_b)).requires_grad_(True)
    nw_locs = mu_nw.clone().requires_grad_(True)
    nw_scales_u = torch.log(torch.expm1(sd_nw)).requires_grad_(True)
    params = [lg_locs, lg_scales_u, lb_locs, lb_scales_u,
              nw_locs, nw_scales_u]

    opt = torch.optim.Adam(params, lr=lr, betas=betas)
    sched = torch.optim.lr_scheduler.MultiplicativeLR(
        opt, lr_lambda=lambda _: lrd
    )
    sp = torch.nn.functional.softplus
    lgamma = torch.lgamma

    def gamma_poisson_logpmf(k, a, b):
        return (
            lgamma(k + a) - lgamma(a) - lgamma(k + 1.0)
            + a * torch.log(b) - (a + k) * torch.log1p(b)
        )

    losses = []
    for step in range(num_steps):
        opt.zero_grad()
        q_lg = td.Normal(lg_locs, sp(lg_scales_u))
        q_lb = td.Normal(lb_locs, sp(lb_scales_u))
        q_nw = td.Normal(nw_locs, sp(nw_scales_u))
        log_gamma = q_lg.rsample()
        log_beta = q_lb.rsample()
        nuw = q_nw.rsample()
        log_q = (q_lg.log_prob(log_gamma).sum()
                 + q_lb.log_prob(log_beta).sum()
                 + q_nw.log_prob(nuw).sum())

        omega = zeta_w @ nuw                             # (Nc,)
        ElogU = (
            -log_beta[:, None]
            + torch.log(torch.relu(
                dEs * omega[None, :] + torch.exp(log_gamma)[:, None]
            ) + 1e-5)
            + ElogS
        )
        a = 1.0 / r
        log_p = (
            td.Normal(mu_g, sd_g).log_prob(log_gamma).sum()
            + td.Normal(mu_b, sd_b).log_prob(log_beta).sum()
            + td.Normal(mu_nw, sd_nw).log_prob(nuw).sum()
            + gamma_poisson_logpmf(S, a, 1.0 / (r * torch.exp(ElogS))).sum()
            + gamma_poisson_logpmf(U, a, 1.0 / (r * torch.exp(ElogU))).sum()
        )
        loss = -(log_p - log_q)
        loss.backward()
        for p in params:                     # ClippedAdam elementwise clamp
            p.grad.clamp_(-clip, clip)
        opt.step()
        sched.step()
        losses.append(float(loss))

    with torch.no_grad():
        return {
            "log_gamma_mean": lg_locs.numpy(),
            "log_gamma_sd": sp(lg_scales_u).numpy(),
            "log_beta_mean": lb_locs.numpy(),
            "log_beta_sd": sp(lb_scales_u).numpy(),
            "nu_omega_mean": nw_locs.numpy(),
            "nu_omega_sd": sp(nw_scales_u).numpy(),
            "losses": np.asarray(losses),
        }


def main_phase():
    data = build_shared_data()
    out = fit_torch(data)
    print(f"torch reference fit: loss {out['losses'][0]:.1f} -> "
          f"{out['losses'][-1]:.1f} over {NUM_STEPS} steps")
    np.savez(
        ARTIFACT,
        nu_mean=out["nu_mean"], nu_sd=out["nu_sd"],
        phi_mean_angle=out["phi_mean_angle"],
        shape_inv_mean=out["shape_inv_mean"],
        config=np.array([NC, NG, SEED, HARMONICS, NUM_STEPS]),
        producer=np.array("torch-f64-raw-distributions"),
    )
    print(f"wrote {ARTIFACT}")


def main_velocity():
    data = build_shared_velocity_data()
    out = fit_torch_velocity(data)
    print(f"torch velocity reference fit: loss {out['losses'][0]:.1f} -> "
          f"{out['losses'][-1]:.1f} over {VELO_NUM_STEPS} steps")
    np.savez(
        VELOCITY_ARTIFACT,
        log_gamma_mean=out["log_gamma_mean"],
        log_gamma_sd=out["log_gamma_sd"],
        log_beta_mean=out["log_beta_mean"],
        log_beta_sd=out["log_beta_sd"],
        nu_omega_mean=out["nu_omega_mean"],
        nu_omega_sd=out["nu_omega_sd"],
        config=np.array([NC, NG, SEED, HARMONICS, OMEGA_HARMONICS,
                         VELO_NUM_STEPS]),
        producer=np.array("torch-f64-raw-distributions"),
    )
    print(f"wrote {VELOCITY_ARTIFACT}")


def main(argv=()):
    stage = argv[1] if len(argv) > 1 else "both"
    if stage in ("phase", "both"):
        main_phase()
    if stage in ("velocity", "both"):
        main_velocity()


if __name__ == "__main__":
    main(sys.argv)
