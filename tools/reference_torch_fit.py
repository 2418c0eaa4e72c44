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

Usage:  python tools/reference_torch_fit.py        # writes the artifact
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from golden_vs_reference import (  # noqa: E402
    ARTIFACT, HARMONICS, NC, NG, NUM_STEPS, SEED, make_dataset, _priors,
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


def main():
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


if __name__ == "__main__":
    main()
