"""Manifold-learning (phase inference) model + guide family.

Generative model parity with the reference
(`/root/reference/velocycle/phase_inference_model.py:336-449`,
`phase_inference_guide.py:10-130`), rebuilt on clean 2-D tensor layouts:

  nu        ~ Normal(mu_nu, sd_nu)           per gene, (Ng, Nh) coeffs
  delta_nu  ~ Normal(mu_dnu, sd_dnu)         per batch x gene, (Nb, Ng)
  phi_xy    ~ Normal(phixy_prior, 1)         per cell, (Nc, 2)
  phi       = atan2(phi_xy)                  deterministic
  zeta      = fourier_basis(phi)             (Nc, Nh)
  ElogS     = nu @ zeta^T + Db-weighted delta_nu + count_factor   (Ng, Nc)
  S | ...   ~ NegativeBinomial / Poisson / Lognormal

The hot path — `nu (Ng,Nh) @ zeta^T (Nh,Nc)` — is an MXU matmul; the NB
log-prob + ELBO reduction fuses behind it (optionally via the Pallas kernel
in `ops.nb_kernels`).

The LBA variant replaces pyro's parallel enumeration with an analytic
per-gene mixture over the Bernoulli "periodic" indicator
(`phase_inference_model.py:390-447`): mathematically identical, static
shapes, no enumeration machinery.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import logsumexp

from ..core import handlers
from ..core import distributions as dist
from ..core import constraints
from ..core.handlers import sample, param, deterministic, plate
from ..ops.likelihoods import nb_logpmf
from .basis import expression_basis, guide_phi, sample_phi

__all__ = [
    "phase_model",
    "phase_guide",
    "phase_model_lba",
    "phase_guide_lba",
    "phase_model_lba_enum",
]


def _expected_log_s(nu, zeta, delta_nu, mp):
    """ElogS (Ng, Nc) = nu @ zeta^T [+ batch offsets] + count_factor."""
    ElogS = nu @ zeta.T
    if mp.with_delta_nu and delta_nu is not None:
        # (Nb, Ng) offsets routed to cells by the (Nb, Nc) one-hot design
        ElogS = ElogS + jnp.einsum("bg,bc->gc", delta_nu, mp.Db)
    return ElogS + mp.count_factor[None, :]


def _observe_spliced(mp, ElogS):
    if mp.noisemodel == "Lognormal":
        sample(
            "logS", dist.Normal(ElogS, mp.sigma_gc), obs=mp.logS
        )
        return None
    if mp.noisemodel == "Poisson":
        sample("S", dist.Poisson(jnp.exp(ElogS)), obs=mp.S)
        return None
    if mp.noisemodel == "NegativeBinomial":
        with plate("genes", mp.Ng, dim=-1):
            shape_inv = sample(
                "shape_inv",
                dist.Gamma(
                    jnp.broadcast_to(mp.gamma_alpha, (mp.Ng,)),
                    jnp.broadcast_to(mp.gamma_beta, (mp.Ng,)),
                ),
            )
        sample(
            "S",
            dist.NegativeBinomial(
                mean=jnp.exp(ElogS), dispersion=shape_inv[:, None]
            ),
            obs=mp.S,
        )
        return shape_inv
    raise ValueError(f"{mp.noisemodel} not allowed")


def phase_model(mp):
    """mp: a `PhaseData` container (models.metapars)."""
    with plate("genes", mp.Ng, dim=-2):
        nu = sample(
            "nu", dist.Normal(mp.mu_nu, mp.sd_nu).to_event(1)
        )  # (Ng, Nh)
        delta_nu = None
        if mp.with_delta_nu:
            with plate("batches", mp.Nb, dim=-3):
                delta_nu = sample(
                    "delta_nu",
                    dist.Normal(
                        jnp.zeros((mp.Nb, mp.Ng)), mp.sd_dnu
                    ),
                )
    phi = sample_phi(mp)
    zeta = expression_basis(mp, phi, der=0)  # (Nc, Nh)
    deterministic("zeta", zeta)

    if mp.use_fused_nb and mp.noisemodel == "NegativeBinomial":
        # Pallas fast path: matmul + NB log-pmf + reduction in one kernel,
        # no (Ng, Nc) ElogS intermediate in HBM (ops/nb_kernels.py).
        from ..ops.nb_kernels import nb_loglik_fused

        with plate("genes", mp.Ng, dim=-1):
            shape_inv = sample(
                "shape_inv",
                dist.Gamma(
                    jnp.broadcast_to(mp.gamma_alpha, (mp.Ng,)),
                    jnp.broadcast_to(mp.gamma_beta, (mp.Ng,)),
                ),
            )
        cf = jnp.broadcast_to(mp.count_factor, (mp.Nc,))
        handlers.factor(
            "S_fused",
            nb_loglik_fused(
                mp.S, nu, zeta, cf, shape_inv,
                delta_nu if mp.with_delta_nu else None,
                mp.Db if mp.with_delta_nu else None,
                lgamma_k_sum=mp.lgamma_k_sum,
                disp_grad=mp.disp_grad,
            ),
        )
        return

    ElogS = _expected_log_s(nu, zeta, delta_nu, mp)
    deterministic("ElogS", ElogS)
    _observe_spliced(mp, ElogS)


def phase_guide(mp):
    """Hand-written mean-field guide (parity with
    `phase_inference_guide.py:10-56`): Normal for nu with learnable scales,
    Delta for delta_nu and shape_inv, fixed-scale Normal for phi_xy."""
    nu_locs = param("nu_locs", mp.mu_nu)
    nu_scales = param("nu_scales", mp.sd_nu, constraint=constraints.positive)

    with plate("genes", mp.Ng, dim=-2):
        sample("nu", dist.Normal(nu_locs, nu_scales).to_event(1))
        if mp.noisemodel == "NegativeBinomial":
            shape_inv_locs = param(
                "shape_inv_locs",
                jnp.ones((mp.Ng,)) * mp.gamma_alpha / mp.gamma_beta,
                constraint=constraints.positive,
            )
            sample("shape_inv", dist.Delta(shape_inv_locs))
        if mp.with_delta_nu:
            dnu_locs = param(
                "delta_nu_locs", jnp.ones((mp.Nb, mp.Ng)) * mp.mu_dnu
            )
            with plate("batches", mp.Nb, dim=-3):
                sample("delta_nu", dist.Delta(dnu_locs))

    guide_phi(mp)


# ---------------------------------------------------------------------------
# LBA variant: per-gene Bernoulli "is this gene periodic?" indicator,
# marginalized analytically.
# ---------------------------------------------------------------------------

def _lba_branch_loglik(mp, ElogS, shape_inv):
    """Per-gene data log-likelihood (Ng,) for a given ElogS."""
    if mp.noisemodel == "NegativeBinomial":
        lp = nb_logpmf(mp.S, ElogS, shape_inv[:, None])
    elif mp.noisemodel == "Poisson":
        lp = dist.Poisson(jnp.exp(ElogS)).log_prob(mp.S)
    elif mp.noisemodel == "Lognormal":
        lp = dist.Normal(ElogS, mp.sigma_gc).log_prob(mp.logS)
    else:
        raise ValueError(f"{mp.noisemodel} not allowed")
    return lp.sum(axis=-1)


def phase_model_lba(mp):
    """LBA phase model: mixture over per-gene periodicity."""
    with plate("genes", mp.Ng, dim=-2):
        nu = sample("nu", dist.Normal(mp.mu_nu, mp.sd_nu).to_event(1))
        delta_nu = None
        if mp.with_delta_nu:
            with plate("batches", mp.Nb, dim=-3):
                delta_nu = sample(
                    "delta_nu",
                    dist.Normal(jnp.zeros((mp.Nb, mp.Ng)), mp.sd_dnu),
                )
        periodic_prob = sample(
            "periodic_prob",
            dist.Beta(
                jnp.broadcast_to(mp.beta0, (mp.Ng,)),
                jnp.broadcast_to(mp.beta1, (mp.Ng,)),
            ),
        )  # (Ng,)

    phi = sample_phi(mp)
    zeta = expression_basis(mp, phi, der=0)
    deterministic("zeta", zeta)

    # dispersion shared across both mixture branches
    if mp.noisemodel == "NegativeBinomial":
        with plate("genes", mp.Ng, dim=-1):
            shape_inv = sample(
                "shape_inv",
                dist.Gamma(
                    jnp.broadcast_to(mp.gamma_alpha, (mp.Ng,)),
                    jnp.broadcast_to(mp.gamma_beta, (mp.Ng,)),
                ),
            )
    else:
        shape_inv = None

    ElogS_full = _expected_log_s(nu, zeta, delta_nu, mp)
    # constant-only branch: just the nu0 column
    ElogS_flat = _expected_log_s(
        nu[:, :1],  # (Ng, 1): only the constant coefficient nu0
        jnp.ones((mp.Nc, 1), dtype=zeta.dtype),
        delta_nu,
        mp,
    )
    deterministic("ElogS", ElogS_full)

    p = jnp.broadcast_to(jnp.clip(periodic_prob, 1e-6, 1 - 1e-6), (mp.Ng,))
    ll_full = _lba_branch_loglik(mp, ElogS_full, shape_inv)   # (Ng,)
    ll_flat = _lba_branch_loglik(mp, ElogS_flat, shape_inv)   # (Ng,)
    joint = jnp.stack(
        [jnp.log1p(-p) + ll_flat, jnp.log(p) + ll_full], axis=0
    )  # (2, Ng)
    handlers.factor("S_mixture", logsumexp(joint, axis=0))
    # posterior membership, for parity with the reference's `periodic` site
    deterministic(
        "periodic", jnp.exp(joint[1] - logsumexp(joint, axis=0))
    )


def phase_model_lba_enum(mp):
    """LBA phase model written with an EXPLICIT enumerated Bernoulli site —
    the generic discrete-latent path, mirroring the reference's
    `@config_enumerate` model line for line
    (`phase_inference_model.py:397-456`: `periodic~Bernoulli` at `:425`,
    `torch.where` mixing at `:436-438`).

    Semantically identical to `phase_model_lba` (which marginalizes the
    same mixture by hand); fit it with `infer.TraceEnum_ELBO`, which sums
    the ``periodic`` indicator out exactly
    (`tests/test_enum.py` proves ELBO and gradient equality).  Use this
    form as the template for NEW discrete-latent models — no bespoke
    mixture algebra needed.
    """
    with plate("genes", mp.Ng, dim=-2):
        nu = sample("nu", dist.Normal(mp.mu_nu, mp.sd_nu).to_event(1))
        delta_nu = None
        if mp.with_delta_nu:
            with plate("batches", mp.Nb, dim=-3):
                delta_nu = sample(
                    "delta_nu",
                    dist.Normal(jnp.zeros((mp.Nb, mp.Ng)), mp.sd_dnu),
                )
        periodic_prob = sample(
            "periodic_prob",
            dist.Beta(
                jnp.broadcast_to(mp.beta0, (mp.Ng,)),
                jnp.broadcast_to(mp.beta1, (mp.Ng,)),
            ),
        )  # (Ng,)

    phi = sample_phi(mp)
    zeta = expression_basis(mp, phi, der=0)
    deterministic("zeta", zeta)

    if mp.noisemodel == "NegativeBinomial":
        with plate("genes", mp.Ng, dim=-1):
            shape_inv = sample(
                "shape_inv",
                dist.Gamma(
                    jnp.broadcast_to(mp.gamma_alpha, (mp.Ng,)),
                    jnp.broadcast_to(mp.gamma_beta, (mp.Ng,)),
                ),
            )
    else:
        shape_inv = None

    # per-gene indicator, enumerated in parallel by TraceEnum_ELBO
    p = jnp.clip(periodic_prob, 1e-6, 1 - 1e-6)[:, None]  # (Ng, 1)
    periodic = sample(
        "periodic", dist.Bernoulli(p), infer={"enumerate": "parallel"}
    )

    ElogS_full = _expected_log_s(nu, zeta, delta_nu, mp)
    ElogS_flat = _expected_log_s(
        nu[:, :1], jnp.ones((mp.Nc, 1), dtype=zeta.dtype), delta_nu, mp,
    )
    # reference `torch.where(periodic, full, const)`; under enumeration
    # `periodic` carries a leading (2,) axis and everything broadcasts
    ElogS = jnp.where(periodic == 1.0, ElogS_full, ElogS_flat)
    deterministic("ElogS", ElogS_full)

    if mp.noisemodel == "NegativeBinomial":
        sample(
            "S",
            dist.NegativeBinomial(
                mean=jnp.exp(ElogS), dispersion=shape_inv[:, None]
            ),
            obs=mp.S,
        )
    elif mp.noisemodel == "Poisson":
        sample("S", dist.Poisson(jnp.exp(ElogS)), obs=mp.S)
    elif mp.noisemodel == "Lognormal":
        sample("logS", dist.Normal(ElogS, mp.sigma_gc), obs=mp.logS)
    else:
        raise ValueError(f"{mp.noisemodel} not allowed")


def _clipped_sigmoid(x):
    finfo = jnp.finfo(jnp.float32)
    z = jnp.clip(x, finfo.min + 10 * finfo.eps, finfo.max - 10 * finfo.eps)
    s = jnp.reciprocal(1.0 + jnp.exp(-z))
    return jnp.clip(s, finfo.eps, 1.0 - finfo.eps)


def phase_guide_lba(mp):
    """LBA guide (`phase_inference_guide.py:79-130`): mean-field plus a
    Delta(clipped_sigmoid(logit + logit_avg)) for periodic_prob."""
    nu_locs = param("nu_locs", mp.mu_nu)
    nu_scales = param("nu_scales", mp.sd_nu, constraint=constraints.positive)

    avg_p = mp.beta0 / (mp.beta0 + mp.beta1)
    logit_avg = jnp.log(avg_p / (1.0 - avg_p))
    logit_locs = param("logit_locs", jnp.zeros((mp.Ng,)))

    with plate("genes", mp.Ng, dim=-2):
        sample("nu", dist.Normal(nu_locs, nu_scales).to_event(1))
        if mp.noisemodel == "NegativeBinomial":
            shape_inv_locs = param(
                "shape_inv_locs",
                jnp.ones((mp.Ng,)) * mp.gamma_alpha / mp.gamma_beta,
                constraint=constraints.positive,
            )
            sample("shape_inv", dist.Delta(shape_inv_locs))
        if mp.with_delta_nu:
            dnu_locs = param(
                "delta_nu_locs", jnp.ones((mp.Nb, mp.Ng)) * mp.mu_dnu
            )
            with plate("batches", mp.Nb, dim=-3):
                sample("delta_nu", dist.Delta(dnu_locs))
        sample(
            "periodic_prob",
            dist.Delta(_clipped_sigmoid(logit_locs + logit_avg)),
        )

    guide_phi(mp)
