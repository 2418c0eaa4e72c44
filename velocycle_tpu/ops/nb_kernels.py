"""Pallas TPU kernels for the FLOP-dominant ops: fused NB log-likelihoods.

Every SVI/MCMC step is dominated by ``sum_{g,c} NB_logpmf(K_gc | Elog_gc,
r_g)`` over the dense gene x cell matrix — one matrix for the phase stage
(`/root/reference/velocycle/phase_inference_model.py:374-393`), two (S and
U, coupled through the kinetic ODE) for the velocity stage
(`velocity_inference_model.py:359-388`).  XLA fuses the elementwise
log-pmf, but at Stereo-seq scale the (Ng, Nc) ElogS/ElogU intermediates are
written to and re-read from HBM in both the forward and backward pass.
These kernels keep them in VMEM:

  * forward: one pass over a (gene-tile, cell-tile) grid — MXU matmul for
    the tile's ElogS (and dEs/dphi for velocity), VPU log-pmf, running
    scalar accumulation; no (Ng, Nc) array ever touches HBM except the
    count data itself.
  * backward (custom VJP): recompute the tile's intermediates (cheap —
    this op is HBM-bandwidth-bound, not FLOP-bound), form d(loss)/d(Elog)
    in-register, and accumulate the small parameter gradients.  Mosaic
    only accumulates correctly into an output block whose grid revisits
    are *consecutive* (verified empirically: a block indexed by a
    non-innermost grid axis silently drops prior visits), so the backward
    runs as TWO grid passes: gene-indexed gradients (nu, dispersion,
    kinetics, delta_nu) with cell-tiles innermost, and cell-indexed
    gradients (zeta, count_factor, omega) with gene-tiles innermost.  No
    (Ng, Nc) gradient buffer exists at any point.

Mosaic has no `lgamma`/`digamma` lowering, so the kernels use the pure
arithmetic implementations in `ops.special` (Lanczos / asymptotic series),
identical code between the compiled TPU kernel and the CPU interpret mode
the test suite runs in.

Padding: inputs are padded to tile multiples only when needed (a no-op for
aligned shapes — no extra HBM copy at e.g. 2048 x 102400); validity masks
are computed *in-kernel* from `broadcasted_iota` against the true (static)
Ng/Nc, so no (Ng, Nc) mask array is ever materialized.  Per-cell gradient
rows use 8-sublane accumulator blocks ((8, TILE_C), row 0 read back):
1-sublane output blocks also miscompile under revisiting.

On non-TPU backends `pallas_call(..., interpret=True)` runs the same
kernels through the interpreter — same math, same API.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .likelihoods import nb_logpmf
from .special import lgamma_pos, digamma_pos, softplus

TILE_G = 128
TILE_C = 1024  # tuned on v5e: 26.1 ms vs 30.5 ms at TILE_C=256 (2048x102400)

__all__ = [
    "nb_loglik_fused",
    "nb_loglik_reference",
    "nbsu_loglik_fused",
    "nbsu_loglik_reference",
]


def _cdiv(a, b):
    return -(-a // b)


def _round_up(a, b):
    return _cdiv(a, b) * b


# ---------------------------------------------------------------------------
# pure-jnp references (the math the kernels must reproduce)
# ---------------------------------------------------------------------------

def nb_loglik_reference(S, nu, zeta, count_factor, dispersion,
                        delta_nu=None, Db=None):
    """sum of NB log-pmfs with ElogS = nu @ zeta^T [+ Db-routed batch
    offsets] + count_factor (`phase_inference_model.py:374-393`)."""
    elog = nu @ zeta.T + count_factor[None, :]
    if delta_nu is not None:
        elog = elog + jnp.einsum("bg,bc->gc", delta_nu, Db)
    return nb_logpmf(S, elog, dispersion[:, None]).sum()


def nbsu_loglik_reference(S, U, nu, zeta, zeta_dphi, count_factor, omega,
                          log_beta, log_gamma, dispersion,
                          delta_nu=None, Db=None):
    """Velocity-stage joint NB log-likelihood of S and U
    (`velocity_inference_model.py:359-388`):

      ElogS = nu @ zeta^T [+ offsets] + count_factor
      ElogU = -log_beta + log(relu((nu @ zeta_dphi^T) * omega
                                   + exp(log_gamma)) + 1e-5) + ElogS
    """
    elogS = nu @ zeta.T + count_factor[None, :]
    if delta_nu is not None:
        elogS = elogS + jnp.einsum("bg,bc->gc", delta_nu, Db)
    dEs = nu @ zeta_dphi.T
    x = dEs * omega[None, :] + jnp.exp(log_gamma)[:, None]
    elogU = -log_beta[:, None] + jnp.log(jnp.maximum(x, 0.0) + 1e-5) + elogS
    r = dispersion[:, None]
    return (nb_logpmf(S, elogS, r) + nb_logpmf(U, elogU, r)).sum()


# ---------------------------------------------------------------------------
# shared in-kernel pieces
# ---------------------------------------------------------------------------

def _tile_mask(gi, cj, Ng, Nc, tg, tc):
    """(tg, tc) f32 validity mask for gene-tile gi, cell-tile cj of the
    true Ng x Nc array."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (tg, tc), 0) + gi * tg
    cols = jax.lax.broadcasted_iota(jnp.int32, (tg, tc), 1) + cj * tc
    return ((rows < Ng) & (cols < Nc)).astype(jnp.float32)


def _nb_lp(k, elog, a, log_r, skip_lgamma_k=False):
    """NB log-pmf, Mosaic-lowerable (ops.special in place of lgamma).

    ``skip_lgamma_k=True`` omits the ``-lgamma(k+1)`` term — it depends
    only on the observed counts, so its (masked) sum is precomputable once
    per dataset and added outside the kernel.  That removes one of the two
    full-tile lgamma evaluations from the forward pass (the kernel's
    dominant VPU cost)."""
    log_b = -log_r - elog
    lp = (
        lgamma_pos(k + a)
        - lgamma_pos(a)
        + a * log_b
        - (a + k) * softplus(log_b)
    )
    if not skip_lgamma_k:
        lp = lp - lgamma_pos(k + 1.0)
    return lp


def _nb_grads(k, elog, a, log_r, want_r=True):
    """(d lp/d elog, d lp/d r) of the NB log-pmf, elementwise.

    ``want_r=False`` skips the dispersion gradient — it needs two digamma
    evaluations (the most expensive VPU work in the backward), and the
    cell-indexed backward pass doesn't use it."""
    log_b = -log_r - elog
    sig = 1.0 / (1.0 + jnp.exp(-log_b))  # = b / (1 + b), overflow-safe
    g_elog = -a + (a + k) * sig
    if not want_r:
        return g_elog, None
    dlp_da = digamma_pos(k + a) - digamma_pos(a) + log_b - softplus(log_b)
    dlp_dlogb = a - (a + k) * sig
    g_r = dlp_da * (-a * a) + dlp_dlogb * (-a)  # da/dr=-1/r^2, dlogb/dr=-1/r
    return g_elog, g_r


def _pad_rows(x, rows, value=0.0):
    if x.shape[0] == rows:
        return x
    pad = [(0, rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=value)


def _pad_2d(x, rows, cols):
    if x.shape == (rows, cols):
        return x
    return jnp.pad(x, [(0, rows - x.shape[0]), (0, cols - x.shape[1])])


def _interpret():
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# phase-stage kernel: sum NB(S | nu @ zeta^T [+ dnu] + cf, r)
# ---------------------------------------------------------------------------

def _phase_elog(nu_ref, zeta_ref, cf_ref, dnuT_ref, Db_ref, has_dnu):
    elog = (
        jnp.dot(nu_ref[:], zeta_ref[:].T, preferred_element_type=jnp.float32)
        + cf_ref[:]
    )
    if has_dnu:
        elog = elog + jnp.dot(
            dnuT_ref[:], Db_ref[:], preferred_element_type=jnp.float32
        )
    return elog


def _phase_fwd_kernel(Ng, Nc, has_dnu, skip_k, *refs):
    import jax.experimental.pallas as pl

    if has_dnu:
        (S_ref, nu_ref, zeta_ref, cf_ref, disp_ref, dnuT_ref, Db_ref,
         out_ref) = refs
    else:
        S_ref, nu_ref, zeta_ref, cf_ref, disp_ref, out_ref = refs
        dnuT_ref = Db_ref = None

    elog = _phase_elog(nu_ref, zeta_ref, cf_ref, dnuT_ref, Db_ref, has_dnu)
    r = disp_ref[:]
    lp = _nb_lp(S_ref[:], elog, 1.0 / r, jnp.log(r), skip_lgamma_k=skip_k)
    gi, cj = pl.program_id(0), pl.program_id(1)
    tile_sum = jnp.sum(lp * _tile_mask(gi, cj, Ng, Nc, *S_ref.shape))

    @pl.when((gi == 0) & (cj == 0))
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += tile_sum


def _phase_bwd_gene_kernel(Ng, Nc, has_dnu, *refs):
    """Grid (gene, cell) — cell innermost; accumulates gene-indexed grads."""
    import jax.experimental.pallas as pl

    if has_dnu:
        (S_ref, nu_ref, zeta_ref, cf_ref, disp_ref, dnuT_ref, Db_ref, g_ref,
         dnu_ref, ddisp_ref, ddnuT_ref) = refs
    else:
        (S_ref, nu_ref, zeta_ref, cf_ref, disp_ref, g_ref,
         dnu_ref, ddisp_ref) = refs
        dnuT_ref = Db_ref = ddnuT_ref = None

    elog = _phase_elog(nu_ref, zeta_ref, cf_ref, dnuT_ref, Db_ref, has_dnu)
    r = disp_ref[:]
    gi, cj = pl.program_id(0), pl.program_id(1)
    w = _tile_mask(gi, cj, Ng, Nc, *S_ref.shape) * g_ref[0, 0]
    g_elog, g_r = _nb_grads(S_ref[:], elog, 1.0 / r, jnp.log(r))
    g_elog = g_elog * w

    @pl.when(cj == 0)
    def _():
        dnu_ref[:] = jnp.zeros_like(dnu_ref)
        ddisp_ref[:] = jnp.zeros_like(ddisp_ref)
        if has_dnu:
            ddnuT_ref[:] = jnp.zeros_like(ddnuT_ref)

    dnu_ref[:] += jnp.dot(
        g_elog, zeta_ref[:], preferred_element_type=jnp.float32
    )
    ddisp_ref[:] += jnp.sum(g_r * w, axis=1, keepdims=True)
    if has_dnu:
        ddnuT_ref[:] += jnp.dot(
            g_elog, Db_ref[:].T, preferred_element_type=jnp.float32
        )


def _phase_bwd_cell_kernel(Ng, Nc, has_dnu, *refs):
    """Grid (cell, gene) — gene innermost; accumulates cell-indexed grads."""
    import jax.experimental.pallas as pl

    if has_dnu:
        (S_ref, nu_ref, zeta_ref, cf_ref, disp_ref, dnuT_ref, Db_ref, g_ref,
         dzeta_ref, dcf_ref) = refs
    else:
        (S_ref, nu_ref, zeta_ref, cf_ref, disp_ref, g_ref,
         dzeta_ref, dcf_ref) = refs
        dnuT_ref = Db_ref = None

    elog = _phase_elog(nu_ref, zeta_ref, cf_ref, dnuT_ref, Db_ref, has_dnu)
    r = disp_ref[:]
    cj, gi = pl.program_id(0), pl.program_id(1)
    w = _tile_mask(gi, cj, Ng, Nc, *S_ref.shape) * g_ref[0, 0]
    g_elog, _ = _nb_grads(S_ref[:], elog, 1.0 / r, jnp.log(r), want_r=False)
    g_elog = g_elog * w

    @pl.when(gi == 0)
    def _():
        dzeta_ref[:] = jnp.zeros_like(dzeta_ref)
        dcf_ref[:] = jnp.zeros_like(dcf_ref)

    dzeta_ref[:] += jnp.dot(
        g_elog.T, nu_ref[:], preferred_element_type=jnp.float32
    )
    # 8-sublane accumulator; every row carries the same sum, row 0 is used
    colsum = jnp.sum(g_elog, axis=0, keepdims=True)
    dcf_ref[:] += jnp.broadcast_to(colsum, dcf_ref.shape)


def _phase_padded(S, nu, zeta, count_factor, dispersion, delta_nu):
    Ng, Nc = S.shape
    Gp, Cp = _round_up(Ng, TILE_G), _round_up(Nc, TILE_C)
    padded = [
        _pad_2d(S, Gp, Cp),
        _pad_rows(nu, Gp),
        _pad_rows(zeta, Cp),
        _pad_2d(count_factor.reshape(1, -1), 1, Cp),
        _pad_rows(dispersion.reshape(-1, 1), Gp, value=1.0),
    ]
    if delta_nu is not None:
        padded.append(_pad_rows(delta_nu.T, Gp))
    return padded, (Ng, Nc, nu.shape[1], Gp, Cp)


def _phase_in_specs(Nh, Nb, has_dnu, gene_major):
    """Input block specs; gene_major selects grid=(gene,cell) vs
    (cell,gene)."""
    import jax.experimental.pallas as pl

    if gene_major:
        g, c = lambda i, j: i, lambda i, j: j
    else:
        g, c = lambda j, i: i, lambda j, i: j
    specs = [
        pl.BlockSpec((TILE_G, TILE_C), lambda *a: (g(*a), c(*a))),
        pl.BlockSpec((TILE_G, Nh), lambda *a: (g(*a), 0)),
        pl.BlockSpec((TILE_C, Nh), lambda *a: (c(*a), 0)),
        pl.BlockSpec((1, TILE_C), lambda *a: (0, c(*a))),
        pl.BlockSpec((TILE_G, 1), lambda *a: (g(*a), 0)),
    ]
    if has_dnu:
        specs += [
            pl.BlockSpec((TILE_G, Nb), lambda *a: (g(*a), 0)),
            pl.BlockSpec((Nb, TILE_C), lambda *a: (0, c(*a))),
        ]
    return specs


def _phase_fused_impl(S, nu, zeta, count_factor, dispersion, delta_nu, Db,
                      lgamma_k_sum):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    has_dnu = delta_nu is not None
    skip_k = lgamma_k_sum is not None
    ops, (Ng, Nc, Nh, Gp, Cp) = _phase_padded(
        S, nu, zeta, count_factor, dispersion, delta_nu
    )
    Nb = delta_nu.shape[0] if has_dnu else 0
    if has_dnu:
        ops.append(_pad_2d(Db, Nb, Cp))
    out = pl.pallas_call(
        functools.partial(_phase_fwd_kernel, Ng, Nc, has_dnu, skip_k),
        grid=(Gp // TILE_G, Cp // TILE_C),
        in_specs=_phase_in_specs(Nh, Nb, has_dnu, gene_major=True),
        out_specs=pl.BlockSpec(
            (1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=_interpret(),
    )(*ops)
    total = out[0, 0]
    if skip_k:
        total = total - lgamma_k_sum
    return total


@jax.custom_vjp
def nb_loglik_fused(S, nu, zeta, count_factor, dispersion,
                    delta_nu=None, Db=None, lgamma_k_sum=None):
    """Fused ``sum NB_logpmf(S | nu @ zeta^T [+ dnu offsets] + cf, r)``.

    Args:
      S: counts (Ng, Nc).
      nu: harmonic coefficients (Ng, Nh).
      zeta: basis at cell phases (Nc, Nh).
      count_factor: per-cell size factor (Nc,).
      dispersion: per-gene NB dispersion r (Ng,).
      delta_nu: optional per-batch offsets (Nb, Ng).
      Db: batch one-hot design (Nb, Nc), required with delta_nu.
      lgamma_k_sum: optional precomputed ``sum(lgamma(S + 1))`` — a
        dataset constant; providing it removes one full-tile lgamma from
        the forward kernel (~25% of its VPU cost).

    Returns a scalar; differentiable w.r.t. nu, zeta, count_factor,
    dispersion and delta_nu (S and Db are data).
    """
    return _phase_fused_impl(
        S, nu, zeta, count_factor, dispersion, delta_nu, Db, lgamma_k_sum
    )


def _phase_fused_fwd(S, nu, zeta, count_factor, dispersion, delta_nu, Db,
                     lgamma_k_sum):
    out = _phase_fused_impl(
        S, nu, zeta, count_factor, dispersion, delta_nu, Db, lgamma_k_sum
    )
    return out, (S, nu, zeta, count_factor, dispersion, delta_nu, Db)


def _phase_fused_bwd(residuals, g):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, nu, zeta, count_factor, dispersion, delta_nu, Db = residuals
    has_dnu = delta_nu is not None
    ops, (Ng, Nc, Nh, Gp, Cp) = _phase_padded(
        S, nu, zeta, count_factor, dispersion, delta_nu
    )
    Nb = delta_nu.shape[0] if has_dnu else 0
    if has_dnu:
        ops.append(_pad_2d(Db, Nb, Cp))
    ops.append(jnp.asarray(g, jnp.float32).reshape(1, 1))
    smem_spec = pl.BlockSpec(
        (1, 1), lambda *a: (0, 0), memory_space=pltpu.SMEM
    )
    n_g, n_c = Gp // TILE_G, Cp // TILE_C

    # pass 1: gene-indexed grads, cell tiles innermost
    gene_outs = [
        pl.BlockSpec((TILE_G, Nh), lambda i, j: (i, 0)),
        pl.BlockSpec((TILE_G, 1), lambda i, j: (i, 0)),
    ]
    gene_shapes = [
        jax.ShapeDtypeStruct((Gp, Nh), jnp.float32),
        jax.ShapeDtypeStruct((Gp, 1), jnp.float32),
    ]
    if has_dnu:
        gene_outs.append(pl.BlockSpec((TILE_G, Nb), lambda i, j: (i, 0)))
        gene_shapes.append(jax.ShapeDtypeStruct((Gp, Nb), jnp.float32))
    outs_g = pl.pallas_call(
        functools.partial(_phase_bwd_gene_kernel, Ng, Nc, has_dnu),
        grid=(n_g, n_c),
        in_specs=_phase_in_specs(Nh, Nb, has_dnu, gene_major=True)
        + [smem_spec],
        out_specs=gene_outs,
        out_shape=gene_shapes,
        interpret=_interpret(),
    )(*ops)

    # pass 2: cell-indexed grads, gene tiles innermost
    outs_c = pl.pallas_call(
        functools.partial(_phase_bwd_cell_kernel, Ng, Nc, has_dnu),
        grid=(n_c, n_g),
        in_specs=_phase_in_specs(Nh, Nb, has_dnu, gene_major=False)
        + [smem_spec],
        out_specs=[
            pl.BlockSpec((TILE_C, Nh), lambda j, i: (j, 0)),
            pl.BlockSpec((8, TILE_C), lambda j, i: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Cp, Nh), jnp.float32),
            jax.ShapeDtypeStruct((8, Cp), jnp.float32),
        ],
        interpret=_interpret(),
    )(*ops)

    dnu_p, ddisp_p = outs_g[0], outs_g[1]
    d_dnu = outs_g[2][:Ng].T if has_dnu else None
    dzeta_p, dcf_p = outs_c
    return (
        None,
        dnu_p[:Ng],
        dzeta_p[:Nc],
        dcf_p[0, :Nc],
        ddisp_p[:Ng, 0],
        d_dnu,
        None,
        None,  # lgamma_k_sum is a dataset constant
    )


nb_loglik_fused.defvjp(_phase_fused_fwd, _phase_fused_bwd)


# ---------------------------------------------------------------------------
# velocity-stage kernel: sum NB(S | ElogS, r) + NB(U | ElogU, r) with the
# kinetic coupling ElogU = -log_beta + log(relu(dEs * omega + gamma) + 1e-5)
# + ElogS  (`velocity_inference_model.py:359-388`)
# ---------------------------------------------------------------------------

def _velo_elogs(nu_ref, zeta_ref, zdphi_ref, cf_ref, omega_ref,
                lbeta_ref, lgamma_ref, dnuT_ref, Db_ref, has_dnu):
    elogS = (
        jnp.dot(nu_ref[:], zeta_ref[:].T, preferred_element_type=jnp.float32)
        + cf_ref[:]
    )
    if has_dnu:
        elogS = elogS + jnp.dot(
            dnuT_ref[:], Db_ref[:], preferred_element_type=jnp.float32
        )
    dEs = jnp.dot(
        nu_ref[:], zdphi_ref[:].T, preferred_element_type=jnp.float32
    )
    gamma = jnp.exp(lgamma_ref[:])          # (TG, 1)
    x = dEs * omega_ref[:] + gamma          # (TG, TC)
    xr = jnp.maximum(x, 0.0) + 1e-5
    elogU = -lbeta_ref[:] + jnp.log(xr) + elogS
    return elogS, elogU, dEs, gamma, x, xr


def _velo_fwd_kernel(Ng, Nc, has_dnu, skip_k, *refs):
    import jax.experimental.pallas as pl

    if has_dnu:
        (S_ref, U_ref, nu_ref, zeta_ref, zdphi_ref, cf_ref, omega_ref,
         lbeta_ref, lgamma_ref, disp_ref, dnuT_ref, Db_ref, out_ref) = refs
    else:
        (S_ref, U_ref, nu_ref, zeta_ref, zdphi_ref, cf_ref, omega_ref,
         lbeta_ref, lgamma_ref, disp_ref, out_ref) = refs
        dnuT_ref = Db_ref = None

    elogS, elogU, _, _, _, _ = _velo_elogs(
        nu_ref, zeta_ref, zdphi_ref, cf_ref, omega_ref, lbeta_ref,
        lgamma_ref, dnuT_ref, Db_ref, has_dnu
    )
    r = disp_ref[:]
    a, log_r = 1.0 / r, jnp.log(r)
    lp = (
        _nb_lp(S_ref[:], elogS, a, log_r, skip_lgamma_k=skip_k)
        + _nb_lp(U_ref[:], elogU, a, log_r, skip_lgamma_k=skip_k)
    )
    gi, cj = pl.program_id(0), pl.program_id(1)
    tile_sum = jnp.sum(lp * _tile_mask(gi, cj, Ng, Nc, *S_ref.shape))

    @pl.when((gi == 0) & (cj == 0))
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += tile_sum


def _velo_bwd_common(refs, has_dnu, gi, cj, Ng, Nc, want_r=True):
    """Recompute intermediates and elementwise gradients for one tile."""
    if has_dnu:
        (S_ref, U_ref, nu_ref, zeta_ref, zdphi_ref, cf_ref, omega_ref,
         lbeta_ref, lgamma_ref, disp_ref, dnuT_ref, Db_ref, g_ref) = refs
    else:
        (S_ref, U_ref, nu_ref, zeta_ref, zdphi_ref, cf_ref, omega_ref,
         lbeta_ref, lgamma_ref, disp_ref, g_ref) = refs
        dnuT_ref = Db_ref = None

    elogS, elogU, dEs, gamma, x, xr = _velo_elogs(
        nu_ref, zeta_ref, zdphi_ref, cf_ref, omega_ref, lbeta_ref,
        lgamma_ref, dnuT_ref, Db_ref, has_dnu
    )
    r = disp_ref[:]
    a, log_r = 1.0 / r, jnp.log(r)
    w = _tile_mask(gi, cj, Ng, Nc, *S_ref.shape) * g_ref[0, 0]

    gS, g_rS = _nb_grads(S_ref[:], elogS, a, log_r, want_r)
    gU, g_rU = _nb_grads(U_ref[:], elogU, a, log_r, want_r)
    gS, gU = gS * w, gU * w
    g_r = (g_rS + g_rU) * w if want_r else None
    g_elogS = gS + gU                                   # ElogU includes ElogS
    g_x = gU * jnp.where(x > 0.0, 1.0 / xr, 0.0)        # relu + log chain
    return dict(
        nu_ref=nu_ref, zeta_ref=zeta_ref, zdphi_ref=zdphi_ref,
        omega_ref=omega_ref, Db_ref=Db_ref, gamma=gamma, dEs=dEs,
        gS=gS, gU=gU, g_r=g_r, g_elogS=g_elogS, g_x=g_x,
    )


def _velo_bwd_gene_kernel(Ng, Nc, has_dnu, *refs):
    """Grid (gene, cell): dnu, dlog_beta, dlog_gamma, ddisp, ddnuT."""
    import jax.experimental.pallas as pl

    n_outs = 5 if has_dnu else 4
    ins, outs = refs[:-n_outs], refs[-n_outs:]
    if has_dnu:
        dnu_ref, dlbeta_ref, dlgamma_ref, ddisp_ref, ddnuT_ref = outs
    else:
        dnu_ref, dlbeta_ref, dlgamma_ref, ddisp_ref = outs
        ddnuT_ref = None
    gi, cj = pl.program_id(0), pl.program_id(1)
    v = _velo_bwd_common(ins, has_dnu, gi, cj, Ng, Nc)

    @pl.when(cj == 0)
    def _():
        dnu_ref[:] = jnp.zeros_like(dnu_ref)
        dlbeta_ref[:] = jnp.zeros_like(dlbeta_ref)
        dlgamma_ref[:] = jnp.zeros_like(dlgamma_ref)
        ddisp_ref[:] = jnp.zeros_like(ddisp_ref)
        if has_dnu:
            ddnuT_ref[:] = jnp.zeros_like(ddnuT_ref)

    g_x_om = v["g_x"] * v["omega_ref"][:]
    dnu_ref[:] += jnp.dot(
        v["g_elogS"], v["zeta_ref"][:], preferred_element_type=jnp.float32
    ) + jnp.dot(
        g_x_om, v["zdphi_ref"][:], preferred_element_type=jnp.float32
    )
    dlbeta_ref[:] += jnp.sum(-v["gU"], axis=1, keepdims=True)
    dlgamma_ref[:] += jnp.sum(v["g_x"], axis=1, keepdims=True) * v["gamma"]
    ddisp_ref[:] += jnp.sum(v["g_r"], axis=1, keepdims=True)
    if has_dnu:
        ddnuT_ref[:] += jnp.dot(
            v["g_elogS"], v["Db_ref"][:].T,
            preferred_element_type=jnp.float32,
        )


def _velo_bwd_cell_kernel(Ng, Nc, has_dnu, *refs):
    """Grid (cell, gene): dzeta, dzeta_dphi, dcf, domega."""
    import jax.experimental.pallas as pl

    ins, outs = refs[:-4], refs[-4:]
    dzeta_ref, dzdphi_ref, dcf_ref, domega_ref = outs
    cj, gi = pl.program_id(0), pl.program_id(1)
    v = _velo_bwd_common(ins, has_dnu, gi, cj, Ng, Nc, want_r=False)

    @pl.when(gi == 0)
    def _():
        dzeta_ref[:] = jnp.zeros_like(dzeta_ref)
        dzdphi_ref[:] = jnp.zeros_like(dzdphi_ref)
        dcf_ref[:] = jnp.zeros_like(dcf_ref)
        domega_ref[:] = jnp.zeros_like(domega_ref)

    g_x_om = v["g_x"] * v["omega_ref"][:]
    dzeta_ref[:] += jnp.dot(
        v["g_elogS"].T, v["nu_ref"][:], preferred_element_type=jnp.float32
    )
    dzdphi_ref[:] += jnp.dot(
        g_x_om.T, v["nu_ref"][:], preferred_element_type=jnp.float32
    )
    cf_sum = jnp.sum(v["g_elogS"], axis=0, keepdims=True)
    dcf_ref[:] += jnp.broadcast_to(cf_sum, dcf_ref.shape)
    om_sum = jnp.sum(v["g_x"] * v["dEs"], axis=0, keepdims=True)
    domega_ref[:] += jnp.broadcast_to(om_sum, domega_ref.shape)


def _velo_padded(S, U, nu, zeta, zeta_dphi, count_factor, omega, log_beta,
                 log_gamma, dispersion, delta_nu, Db):
    Ng, Nc = S.shape
    Gp, Cp = _round_up(Ng, TILE_G), _round_up(Nc, TILE_C)
    padded = [
        _pad_2d(S, Gp, Cp),
        _pad_2d(U, Gp, Cp),
        _pad_rows(nu, Gp),
        _pad_rows(zeta, Cp),
        _pad_rows(zeta_dphi, Cp),
        _pad_2d(count_factor.reshape(1, -1), 1, Cp),
        _pad_2d(omega.reshape(1, -1), 1, Cp),
        _pad_rows(log_beta.reshape(-1, 1), Gp),
        _pad_rows(log_gamma.reshape(-1, 1), Gp),
        _pad_rows(dispersion.reshape(-1, 1), Gp, value=1.0),
    ]
    if delta_nu is not None:
        padded += [_pad_rows(delta_nu.T, Gp), _pad_2d(Db, Db.shape[0], Cp)]
    return padded, (Ng, Nc, nu.shape[1], Gp, Cp)


def _velo_in_specs(Nh, Nb, has_dnu, gene_major):
    import jax.experimental.pallas as pl

    if gene_major:
        g, c = lambda i, j: i, lambda i, j: j
    else:
        g, c = lambda j, i: i, lambda j, i: j
    specs = [
        pl.BlockSpec((TILE_G, TILE_C), lambda *a: (g(*a), c(*a))),  # S
        pl.BlockSpec((TILE_G, TILE_C), lambda *a: (g(*a), c(*a))),  # U
        pl.BlockSpec((TILE_G, Nh), lambda *a: (g(*a), 0)),          # nu
        pl.BlockSpec((TILE_C, Nh), lambda *a: (c(*a), 0)),          # zeta
        pl.BlockSpec((TILE_C, Nh), lambda *a: (c(*a), 0)),          # zdphi
        pl.BlockSpec((1, TILE_C), lambda *a: (0, c(*a))),           # cf
        pl.BlockSpec((1, TILE_C), lambda *a: (0, c(*a))),           # omega
        pl.BlockSpec((TILE_G, 1), lambda *a: (g(*a), 0)),           # lbeta
        pl.BlockSpec((TILE_G, 1), lambda *a: (g(*a), 0)),           # lgamma
        pl.BlockSpec((TILE_G, 1), lambda *a: (g(*a), 0)),           # disp
    ]
    if has_dnu:
        specs += [
            pl.BlockSpec((TILE_G, Nb), lambda *a: (g(*a), 0)),
            pl.BlockSpec((Nb, TILE_C), lambda *a: (0, c(*a))),
        ]
    return specs


def _velo_fused_impl(S, U, nu, zeta, zeta_dphi, count_factor, omega,
                     log_beta, log_gamma, dispersion, delta_nu, Db,
                     lgamma_k_sum):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    has_dnu = delta_nu is not None
    skip_k = lgamma_k_sum is not None
    ops, (Ng, Nc, Nh, Gp, Cp) = _velo_padded(
        S, U, nu, zeta, zeta_dphi, count_factor, omega, log_beta, log_gamma,
        dispersion, delta_nu, Db
    )
    Nb = delta_nu.shape[0] if has_dnu else 0
    out = pl.pallas_call(
        functools.partial(_velo_fwd_kernel, Ng, Nc, has_dnu, skip_k),
        grid=(Gp // TILE_G, Cp // TILE_C),
        in_specs=_velo_in_specs(Nh, Nb, has_dnu, gene_major=True),
        out_specs=pl.BlockSpec(
            (1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=_interpret(),
    )(*ops)
    total = out[0, 0]
    if skip_k:
        total = total - lgamma_k_sum
    return total


@jax.custom_vjp
def nbsu_loglik_fused(S, U, nu, zeta, zeta_dphi, count_factor, omega,
                      log_beta, log_gamma, dispersion,
                      delta_nu=None, Db=None, lgamma_k_sum=None):
    """Fused velocity-stage joint NB log-likelihood of S and U.

    The ElogS/ElogU/dEs (Ng, Nc) intermediates stay in VMEM; differentiable
    w.r.t. nu, zeta, zeta_dphi, count_factor, omega, log_beta, log_gamma,
    dispersion and delta_nu.  S, U, Db are data.  ``lgamma_k_sum``:
    optional precomputed ``sum(lgamma(S+1)) + sum(lgamma(U+1))`` dataset
    constant, removing two full-tile lgammas from the forward kernel.
    """
    return _velo_fused_impl(
        S, U, nu, zeta, zeta_dphi, count_factor, omega, log_beta, log_gamma,
        dispersion, delta_nu, Db, lgamma_k_sum
    )


def _velo_fused_fwd(S, U, nu, zeta, zeta_dphi, count_factor, omega, log_beta,
                    log_gamma, dispersion, delta_nu, Db, lgamma_k_sum):
    out = _velo_fused_impl(
        S, U, nu, zeta, zeta_dphi, count_factor, omega, log_beta, log_gamma,
        dispersion, delta_nu, Db, lgamma_k_sum
    )
    return out, (S, U, nu, zeta, zeta_dphi, count_factor, omega, log_beta,
                 log_gamma, dispersion, delta_nu, Db)


def _velo_fused_bwd(residuals, g):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (S, U, nu, zeta, zeta_dphi, count_factor, omega, log_beta, log_gamma,
     dispersion, delta_nu, Db) = residuals
    has_dnu = delta_nu is not None
    ops, (Ng, Nc, Nh, Gp, Cp) = _velo_padded(
        S, U, nu, zeta, zeta_dphi, count_factor, omega, log_beta, log_gamma,
        dispersion, delta_nu, Db
    )
    Nb = delta_nu.shape[0] if has_dnu else 0
    ops.append(jnp.asarray(g, jnp.float32).reshape(1, 1))
    smem_spec = pl.BlockSpec(
        (1, 1), lambda *a: (0, 0), memory_space=pltpu.SMEM
    )
    n_g, n_c = Gp // TILE_G, Cp // TILE_C

    gene_outs = [
        pl.BlockSpec((TILE_G, Nh), lambda i, j: (i, 0)),   # dnu
        pl.BlockSpec((TILE_G, 1), lambda i, j: (i, 0)),    # dlog_beta
        pl.BlockSpec((TILE_G, 1), lambda i, j: (i, 0)),    # dlog_gamma
        pl.BlockSpec((TILE_G, 1), lambda i, j: (i, 0)),    # ddisp
    ]
    gene_shapes = [
        jax.ShapeDtypeStruct((Gp, Nh), jnp.float32),
        jax.ShapeDtypeStruct((Gp, 1), jnp.float32),
        jax.ShapeDtypeStruct((Gp, 1), jnp.float32),
        jax.ShapeDtypeStruct((Gp, 1), jnp.float32),
    ]
    if has_dnu:
        gene_outs.append(pl.BlockSpec((TILE_G, Nb), lambda i, j: (i, 0)))
        gene_shapes.append(jax.ShapeDtypeStruct((Gp, Nb), jnp.float32))
    outs_g = pl.pallas_call(
        functools.partial(_velo_bwd_gene_kernel, Ng, Nc, has_dnu),
        grid=(n_g, n_c),
        in_specs=_velo_in_specs(Nh, Nb, has_dnu, gene_major=True)
        + [smem_spec],
        out_specs=gene_outs,
        out_shape=gene_shapes,
        interpret=_interpret(),
    )(*ops)

    outs_c = pl.pallas_call(
        functools.partial(_velo_bwd_cell_kernel, Ng, Nc, has_dnu),
        grid=(n_c, n_g),
        in_specs=_velo_in_specs(Nh, Nb, has_dnu, gene_major=False)
        + [smem_spec],
        out_specs=[
            pl.BlockSpec((TILE_C, Nh), lambda j, i: (j, 0)),
            pl.BlockSpec((TILE_C, Nh), lambda j, i: (j, 0)),
            pl.BlockSpec((8, TILE_C), lambda j, i: (0, j)),
            pl.BlockSpec((8, TILE_C), lambda j, i: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Cp, Nh), jnp.float32),
            jax.ShapeDtypeStruct((Cp, Nh), jnp.float32),
            jax.ShapeDtypeStruct((8, Cp), jnp.float32),
            jax.ShapeDtypeStruct((8, Cp), jnp.float32),
        ],
        interpret=_interpret(),
    )(*ops)

    dnu, dlbeta, dlgamma, ddisp = outs_g[:4]
    d_dnu = outs_g[4][:Ng].T if has_dnu else None
    dzeta, dzdphi, dcf, domega = outs_c
    return (
        None,
        None,
        dnu[:Ng],
        dzeta[:Nc],
        dzdphi[:Nc],
        dcf[0, :Nc],
        domega[0, :Nc],
        dlbeta[:Ng, 0],
        dlgamma[:Ng, 0],
        ddisp[:Ng, 0],
        d_dnu,
        None,
        None,  # lgamma_k_sum is a dataset constant
    )


nbsu_loglik_fused.defvjp(_velo_fused_fwd, _velo_fused_bwd)
