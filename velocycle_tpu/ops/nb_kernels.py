"""Pallas TPU kernels for the FLOP-dominant ops: fused NB log-likelihoods.

Every SVI/MCMC step is dominated by ``sum_{g,c} NB_logpmf(K_gc | Elog_gc,
r_g)`` over the dense gene x cell matrix — one matrix for the phase stage
(`/root/reference/velocycle/phase_inference_model.py:374-393`), two (S and
U, coupled through the kinetic ODE) for the velocity stage
(`velocity_inference_model.py:359-388`).  XLA fuses the elementwise
log-pmf, but at Stereo-seq scale the (Ng, Nc) ElogS/ElogU intermediates are
written to and re-read from HBM in both the forward and backward pass.
These kernels keep them in VMEM:

  * loss-only calls run one forward pass over a (gene-tile, cell-tile)
    grid — MXU matmul for the tile's ElogS (and dEs/dphi for velocity),
    VPU log-pmf, running scalar accumulation; no (Ng, Nc) array ever
    touches HBM except the count data itself.
  * under differentiation, a SINGLE grid pass produces the loss AND every
    parameter gradient (the gradients of a scalar-sum loss don't depend
    on the cotangent, so the custom VJP's backward is a scalar scale of
    residuals computed in the forward).  Gene-indexed gradients (nu,
    dispersion, kinetics, delta_nu) accumulate in-place — Mosaic only
    accumulates correctly into an output block whose grid revisits are
    *consecutive* (verified empirically: a block indexed by a
    non-innermost grid axis silently drops prior visits), and cell-tiles
    are innermost here, so revisits are consecutive.  Cell-indexed
    gradients (zeta, count_factor, omega) go to per-gene-tile PARTIAL
    buffers (each output block written exactly once — no revisit rule in
    play) and one tiny XLA reduction sums them outside.  One pass instead
    of the previous three (forward + 2 backward) shares the count read,
    the ElogS matmuls, and the log_b/sigmoid work between the log-pmf and
    its gradients.

Mosaic has no `lgamma`/`digamma` lowering; the kernels use
`ops.special.lgamma_ratio`/`digamma_ratio` — ratio forms built for the
integer-count case: for k < 8 the lgamma/digamma DIFFERENCES are exact
8-term masked recurrences over per-gene columns (8 masked adds per
element), with a Stirling difference above.  ~2x cheaper than the
Lanczos/series route and free of the large-`1/r` cancellation
(`core/distributions.py`).  Identical code runs in the CPU interpret mode
the test suite uses.  Measured on v5e at 2048 x 102400 (full SVI
loss+grad step): 3-pass Lanczos 14.5 ms -> 1-pass ratio forms 6.7 ms.

Padding: inputs are padded to tile multiples only when needed (the cell
tile shrinks to the 128-aligned data width when the data is narrower, so
small configs never pad to the tuned cap); validity masks are computed
*in-kernel* from `broadcasted_iota` against the true (static) Ng/Nc, so
no (Ng, Nc) mask array is ever materialized.  Per-cell gradient rows use
8-sublane blocks ((8, tile_c), row 0 read back): 1-sublane output blocks
miscompile under revisiting.

On non-TPU backends `pallas_call(..., interpret=True)` runs the same
kernels through the interpreter — same math, same API.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .likelihoods import nb_logpmf
from .special import (
    digamma_ratio, lgamma_pos, lgamma_ratio, softplus,
)

# Default tile caps, tuned on v5e with the single-pass fwd+grad kernel at
# 2048 x 102400 (ms/step): (128,1024) 8.6, (128,2048) 8.3, (64,2048) 7.5,
# (64,4096) 6.7, (64,8192) 9.3 (the kernel is VPU-bound; tiles past the
# pipelining optimum only add pressure).  Both fwd+grad calls raise
# Mosaic's scoped-VMEM limit from its conservative 16M default — the
# tuned tiles exceed it by ~1% at large grids.  The velocity kernel holds
# both S and U tiles, so its cell tile cap is half the phase kernel's
# (measured 3.8 ms/step at 1024 x 51200 S+U).  Small inputs split the
# cell axis into equal 128-aligned tiles under the cap (minimal pad).
TILE_G = 64
TILE_C = 4096
TILE_C_VELO = 2048


def _tiles(Nc, cap=None):
    """(gene-tile, cell-tile) for a given cell count: the largest
    128-aligned tile under the tuned cap that divides the cells into
    equal-size tiles — minimal padding at every data width (e.g.
    Nc=2000 under a 1536 cap gives two 1024-tiles, not a 1536-tile plus
    a 67%-padding straggler)."""
    cap = cap or TILE_C
    n = _cdiv(Nc, cap)
    tc = _round_up(_cdiv(Nc, n), 128)
    return TILE_G, tc

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
    per dataset and added outside the kernel.  The lgamma-RATIO form
    (`ops.special.lgamma_ratio`) replaces two Lanczos series with 8
    masked adds (k < 8, i.e. most count entries) or a Stirling difference
    — the kernels are VPU-bound on exactly this function."""
    log_b = -log_r - elog
    lp = (
        lgamma_ratio(k, a)
        + a * log_b
        - (a + k) * softplus(log_b)
    )
    if not skip_lgamma_k:
        lp = lp - lgamma_pos(k + 1.0)
    return lp


def _nb_lp_and_grads(k, a, log_r, elog, skip_k):
    """(log-pmf, d lp/d elog, d lp/d r) with every intermediate shared —
    the single-pass kernels' workhorse (ratio-form special functions, see
    `_nb_lp`)."""
    log_b = -log_r - elog
    sp = softplus(log_b)
    sig = 1.0 / (1.0 + jnp.exp(-log_b))   # = b/(1+b), overflow-safe
    lp = lgamma_ratio(k, a) + a * log_b - (a + k) * sp
    if not skip_k:
        lp = lp - lgamma_pos(k + 1.0)
    g_elog = -a + (a + k) * sig
    dlp_da = digamma_ratio(k, a) + log_b - sp
    dlp_dlogb = a - (a + k) * sig
    g_r = dlp_da * (-a * a) + dlp_dlogb * (-a)
    return lp, g_elog, g_r


def _nb_grads(k, elog, a, log_r, want_r=True):
    """(d lp/d elog, d lp/d r) of the NB log-pmf, elementwise.

    ``want_r=False`` skips the dispersion gradient — it needs the digamma
    ratio (the most expensive remaining VPU work in the backward), and
    the cell-indexed backward pass doesn't use it."""
    log_b = -log_r - elog
    sig = 1.0 / (1.0 + jnp.exp(-log_b))  # = b / (1 + b), overflow-safe
    g_elog = -a + (a + k) * sig
    if not want_r:
        return g_elog, None
    dlp_da = digamma_ratio(k, a) + log_b - softplus(log_b)
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


def _phase_fwdgrad_kernel(Ng, Nc, has_dnu, skip_k, *refs):
    """ONE grid pass (gene-major, cell innermost) producing the loss AND
    every parameter gradient.

    The original design ran three passes (forward; gene-grad; cell-grad)
    because Mosaic only accumulates correctly into an output block whose
    grid revisits are consecutive — cell-indexed gradients need a
    cell-major grid.  This kernel removes that constraint a different
    way: cell-indexed gradients are written to PER-GENE-TILE partial
    buffers (a unique output block per grid step, so no revisit
    accumulation at all) and summed by one tiny XLA reduction outside.
    One pass instead of three means one read of the count matrix, one
    ElogS matmul, one mask, and the log_b/sigmoid work shared between
    the log-pmf and its gradients — the op is VPU-bound on the special-
    function series, so the sharing is the win (measured on v5e at
    2048 x 102400 with the ratio-form specials: 9.6 ms three-pass ->
    6.7 ms single-pass per full SVI loss+grad step)."""
    import jax.experimental.pallas as pl

    if has_dnu:
        (S_ref, nu_ref, zeta_ref, cf_ref, disp_ref, dnuT_ref, Db_ref,
         out_ref, dnu_ref, ddisp_ref, ddnuT_ref, dzetaP_ref,
         dcfP_ref) = refs
    else:
        (S_ref, nu_ref, zeta_ref, cf_ref, disp_ref,
         out_ref, dnu_ref, ddisp_ref, dzetaP_ref, dcfP_ref) = refs
        dnuT_ref = Db_ref = ddnuT_ref = None

    elog = _phase_elog(nu_ref, zeta_ref, cf_ref, dnuT_ref, Db_ref, has_dnu)
    r = disp_ref[:]
    gi, cj = pl.program_id(0), pl.program_id(1)
    mask = _tile_mask(gi, cj, Ng, Nc, *S_ref.shape)

    lp, g_elog, g_r = _nb_lp_and_grads(
        S_ref[:], 1.0 / r, jnp.log(r), elog, skip_k
    )

    @pl.when((gi == 0) & (cj == 0))
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += jnp.sum(lp * mask)
    g_elog = g_elog * mask
    g_r = g_r * mask

    # gene-indexed grads: consecutive cj revisits -> accumulate in place
    @pl.when(cj == 0)
    def _():
        dnu_ref[:] = jnp.zeros_like(dnu_ref)
        ddisp_ref[:] = jnp.zeros_like(ddisp_ref)
        if has_dnu:
            ddnuT_ref[:] = jnp.zeros_like(ddnuT_ref)

    dnu_ref[:] += jnp.dot(
        g_elog, zeta_ref[:], preferred_element_type=jnp.float32
    )
    ddisp_ref[:] += jnp.sum(g_r, axis=1, keepdims=True)
    if has_dnu:
        ddnuT_ref[:] += jnp.dot(
            g_elog, Db_ref[:].T, preferred_element_type=jnp.float32
        )

    # cell-indexed grads: one unique partial block per (gi, cj) step.
    # Mosaic requires output block rows in multiples of 8, so the (Nh, TC)
    # tile is zero-padded to the block height.
    dzp = jnp.dot(
        nu_ref[:].T, g_elog, preferred_element_type=jnp.float32
    )                                                    # (Nh, TILE_C)
    pad_rows = dzetaP_ref.shape[0] - dzp.shape[0]
    dzetaP_ref[:] = jnp.concatenate(
        [dzp, jnp.zeros((pad_rows, dzp.shape[1]), dzp.dtype)], axis=0
    )
    colsum = jnp.sum(g_elog, axis=0, keepdims=True)      # (1, TILE_C)
    dcfP_ref[:] = jnp.broadcast_to(colsum, dcfP_ref.shape)


def _phase_padded(S, nu, zeta, count_factor, dispersion, delta_nu, tg, tc):
    Ng, Nc = S.shape
    Gp, Cp = _round_up(Ng, tg), _round_up(Nc, tc)
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


def _phase_in_specs(Nh, Nb, has_dnu, gene_major, tg, tc):
    """Input block specs; gene_major selects grid=(gene,cell) vs
    (cell,gene)."""
    import jax.experimental.pallas as pl

    if gene_major:
        g, c = lambda i, j: i, lambda i, j: j
    else:
        g, c = lambda j, i: i, lambda j, i: j
    specs = [
        pl.BlockSpec((tg, tc), lambda *a: (g(*a), c(*a))),
        pl.BlockSpec((tg, Nh), lambda *a: (g(*a), 0)),
        pl.BlockSpec((tc, Nh), lambda *a: (c(*a), 0)),
        pl.BlockSpec((1, tc), lambda *a: (0, c(*a))),
        pl.BlockSpec((tg, 1), lambda *a: (g(*a), 0)),
    ]
    if has_dnu:
        specs += [
            pl.BlockSpec((tg, Nb), lambda *a: (g(*a), 0)),
            pl.BlockSpec((Nb, tc), lambda *a: (0, c(*a))),
        ]
    return specs


def _phase_fused_impl(S, nu, zeta, count_factor, dispersion, delta_nu, Db,
                      lgamma_k_sum):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    has_dnu = delta_nu is not None
    skip_k = lgamma_k_sum is not None
    tg, tc = _tiles(S.shape[1])
    ops, (Ng, Nc, Nh, Gp, Cp) = _phase_padded(
        S, nu, zeta, count_factor, dispersion, delta_nu, tg, tc
    )
    Nb = delta_nu.shape[0] if has_dnu else 0
    if has_dnu:
        ops.append(_pad_2d(Db, Nb, Cp))
    out = pl.pallas_call(
        functools.partial(_phase_fwd_kernel, Ng, Nc, has_dnu, skip_k),
        grid=(Gp // tg, Cp // tc),
        in_specs=_phase_in_specs(Nh, Nb, has_dnu, True, tg, tc),
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

    INTEGER-COUNT REQUIREMENT: the kernel's lgamma/digamma ratio forms
    (`ops/special.lgamma_ratio`) evaluate ``lgamma(k+a)-lgamma(a)`` as a
    masked sum of ``log(a+j)`` for k < 8 — exact ONLY for integer-valued
    ``S`` (raw counts, possibly stored as float).  A normalized or
    smoothed layer with fractional values silently yields wrong
    log-probs and gradients; use the plain-XLA path
    (``use_fused_nb=False``) for non-integer data.

    Args:
      S: counts (Ng, Nc), integer-valued (see above).
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


def _phase_fwdgrad_impl(S, nu, zeta, count_factor, dispersion, delta_nu,
                        Db, lgamma_k_sum):
    """Single-pass loss + all gradients (see `_phase_fwdgrad_kernel`)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    has_dnu = delta_nu is not None
    skip_k = lgamma_k_sum is not None
    tg, tc = _tiles(S.shape[1])
    ops, (Ng, Nc, Nh, Gp, Cp) = _phase_padded(
        S, nu, zeta, count_factor, dispersion, delta_nu, tg, tc
    )
    Nb = delta_nu.shape[0] if has_dnu else 0
    if has_dnu:
        ops.append(_pad_2d(Db, Nb, Cp))
    n_g, n_c = Gp // tg, Cp // tc

    out_specs = [
        pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((tg, Nh), lambda i, j: (i, 0)),
        pl.BlockSpec((tg, 1), lambda i, j: (i, 0)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((Gp, Nh), jnp.float32),
        jax.ShapeDtypeStruct((Gp, 1), jnp.float32),
    ]
    if has_dnu:
        out_specs.append(pl.BlockSpec((tg, Nb), lambda i, j: (i, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((Gp, Nb), jnp.float32))
    # per-gene-tile partial buffers for the cell-indexed grads: block
    # (i, j) of a (n_g*NH8, Cp) / (n_g*8, Cp) array is written exactly
    # once (Mosaic needs block heights in multiples of 8; rows Nh..NH8-1
    # are zero padding)
    NH8 = _round_up(Nh, 8)
    out_specs += [
        pl.BlockSpec((NH8, tc), lambda i, j: (i, j)),
        pl.BlockSpec((8, tc), lambda i, j: (i, j)),
    ]
    out_shapes += [
        jax.ShapeDtypeStruct((n_g * NH8, Cp), jnp.float32),
        jax.ShapeDtypeStruct((n_g * 8, Cp), jnp.float32),
    ]

    outs = pl.pallas_call(
        functools.partial(_phase_fwdgrad_kernel, Ng, Nc, has_dnu, skip_k),
        grid=(n_g, n_c),
        in_specs=_phase_in_specs(Nh, Nb, has_dnu, True, tg, tc),
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(*ops)
    if has_dnu:
        out, dnu_p, ddisp_p, ddnuT_p, dzetaP, dcfP = outs
        d_dnu = ddnuT_p[:Ng].T
    else:
        out, dnu_p, ddisp_p, dzetaP, dcfP = outs
        d_dnu = None
    total = out[0, 0]
    if skip_k:
        total = total - lgamma_k_sum
    NH8 = _round_up(Nh, 8)
    dzeta = dzetaP.reshape(n_g, NH8, Cp)[:, :Nh].sum(0).T[:Nc]
    dcf = dcfP.reshape(n_g, 8, Cp)[:, 0, :].sum(0)[:Nc]
    return total, (dnu_p[:Ng], dzeta, dcf, ddisp_p[:Ng, 0], d_dnu)


def _phase_fused_fwd(S, nu, zeta, count_factor, dispersion, delta_nu, Db,
                     lgamma_k_sum):
    # under differentiation, compute loss AND grads in one kernel pass;
    # gradients of a scalar-sum loss don't depend on the cotangent, so the
    # backward is a scalar scale of the stored residuals
    return _phase_fwdgrad_impl(
        S, nu, zeta, count_factor, dispersion, delta_nu, Db, lgamma_k_sum
    )


def _phase_fused_bwd(residuals, g):
    dnu, dzeta, dcf, ddisp, d_dnu = residuals
    g = jnp.asarray(g, jnp.float32)
    return (
        None,
        g * dnu,
        g * dzeta,
        g * dcf,
        g * ddisp,
        None if d_dnu is None else g * d_dnu,
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


def _velo_fwdgrad_kernel(Ng, Nc, has_dnu, skip_k, *refs):
    """ONE grid pass (gene-major) producing loss + every gradient — the
    velocity-stage twin of `_phase_fwdgrad_kernel` (see its docstring for
    the design: gene-indexed grads accumulate over consecutive cell-tile
    revisits; cell-indexed grads go to per-gene-tile partial buffers)."""
    import jax.experimental.pallas as pl

    n_outs = 10 if has_dnu else 9
    ins, outs = refs[:-n_outs], refs[-n_outs:]
    if has_dnu:
        (S_ref, U_ref, nu_ref, zeta_ref, zdphi_ref, cf_ref, omega_ref,
         lbeta_ref, lgamma_ref, disp_ref, dnuT_ref, Db_ref) = ins
        (out_ref, dnu_ref, dlbeta_ref, dlgamma_ref, ddisp_ref, ddnuT_ref,
         dzetaP_ref, dzdphiP_ref, dcfP_ref, domegaP_ref) = outs
    else:
        (S_ref, U_ref, nu_ref, zeta_ref, zdphi_ref, cf_ref, omega_ref,
         lbeta_ref, lgamma_ref, disp_ref) = ins
        (out_ref, dnu_ref, dlbeta_ref, dlgamma_ref, ddisp_ref,
         dzetaP_ref, dzdphiP_ref, dcfP_ref, domegaP_ref) = outs
        dnuT_ref = Db_ref = ddnuT_ref = None

    elogS, elogU, dEs, gamma, x, xr = _velo_elogs(
        nu_ref, zeta_ref, zdphi_ref, cf_ref, omega_ref, lbeta_ref,
        lgamma_ref, dnuT_ref, Db_ref, has_dnu
    )
    r = disp_ref[:]
    a, log_r = 1.0 / r, jnp.log(r)
    gi, cj = pl.program_id(0), pl.program_id(1)
    mask = _tile_mask(gi, cj, Ng, Nc, *S_ref.shape)

    lpS, gS, g_rS = _nb_lp_and_grads(S_ref[:], a, log_r, elogS, skip_k)
    lpU, gU, g_rU = _nb_lp_and_grads(U_ref[:], a, log_r, elogU, skip_k)

    @pl.when((gi == 0) & (cj == 0))
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += jnp.sum((lpS + lpU) * mask)

    gS, gU = gS * mask, gU * mask
    g_r = (g_rS + g_rU) * mask
    g_elogS = gS + gU                                   # ElogU includes ElogS
    g_x = gU * jnp.where(x > 0.0, 1.0 / xr, 0.0)        # relu + log chain
    g_x_om = g_x * omega_ref[:]

    @pl.when(cj == 0)
    def _():
        dnu_ref[:] = jnp.zeros_like(dnu_ref)
        dlbeta_ref[:] = jnp.zeros_like(dlbeta_ref)
        dlgamma_ref[:] = jnp.zeros_like(dlgamma_ref)
        ddisp_ref[:] = jnp.zeros_like(ddisp_ref)
        if has_dnu:
            ddnuT_ref[:] = jnp.zeros_like(ddnuT_ref)

    dnu_ref[:] += jnp.dot(
        g_elogS, zeta_ref[:], preferred_element_type=jnp.float32
    ) + jnp.dot(
        g_x_om, zdphi_ref[:], preferred_element_type=jnp.float32
    )
    dlbeta_ref[:] += jnp.sum(-gU, axis=1, keepdims=True)
    dlgamma_ref[:] += jnp.sum(g_x, axis=1, keepdims=True) * gamma
    ddisp_ref[:] += jnp.sum(g_r, axis=1, keepdims=True)
    if has_dnu:
        ddnuT_ref[:] += jnp.dot(
            g_elogS, Db_ref[:].T, preferred_element_type=jnp.float32
        )

    def _pad_block(t, ref):
        z = jnp.zeros((ref.shape[0] - t.shape[0], t.shape[1]), t.dtype)
        return jnp.concatenate([t, z], axis=0)

    dzetaP_ref[:] = _pad_block(jnp.dot(
        nu_ref[:].T, g_elogS, preferred_element_type=jnp.float32
    ), dzetaP_ref)
    dzdphiP_ref[:] = _pad_block(jnp.dot(
        nu_ref[:].T, g_x_om, preferred_element_type=jnp.float32
    ), dzdphiP_ref)
    cf_sum = jnp.sum(g_elogS, axis=0, keepdims=True)
    dcfP_ref[:] = jnp.broadcast_to(cf_sum, dcfP_ref.shape)
    om_sum = jnp.sum(g_x * dEs, axis=0, keepdims=True)
    domegaP_ref[:] = jnp.broadcast_to(om_sum, domegaP_ref.shape)


def _velo_padded(S, U, nu, zeta, zeta_dphi, count_factor, omega, log_beta,
                 log_gamma, dispersion, delta_nu, Db, tg, tc):
    Ng, Nc = S.shape
    Gp, Cp = _round_up(Ng, tg), _round_up(Nc, tc)
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


def _velo_in_specs(Nh, Nb, has_dnu, gene_major, tg, tc):
    import jax.experimental.pallas as pl

    if gene_major:
        g, c = lambda i, j: i, lambda i, j: j
    else:
        g, c = lambda j, i: i, lambda j, i: j
    specs = [
        pl.BlockSpec((tg, tc), lambda *a: (g(*a), c(*a))),  # S
        pl.BlockSpec((tg, tc), lambda *a: (g(*a), c(*a))),  # U
        pl.BlockSpec((tg, Nh), lambda *a: (g(*a), 0)),          # nu
        pl.BlockSpec((tc, Nh), lambda *a: (c(*a), 0)),          # zeta
        pl.BlockSpec((tc, Nh), lambda *a: (c(*a), 0)),          # zdphi
        pl.BlockSpec((1, tc), lambda *a: (0, c(*a))),           # cf
        pl.BlockSpec((1, tc), lambda *a: (0, c(*a))),           # omega
        pl.BlockSpec((tg, 1), lambda *a: (g(*a), 0)),           # lbeta
        pl.BlockSpec((tg, 1), lambda *a: (g(*a), 0)),           # lgamma
        pl.BlockSpec((tg, 1), lambda *a: (g(*a), 0)),           # disp
    ]
    if has_dnu:
        specs += [
            pl.BlockSpec((tg, Nb), lambda *a: (g(*a), 0)),
            pl.BlockSpec((Nb, tc), lambda *a: (0, c(*a))),
        ]
    return specs


def _velo_fused_impl(S, U, nu, zeta, zeta_dphi, count_factor, omega,
                     log_beta, log_gamma, dispersion, delta_nu, Db,
                     lgamma_k_sum):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    has_dnu = delta_nu is not None
    skip_k = lgamma_k_sum is not None
    tg, tc = _tiles(S.shape[1], cap=TILE_C_VELO)
    ops, (Ng, Nc, Nh, Gp, Cp) = _velo_padded(
        S, U, nu, zeta, zeta_dphi, count_factor, omega, log_beta, log_gamma,
        dispersion, delta_nu, Db, tg, tc
    )
    Nb = delta_nu.shape[0] if has_dnu else 0
    out = pl.pallas_call(
        functools.partial(_velo_fwd_kernel, Ng, Nc, has_dnu, skip_k),
        grid=(Gp // tg, Cp // tc),
        in_specs=_velo_in_specs(Nh, Nb, has_dnu, True, tg, tc),
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

    ``S`` and ``U`` must be integer-valued (raw counts): the ratio-form
    specials are exact only for integer k — see `nb_loglik_fused`.
    """
    return _velo_fused_impl(
        S, U, nu, zeta, zeta_dphi, count_factor, omega, log_beta, log_gamma,
        dispersion, delta_nu, Db, lgamma_k_sum
    )


def _velo_fwdgrad_impl(S, U, nu, zeta, zeta_dphi, count_factor, omega,
                       log_beta, log_gamma, dispersion, delta_nu, Db,
                       lgamma_k_sum):
    """Single-pass loss + all gradients (see `_velo_fwdgrad_kernel`)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    has_dnu = delta_nu is not None
    skip_k = lgamma_k_sum is not None
    tg, tc = _tiles(S.shape[1], cap=TILE_C_VELO)
    ops, (Ng, Nc, Nh, Gp, Cp) = _velo_padded(
        S, U, nu, zeta, zeta_dphi, count_factor, omega, log_beta, log_gamma,
        dispersion, delta_nu, Db, tg, tc
    )
    Nb = delta_nu.shape[0] if has_dnu else 0
    n_g, n_c = Gp // tg, Cp // tc
    NH8 = _round_up(Nh, 8)

    out_specs = [
        pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((tg, Nh), lambda i, j: (i, 0)),   # dnu
        pl.BlockSpec((tg, 1), lambda i, j: (i, 0)),    # dlog_beta
        pl.BlockSpec((tg, 1), lambda i, j: (i, 0)),    # dlog_gamma
        pl.BlockSpec((tg, 1), lambda i, j: (i, 0)),    # ddisp
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((Gp, Nh), jnp.float32),
        jax.ShapeDtypeStruct((Gp, 1), jnp.float32),
        jax.ShapeDtypeStruct((Gp, 1), jnp.float32),
        jax.ShapeDtypeStruct((Gp, 1), jnp.float32),
    ]
    if has_dnu:
        out_specs.append(pl.BlockSpec((tg, Nb), lambda i, j: (i, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((Gp, Nb), jnp.float32))
    out_specs += [
        pl.BlockSpec((NH8, tc), lambda i, j: (i, j)),  # dzeta partials
        pl.BlockSpec((NH8, tc), lambda i, j: (i, j)),  # dzdphi partials
        pl.BlockSpec((8, tc), lambda i, j: (i, j)),    # dcf partials
        pl.BlockSpec((8, tc), lambda i, j: (i, j)),    # domega partials
    ]
    out_shapes += [
        jax.ShapeDtypeStruct((n_g * NH8, Cp), jnp.float32),
        jax.ShapeDtypeStruct((n_g * NH8, Cp), jnp.float32),
        jax.ShapeDtypeStruct((n_g * 8, Cp), jnp.float32),
        jax.ShapeDtypeStruct((n_g * 8, Cp), jnp.float32),
    ]

    outs = pl.pallas_call(
        functools.partial(_velo_fwdgrad_kernel, Ng, Nc, has_dnu, skip_k),
        grid=(n_g, n_c),
        in_specs=_velo_in_specs(Nh, Nb, has_dnu, True, tg, tc),
        out_specs=out_specs,
        out_shape=out_shapes,
        # the S+U working set at the tuned tile exceeds Mosaic's
        # conservative 16M scoped-VMEM default by ~1% at large grids
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(*ops)
    if has_dnu:
        (out, dnu_p, dlbeta_p, dlgamma_p, ddisp_p, ddnuT_p, dzetaP,
         dzdphiP, dcfP, domegaP) = outs
        d_dnu = ddnuT_p[:Ng].T
    else:
        (out, dnu_p, dlbeta_p, dlgamma_p, ddisp_p, dzetaP, dzdphiP,
         dcfP, domegaP) = outs
        d_dnu = None
    total = out[0, 0]
    if skip_k:
        total = total - lgamma_k_sum
    dzeta = dzetaP.reshape(n_g, NH8, Cp)[:, :Nh].sum(0).T[:Nc]
    dzdphi = dzdphiP.reshape(n_g, NH8, Cp)[:, :Nh].sum(0).T[:Nc]
    dcf = dcfP.reshape(n_g, 8, Cp)[:, 0, :].sum(0)[:Nc]
    domega = domegaP.reshape(n_g, 8, Cp)[:, 0, :].sum(0)[:Nc]
    return total, (dnu_p[:Ng], dzeta, dzdphi, dcf, domega,
                   dlbeta_p[:Ng, 0], dlgamma_p[:Ng, 0], ddisp_p[:Ng, 0],
                   d_dnu)


def _velo_fused_fwd(S, U, nu, zeta, zeta_dphi, count_factor, omega, log_beta,
                    log_gamma, dispersion, delta_nu, Db, lgamma_k_sum):
    # one kernel pass for loss + grads; backward is a scalar scale (the
    # gradients of a scalar-sum loss don't depend on the cotangent)
    return _velo_fwdgrad_impl(
        S, U, nu, zeta, zeta_dphi, count_factor, omega, log_beta, log_gamma,
        dispersion, delta_nu, Db, lgamma_k_sum
    )


def _velo_fused_bwd(residuals, g):
    (dnu, dzeta, dzdphi, dcf, domega, dlbeta, dlgamma, ddisp,
     d_dnu) = residuals
    g = jnp.asarray(g, jnp.float32)
    return (
        None,
        None,
        g * dnu,
        g * dzeta,
        g * dzdphi,
        g * dcf,
        g * domega,
        g * dlbeta,
        g * dlgamma,
        g * ddisp,
        None if d_dnu is None else g * d_dnu,
        None,
        None,  # lgamma_k_sum is a dataset constant
    )


nbsu_loglik_fused.defvjp(_velo_fused_fwd, _velo_fused_bwd)
