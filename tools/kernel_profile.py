"""Micro-profiling: where do the 6 ms of the fwd+grad kernel go?

Measures a ladder of stripped Pallas kernels at the bench shape:
  stream   — read S tiles, accumulate sum (HBM floor)
  matmul   — stream + the ElogS MXU matmul
  logpmf   — + the full NB log-pmf (no grads)
  fwdgrad  — the real single-pass loss+grads kernel
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

jax.config.update("jax_compilation_cache_dir", "/tmp/velocycle_tpu_cc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.experimental.pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from velocycle_tpu.ops.nb_kernels import _nb_lp_and_grads, _nb_lp  # noqa: E402

Ng, Nc, Nh = 2048, 102400, 5
TG, TC = 64, 4096


def _mk(kernel, n_extra_outs=0):
    in_specs = [
        pl.BlockSpec((TG, TC), lambda i, j: (i, j)),
        pl.BlockSpec((TG, Nh), lambda i, j: (i, 0)),
        pl.BlockSpec((TC, Nh), lambda i, j: (j, 0)),
        pl.BlockSpec((TG, 1), lambda i, j: (i, 0)),
    ]
    out_specs = [pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                              memory_space=pltpu.SMEM)]
    out_shape = [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
    if n_extra_outs:
        out_specs.append(pl.BlockSpec((TG, Nh), lambda i, j: (i, 0)))
        out_shape.append(jax.ShapeDtypeStruct((Ng, Nh), jnp.float32))

    def run(S, nu, zeta, disp):
        return pl.pallas_call(
            kernel, grid=(Ng // TG, Nc // TC),
            in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024),
        )(S, nu, zeta, disp)

    return run


def k_stream(S_ref, nu_ref, zeta_ref, disp_ref, out_ref):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[0, 0] = 0.0

    # the nu term creates the carry dependence that stops XLA hoisting
    # the call out of the timing scan (costs 64x5 adds per step)
    out_ref[0, 0] += jnp.sum(S_ref[:].astype(jnp.float32)) + jnp.sum(
        nu_ref[:]
    )


def k_matmul(S_ref, nu_ref, zeta_ref, disp_ref, out_ref):
    i, j = pl.program_id(0), pl.program_id(1)
    elog = jnp.dot(nu_ref[:], zeta_ref[:].T,
                   preferred_element_type=jnp.float32)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += jnp.sum(S_ref[:].astype(jnp.float32) * elog)


def k_logpmf(S_ref, nu_ref, zeta_ref, disp_ref, out_ref):
    i, j = pl.program_id(0), pl.program_id(1)
    elog = jnp.dot(nu_ref[:], zeta_ref[:].T,
                   preferred_element_type=jnp.float32)
    r = disp_ref[:]
    lp = _nb_lp(S_ref[:].astype(jnp.float32), elog, 1.0 / r, jnp.log(r),
                skip_lgamma_k=True)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += jnp.sum(lp)


def k_fwdgrad(S_ref, nu_ref, zeta_ref, disp_ref, out_ref, dnu_ref):
    i, j = pl.program_id(0), pl.program_id(1)
    elog = jnp.dot(nu_ref[:], zeta_ref[:].T,
                   preferred_element_type=jnp.float32)
    r = disp_ref[:]
    lp, g_elog, g_r = _nb_lp_and_grads(
        S_ref[:].astype(jnp.float32), 1.0 / r, jnp.log(r), elog, True)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += jnp.sum(lp)

    @pl.when(j == 0)
    def _():
        dnu_ref[:] = jnp.zeros_like(dnu_ref)

    dnu_ref[:] += jnp.dot(g_elog, zeta_ref[:],
                          preferred_element_type=jnp.float32)


NH8 = 8
N_G, N_C = Ng // TG, Nc // TC


def _mk_variant(kernel, gene_parts=True, cell_parts=True):
    """Cell-major grid like the real fwdgrad kernel, with selectable
    output groups."""
    in_specs = [
        pl.BlockSpec((TG, TC), lambda j, i: (i, j)),
        pl.BlockSpec((TG, Nh), lambda j, i: (i, 0)),
        pl.BlockSpec((TC, Nh), lambda j, i: (j, 0)),
        pl.BlockSpec((1, TC), lambda j, i: (0, j)),
        pl.BlockSpec((TG, 1), lambda j, i: (i, 0)),
    ]
    out_specs = [pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                              memory_space=pltpu.SMEM)]
    out_shape = [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
    if gene_parts:
        out_specs += [
            pl.BlockSpec((TG, Nh), lambda j, i: (j * N_G + i, 0)),
            pl.BlockSpec((TG, 1), lambda j, i: (j * N_G + i, 0)),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((N_C * Ng, Nh), jnp.float32),
            jax.ShapeDtypeStruct((N_C * Ng, 1), jnp.float32),
        ]
    if cell_parts:
        out_specs += [
            pl.BlockSpec((NH8, TC), lambda j, i: (0, j)),
            pl.BlockSpec((8, TC), lambda j, i: (0, j)),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((NH8, Nc), jnp.float32),
            jax.ShapeDtypeStruct((8, Nc), jnp.float32),
        ]

    def run(S, nu, zeta, cf, disp):
        return pl.pallas_call(
            kernel, grid=(N_C, N_G),
            in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024),
        )(S, nu, zeta, cf, disp)

    return run


def _variant_kernel(want_dig, gene_parts, cell_parts, *refs):
    idx = 5
    S_ref, nu_ref, zeta_ref, cf_ref, disp_ref = refs[:idx]
    outs = refs[idx:]
    out_ref = outs[0]
    p = 1
    if gene_parts:
        dnuP_ref, ddispP_ref = outs[p:p + 2]
        p += 2
    if cell_parts:
        dzeta_ref, dcf_ref = outs[p:p + 2]

    cj, gi = pl.program_id(0), pl.program_id(1)
    elog = jnp.dot(nu_ref[:], zeta_ref[:].T,
                   preferred_element_type=jnp.float32) + cf_ref[:]
    r = disp_ref[:]
    k = S_ref[:].astype(jnp.float32)
    lp, g_elog, g_r = _nb_lp_and_grads(k, 1.0 / r, jnp.log(r), elog, True)

    @pl.when((gi == 0) & (cj == 0))
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += jnp.sum(lp)
    if gene_parts:
        dnuP_ref[:] = jnp.dot(g_elog, zeta_ref[:],
                              preferred_element_type=jnp.float32)
        if want_dig:
            ddispP_ref[:] = jnp.sum(g_r, axis=1, keepdims=True)
        else:
            ddispP_ref[:] = jnp.sum(g_elog, axis=1, keepdims=True)
    if cell_parts:
        @pl.when(gi == 0)
        def _():
            dzeta_ref[:] = jnp.zeros_like(dzeta_ref)
            dcf_ref[:] = jnp.zeros_like(dcf_ref)

        dzp = jnp.dot(nu_ref[:].T, g_elog,
                      preferred_element_type=jnp.float32)
        dzeta_ref[:] += jnp.concatenate(
            [dzp, jnp.zeros((NH8 - Nh, TC), jnp.float32)], axis=0)
        dcf_ref[:] += jnp.broadcast_to(
            jnp.sum(g_elog, axis=0, keepdims=True), (8, TC))


def k_vpu_only(nu_ref, zeta_ref, disp_ref, out_ref):
    """The _nb_lp math with synthetic counts derived from elog — no count
    stream at all.  If this runs at (logpmf - stream), DMA and VPU are
    not overlapping."""
    i, j = pl.program_id(0), pl.program_id(1)
    elog = jnp.dot(nu_ref[:], zeta_ref[:].T,
                   preferred_element_type=jnp.float32)
    r = disp_ref[:]
    k = jnp.floor(jnp.abs(elog) * 3.0)
    lp = _nb_lp(k, elog, 1.0 / r, jnp.log(r), skip_lgamma_k=True)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += jnp.sum(lp)


def run_vpu_only(nu, zeta, disp, n_it=25):
    in_specs = [
        pl.BlockSpec((TG, Nh), lambda i, j: (i, 0)),
        pl.BlockSpec((TC, Nh), lambda i, j: (j, 0)),
        pl.BlockSpec((TG, 1), lambda i, j: (i, 0)),
    ]

    def run(nu, zeta, disp):
        return pl.pallas_call(
            k_vpu_only, grid=(Ng // TG, Nc // TC),
            in_specs=in_specs,
            out_specs=[pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                    memory_space=pltpu.SMEM)],
            out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024),
        )(nu, zeta, disp)

    @jax.jit
    def loop(nu, zeta, disp):
        def body(nu, _):
            outs = run(nu, zeta, disp)
            return nu - 1e-30 * outs[0][0, 0], outs[0][0, 0]

        nu, losses = jax.lax.scan(body, nu, None, length=n_it)
        return losses[-1]

    jax.device_get(loop(nu, zeta, disp))
    t0 = time.perf_counter()
    jax.device_get(loop(nu, zeta, disp))
    return (time.perf_counter() - t0) / n_it * 1000


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    S = jnp.floor(jnp.exp(jax.random.normal(ks[0], (Ng, Nc)) * 0.8 + 1.0))
    dtype = jnp.int16 if "i16" in sys.argv else jnp.float32
    S = S.astype(dtype)
    nu = jax.random.normal(ks[2], (Ng, Nh)) * 0.5
    ang = jax.random.uniform(ks[3], (Nc,)) * 6.28
    zeta = jnp.stack([jnp.ones_like(ang), jnp.cos(ang), jnp.sin(ang),
                      jnp.cos(2 * ang), jnp.sin(2 * ang)], -1)
    disp = jnp.exp(jax.random.normal(ks[5], (Ng,)) * 0.3).reshape(-1, 1)

    cf = jax.random.normal(ks[4], (1, Nc)) * 0.2
    n_it = 25
    for name, kern, extra in [
        ("stream", k_stream, 0), ("matmul", k_matmul, 0),
        ("logpmf", k_logpmf, 0), ("fwdgrad", k_fwdgrad, 1),
    ]:
        run = _mk(kern, extra)

        @jax.jit
        def loop(S, nu, zeta, disp, run=run):
            # nu depends on the previous step's scalar output: sequential
            # dependence, no loop-invariant hoisting
            def body(nu, _):
                outs = run(S, nu, zeta, disp)
                return nu - 1e-30 * outs[0][0, 0], outs[0][0, 0]

            nu, losses = jax.lax.scan(body, nu, None, length=n_it)
            return losses[-1]

        jax.device_get(loop(S, nu, zeta, disp))
        t0 = time.perf_counter()
        jax.device_get(loop(S, nu, zeta, disp))
        dt = (time.perf_counter() - t0) / n_it
        print(f"{name:8s} {dt*1000:6.2f} ms/step", flush=True)

    print(f"vpu_only {run_vpu_only(nu, zeta, disp):6.2f} ms/step",
          flush=True)

    # nu is the scan carry and is updated from the kernel's dnu output, so
    # the kernel CANNOT be hoisted out of the loop (the first bisection
    # attempt accumulated only the scalar output — loop-invariant, hoisted,
    # and every 'variant' measured the ~26 ms relay dispatch / n_it).
    for name, want_dig, cell_parts in [
        ("v_full", True, True),
        ("v_nodig", False, True),
        ("v_nocell", True, False),
    ]:
        kern = functools.partial(
            _variant_kernel, want_dig, True, cell_parts)
        run = _mk_variant(kern, True, cell_parts)

        @jax.jit
        def loop(S, nu, zeta, cf, disp, run=run):
            def body(nu, _):
                outs = run(S, nu, zeta, cf, disp)
                dnu = outs[1].reshape(N_C, Ng, Nh).sum(0)
                return nu - 1e-12 * dnu, outs[0][0, 0]

            nu, losses = jax.lax.scan(body, nu, None, length=n_it)
            return losses[-1]

        jax.device_get(loop(S, nu, zeta, cf, disp))
        t0 = time.perf_counter()
        jax.device_get(loop(S, nu, zeta, cf, disp))
        dt = (time.perf_counter() - t0) / n_it
        print(f"{name:9s} {dt*1000:6.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
