"""Tile/dtype ladder for the fused phase fwd+grad kernel on TPU.

Usage: python tools/kernel_ladder.py [phase|velo] [tiles...]
Measures ms/step of loss+all-grads at the Stereo-seq bench shape
(2048 x 102400) across count dtypes and tile configurations.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

jax.config.update("jax_compilation_cache_dir", "/tmp/velocycle_tpu_cc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def measure_phase(tg, tc, dtype, n_it=25):
    from jax.scipy.special import gammaln

    from velocycle_tpu.ops import nb_kernels as K

    K.TILE_G, K.TILE_C = tg, tc
    Ng, Nc, Nh = 2048, 102400, 5
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    S = jnp.floor(jnp.exp(jax.random.normal(ks[0], (Ng, Nc)) * 0.8 + 1.0))
    lgk = jax.jit(lambda s: gammaln(s + 1.0).sum())(S)
    S = S.astype(dtype)
    nu0 = jax.random.normal(ks[2], (Ng, Nh)) * 0.5
    ang = jax.random.uniform(ks[3], (Nc,)) * 6.28
    zeta = jnp.stack([jnp.ones_like(ang), jnp.cos(ang), jnp.sin(ang),
                      jnp.cos(2 * ang), jnp.sin(2 * ang)], -1)
    cf = jax.random.normal(ks[4], (Nc,)) * 0.2
    disp = jnp.exp(jax.random.normal(ks[5], (Ng,)) * 0.3)

    @jax.jit
    def loop(nu, S, lgk):
        def body(nu, _):
            loss, g = jax.value_and_grad(lambda nu: K.nb_loglik_fused(
                S, nu, zeta, cf, disp, lgamma_k_sum=lgk))(nu)
            return nu - 1e-12 * g, loss

        nu, losses = jax.lax.scan(body, nu, None, length=n_it)
        return losses[-1]

    last = float(jax.device_get(loop(nu0, S, lgk)))
    t0 = time.perf_counter()
    jax.device_get(loop(nu0, S, lgk))
    dt = (time.perf_counter() - t0) / n_it
    return dt * 1000, last


def measure_velo(tg, tc, dtype, n_it=25):
    from jax.scipy.special import gammaln

    from velocycle_tpu.ops import nb_kernels as K

    K.TILE_G, K.TILE_C_VELO = tg, tc
    Ng, Nc, Nh = 1024, 51200, 5
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    S = jnp.floor(jnp.exp(jax.random.normal(ks[0], (Ng, Nc)) * 0.8 + 1.0))
    U = jnp.floor(jnp.exp(jax.random.normal(ks[1], (Ng, Nc)) * 0.8 + 0.4))
    lgk = jax.jit(lambda s, u: gammaln(s + 1.0).sum()
                  + gammaln(u + 1.0).sum())(S, U)
    S, U = S.astype(dtype), U.astype(dtype)
    nu0 = jax.random.normal(ks[2], (Ng, Nh)) * 0.5
    ang = jax.random.uniform(ks[3], (Nc,)) * 6.28
    zeta = jnp.stack([jnp.ones_like(ang), jnp.cos(ang), jnp.sin(ang),
                      jnp.cos(2 * ang), jnp.sin(2 * ang)], -1)
    zdphi = jnp.stack([jnp.zeros_like(ang), -jnp.sin(ang), jnp.cos(ang),
                       -2 * jnp.sin(2 * ang), 2 * jnp.cos(2 * ang)], -1)
    cf = jax.random.normal(ks[4], (Nc,)) * 0.2
    disp = jnp.exp(jax.random.normal(ks[5], (Ng,)) * 0.3)
    om = jnp.exp(jax.random.normal(ks[6], (Nc,)) * 0.2 - 1.0)
    lb = jax.random.normal(ks[7], (Ng,)) * 0.2
    lg = jax.random.normal(ks[8], (Ng,)) * 0.2

    @jax.jit
    def loop(nu, S, U, lgk):
        def body(nu, _):
            loss, g = jax.value_and_grad(lambda nu: K.nbsu_loglik_fused(
                S, U, nu, zeta, zdphi, cf, om, lb, lg, disp,
                lgamma_k_sum=lgk))(nu)
            return nu - 1e-12 * g, loss

        nu, losses = jax.lax.scan(body, nu, None, length=n_it)
        return losses[-1]

    last = float(jax.device_get(loop(nu0, S, U, lgk)))
    t0 = time.perf_counter()
    jax.device_get(loop(nu0, S, U, lgk))
    dt = (time.perf_counter() - t0) / n_it
    return dt * 1000, last


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "phase"
    configs = sys.argv[2:] or ["64x4096xi16", "64x4096xf32"]
    fn = measure_phase if kind == "phase" else measure_velo
    for cfg in configs:
        tg, tc, dt_name = cfg.split("x")
        dtype = {"i16": jnp.int16, "i8": jnp.int8,
                 "f32": jnp.float32, "bf16": jnp.bfloat16}[dt_name]
        ms, loss = fn(int(tg), int(tc), dtype)
        print(f"{kind} tg={tg} tc={tc} {dt_name}: {ms:.2f} ms/step "
              f"(loss {loss:.1f})", flush=True)


if __name__ == "__main__":
    main()
