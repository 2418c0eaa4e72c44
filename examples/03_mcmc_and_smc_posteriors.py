"""Full-posterior inference on the phase model with the MCMC and SMC
backends — capabilities beyond the SVI-only reference.

NUTS: multi-chain, dual-averaging warmup, split-Rhat diagnostics.
SMC: adaptive likelihood tempering with log-evidence estimate.
"""
import numpy as np
import jax

from velocycle_tpu import Cycle, Phases, preprocess_for_phase_estimation
from velocycle_tpu.infer import MCMC, SMC
from velocycle_tpu.simulate import simulate_data

NC, NG = 60, 20


def main():
    sim = simulate_data(Nc=NC, Ng=NG, seed=5)
    rng = np.random.default_rng(0)
    nu = sim.uns["simulated_nu"]
    cycle = Cycle.from_array(
        (nu + rng.normal(0, 0.2, nu.shape)).T, np.full((3, NG), 0.5),
        list(sim.var.index),
    )
    phases = Phases.from_angles(
        sim.obs["simulated_phis"].values, 2.0, list(sim.obs.index)
    )
    mp = preprocess_for_phase_estimation(
        sim, cycle, phases, n_harmonics=1, with_delta_nu=False,
    )

    def model():
        mp.model_fn(mp.data)

    # -- NUTS --------------------------------------------------------------
    mcmc = MCMC(model, kernel="nuts", num_warmup=400, num_samples=400,
                num_chains=4, max_depth=6, init_jitter=0.1)
    mcmc.run(jax.random.PRNGKey(0))
    summ = mcmc.summary()
    print(f"NUTS accept {mcmc.accept_rate():.2f}")
    print(f"  nu[0,0]: mean {summ['nu']['mean'][0]:.3f} "
          f"sd {summ['nu']['sd'][0]:.3f} rhat {summ['nu']['rhat'][0]:.3f}")
    phi_xy = mcmc.get_samples()["phi_xy"]         # (draws, Nc, 2)
    phi = np.arctan2(phi_xy[..., 1], phi_xy[..., 0])
    post_mean_phase = np.angle(np.exp(1j * phi).mean(0))
    cc = np.abs(np.exp(
        1j * (post_mean_phase - sim.obs["simulated_phis"].values)
    ).mean())
    print(f"  posterior-mean phase vs truth: circular corr {cc:.3f}")

    # -- SMC ---------------------------------------------------------------
    smc = SMC(model, num_particles=512, num_moves=3, max_stages=100)
    smc.run(jax.random.PRNGKey(1))
    print(f"SMC: {len(smc.temperature_schedule)} tempering stages, "
          f"logZ {smc.log_evidence():.1f}")
    s = smc.get_samples()
    print(f"  nu[0,0] particle mean {s['nu'][:, 0, 0].mean():.3f}")


if __name__ == "__main__":
    main()
