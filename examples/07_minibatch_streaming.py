"""Minibatched + host-streamed SVI for beyond-HBM cell counts.

The reference is strictly full-batch — every step evaluates the entire
``Ng x Nc`` matrix on one device, so the largest fittable dataset is
whatever fits in device memory (`/root/reference/velocycle/
phase_inference_model.py:168-169`; the Stereo-seq notebook simply assumes
the matrix fits).  `infer.MinibatchSVI` removes that bound:

  * cells are split into equal blocks; one compiled step processes one
    block, with cell-local ELBO terms upweighted so every step is an
    unbiased full-ELBO gradient (exactness is tested in
    `tests/test_minibatch.py`);
  * per-cell variational params (``phixy_locs``) update block-coordinate
    style — only the visited block's rows move;
  * `fit_streamed` pulls blocks from HOST memory (numpy / np.memmap) with
    double-buffered device transfers: only ~2 blocks ever occupy HBM, so
    Nc is bounded by host storage, not device memory.

Run: python examples/07_minibatch_streaming.py
"""
import numpy as np
import jax

from velocycle_tpu import Cycle, Phases, preprocess_for_phase_estimation
from velocycle_tpu.infer import MinibatchSVI, iter_host_blocks
from velocycle_tpu.ops.circular import circular_corrcoef
from velocycle_tpu.simulate import simulate_data

from _smoke import sz

NC, NG, NBLK = sz(2000, 256), sz(120, 24), sz(8, 4)


def main():
    adata = simulate_data(Nc=NC, Ng=NG, omegas_to_test=(0.4,), seed=11)
    true_phis = np.asarray(adata.obs["simulated_phis"].values)

    rng = np.random.default_rng(0)
    true_nu = adata.uns["simulated_nu"]
    cycle = Cycle.from_array(
        (true_nu + rng.normal(0, 0.2, true_nu.shape)).T,
        np.full((3, NG), 0.5), list(adata.var.index),
    )
    phases = Phases.from_angles(
        true_phis + rng.normal(0, 0.5, NC), concentration=2.0,
        cell_names=list(adata.obs.index),
    )
    mp = preprocess_for_phase_estimation(
        adata, cycle, phases, n_harmonics=1, with_delta_nu=False,
    )

    # ---- on-device minibatch fit (blocks pre-split in HBM) --------------
    mb = MinibatchSVI(mp.model_fn, mp.guide_fn, num_blocks=NBLK, lr=0.05)
    state, losses = mb.fit(jax.random.PRNGKey(0), mp.data,
                           num_epochs=sz(150, 8))
    locs = np.asarray(mb.get_params(state)["phixy_locs"])
    cc = float(circular_corrcoef(
        np.arctan2(locs[:, 1], locs[:, 0]), true_phis
    ))
    print(f"on-device minibatch: {len(losses)} steps, "
          f"loss {losses[0]:.0f} -> {losses[-1]:.0f}, circ-corr {cc:.3f}")

    # ---- streamed fit: blocks live on the HOST until their step ---------
    # (stand-in for np.memmap over an on-disk Stereo-seq-scale matrix)
    S_host = np.asarray(mp.data.S)
    cf_host = np.asarray(mp.data.count_factor)
    pp_host = np.asarray(mp.data.phixy_prior)
    logS_host = np.asarray(mp.data.logS)
    Db_host = np.asarray(mp.data.Db)

    def factory():
        return iter_host_blocks(
            S_host, cf_host, pp_host, mp.data, NBLK,
            logS=logS_host, Db=Db_host,
        )

    mb2 = MinibatchSVI(mp.model_fn, mp.guide_fn, num_blocks=NBLK, lr=0.05)
    state2, losses2 = mb2.fit_streamed(
        jax.random.PRNGKey(0), mp.data, factory, num_epochs=sz(20, 3)
    )
    print(f"host-streamed: {len(losses2)} steps, "
          f"loss {losses2[0]:.0f} -> {losses2[-1]:.0f} "
          "(only ~2 blocks in HBM at any time)")


if __name__ == "__main__":
    main()
