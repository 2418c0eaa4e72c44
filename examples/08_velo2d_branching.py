"""2-D branching-manifold workflow (mirrors
`tutorials/VeloCycle_2D/Velocity_Simulation_2D.ipynb` +
`run_simulations.py`): simulate a Y-shaped trajectory with a spline
velocity field, two-stage fit, correlations vs ground truth.
"""
import jax

import numpy as np

from _smoke import sz
import _figs
from velocycle_tpu.twodim import (
    evaluate_fit, generate_adata, prepare_data, train_velo2d,
)


def main():
    adata = generate_adata(n_cells=sz(400, 96), n_genes=sz(48, 12), seed=0)
    pd = prepare_data(adata)
    results, losses_s, losses_u = train_velo2d(
        pd, n_steps_s=sz(800, 30), n_steps_u=sz(800, 30),
        key=jax.random.PRNGKey(0)
    )
    print(f"stage S ELBO {losses_s[0]:.0f} -> {losses_s[-1]:.0f}")
    print(f"stage U ELBO {losses_u[0]:.0f} -> {losses_u[-1]:.0f}")
    corrs = evaluate_fit(adata, results)
    for k, v in corrs.items():
        print(f"  corr[{k}] = {v:.3f}")
    _figs.fig_quiver2d(
        adata.obs["cell_x"].values, adata.obs["cell_y"].values,
        results["omega"],
        np.stack([adata.obs["omega_x"].values,
                  adata.obs["omega_y"].values]),
        "velo2d_quiver.png",
    )


if __name__ == "__main__":
    main()
