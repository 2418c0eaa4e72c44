"""Fit drivers: the user-facing orchestration API.

`PhaseFitModel` / `VelocityFitModel` mirror the reference's de-facto API
(`/root/reference/velocycle/phase_inference_model.py:81-341`,
`velocity_inference_model.py:32-302`): construct with metaparameters and an
optional ``condition_on`` dict (stage-2 fits pin stage-1 posteriors), call
``.fit(...)``, read back posterior containers (`Cycle`, `Phases`,
`AngularSpeed`) and a posterior-sample dict.

TPU-first differences:
  * The SVI hot loop is `lax.scan`-compiled chunks — one XLA program per
    chunk, no per-step host sync (reference: Python loop + float() per
    step, `phase_inference_model.py:168-170`).
  * Posterior sampling is a single vmapped Predictive call; ``n_per_bin``
    only bounds device memory for very large models (the reference needs
    CPU round-trips per bin, `phase_inference_model.py:216-246`).
  * Explicit PRNG keys everywhere; fits are bit-reproducible.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .containers import AngularSpeed, Cycle, Phases
from .core import handlers
from .infer import SVI, Trace_ELBO, clipped_adam
from .infer.predictive import Predictive
from .models.basis import expression_basis, omega_basis

__all__ = ["PhaseFitModel", "VelocityFitModel"]


def _np(x):
    return np.asarray(jax.device_get(x))


def _phases_from_params(p, mp):
    """Posterior Phases from whichever phi parametrization the fit used:
    ``phixy_locs`` (fourier/S^1), ``phi_locs`` (spline/interval), or the
    prior unchanged when phi was conditioned."""
    cells = mp.phase_prior.phi_xy.columns
    if "phixy_locs" in p:
        return Phases.from_array(p["phixy_locs"].T, cell_names=cells)
    if "phi_locs" in p:
        return Phases.from_angles(
            np.asarray(p["phi_locs"]).reshape(-1), cell_names=cells
        )
    return mp.phase_prior.copy()


class _FitModel:
    """Shared conditioning / SVI / predictive machinery."""

    def __init__(self, metaparams, condition_on=None, early_exit=False,
                 get_posterior=True, num_samples=500, n_per_bin=500):
        self.metaparams = metaparams
        self.condition = dict(condition_on or {})
        self.condition_on = list(self.condition.keys())
        # shape_inv conditioned (the two-stage workflow) => its gradient
        # is discarded; compile the fused kernels without the digamma
        # chain (their most expensive gradient — ops/nb_kernels.py)
        if (
            "shape_inv" in self.condition
            and getattr(metaparams.data, "use_fused_nb", False)
            and getattr(metaparams.data, "disp_grad", True)
        ):
            self.metaparams = metaparams = dataclasses.replace(
                metaparams, data=metaparams.data.replace(disp_grad=False)
            )
        model, guide = metaparams.model_fn, metaparams.guide_fn
        if self.condition:
            model = handlers.condition(model, data=self.condition)
            guide = handlers.block(guide, hide=self.condition_on)
        self.model = model
        self.guide = guide
        self.early_exit = early_exit
        self.get_posterior = get_posterior
        self.num_samples = num_samples
        self.n_per_bin = n_per_bin
        self.posterior = None
        self.losses = None
        self.params = None
        self.state = None
        self.svi = None

    # -- fitting -----------------------------------------------------------
    def fit(self, optimizer=None, loss=None, num_steps=1000, key=None,
            log_every=0, verbose=False, callback=None,
            store_output=False, intermediate_output_step_size=100,
            store_num_samples=50, live_plot=False):
        """Run SVI and extract posterior estimates.

        Args:
          optimizer: optax transform; defaults to the reference's tutorial
            ClippedAdam schedule (lr 0.05, betas (0.80, 0.99), lrd decaying
            to 0.1x over ``num_steps``).
          loss: ELBO object (default `Trace_ELBO()`).
          num_steps: SVI steps.
          key: PRNG key (default PRNGKey(0)).
          store_output: capture intermediate posterior snapshots every
            ``intermediate_output_step_size`` steps into
            ``self.intermediate_output`` — the reference's mid-fit
            observability hook (`phase_inference_model.py:171-174`,
            `sample_posterior(num_samples=50)` per snapshot).  Snapshots
            happen at scanned-chunk boundaries, so the hot loop stays one
            XLA program per chunk.
          live_plot: redraw the live ELBO curve at every chunk boundary
            (`plots.live_plot`, for notebook use —
            `phase_inference_model.py:176-179`).
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        if optimizer is None:
            optimizer = clipped_adam(
                lr=0.05, betas=(0.80, 0.99),
                lrd=0.1 ** (1.0 / max(num_steps, 1)),
            )
        self.svi = SVI(self.model, self.guide, optimizer,
                       loss or Trace_ELBO())
        self.intermediate_output = []
        self._store_num_samples = store_num_samples
        loss_history = []
        chunk_size = None
        user_callback = callback
        if store_output or live_plot:
            chunk_size = min(intermediate_output_step_size, num_steps)

            def callback(step, state, last_loss, _user=user_callback):
                loss_history.append(float(last_loss))
                if store_output:
                    params = {
                        k: _np(v)
                        for k, v in self.svi.get_params(state).items()
                    }
                    self.intermediate_output.append(
                        self._snapshot_posterior(params, step)
                    )
                if live_plot:
                    from .plots import live_plot as _live_plot

                    _live_plot({"ELBO": loss_history})
                if _user is not None:
                    _user(step, state, last_loss)

        self.state, self.losses = self.svi.run(
            key, num_steps, self.metaparams.data,
            log_every=log_every if (log_every or verbose) else 0,
            early_exit=self.early_exit, callback=callback,
            chunk_size=chunk_size,
        )
        self.params = {
            k: _np(v) for k, v in self.svi.get_params(self.state).items()
        }
        self._extract()
        if self.get_posterior:
            self.posterior = self._build_posterior(
                key=jax.random.fold_in(key, 1)
            )
        return self

    def _extract(self):
        raise NotImplementedError

    def _posterior_sites(self):
        raise NotImplementedError

    # -- posterior ---------------------------------------------------------
    def sample_posterior(self, num_samples=1, rs=None, data=None, key=None,
                         params=None):
        """Draw guide->model replayed samples of the requested sites.

        Returns {site: (num_samples, ...) numpy array}.
        """
        if key is None:
            key = jax.random.PRNGKey(1)
        if data is None:
            data = self.metaparams.data
        if getattr(data, "use_fused_nb", False):
            # the fused-kernel fit path skips the ElogS/ElogU deterministic
            # sites; posterior sampling replays through the plain path so
            # every site the reference's Predictive exposes is present
            data = data.replace(use_fused_nb=False)
        if params is None:
            params = self.params
        constrained = {
            k: jnp.asarray(v) for k, v in (params or {}).items()
        }
        pred = Predictive(
            self.model, guide=self.guide, params=constrained,
            num_samples=num_samples, return_sites=rs,
        )
        out = pred(key, data)
        return {k: _np(v) for k, v in out.items()}

    def _snapshot_posterior(self, params, step):
        """One intermediate posterior snapshot (reference: 50 draws of the
        latent sites, `phase_inference_model.py:171-174`)."""
        sample_sites = [
            s for s in self._posterior_sites()
            if s not in ("ElogS", "ElogU")
        ]
        snap = self.sample_posterior(
            num_samples=getattr(self, "_store_num_samples", 50),
            rs=sample_sites,
            key=jax.random.PRNGKey(step), params=params,
        )
        snap["step"] = step
        return snap

    def _build_posterior(self, key):
        rs = self._posterior_sites()
        n = self.num_samples
        per = min(self.n_per_bin, n)
        chunks = []
        drawn = 0
        while drawn < n:
            take = min(per, n - drawn)
            chunks.append(
                self.sample_posterior(
                    num_samples=take, rs=rs,
                    key=jax.random.fold_in(key, drawn),
                )
            )
            drawn += take
        out = {
            k: np.concatenate([c[k] for c in chunks], axis=0)
            for k in chunks[0]
        }
        return out

    # -- debugging ---------------------------------------------------------
    def _format_shapes(self, fn):
        tr = handlers.trace(
            handlers.seed(fn, jax.random.PRNGKey(0))
        ).get_trace(self.metaparams.data)
        lines = []
        for name, site in tr.items():
            shape = tuple(np.shape(site["value"]))
            lines.append(f"{site['type']:>13} {name:<20} {shape}")
        return "\n".join(lines)

    def check_model(self, raise_on_error=False):
        """Print trace shapes and verify plate/log_prob shape consistency
        (`handlers.check_plate_shapes` — the runnable replacement for the
        reference's `format_shapes` dump, `plots.py:13-31`)."""
        print(self._format_shapes(self.model))
        return self._check_plates(self.model, raise_on_error)

    def check_guide(self, raise_on_error=False):
        print(self._format_shapes(self.guide))
        return self._check_plates(self.guide, raise_on_error)

    def _check_plates(self, fn, raise_on_error):
        problems = handlers.check_plate_shapes(fn, self.metaparams.data)
        for p in problems:
            print(f"PLATE CHECK: {p}")
        if problems and raise_on_error:
            raise ValueError("\n".join(problems))
        return problems


class PhaseFitModel(_FitModel):
    """Manifold-learning driver (`phase_inference_model.py:81-341`).

    After ``.fit()``:
      * ``cycle_fit``  — posterior `Cycle` (nu means/stds, NB dispersion)
      * ``phase_fit``  — posterior `Phases` (phi_xy point estimates)
      * ``posterior``  — sampled sites + recomputed ``ElogS``/``ElogS2``
    """

    def _extract(self):
        mp = self.metaparams
        p = self.params
        nu_locs = p["nu_locs"]          # (Ng, Nh)
        nu_scales = p["nu_scales"]
        cycle = Cycle.from_array(
            nu_locs.T, nu_scales.T, mp.cycle_prior.genes
        )
        if "shape_inv_locs" in p:
            cycle.set_disp(p["shape_inv_locs"])
        phases = _phases_from_params(p, mp)
        self.cycle_fit = cycle
        self.phase_fit = phases
        self.fourier_coef = nu_locs.T
        self.fourier_coef_sd = nu_scales.T
        self.phis_fit = phases.phi_xy_array.T
        self.disp = p.get("shape_inv_locs")
        self.delta_nus = p.get("delta_nu_locs")
        if mp.gene_selection_model == "lba":
            self.periodic_logits = p.get("logit_locs")
        # reference-compatible aliases
        self.cycle_pyro = cycle
        self.phase_pyro = phases

    def _posterior_sites(self):
        mp = self.metaparams
        rs = ["nu", "phi", "zeta"]
        if mp.basis_kind == "fourier":
            rs.insert(1, "phi_xy")
        if mp.noisemodel == "NegativeBinomial":
            rs.append("shape_inv")
        if mp.with_delta_nu and "delta_nu" not in self.condition_on:
            rs.append("delta_nu")
        if mp.gene_selection_model == "lba":
            rs += ["periodic", "periodic_prob"]
        rs = [s for s in rs if s not in self.condition_on]
        return rs

    def _build_posterior(self, key):
        out = super()._build_posterior(key)
        mp = self.metaparams
        # point-estimate ElogS with raw and averaged count factors
        # (`phase_inference_model.py:248-263`)
        nu = jnp.asarray(self.params["nu_locs"])
        phi = jnp.asarray(self.phase_fit.phis)
        zeta = expression_basis(mp.data, phi)
        base = nu @ zeta.T
        if mp.with_delta_nu and self.delta_nus is not None:
            base = base + jnp.einsum(
                "bg,bc->gc", jnp.asarray(self.delta_nus),
                jnp.asarray(mp.data.Db),
            )
        cf = jnp.asarray(mp.data.count_factor)
        out["ElogS"] = _np(base + cf[None, :])
        out["ElogS2"] = _np(base + jnp.mean(cf))
        if mp.gene_selection_model == "lba" and "periodic" in out:
            self.periodic = out["periodic"].mean(0)
        return out

    def polar_plot(self, **kwargs):
        from .plots import pplot

        return pplot(self, **kwargs)


class VelocityFitModel(_FitModel):
    """Velocity-learning driver (`velocity_inference_model.py:32-302`).

    After ``.fit()``:
      * ``cycle_fit`` — `Cycle` with ``log_gammas``/``log_betas``/``disp``
      * ``phase_fit`` — `Phases`
      * ``speed_fit`` — posterior `AngularSpeed` (condition-level omega
        Fourier coefficients)
    """

    def _extract(self):
        mp = self.metaparams
        p = self.params
        Ng, Nx, Nhw = mp.Ng, mp.Nx, mp.Nhw

        if mp.model_type == "lrmn":
            # the joint low-rank MVN packs [log_gamma (Ng), nu_omega
            # (Nx*Nhw)]; marginal stds come from W W^T + D diagonals
            loc = p["loc"]
            var = (p["cov_factor"] ** 2).sum(-1) + p["cov_diag"]
            sd = np.sqrt(var)
            log_gamma, log_gamma_sd = loc[:Ng], sd[:Ng]
            nuw = loc[Ng:].reshape(Nx, Nhw)
            nuw_sd = sd[Ng:].reshape(Nx, Nhw)
            self.rho_real = p.get("rho_real_loc")
        else:
            log_gamma = p["log_gamma_locs"]
            log_gamma_sd = p["log_gamma_scales"]
            nuw = p["nu_omega_locs"]
            nuw_sd = p["nu_omega_scales"]
            self.rho_real = None

        cycle = Cycle.from_array(
            p["nu_locs"].T, p["nu_scales"].T, mp.cycle_prior.genes
        )
        cycle.set_log_gammas(log_gamma)
        cycle.set_log_betas(p["log_beta_locs"])
        if "shape_inv_locs" in p:
            cycle.set_disp(p["shape_inv_locs"])
        self.cycle_fit = cycle
        self.log_gamma_sd = log_gamma_sd
        self.log_beta_sd = p.get("log_beta_scales")

        self.phase_fit = _phases_from_params(p, mp)
        self.speed_fit = AngularSpeed.from_array(
            nuw.T, nuw_sd.T,
            condition_names=mp.speed_prior.conditions,
            num_coeffs=Nhw,
        )
        self.delta_nus = p.get("delta_nu_locs")
        # reference-compatible aliases
        self.cycle_pyro = cycle
        self.phase_pyro = self.phase_fit
        self.speed_pyro = self.speed_fit

    def _posterior_sites(self):
        mp = self.metaparams
        rs = [
            "log_gamma", "log_beta", "nu_omega", "gamma", "nu",
            "phi", "zeta", "zeta_dphi", "zeta_omega", "omega",
            "ElogS", "ElogU",
        ]
        if mp.basis_kind == "fourier":
            rs.insert(5, "phi_xy")
        if mp.noisemodel == "NegativeBinomial":
            rs.append("shape_inv")
        if mp.with_delta_nu and "delta_nu" not in self.condition_on:
            rs.append("delta_nu")
        if mp.model_type == "lrmn":
            rs.append("rho_real")
        rs = [s for s in rs if s not in self.condition_on]
        return rs

    def period_hours(self, total_hours=None, n_grid=1000):
        """Cell-cycle period per condition: integral of 1/omega over the
        manifold (trapezoid), the statistic the tutorials compute via
        ``trapz(1/omega)`` (Tutorial_*_OneSample.ipynb cells 63-64)."""
        mp = self.metaparams
        if mp.basis_kind == "fourier":
            grid = np.linspace(0, 2 * np.pi, n_grid, endpoint=False)
        else:
            lo, hi = mp.spline_domain
            grid = np.linspace(lo, hi, n_grid)
        zeta_w = _np(omega_basis(mp.data, jnp.asarray(grid)))
        nuw = self.speed_fit.means_array  # (Nx, Nhw)
        omega = nuw @ zeta_w.T            # (Nx, n_grid)
        periods = np.trapezoid(1.0 / omega, grid, axis=-1)
        return periods
