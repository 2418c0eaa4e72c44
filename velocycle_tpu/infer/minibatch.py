"""Minibatched / streaming SVI over cell blocks.

The reference is strictly full-batch: every SVI step evaluates the entire
``Ng x Nc`` matrix on one device (`/root/reference/velocycle/
phase_inference_model.py:168-169`), so the largest fittable dataset is
bounded by device memory.  This module removes that bound, TPU-style:

  * Cells are partitioned into ``num_blocks`` equal, contiguous blocks.
    One jitted ``update_block`` step evaluates one block — same compiled
    program for every block (static block shapes).
  * **Unbiasedness**: cell-local terms (the likelihood and the per-cell
    ``phi_xy``/``phi`` latents, prior and guide sides) are upweighted by
    ``num_blocks`` via `handlers.scale`; gene-global terms (``nu``,
    ``shape_inv``, kinetics, ...) enter once per step unscaled.  The
    average of block losses over one epoch equals the full-batch ELBO for
    fixed parameters (`tests/test_minibatch.py` verifies this to float
    tolerance), so gradients are unbiased full-ELBO estimates.
  * **Block-masked ClippedAdam**: per-cell parameter rows (``phixy_locs``/
    ``phi_locs``) update — moments included — only when their block is
    visited, exact block-coordinate semantics; global params update every
    step.  Hyperparameters match `optim.clipped_adam` (elementwise clip,
    betas, multiplicative ``lrd`` decay).
  * **Streaming**: `fit_streamed` takes a host-side block iterator
    (numpy / memory-mapped arrays) and double-buffers device transfers, so
    the dataset never needs to fit in HBM — only two blocks do.  The
    on-device path (`fit`) pre-splits once and scans the blocks.

Not supported: the LBA mixture model — its per-gene ``logsumexp`` over the
full cell axis does not decompose across blocks (`models/phase.py:
phase_model_lba`); `MinibatchSVI` raises if it sees an ``S_mixture`` site.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import handlers
from .elbo import Trace_ELBO
from .svi import init_params, constrain

__all__ = ["MinibatchSVI", "split_cells", "iter_host_blocks",
           "init_template"]

# model sites whose log-prob is a sum of per-cell terms: the data
# likelihoods and the per-cell manifold-coordinate latent.  Everything else
# (gene-global latents) stays unscaled.
LOCAL_SITES = frozenset(
    {"phi_xy", "phi", "S", "U", "logS", "logU", "S_fused", "SU_fused"}
)

# data-container fields with a cell axis (mirrors parallel.sharding)
_PHASE_CELL_AXES = {
    "S": 1, "logS": 1, "count_factor": 0, "phixy_prior": 0, "Db": 1,
    "phi_prior": 0,
}
_VELOCITY_CELL_AXES = {
    "S": 1, "U": 1, "logS": 1, "logU": 1, "count_factor": 0,
    "phixy_prior": 0, "Db": 1, "D": 1, "phi_prior": 0,
}
# variational params with a cell axis (axis index)
_PARAM_CELL_AXES = {"phixy_locs": 0, "phi_locs": 0}


def _cell_axes_for(data):
    return _VELOCITY_CELL_AXES if hasattr(data, "U") else _PHASE_CELL_AXES


def _block_lgamma_sum(data, blocks):
    """Per-block ``sum(lgamma(K + 1))`` dataset constants (fused-kernel
    shortcut), recomputed because the full-data scalar is not block-
    decomposable into the container's single field."""
    from jax.scipy.special import gammaln

    if getattr(data, "lgamma_k_sum", None) is None:
        return [None] * len(blocks)

    @jax.jit
    def _sums(S):
        return gammaln(S + 1.0).sum()

    out = []
    for b in blocks:
        total = _sums(b.S)
        if hasattr(b, "U"):
            total = total + _sums(b.U)
        out.append(total)
    return out


def split_cells(data, num_blocks):
    """Partition a PhaseData/VelocityData into ``num_blocks`` equal blocks
    along the cell axis.  ``Nc`` must be divisible by ``num_blocks`` (pad or
    subset upstream otherwise — unequal blocks would force one recompile
    per distinct shape)."""
    Nc = data.Nc
    if Nc % num_blocks:
        raise ValueError(
            f"Nc={Nc} not divisible by num_blocks={num_blocks}; pad or "
            "subset cells upstream so every block compiles to one program"
        )
    B = Nc // num_blocks
    axes = _cell_axes_for(data)
    blocks = []
    for i in range(num_blocks):
        fields = {}
        for name in data.__dataclass_fields__:
            field = data.__dataclass_fields__[name]
            leaf = getattr(data, name)
            if field.metadata.get("pytree_node", True) is False:
                continue
            ax = axes.get(name)
            if ax is None or leaf is None or getattr(leaf, "ndim", 0) <= ax:
                fields[name] = leaf
            else:
                fields[name] = jax.lax.slice_in_dim(
                    leaf, i * B, (i + 1) * B, axis=ax
                )
        blocks.append(dataclasses.replace(data, **fields, Nc=B))
    # flax.struct dataclasses are frozen; rebuild with per-block constants
    lgs = _block_lgamma_sum(data, blocks)
    return [
        dataclasses.replace(b, lgamma_k_sum=lg) for b, lg in zip(blocks, lgs)
    ]


def iter_host_blocks(S, count_factor, phixy_prior, template, num_blocks,
                     U=None, logS=None, logU=None, Db=None, D=None,
                     phi_prior=None):
    """Yield ``(block_idx, block_data)`` with HOST-side arrays (numpy or
    memory-mapped), for `MinibatchSVI.fit_streamed`.  ``template`` is a
    PhaseData/VelocityData carrying priors + static config; its cell-axis
    fields are replaced per block.  Nothing here touches the device — the
    streamed fit owns the transfers."""
    from jax.scipy.special import gammaln

    Nc = S.shape[1]
    if Nc % num_blocks:
        raise ValueError(f"Nc={Nc} not divisible by num_blocks={num_blocks}")
    B = Nc // num_blocks
    want_lgamma = getattr(template, "lgamma_k_sum", None) is not None
    is_velo = hasattr(template, "U")
    for i in range(num_blocks):
        sl = slice(i * B, (i + 1) * B)
        fields = dict(
            S=S[:, sl],
            count_factor=(
                count_factor[sl]
                if getattr(count_factor, "ndim", 0) else count_factor
            ),
            phixy_prior=phixy_prior[sl],
            Nc=B,
        )
        if logS is not None:
            fields["logS"] = logS[:, sl]
        if Db is not None:
            fields["Db"] = Db[:, sl]
        if phi_prior is not None:
            fields["phi_prior"] = phi_prior[sl]
        if is_velo:
            fields["U"] = U[:, sl]
            if logU is not None:
                fields["logU"] = logU[:, sl]
            if D is not None:
                fields["D"] = D[:, sl]
        if want_lgamma:
            lg = np.sum(gammaln(np.asarray(fields["S"], np.float64) + 1.0))
            if is_velo:
                lg += np.sum(
                    gammaln(np.asarray(fields["U"], np.float64) + 1.0)
                )
            fields["lgamma_k_sum"] = jnp.asarray(lg, jnp.float32)
        yield i, dataclasses.replace(template, **fields)


def init_template(template, Nc, phixy_prior, count_factor=None, Db=None,
                  phi_prior=None, D=None):
    """Build a full-``Nc`` container for `MinibatchSVI.init` WITHOUT the
    count matrices ever entering HBM.

    For a streamed fit, param init only needs (a) the gene-side priors and
    static config — taken from ``template``, which can be a single host
    block from `iter_host_blocks` — and (b) the full-length per-cell prior
    fields, passed as host numpy arrays.  The S/logS (and U/logU) fields
    are replaced by zero-strided numpy broadcasts: zero bytes allocated,
    and the guide's init path never reads them.

    Returns a PhaseData/VelocityData suitable as the ``data`` argument of
    `MinibatchSVI.fit_streamed`.
    """
    Ng = template.Ng
    zeros_gc = np.broadcast_to(np.float32(0.0), (Ng, Nc))
    fields = dict(S=zeros_gc, Nc=Nc, phixy_prior=np.asarray(phixy_prior))
    if getattr(template, "logS", None) is not None:
        fields["logS"] = zeros_gc
    if count_factor is not None:
        fields["count_factor"] = np.asarray(count_factor)
    else:
        fields["count_factor"] = np.broadcast_to(np.float32(0.0), (Nc,))
    if Db is not None:
        fields["Db"] = np.asarray(Db)
    elif getattr(template, "Db", None) is not None:
        fields["Db"] = np.broadcast_to(
            np.float32(1.0), (template.Db.shape[0], Nc)
        )
    if phi_prior is not None:
        fields["phi_prior"] = np.asarray(phi_prior)
    if hasattr(template, "U"):
        fields["U"] = zeros_gc
        if getattr(template, "logU", None) is not None:
            fields["logU"] = zeros_gc
        if D is not None:
            fields["D"] = np.asarray(D)
        elif getattr(template, "D", None) is not None:
            fields["D"] = np.broadcast_to(
                np.float32(1.0), (template.D.shape[0], Nc)
            )
    return dataclasses.replace(template, **fields)


class MinibatchState:
    """Pytree: (step, params, adam mu, adam nu, visit counts, key).

    ``counts`` holds per-parameter Adam visit counters: scalar for global
    params, per-row (full param shape) for cell-axis params, so bias
    correction and lrd decay run on each row's OWN visit count — a masked
    row visited for the first time at global step 8 must be bias-corrected
    with c=1, not c=8 (exact block-coordinate Adam semantics).
    """

    def __init__(self, step, params, mu, nu, counts, key):
        self.step = step
        self.params = params
        self.mu = mu
        self.nu = nu
        self.counts = counts
        self.key = key

    def tree_flatten(self):
        return (self.step, self.params, self.mu, self.nu, self.counts,
                self.key), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    MinibatchState, MinibatchState.tree_flatten, MinibatchState.tree_unflatten
)


class MinibatchSVI:
    """Blockwise SVI: unbiased full-ELBO gradients from one cell block per
    step.  See module docstring for the estimator and optimizer semantics.

    Args:
      model, guide: the usual program pair (phase or velocity family).
      num_blocks: cell-block count; ``Nc % num_blocks == 0``.
      lr, betas, eps, clip_norm, lrd: ClippedAdam hyperparameters
        (`optim.clipped_adam` / pyro ``ClippedAdam`` semantics).
      local_sites: override the cell-local site set (default
        ``LOCAL_SITES``).
      cell_param_axes: override {param_name: cell axis} for per-cell
        variational parameters (default ``phixy_locs``/``phi_locs``).
    """

    def __init__(self, model, guide, num_blocks, lr=0.05, betas=(0.80, 0.99),
                 eps=1e-8, clip_norm=10.0, lrd=1.0, loss=None,
                 local_sites=None, cell_param_axes=None):
        self.model = model
        self.guide = guide
        self.num_blocks = num_blocks
        self.lr, self.betas, self.eps = lr, betas, eps
        self.clip_norm, self.lrd = clip_norm, lrd
        self.loss = loss if loss is not None else Trace_ELBO()
        self.local_sites = frozenset(local_sites or LOCAL_SITES)
        self.cell_param_axes = dict(cell_param_axes or _PARAM_CELL_AXES)
        self.constraints = None
        self.block_size = None

    # -- setup --------------------------------------------------------------
    def init(self, key, data):
        """Initialize FULL-size params from the full dataset (per-cell param
        rows cover all Nc cells; each block step touches its slice)."""
        if data.Nc % self.num_blocks:
            raise ValueError(
                f"Nc={data.Nc} not divisible by num_blocks={self.num_blocks}"
            )
        if getattr(data, "gene_selection_model", "all") == "lba":
            raise ValueError(
                "MinibatchSVI does not support the LBA mixture model: its "
                "per-gene logsumexp over all cells does not decompose "
                "across cell blocks (models/phase.py phase_model_lba)"
            )
        self.block_size = data.Nc // self.num_blocks
        self._warn_nonlocal_cell_sites(data)
        key_init, key_state = jax.random.split(key)
        params, self.constraints = init_params(self.guide, key_init, data)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        counts = {
            name: jnp.zeros(
                p.shape if name in self.cell_param_axes else (), jnp.int32
            )
            for name, p in params.items()
        }
        return MinibatchState(
            jnp.zeros((), jnp.int32), params,
            zeros, jax.tree_util.tree_map(jnp.zeros_like, params),
            counts, key_state,
        )

    def _warn_nonlocal_cell_sites(self, data):
        """Guard the unbiasedness contract: any sample site whose log-prob
        carries a cell axis but is NOT in ``local_sites`` would make the
        scaled-block objective a biased full-ELBO estimate (its prior/
        entropy terms get counted once per step instead of once per epoch).
        Shape-only check via eval_shape — no FLOPs, runs once at init."""
        import warnings

        Nc = int(data.Nc)
        if Nc <= 1:
            return

        def _lp_shapes(fn, d):
            tr = handlers.trace(
                handlers.seed(fn, jax.random.PRNGKey(0))
            ).get_trace(d)
            return {
                n: s["fn"].log_prob(s["value"])
                for n, s in tr.items() if s["type"] == "sample"
            }

        try:
            m_sh, g_sh = jax.eval_shape(
                lambda d: (_lp_shapes(self.model, d),
                           _lp_shapes(self.guide, d)), data
            )
        except Exception:
            return  # exotic models may not trace abstractly; skip the guard
        suspects = sorted(
            name
            for shapes in (m_sh, g_sh)
            for name, lp in shapes.items()
            if name not in self.local_sites and Nc in lp.shape
        )
        if suspects:
            warnings.warn(
                f"MinibatchSVI: sample site(s) {suspects} have a "
                f"cell-sized (Nc={Nc}) log-prob axis but are not in "
                "local_sites — the blockwise objective will be a BIASED "
                "full-ELBO estimate.  Pass local_sites={...} including "
                "them if they are per-cell sites.",
                stacklevel=3,
            )

    # -- one block step -----------------------------------------------------
    def _slice_cell_params(self, params, block_idx):
        B = self.block_size
        out = {}
        for name, v in params.items():
            ax = self.cell_param_axes.get(name)
            if ax is None:
                out[name] = v
            else:
                out[name] = jax.lax.dynamic_slice_in_dim(
                    v, block_idx * B, B, axis=ax
                )
        return out

    def _block_loss(self, params, key, block_idx, block_data):
        sliced = self._slice_cell_params(params, block_idx)
        constrained = constrain(sliced, self.constraints)
        is_local = self.local_sites.__contains__
        s = float(self.num_blocks)

        def scaled(fn):
            def wrapped(*a, **kw):
                with handlers.scale(scale_factor=s, site_filter=is_local):
                    return fn(*a, **kw)
            return wrapped

        guide = scaled(handlers.substitute(self.guide, data=constrained))
        model = scaled(handlers.substitute(self.model, data=constrained))
        return self.loss.loss(key, model, guide, block_data)

    def _adam(self, g, mu, nu, count):
        """One ClippedAdam step.  ``count`` is this parameter's visit
        counter AFTER the current visit — scalar for global params,
        elementwise (per cell row) for masked params, so bias correction
        and lrd decay see each row's own visit number."""
        b1, b2 = self.betas
        g = jnp.clip(g, -self.clip_norm, self.clip_norm)
        mu_n = b1 * mu + (1.0 - b1) * g
        nu_n = b2 * nu + (1.0 - b2) * g * g
        # rows outside the block carry count=0 pre-first-visit; clamp so
        # the (masked-out) lanes divide by (1-b^1), not by zero
        c = jnp.maximum(count.astype(jnp.float32), 1.0)
        mu_hat = mu_n / (1.0 - b1 ** c)
        nu_hat = nu_n / (1.0 - b2 ** c)
        lr_t = self.lr * self.lrd ** (c - 1.0)
        upd = -lr_t * mu_hat / (jnp.sqrt(nu_hat) + self.eps)
        return upd, mu_n, nu_n

    def _row_mask(self, shape, ax, block_idx):
        B = self.block_size
        idx = jax.lax.broadcasted_iota(jnp.int32, shape, ax)
        lo = block_idx * B
        return (idx >= lo) & (idx < lo + B)

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def update_block(self, state, block_idx, block_data):
        """One SVI step on one cell block; compiled once for all blocks."""
        key, sub = jax.random.split(state.key)
        loss, grads = jax.value_and_grad(self._block_loss)(
            state.params, sub, block_idx, block_data
        )
        count = state.step + 1
        params, mus, nus, counts = {}, {}, {}, {}
        for name, p in state.params.items():
            g, mu, nu = grads[name], state.mu[name], state.nu[name]
            ax = self.cell_param_axes.get(name)
            if ax is not None:
                # block-coordinate semantics: rows outside the block keep
                # their moments/counters and receive no update; visited
                # rows are bias-corrected with their OWN visit number
                m = self._row_mask(p.shape, ax, block_idx)
                cnt_n = state.counts[name] + m.astype(jnp.int32)
                upd, mu_n, nu_n = self._adam(g, mu, nu, cnt_n)
                upd = jnp.where(m, upd, 0.0)
                mu_n = jnp.where(m, mu_n, mu)
                nu_n = jnp.where(m, nu_n, nu)
            else:
                cnt_n = state.counts[name] + 1
                upd, mu_n, nu_n = self._adam(g, mu, nu, cnt_n)
            params[name] = p + upd
            mus[name], nus[name] = mu_n, nu_n
            counts[name] = cnt_n
        return MinibatchState(count, params, mus, nus, counts, key), loss

    # -- drivers ------------------------------------------------------------
    def get_params(self, state):
        return constrain(state.params, self.constraints)

    def fit(self, key, data, num_epochs, shuffle=True, callback=None):
        """On-device minibatch fit: pre-split blocks once, then loop.
        Returns (state, losses ndarray of shape (num_epochs*num_blocks,)).
        The block visit order is derived from ``key`` (fold_in), so
        different keys give different shuffles."""
        state = self.init(key, data)
        blocks = split_cells(data, self.num_blocks)
        rng = np.random.default_rng(int(jax.device_get(
            jax.random.randint(jax.random.fold_in(key, 0x5b),
                               (), 0, np.iinfo(np.int32).max)
        )))
        losses = []
        for epoch in range(num_epochs):
            order = (
                rng.permutation(self.num_blocks)
                if shuffle else np.arange(self.num_blocks)
            )
            for i in order:
                state, loss = self.update_block(
                    state, jnp.asarray(i, jnp.int32), blocks[int(i)]
                )
                losses.append(loss)
            if callback is not None:
                callback(epoch, state, losses[-1])
        return state, np.asarray(jax.device_get(jnp.stack(losses)))

    def fit_streamed(self, key, data, block_factory, num_epochs,
                     callback=None):
        """Beyond-HBM fit: ``block_factory()`` yields host-side
        ``(block_idx, block_data)`` (see `iter_host_blocks`); only the
        in-flight and prefetched blocks occupy device memory.  ``data`` is
        used for param init only — build it with `init_template` so the
        count matrices never land in HBM; it must be shaped with the FULL
        Nc so the per-cell params cover every cell.

        A factory taking one argument is called as ``block_factory(epoch)``
        so it can permute (or re-chunk) its block order per epoch; a
        zero-arg factory streams in its natural (e.g. sequential-disk)
        order every epoch."""
        import inspect

        takes_epoch = False
        try:
            takes_epoch = any(
                p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD,
                           p.VAR_POSITIONAL)
                for p in inspect.signature(
                    block_factory
                ).parameters.values()
            )  # keyword-only/**kwargs params cannot receive the epoch
        except (TypeError, ValueError):
            pass
        state = self.init(key, data)
        losses = []
        for epoch in range(num_epochs):
            it = iter(block_factory(epoch) if takes_epoch
                      else block_factory())
            nxt = next(it, None)
            staged = (
                None if nxt is None
                else (nxt[0], jax.device_put(nxt[1]))
            )
            while staged is not None:
                i, block = staged
                nxt = next(it, None)  # prefetch while the step runs
                staged = (
                    None if nxt is None
                    else (nxt[0], jax.device_put(nxt[1]))
                )
                state, loss = self.update_block(
                    state, jnp.asarray(i, jnp.int32), block
                )
                losses.append(loss)
            if callback is not None:
                callback(epoch, state, losses[-1])
        return state, np.asarray(jax.device_get(jnp.stack(losses)))
