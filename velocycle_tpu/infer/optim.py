"""Optimizers for SVI.

`clipped_adam` mirrors `pyro.optim.ClippedAdam` as used by all reference
tutorials (elementwise gradient clamp to [-clip_norm, clip_norm], Adam with
betas=(0.80, 0.99) in the notebooks, and multiplicative lr decay ``lrd`` per
step — `Tutorial_*_OneSample.ipynb` cell 27), built from optax primitives.
"""
from __future__ import annotations

import optax

__all__ = ["clipped_adam", "adam"]


def clipped_adam(lr=0.05, betas=(0.80, 0.99), eps=1e-8, clip_norm=10.0,
                 lrd=1.0):
    """ClippedAdam equivalent.

    Args:
      lr: base learning rate.
      betas: Adam (b1, b2).
      eps: Adam epsilon.
      clip_norm: elementwise clamp applied to raw gradients *before* the
        Adam moments (pyro ClippedAdam semantics).
      lrd: per-step multiplicative lr decay; effective lr at step t is
        ``lr * lrd**t``.  Tutorials use ``lrd = gamma ** (1 / num_steps)``.
    """
    return optax.chain(
        optax.clip(clip_norm),
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
        optax.scale_by_schedule(lambda t: -lr * (lrd ** t)),
    )


def adam(lr=1e-2, betas=(0.9, 0.999), eps=1e-8):
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
