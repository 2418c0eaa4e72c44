"""Training checkpoint / resume.

The reference persists only *results* (container CSVs, whole-fit pickles —
SURVEY.md §5.4); a crashed fit restarts from zero.  Here the full SVI state
(step, unconstrained params, optimizer moments, PRNG key) is a pytree, so
checkpointing is one orbax call — multi-host safe, async-capable — with a
numpy ``.npz`` fallback when orbax is unavailable.

Usage::

    ckpt = Checkpointer("/path/run1")
    ckpt.save(step, state)                     # during the fit
    state = ckpt.restore(svi_state_like=state) # resume

Container CSVs (Cycle/Phases/AngularSpeed `.save/.load`) remain the
interop format for fitted *results* — identical on-disk layout to the
reference for cross-validation.
"""
from __future__ import annotations

import os

import numpy as np
import jax

__all__ = ["Checkpointer", "save_state", "load_state"]


def _flatten_state(state):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save_state(path, state):
    """Pytree -> single .npz (host-side, synchronous)."""
    leaves, _ = _flatten_state(state)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(
        path,
        **{
            f"leaf_{i}": np.asarray(jax.device_get(leaf))
            for i, leaf in enumerate(leaves)
        },
    )


def load_state(path, state_like):
    """Restore into the structure of ``state_like``."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves, treedef = _flatten_state(state_like)
    new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


class Checkpointer:
    """Orbax-backed checkpoint manager with .npz fallback.

    Args:
      directory: checkpoint root.
      max_to_keep: retained checkpoints (orbax backend only).
    """

    def __init__(self, directory, max_to_keep=3, use_orbax=None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        if use_orbax is None:
            try:
                import orbax.checkpoint  # noqa: F401

                use_orbax = True
            except ImportError:
                use_orbax = False
        self.use_orbax = use_orbax
        if use_orbax:
            import orbax.checkpoint as ocp

            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=max_to_keep
                ),
            )

    def save(self, step, state):
        if self.use_orbax:
            import orbax.checkpoint as ocp

            self._mgr.save(
                int(step), args=ocp.args.StandardSave(
                    jax.device_get(state)
                )
            )
            self._mgr.wait_until_finished()
        else:
            save_state(
                os.path.join(self.directory, f"ckpt_{int(step)}.npz"),
                state,
            )

    def latest_step(self):
        if self.use_orbax:
            return self._mgr.latest_step()
        steps = [
            int(f[5:-4])
            for f in os.listdir(self.directory)
            if f.startswith("ckpt_") and f.endswith(".npz")
        ]
        return max(steps) if steps else None

    def restore(self, state_like, step=None):
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoints under {self.directory}"
            )
        if self.use_orbax:
            import orbax.checkpoint as ocp

            return self._mgr.restore(
                int(step),
                args=ocp.args.StandardRestore(jax.device_get(state_like)),
            )
        return load_state(
            os.path.join(self.directory, f"ckpt_{int(step)}.npz"),
            state_like,
        )
