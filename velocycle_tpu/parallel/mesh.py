"""Device mesh construction.

The framework's scaling axis is **cells** (SURVEY.md §5.7: the reference's
"long context" = many cells, plate dim -1), with a second optional axis for
MCMC chains / SMC particles.  The mesh rides ICI within a slice; on
multi-host pods call `jax.distributed.initialize()` before `make_mesh`.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "local_mesh"]


def make_mesh(axis_names=("cells",), shape=None, devices=None):
    """Build a named `Mesh` over the available devices.

    Args:
      axis_names: mesh axis names; default a 1-D ("cells",) mesh.
      shape: per-axis sizes; default puts all devices on the first axis.
      devices: explicit device list (default `jax.devices()`).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def local_mesh(n=None, axis_names=("cells",)):
    """Mesh over the first ``n`` local devices (all by default)."""
    devices = jax.devices()[: n or len(jax.devices())]
    return make_mesh(axis_names, devices=devices)
