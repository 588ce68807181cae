"""Device-mesh construction and sharding helpers.

The reference has no distributed support at all (SURVEY §2.6); these are the
TPU-native additions: a 1-D (or 2-D data×model) mesh over whatever chips are
visible, NamedShardings for the canonical layouts, and helpers to place
arrays.  Scaling is pure XLA: annotate shardings, ``jit``, and the compiler
inserts ICI collectives (psum for data-parallel gradients).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` visible devices.

    Default: 1-D 'data' axis over all devices.  Pass ``axis_names=('data',
    'model')`` with a ``shape`` for 2-D layouts (ensemble × batch)."""
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    if n > len(devices):
        raise ValueError(f"requested {n} devices, only {len(devices)} visible")
    devs = np.array(devices[:n])
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("multi-axis mesh needs an explicit shape")
    return Mesh(devs.reshape(tuple(shape)), tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Rows sharded over ``axis``, features replicated."""
    return NamedSharding(mesh, P(axis, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays, axis: str = "data"):
    """Place arrays with their leading dim sharded over the mesh axis.
    Pads nothing — callers must make N divisible by the axis size."""
    sh = batch_sharding(mesh, axis)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def pad_to_multiple(array: np.ndarray, multiple: int, axis: int = 0):
    """Pad (with edge rows) so shape[axis] % multiple == 0; returns
    (padded, original_length)."""
    n = array.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return array, n
    pad_width = [(0, 0)] * array.ndim
    pad_width[axis] = (0, rem)
    return np.pad(np.asarray(array), pad_width, mode="edge"), n
