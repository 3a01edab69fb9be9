"""Device mesh construction.

The reference is single-process/single-device (``vectorization.py:14`` picks
one cuda-or-cpu torch device; no collectives anywhere — SURVEY.md §2). Here
the corpus axis of the vector index and the batch axis of embedding/training
are sharded over a ``jax.sharding.Mesh``; XLA inserts ICI collectives.

Axis conventions used throughout the framework:
  "data"  — batch / query data-parallel axis
  "db"    — vector-database row axis (flat-scan sharding; top-k merged by
            all-gather, see parallel/sharded.py)
  "model" — tensor-parallel axis for encoder training (parallel/train.py)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_shapes: Optional[dict] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh over available devices.

    ``axis_shapes`` maps axis name -> size; a single ``-1`` entry is inferred.
    Default: all devices on one ``"db"`` axis (corpus sharding).
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_shapes is None:
        axis_shapes = {"db": len(devices)}
    names = tuple(axis_shapes)
    sizes = list(axis_shapes.values())
    if sizes.count(-1) > 1:
        raise ValueError("at most one axis may be -1")
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        if len(devices) % known:
            raise ValueError(f"{len(devices)} devices not divisible by {known}")
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh needs {total} devices, have {len(devices)}")
    grid = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(grid, names)


def single_device_mesh(axis: str = "db") -> Mesh:
    return make_mesh({axis: 1}, devices=jax.devices()[:1])


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
