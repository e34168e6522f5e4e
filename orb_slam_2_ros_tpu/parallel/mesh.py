"""Mesh construction and canonical shardings for the SLAM map.

Axes (``MeshConfig``): ``kf`` partitions the keyframe/trajectory axis (the
SLAM analog of sequence/context parallelism, SURVEY.md §5.7) and ``mp``
partitions map points / observation edges (the data-parallel axis of BA).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_kf: int = 1, n_mp: int = None, devices=None) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    if n_mp is None:
        n_mp = len(devices) // n_kf
    assert n_kf * n_mp == len(devices), (n_kf, n_mp, len(devices))
    return Mesh(np.array(devices).reshape(n_kf, n_mp), ("kf", "mp"))


def edge_sharding(mesh: Mesh) -> NamedSharding:
    """Observation edges / map points: sharded over the mp axis."""
    return NamedSharding(mesh, P("mp"))


def kf_sharding(mesh: Mesh) -> NamedSharding:
    """Keyframe-pool rows: sharded over the kf axis."""
    return NamedSharding(mesh, P("kf"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
