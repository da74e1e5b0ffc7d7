"""Device mesh construction for multi-chip scaling.

The reference's distributed story is NCCL DDP scaffolding that is never
actually exercised (SURVEY.md §2.12: the model is never wrapped in DDP).
The TPU-native equivalent: a 1-D `jax.sharding.Mesh` over the "dp" axis,
data-parallel over frame pairs, gradients reduced with `psum` over ICI —
see `dp.py`. The single-chip case (the reference's primary target: 10 GB,
`README.md:22`) is the mesh of size 1.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def batch_sharded(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(axis))


def shard_map_nocheck(f, mesh: Mesh, in_specs, out_specs):
    """`shard_map` with replication checking off, across the jax >= 0.8
    rename (`check_rep` -> `check_vma`) and the pre-0.8 experimental API."""
    try:
        from jax import shard_map as _sm

        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)
