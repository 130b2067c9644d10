"""Device mesh + sharding helpers.

The reference is single-process single-GPU (reference main.py:11; distributed
training is an unimplemented future direction, README.md:187). Here
parallelism is first-class: a 1-D 'data' mesh over all chips shards the ray
batch (rays are embarrassingly parallel); gradients ride ICI via the psum
XLA emits from shard_map. A 'model' axis can be added for tensor-parallel
wide MLPs but is unnecessary at reference scale (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a Mesh. Default: all local devices on one 'data' axis."""
    devices = devices if devices is not None else jax.devices()
    if mesh_shape is None:
        mesh_shape = (len(devices),)
    mesh_shape = tuple(int(s) for s in mesh_shape)
    if len(axis_names) < len(mesh_shape):
        axis_names = tuple(
            list(axis_names) + [f"axis{i}" for i in range(len(axis_names), len(mesh_shape))]
        )
    n = int(np.prod(mesh_shape))
    dev_array = np.asarray(devices[:n]).reshape(mesh_shape)
    return Mesh(dev_array, axis_names[: len(mesh_shape)])


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, x, axis: int = 0, mesh_axis: str = "data"):
    """Shard array ``x`` along ``axis`` over ``mesh_axis``."""
    spec = [None] * x.ndim
    spec[axis] = mesh_axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
