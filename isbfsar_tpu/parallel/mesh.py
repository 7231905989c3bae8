"""Device mesh + sharding helpers.

The reference's only parallelism is ``torch.nn.DataParallel`` over 4 GPUs
for the RGB extractor (reference modules/ar/utils/model.py:360-369,
enabled train.py:54-56) plus DataLoader worker processes. The TPU-native
equivalent is SPMD over a ``jax.sharding.Mesh``: batches sharded on a
``dp`` axis, parameters replicated, XLA inserting the gradient psum over
ICI automatically. These helpers centralize the mesh/sharding choices so
the trainer, bench and dry-run paths agree.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(shape: Tuple[int, int], axes: Tuple[str, str] = ("dp", "way")) -> Mesh:
    """2D mesh for composed shardings (e.g. streams x support classes —
    docs/SCALING.md "Composition"). shape = devices per axis."""
    n = shape[0] * shape[1]
    devices = np.asarray(jax.devices()[:n]).reshape(shape)
    return Mesh(devices, axes)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Place a host pytree with every leaf sharded over its leading axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)
