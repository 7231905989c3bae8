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


def fsdp_spec(shape, n: int, axis: str = "dp", min_size: int = 4096) -> P:
    """FSDP placement rule for one parameter leaf: shard the LARGEST dim
    divisible by the mesh-axis size ``n``; replicate leaves that are small
    (< ``min_size`` elements — biases, norms, counters: sharding them buys
    nothing and costs a collective) or have no divisible dim. Deterministic
    in the shape alone, so optimizer-state leaves land exactly like the
    params they mirror."""
    shape = tuple(int(s) for s in shape)
    size = 1
    for s in shape:
        size *= s
    if size < min_size:
        return P()
    dims = [d for d in range(len(shape)) if shape[d] % n == 0 and shape[d] >= n]
    if not dims:
        return P()
    d = max(dims, key=lambda i: shape[i])
    spec = [None] * len(shape)
    spec[d] = axis
    return P(*spec)


def shard_params_fsdp(tree, mesh: Mesh, axis: str = "dp", min_size: int = 4096):
    """ZeRO-style parameter sharding (beyond-reference; the reference's only
    parallelism is replicated-parameter DataParallel,
    modules/ar/utils/model.py:360-369): every large leaf is split over the
    ``axis`` mesh axis per :func:`fsdp_spec`, cutting per-device parameter +
    optimizer-state memory ~n_devices-fold. Under ``jit`` XLA's SPMD
    partitioner inserts the all-gather at each use and reduce-scatters the
    gradients — the scaling-book recipe: annotate shardings, let XLA place
    the collectives on ICI."""
    n = mesh.shape[axis]

    def place(x):
        spec = fsdp_spec(np.shape(x), n, axis, min_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)
