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


def put_global(x, sharding: NamedSharding):
    """Place one host array under ``sharding`` — multi-controller-safe.

    Single-process meshes take the plain ``jax.device_put`` fast path. When
    the mesh spans multiple processes (the multi-host DCN topology,
    docs/SCALING.md "Topology notes"), ``jax.device_put`` of host data is
    not defined for non-addressable devices, so each process contributes
    only its own addressable shards via ``jax.make_array_from_callback`` —
    the caller passes the full (deterministically identical) host value and
    each host slices out what it owns locally, i.e. only the data a host's
    own devices consume ever crosses its process boundary."""
    if any(d.process_index != jax.process_index() for d in sharding.device_set):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])
    return jax.device_put(x, sharding)

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Place a host pytree with every leaf sharded over its leading axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: put_global(x, sh), batch)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(lambda x: put_global(x, replicated(mesh)), tree)


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
        return put_global(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)


# ------------------------------------------------------------ sequence par


def sp_batch_spec(key: str, ndim: int, dp_axis: str = "dp",
                  seq_axis: str = "sp") -> P:
    """Sequence-parallel placement for one episodic-batch leaf: the clip
    TIME axis shards over ``seq_axis`` on top of the usual leading-axis dp —
    support clips are (b, way, L, ...), query/unknown clips (b, L, ...),
    labels (b, ...). Keyed by the batch's top-level name because the time
    axis sits at a different rank under each."""
    if key == "support_set":
        dims = [dp_axis, None, seq_axis]
    elif key in ("target_set", "unknown_set"):
        dims = [dp_axis, seq_axis]
    else:
        dims = [dp_axis]
    dims = dims[:ndim] + [None] * (ndim - len(dims))
    return P(*dims)


def shard_batch_sp(batch, mesh: Mesh, dp_axis: str = "dp", seq_axis: str = "sp"):
    """Episodic-batch placement with the clip TIME axis additionally sharded
    over ``seq_axis`` (sequence parallelism): for a FIXED batch the rgb
    extractor's per-device conv FLOPs and activation bytes drop
    ~seq-axis-fold (each device embeds only its L/n slice of every clip's
    frames), and BatchNorm's batch-statistics reductions psum over BOTH
    axes — so the stats remain exactly the full-batch statistics
    (parity-certified by parallel/parity.py::sp_parity_check). XLA's SPMD
    partitioner derives every collective from these input placements —
    no model changes needed. Beyond-reference: the reference's only
    parallelism is DataParallel (modules/ar/utils/model.py:360-369)."""
    out = {}
    for key, sub in batch.items():
        def place(x, key=key):
            spec = sp_batch_spec(key, np.ndim(x), dp_axis, seq_axis)
            return put_global(x, NamedSharding(mesh, spec))

        out[key] = jax.tree.map(place, sub)
    return out


# --------------------------------------------------------------- tensor par

# Megatron-style tensor-parallel placement for the TRX-OS parameter tree,
# keyed by path SUFFIX so the optimizer state's gradient accumulators (same
# trailing path under the MultiSteps prefix) land exactly like the params
# they mirror. Each (column-parallel, row-parallel) pair keeps the
# intermediate activation feature-sharded and costs one psum at the pair's
# end; XLA's SPMD partitioner derives the collectives from these
# annotations (the scaling-book recipe — annotate, let XLA place psums on
# ICI). Pairings:
#   sk_extractor  fc1 (90->180) column  ->  fc2 (180->256) row
#   transformer   k_linear / v_linear (512->128) column: the attention
#                 einsums then contract over the sharded feature dim
#                 (scores, prototype-distance) -> psum per contraction
#   discriminator reduce (128->L) row (its input — the chosen class's
#                 tuple diffs — is already feature-sharded from v_linear),
#                 fc1 (T*L->256) column -> fc2 (256->64) row
# Anything unmatched (LayerNorms, fc3, ResNet trunk) stays replicated.
_TP_RULES: Tuple[Tuple[Tuple[str, ...], Tuple[Optional[int], ...]], ...] = (
    (("sk_extractor", "fc1", "kernel"), (None, 0)),
    (("sk_extractor", "fc1", "bias"), (0,)),
    (("sk_extractor", "fc2", "kernel"), (0, None)),
    (("transformer", "k_linear", "kernel"), (None, 0)),
    (("transformer", "k_linear", "bias"), (0,)),
    (("transformer", "v_linear", "kernel"), (None, 0)),
    (("transformer", "v_linear", "bias"), (0,)),
    (("discriminator", "reduce", "kernel"), (0, None)),
    (("discriminator", "fc1", "kernel"), (None, 0)),
    (("discriminator", "fc1", "bias"), (0,)),
    (("discriminator", "fc2", "kernel"), (0, None)),
)


def _path_names(path) -> Tuple[str, ...]:
    """jax key-path -> plain name tuple ('transformer', 'k_linear', 'kernel')."""
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        elif hasattr(k, "idx"):
            names.append(str(k.idx))
        else:
            names.append(str(k))
    return tuple(names)


def tp_spec(path_names: Tuple[str, ...], shape, n: int, axis: str = "tp") -> P:
    """Tensor-parallel placement for one leaf: the first ``_TP_RULES`` entry
    whose path is a suffix of ``path_names`` decides which dim shards over
    ``axis``; leaves with no rule — or whose target dim is not divisible by
    the mesh-axis size ``n`` (e.g. the 180-wide skeleton fc1 on tp=8) —
    replicate."""
    shape = tuple(int(s) for s in shape)
    for suffix, dims in _TP_RULES:
        if path_names[-len(suffix):] == suffix and len(dims) == len(shape):
            marked = [d for d, m in enumerate(dims) if m is not None]
            if not all(shape[d] % n == 0 and shape[d] >= n for d in marked):
                return P()
            spec = [None] * len(shape)
            for d in marked:
                spec[d] = axis
            return P(*spec)
    return P()


def shard_params_tp(tree, mesh: Mesh, axis: str = "tp"):
    """Tensor-parallel (Megatron-style) placement over the ``axis`` mesh axis
    per :func:`tp_spec` — weights STAY sharded through the compute (unlike
    FSDP's gather-at-use), so per-device FLOPs and activation bytes for the
    cross-transformer drop ~n-fold. Composes with dp on a 2D mesh
    (``make_mesh_2d((dp, tp), ("dp", "tp"))``); certified equivalent to the
    1-device step by parallel/parity.py::tp_parity_check. Beyond-reference:
    the reference's only parallelism is DataParallel
    (modules/ar/utils/model.py:360-369)."""
    n = mesh.shape[axis]

    def place(path, x):
        spec = tp_spec(_path_names(path), np.shape(x), n, axis)
        return put_global(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, tree)
