"""Skeleton format registry.

Replaces the reference's pickled ``skeleton_types.pkl`` lookup
(reference modules/hpe/hpe.py:38-39, modules/ar/utils/dataloader.py:51-54)
with a pickle-free registry backed by ``isbfsar_tpu/assets/skeletons.npz``.

Each skeleton format selects a subset of the 122-joint MetrABS superset and
defines the bone edges used for visualization. The live pipeline uses
``smpl+head_30`` (30 joints, 29 edges).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, Tuple

import numpy as np

from isbfsar_tpu.configs import ASSETS_DIR


@dataclasses.dataclass(frozen=True)
class SkeletonSpec:
    name: str
    indices: Tuple[int, ...]  # joint selection out of the 122-joint superset
    edges: np.ndarray  # (n_edges, 2) int32
    joint_names: Tuple[str, ...]

    @property
    def n_joints(self) -> int:
        return len(self.indices)


def _decode_key(key: str) -> str:
    return key.replace("_plus_", "+")


@functools.lru_cache(maxsize=None)
def load_registry(path: str = "") -> Dict[str, SkeletonSpec]:
    path = path or os.path.join(ASSETS_DIR, "skeletons.npz")
    data = np.load(path, allow_pickle=False)
    names = sorted({k.rsplit("__", 1)[0] for k in data.files})
    registry = {}
    for key in names:
        name = _decode_key(key)
        registry[name] = SkeletonSpec(
            name=name,
            indices=tuple(int(i) for i in data[f"{key}__indices"]),
            edges=np.asarray(data[f"{key}__edges"], dtype=np.int32),
            joint_names=tuple(str(s) for s in data[f"{key}__names"]),
        )
    return registry


def get_skeleton(name: str) -> SkeletonSpec:
    registry = load_registry()
    if name not in registry:
        raise KeyError(f"unknown skeleton {name!r}; available: {sorted(registry)}")
    return registry[name]


@functools.lru_cache(maxsize=None)
def load_expand_joints(path: str = "") -> np.ndarray:
    """(32, 122) float32 joint-expansion matrix (reference hpe.py:37,162)."""
    from isbfsar_tpu.configs import HPEConfig

    path = path or HPEConfig().expand_joints_path
    return np.load(path).astype(np.float32)
