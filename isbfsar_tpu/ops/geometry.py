"""Camera geometry for the MetrABS-style pose pipeline — pure JAX, jit-safe.

Re-implements, TPU-first (batched, fixed shapes, no data-dependent control
flow), the numpy camera math of the reference:

- homogeneous coordinates + perspective projection
  (reference modules/hpe/utils/misc.py:137-138, 239-240)
- FOV visibility test (misc.py:212-220)
- look-at rotation for the virtual camera (misc.py:223-236)
- virtual-camera homography: bbox -> zoomed intrinsics + derotation
  (misc.py:243-296)
- z-axis rotation + test-time-augmentation parameter generation
  (misc.py:299-327)

All functions accept and return ``jnp`` arrays and run inside ``jax.jit``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# The small geometric matmuls must stay in true float32: the default dot
# precision is bf16-grade on the MXU (and in this build even on CPU), which
# would blow the <=1mm keypoint parity budget. Cost is negligible at these
# shapes, so force full precision explicitly at every dot below.
HIGHEST = jax.lax.Precision.HIGHEST


def mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full-precision matmul for small geometric systems."""
    return jnp.matmul(a, b, precision=HIGHEST)


def to_homogeneous(x: jnp.ndarray) -> jnp.ndarray:
    """Append a 1 to the last axis: (..., d) -> (..., d+1)."""
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def inv_intrinsics(k: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of an upper-triangular intrinsics matrix.

    k: (..., 3, 3) of the form [[fx, s, cx], [0, fy, cy], [0, 0, 1]].
    Exact up to one rounding per element — much tighter in float32 than a
    general LU inverse, which matters for the <=1mm keypoint parity budget.
    """
    fx, s, cx = k[..., 0, 0], k[..., 0, 1], k[..., 0, 2]
    fy, cy = k[..., 1, 1], k[..., 1, 2]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    row0 = jnp.stack([1.0 / fx, -s / (fx * fy), (s * cy - cx * fy) / (fx * fy)], axis=-1)
    row1 = jnp.stack([zero, 1.0 / fy, -cy / fy], axis=-1)
    row2 = jnp.stack([zero, zero, one], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def project(points: jnp.ndarray) -> jnp.ndarray:
    """Perspective division: (..., 3) camera-space -> (..., 2) image plane."""
    return points[..., :2] / points[..., 2:3]


def is_within_fov(imcoords: jnp.ndarray, lower: float = 18.0, upper: float = 238.0) -> jnp.ndarray:
    """Per-joint visibility inside the 256px crop (reference misc.py:212-220).

    imcoords: (..., 2) pixel coords. Returns bool (...,).
    """
    ok = jnp.logical_and(imcoords >= lower, imcoords <= upper)
    return jnp.all(ok, axis=-1)


def look_at_rotation(forward: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """Rotation whose +Z points along ``forward`` (reference misc.py:223-236).

    forward: (b, 3) look direction, up: (1, 3) or (b, 3) up vector.
    Returns (b, 3, 3) row-stacked [x; y; z] rotation matrices.
    """
    new_z = forward / jnp.linalg.norm(forward, axis=-1, keepdims=True)
    new_x = jnp.cross(new_z, jnp.broadcast_to(up, new_z.shape))
    # Fallback when forward aligns with up: rotate Z around old Y by 90 deg.
    alt_x = jnp.stack([new_z[:, 2], jnp.zeros_like(new_z[:, 2]), -new_z[:, 0]], axis=1)
    degenerate = jnp.linalg.norm(new_x, axis=-1, keepdims=True) == 0
    new_x = jnp.where(degenerate, alt_x, new_x)
    new_x = new_x / jnp.linalg.norm(new_x, axis=-1, keepdims=True)
    new_y = jnp.cross(new_z, new_x)
    return jnp.stack([new_x, new_y, new_z], axis=1)


def virtual_camera(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    y1: jnp.ndarray,
    y2: jnp.ndarray,
    intrinsics: jnp.ndarray,
    out_dim: int,
):
    """Zoomed+derotated virtual camera looking at a person bbox.

    TPU-native equivalent of the reference's per-frame numpy ``homography``
    (misc.py:243-296): given pixel bbox corners and camera intrinsics ``K``
    (3, 3), build the intrinsic matrix of a virtual camera that looks straight
    at the bbox center with the bbox filling an ``out_dim`` x ``out_dim`` crop.

    Returns (new_K (3, 3), rotation (1, 3, 3)).
    """
    k = intrinsics.astype(jnp.float32)
    cx = (x1 + x2) / 2.0
    cy = (y1 + y2) / 2.0
    # bbox center + the 4 side midpoints, homogeneous image coords: (1, 5, 3)
    pts = jnp.stack(
        [
            jnp.stack([cx, cy]),
            jnp.stack([cx, y1.astype(cx.dtype)]),
            jnp.stack([x2.astype(cx.dtype), cy]),
            jnp.stack([cx, y2.astype(cx.dtype)]),
            jnp.stack([x1.astype(cx.dtype), cy]),
        ]
    )[None].astype(jnp.float32)
    pts_h = to_homogeneous(pts)

    # Image space -> camera space (drop z, re-homogenize).
    inv_k = inv_intrinsics(k)[None]
    cam = mm(pts_h, jnp.swapaxes(inv_k, 1, 2))
    cam = to_homogeneous(cam[..., :2])

    center_cam = cam[:, 0]
    rot = look_at_rotation(center_cam, jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32))

    # Reproject side midpoints through the rotated camera to measure zoom.
    side = cam[:, 1:5]
    side_new = project(mm(side, jnp.swapaxes(mm(k[None], rot), 1, 2)))
    vert = jnp.linalg.norm(side_new[:, 0] - side_new[:, 2], axis=-1)
    horiz = jnp.linalg.norm(side_new[:, 1] - side_new[:, 3], axis=-1)
    box_size = jnp.maximum(vert, horiz)
    zoom = out_dim / box_size  # (1,)

    top = jnp.concatenate(
        [k[:2, :2] * zoom, jnp.full((2, 1), out_dim / 2.0, k.dtype)], axis=1
    )
    bottom = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    new_k = jnp.concatenate([top, bottom], axis=0)
    return new_k, rot


def warp_matrix(intrinsics: jnp.ndarray, new_k: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """Full-frame -> crop homography ``H = K @ inv(new_K @ R)`` (reference hpe.py:96).

    Since R is orthonormal and new_K triangular, ``inv(new_K @ R) = Rᵀ @
    inv(new_K)`` with the closed-form intrinsics inverse — cheaper and
    numerically tighter in float32 than a general 3x3 LU inverse.

    new_k: (3, 3) or (n, 3, 3); rot: (n, 3, 3). Returns (n, 3, 3).
    """
    new_k = jnp.broadcast_to(new_k, rot.shape)
    return mm(mm(intrinsics, jnp.swapaxes(rot, -1, -2)), inv_intrinsics(new_k))


def rotation_z(angle: jnp.ndarray) -> jnp.ndarray:
    """Batched rotation about the z axis (reference misc.py:299-307)."""
    sin, cos = jnp.sin(angle), jnp.cos(angle)
    zero, one = jnp.zeros_like(angle), jnp.ones_like(angle)
    return jnp.stack(
        [
            jnp.stack([cos, -sin, zero], axis=-1),
            jnp.stack([sin, cos, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def tta_params(num_aug: int, rot_linspace_noend: bool = True):
    """Test-time augmentation params (reference misc.py:310-327). Host-side numpy."""
    gammas = np.linspace(0.6, 1.0, num_aug)
    angle_range = np.float32(np.deg2rad(25))
    if rot_linspace_noend:
        angles = np.linspace(-angle_range, angle_range, num_aug + 1)[:-1]
    else:
        angles = np.linspace(-angle_range, angle_range, num_aug)
    scales = np.concatenate(
        [
            np.linspace(0.8, 1.0, (num_aug + 1) // 2)[:-1],
            np.linspace(1.0, 1.1, num_aug - num_aug // 2),
        ],
        axis=0,
    )
    should_flip = (np.arange(num_aug) - num_aug // 2) % 2 != 0
    flipmat = np.array([[-1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    maybe_flip = np.where(should_flip[:, None, None], flipmat, np.eye(3, dtype=np.float32))
    rotmat = np.asarray(rotation_z(jnp.asarray(-angles)))
    rotflip = maybe_flip @ rotmat
    return should_flip, rotflip.astype(np.float32), gammas, scales
