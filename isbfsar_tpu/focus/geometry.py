"""Face/gaze geometry: head pose from landmarks + ETH-XGaze normalization.

The reference delegates this to the vendored ``ptgaze`` package (solvePnP
head pose from mediapipe landmarks, camera normalization at 0.6 m — see
reference modules/focus/gaze_estimation/focus.py:9-24 and
utils/params.py:110-116). Rebuilt here in pure JAX so face detection, head
pose, crop normalization and the gaze network run as one XLA program:

- head pose: Kabsch/Procrustes alignment (3x3 SVD, jit-safe) of a canonical
  6-point 3D face model against camera-ray-lifted detected landmarks.
- normalization: a virtual camera rotated to look at the face center at a
  fixed distance, reusing :func:`isbfsar_tpu.ops.warp.warp_image` for the
  224x224 normalized crop — the same machinery as the HPE crop path.
- rotation helpers: matrix -> rotation-vector (log map) for the reference's
  ``head_pose_rot.as_rotvec()`` heuristics (focus.py:125).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from isbfsar_tpu.ops.geometry import inv_intrinsics, mm, to_homogeneous

# Canonical 3D landmark model (meters, camera-facing, origin at face center):
# right eye, left eye, nose tip, mouth center, right ear, left ear.
CANONICAL_FACE_3D = np.array(
    [
        [-0.032, -0.025, 0.00],
        [0.032, -0.025, 0.00],
        [0.000, 0.010, -0.03],
        [0.000, 0.045, -0.01],
        [-0.070, 0.000, 0.03],
        [0.070, 0.000, 0.03],
    ],
    np.float32,
)


def rotmat_to_rotvec(r: jnp.ndarray) -> jnp.ndarray:
    """SO(3) log map: (..., 3, 3) -> (..., 3) axis-angle vector."""
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    angle = jnp.arccos(cos)
    axis_raw = jnp.stack(
        [
            r[..., 2, 1] - r[..., 1, 2],
            r[..., 0, 2] - r[..., 2, 0],
            r[..., 1, 0] - r[..., 0, 1],
        ],
        axis=-1,
    )
    sin = jnp.sin(angle)
    scale = jnp.where(jnp.abs(sin) > 1e-6, angle / (2.0 * sin + 1e-12), 0.5)
    return axis_raw * scale[..., None]


def kabsch(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Optimal rotation aligning src -> dst (both (n, 3), centered inside)."""
    src_c = src - src.mean(axis=0, keepdims=True)
    dst_c = dst - dst.mean(axis=0, keepdims=True)
    h = mm(src_c.T, dst_c)
    u, _, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(mm(u, vt).T))
    flip = jnp.diag(jnp.asarray([1.0, 1.0, 1.0]) * jnp.stack([1.0, 1.0, d]))
    return mm(mm(u, flip), vt).T


def head_pose_from_landmarks(
    landmarks_px: jnp.ndarray,
    intrinsics: jnp.ndarray,
    assumed_depth: float = 0.6,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Head rotation + position from 6 detected 2D landmarks.

    landmarks_px: (6, 2) pixel coords; intrinsics: (3, 3).
    Weak-perspective lift: back-project each landmark to the assumed depth,
    then Kabsch-align the canonical model. Returns (R (3, 3), t (3,)).
    """
    rays = mm(to_homogeneous(landmarks_px), inv_intrinsics(intrinsics).T)  # (6, 3)
    canonical = jnp.asarray(CANONICAL_FACE_3D)

    # Two-pass weak-perspective lift: a flat lift (all points at the assumed
    # depth) biases the rotation because the canonical model has real depth
    # variation; a second pass re-lifts each landmark with the rotated
    # model's per-point depth, which removes most of that bias.
    lifted = rays * assumed_depth
    rot = kabsch(canonical, lifted)
    depth = assumed_depth + mm(canonical, rot.T)[:, 2:3]
    lifted = rays * depth
    rot = kabsch(canonical, lifted)
    center = lifted.mean(axis=0)
    return rot, center


def normalization_camera(
    face_center: jnp.ndarray,
    intrinsics: jnp.ndarray,
    norm_distance: float = 0.6,
    out_size: int = 224,
    focal_norm: float = 960.0,
):
    """ETH-XGaze-style normalization: a virtual camera looking at the face.

    Returns (warp (3, 3) mapping normalized-crop pixels -> frame pixels,
    R_norm (3, 3) the normalizing rotation). The scale factor moves the face
    to ``norm_distance``; the crop uses a fixed normalized focal length.
    """
    z_axis = face_center / jnp.linalg.norm(face_center)
    down = jnp.asarray([0.0, 1.0, 0.0])
    x_axis = jnp.cross(down, z_axis)
    x_axis = x_axis / jnp.linalg.norm(x_axis)
    y_axis = jnp.cross(z_axis, x_axis)
    r_norm = jnp.stack([x_axis, y_axis, z_axis], axis=0)  # rows

    scale = norm_distance / jnp.linalg.norm(face_center)
    scale_mat = jnp.diag(jnp.stack([jnp.asarray(1.0), jnp.asarray(1.0), scale]))
    cam_norm = jnp.asarray(
        [[focal_norm, 0.0, out_size / 2.0], [0.0, focal_norm, out_size / 2.0], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    # normalized-pixel -> frame-pixel homography (inverse of the usual chain)
    fwd = mm(mm(cam_norm, mm(scale_mat, r_norm)), inv_intrinsics(intrinsics))
    warp = jnp.linalg.inv(fwd)
    warp = warp / warp[2, 2]
    return warp, r_norm


def denormalize_gaze(gaze_vec_norm: jnp.ndarray, r_norm: jnp.ndarray) -> jnp.ndarray:
    """Gaze vector in the normalized camera frame -> original camera frame."""
    return mm(r_norm.T, gaze_vec_norm[..., None])[..., 0]
