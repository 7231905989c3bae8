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
    """SO(3) log map: (..., 3, 3) -> (..., 3) axis-angle vector.

    Handles the angle ~ pi branch explicitly (the antisymmetric-part
    formula degenerates there and would silently return ~0 — a near-pi
    head rotation must NOT read as frontal in the focus heuristics).
    """
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
    rotvec_generic = axis_raw * scale[..., None]

    # angle ~ pi: R + I == 2 aa^T; |axis| from the diagonal, signs from the
    # column of (R + I) with the largest diagonal entry.
    b = (r + jnp.eye(3, dtype=r.dtype)) / 2.0
    diag = jnp.stack([b[..., 0, 0], b[..., 1, 1], b[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(b, k[..., None, None], axis=-1)[..., 0]  # (..., 3)
    axis_pi = col / (jnp.linalg.norm(col, axis=-1, keepdims=True) + 1e-12)
    rotvec_pi = axis_pi * angle[..., None]

    near_pi = (cos < -1.0 + 1e-4)[..., None]
    return jnp.where(near_pi, rotvec_pi, rotvec_generic)


def _svd_rotation(h: jnp.ndarray):
    """Shared Procrustes core: optimal proper rotation from the 3x3 cross-
    covariance ``h`` (reflection corrected via the det sign). Returns
    (rot, svals, d) — kabsch/umeyama both build on this so the sign
    convention lives in exactly one place."""
    u, svals, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(mm(u, vt).T))
    flip = jnp.diag(jnp.stack([1.0, 1.0, d]))
    return mm(mm(u, flip), vt).T, svals, d


def kabsch(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Optimal rotation aligning src -> dst (both (n, 3), centered inside)."""
    src_c = src - src.mean(axis=0, keepdims=True)
    dst_c = dst - dst.mean(axis=0, keepdims=True)
    rot, _, _ = _svd_rotation(mm(src_c.T, dst_c))
    return rot


def umeyama(src: jnp.ndarray, dst: jnp.ndarray):
    """Similarity Procrustes: (rot, scale, t) with dst ~ scale * rot @ src + t."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    sc, dc = src - mu_s, dst - mu_d
    rot, svals, d = _svd_rotation(mm(sc.T, dc))
    scale = (svals[0] + svals[1] + svals[2] * d) / jnp.maximum((sc**2).sum(), 1e-12)
    t = mu_d - scale * mm(rot, mu_s[:, None])[:, 0]
    return rot, scale, t


def head_pose_from_landmarks(
    landmarks_px: jnp.ndarray,
    intrinsics: jnp.ndarray,
    assumed_depth: float = 0.6,
    iters: int = 40,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Head rotation + METRIC position from 6 detected 2D landmarks.

    landmarks_px: (6, 2) pixel coords; intrinsics: (3, 3). Iterative
    weak-perspective PnP (jit-safe, fixed ``iters``): back-project the
    landmarks along their camera rays, similarity-Procrustes the canonical
    model onto the lifted points (the SCALE term absorbs the depth-guess
    error — plain Kabsch leaks it into the rotation and underestimates
    yaw ~2x), then re-lift each ray at the aligned model's per-point
    metric depth. Convergence is geometric but not fast — 6 iterations
    still underestimates a 0.7 rad yaw by 17%; 40 recovers synthetic
    rotations to <1e-3 rad (tests/test_focus.py pins 0.3/0.7/1.0 rad yaw
    and ±0.4 pitch), and 40 six-point SVDs are noise next to the conv
    stacks sharing the program. The recovered
    center carries the true distance (a 0.3 m face no longer reads as
    ``assumed_depth``), which also makes the ETH-XGaze normalization
    zoom meaningful. Returns (R (3, 3), t (3,)).

    The reference gets this from ptgaze's solvePnP
    (modules/focus/gaze_estimation/focus.py:9-24); tests/test_focus.py pins
    this rebuild against exact synthetic projections.
    """
    if iters < 1:
        raise ValueError("head_pose_from_landmarks needs iters >= 1")
    rays = mm(to_homogeneous(landmarks_px), inv_intrinsics(intrinsics).T)  # (6, 3)
    canonical = jnp.asarray(CANONICAL_FACE_3D)
    depth = jnp.full((canonical.shape[0], 1), assumed_depth)
    for _ in range(iters):
        lifted = rays * depth
        rot, scale, t = umeyama(canonical, lifted)
        t_metric = t / jnp.maximum(scale, 1e-6)
        model_cam = mm(canonical, rot.T) + t_metric
        depth = model_cam[:, 2:3]
    center = model_cam.mean(axis=0)
    return rot, center


def normalization_camera(
    face_center: jnp.ndarray,
    intrinsics: jnp.ndarray,
    norm_distance: float = 0.6,
    out_size: int = 224,
    focal_norm: float = None,
):
    """ETH-XGaze-style normalization: a virtual camera looking at the face.

    Returns (warp (3, 3) mapping normalized-crop pixels -> frame pixels,
    R_norm (3, 3) the normalizing rotation). The scale factor moves the face
    to ``norm_distance``; the normalized focal length defaults to the
    ETH-XGaze face convention (960 at a 224 crop) scaled with ``out_size``
    so smaller crops keep the same field of view.
    """
    if focal_norm is None:
        focal_norm = 960.0 * out_size / 224.0
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
