"""Absolute 3D pose reconstruction — pure JAX, jit-safe.

The reference reconstructs the absolute reference point on the host with a
per-frame ``np.linalg.lstsq`` over a (2J, 3) system (reference
modules/hpe/utils/misc.py:141-208). XLA has no dynamic-shape lstsq, and the
system is tiny, so we solve the equivalent weighted normal equations — a
single (3, 3) solve per batch element — fully batched, in-graph.

Math: given normalized 2D joint coords u_j and root-relative 3D offsets
r_j, the camera-space reference point t minimizes
``sum_j w_j^2 * || [I_2, -u_j] t - (u_j r_jz - r_jxy) ||^2``.
The reference RMS-normalizes both sides for conditioning and rescales the
solution afterwards (misc.py:156-175); we reproduce that exactly so outputs
match bit-for-bit up to solver roundoff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from isbfsar_tpu.ops.geometry import inv_intrinsics, mm, to_homogeneous

_HI = jax.lax.Precision.HIGHEST


def _rms_scale(x: jnp.ndarray) -> jnp.ndarray:
    """Root-mean-square over axis 1, matching reference misc.py:156-159.

    x: (b, m). Returns (b, 1).
    """
    return jnp.sqrt(jnp.mean(jnp.square(x), axis=1, keepdims=True))


def reconstruct_reference_point(
    normalized_2d: jnp.ndarray,
    coords3d_rel: jnp.ndarray,
    validity: jnp.ndarray,
) -> jnp.ndarray:
    """Weighted least-squares reference point (reference misc.py:141-176).

    normalized_2d: (b, j, 2) intrinsics-free image coords.
    coords3d_rel:  (b, j, 3) root-relative camera-space offsets.
    validity:      (b, j) bool/float reliability mask.
    Returns (b, 3) camera-space reference point.
    """
    b, j, _ = normalized_2d.shape
    flat2d = normalized_2d.reshape(b, 2 * j)
    scale2d = _rms_scale(flat2d)
    unit2d = flat2d / scale2d  # (b, 2j)

    # Rows of A: [1, 0, -x_j], [0, 1, -y_j] per joint (misc.py:163-166).
    eye = jnp.tile(jnp.eye(2, dtype=normalized_2d.dtype), (j, 1))  # (2j, 2)
    a = jnp.concatenate([jnp.broadcast_to(eye, (b, 2 * j, 2)), -unit2d[..., None]], axis=2)

    rel_backproj = normalized_2d * coords3d_rel[..., 2:] - coords3d_rel[..., :2]
    flat_b = rel_backproj.reshape(b, 2 * j)
    scale_b = _rms_scale(flat_b)
    rhs = (flat_b / scale_b)[..., None]  # (b, 2j, 1)

    w = validity.astype(normalized_2d.dtype) + 1e-4  # (b, j)
    w = jnp.repeat(w, 2, axis=-1)[..., None]  # (b, 2j, 1)

    # SVD pseudo-inverse with np.linalg.lstsq's default rcond cutoff — the
    # reference's exact solver semantics (misc.py:172 np.linalg.lstsq).
    # Normal equations would square the condition number AND, when the 2D
    # decode degenerates (all joints clustered), return batch-layout-
    # dependent garbage; the rcond cutoff keeps the solution stable.
    aw = a * w
    bw = rhs * w
    u, s, vt = jnp.linalg.svd(aw, full_matrices=False)  # (b,2j,3),(b,3),(b,3,3)
    eps = jnp.finfo(s.dtype).eps
    cutoff = s[..., :1] * (max(aw.shape[-2:]) * eps)
    s_inv = jnp.where(s > cutoff, 1.0 / jnp.maximum(s, 1e-30), 0.0)
    utb = jnp.einsum("bri,brk->bik", u, bw, precision=_HI)  # (b, 3, 1)
    x = jnp.einsum("bij,bjk->bik", jnp.swapaxes(vt, 1, 2), s_inv[..., None] * utb,
                   precision=_HI)
    ref = x[..., 0]  # (b, 3)

    # Undo the RMS conditioning (misc.py:175).
    ref = jnp.concatenate([ref[:, :2], ref[:, 2:] / scale2d], axis=1) * scale_b
    return ref


def back_project(camcoords2d: jnp.ndarray, delta_z: jnp.ndarray, z_offset: jnp.ndarray) -> jnp.ndarray:
    """Lift normalized 2D coords to 3D at known depth (reference misc.py:207-208).

    camcoords2d: (b, j, 2); delta_z: (b, j) relative depths; z_offset: (b,).
    """
    return to_homogeneous(camcoords2d) * (delta_z + z_offset[:, None])[..., None]


def reconstruct_absolute(
    coords2d: jnp.ndarray,
    coords3d_rel: jnp.ndarray,
    intrinsics: jnp.ndarray,
    in_fov: jnp.ndarray,
) -> jnp.ndarray:
    """Mix 2D-backprojected and 3D-relative coords (reference misc.py:183-204).

    coords2d: (b, j, 2) pixel coords; coords3d_rel: (b, j, 3);
    intrinsics: (b, 3, 3); in_fov: (b, j) bool. Returns (b, j, 3) absolute.
    """
    inv_k = inv_intrinsics(intrinsics.astype(jnp.float32))
    normalized = mm(to_homogeneous(coords2d), jnp.swapaxes(inv_k, 1, 2))[..., :2]

    ref = reconstruct_reference_point(normalized, coords3d_rel, in_fov)

    abs_from_3d = coords3d_rel + ref[:, None]
    abs_from_2d = back_project(normalized, coords3d_rel[..., 2], ref[:, 2])

    return jnp.where(in_fov[..., None], abs_from_2d, abs_from_3d)
