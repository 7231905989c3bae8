"""Projective crop/warp — the TPU replacement for the reference's
``image_transformation1.engine`` (N3).

The reference implements the homography warp as an index-gather torch module
exported to TensorRT (reference modules/hpe/setup/6_create_image_transformation_onnx.py:23-56):
for each output pixel (x, y), with H normalized so H[2,2] == 1,

    k  = H20*x + H21*y + 1
    xi = trunc((H00*x + H01*y + H02) / k)
    yi = trunc((H10*x + H11*y + H12) / k)
    out[y, x] = img[yi, xi]  if in bounds else 0

i.e. nearest-neighbor-by-truncation sampling with out-of-bounds zeroing. We
reproduce those semantics exactly (truncation toward zero, not floor — the
parity contract for <=1mm keypoint deviation), but in-graph: the coordinate
math runs on the VPU and the pixel lookup is a single flat XLA gather, fused
into the same program as the backbone that consumes the crop. A bilinear
variant is provided for quality-over-parity use cases.
"""

from __future__ import annotations

import jax.numpy as jnp


def _source_coords(transform: jnp.ndarray, out_h: int, out_w: int):
    """Source pixel coords for each output pixel. transform: (b, 3, 3)."""
    t = transform / transform[:, 2:3, 2:3]  # normalize so H22 == 1
    x = jnp.arange(out_w, dtype=jnp.float32)[None, :]  # (1, w)
    y = jnp.arange(out_h, dtype=jnp.float32)[:, None]  # (h, 1)
    b = t.shape[0]
    t = t.reshape(b, 9)[:, :, None, None]  # (b, 9, 1, 1)
    k = t[:, 6] * x + t[:, 7] * y + 1.0
    sx = (t[:, 0] * x + t[:, 1] * y + t[:, 2]) / k
    sy = (t[:, 3] * x + t[:, 4] * y + t[:, 5]) / k
    return sx, sy  # each (b, out_h, out_w)


def warp_image(
    img: jnp.ndarray,
    transform: jnp.ndarray,
    out_size: int = 256,
) -> jnp.ndarray:
    """Nearest (truncation) projective warp, reference-parity.

    img: (h, w, c) source frame (any numeric dtype).
    transform: (b, 3, 3) output->source homographies.
    Returns (b, out_size, out_size, c) in the input dtype, zeros out of bounds.
    """
    h, w, c = img.shape
    sx, sy = _source_coords(transform.astype(jnp.float32), out_size, out_size)
    xi = sx.astype(jnp.int32)  # truncation toward zero, as the reference
    yi = sy.astype(jnp.int32)
    in_bounds = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    flat_idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)

    flat = img.reshape(h * w, c)
    out = jnp.take(flat, flat_idx.reshape(-1), axis=0).reshape(
        transform.shape[0], out_size, out_size, c
    )
    return jnp.where(in_bounds[..., None], out, jnp.zeros((), img.dtype))


def warp_image_bilinear(
    img: jnp.ndarray,
    transform: jnp.ndarray,
    out_size: int = 256,
) -> jnp.ndarray:
    """Bilinear projective warp (higher quality than the reference's nearest)."""
    h, w, c = img.shape
    sx, sy = _source_coords(transform.astype(jnp.float32), out_size, out_size)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)

    flat = img.reshape(h * w, c).astype(jnp.float32)

    def fetch(xi, yi):
        ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(idx.shape + (c,))
        return jnp.where(ok[..., None], vals, 0.0)

    v00 = fetch(x0i, y0i)
    v01 = fetch(x0i + 1, y0i)
    v10 = fetch(x0i, y0i + 1)
    v11 = fetch(x0i + 1, y0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy
