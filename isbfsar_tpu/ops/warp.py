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
    packed: bool = True,
) -> jnp.ndarray:
    """Bilinear projective warp (higher quality than the reference's nearest).

    Single-gather formulation (round 4, ``packed=True``): the naive form
    needs FOUR full-frame gathers (one per bilinear corner) and the round-2
    device profile measured them as the largest single item in the fused
    step (4 x 0.217 ms at 224 px — docs/PERF.md "Round-2 device profile";
    the nearest-fallback fix was refused on train/inference-consistency
    grounds). Instead, pre-pack the four corners along the channel axis of
    a 1-px zero-padded copy — pack[y, x] = (P[y,x], P[y,x+1], P[y+1,x],
    P[y+1,x+1]) — so ONE flat gather at (y0+1, x0+1) fetches all four
    corner pixels. The pack is pure elementwise layout (XLA slices of one
    pad), costing ~4 frame-copies of HBM traffic (~50 us at v5e bandwidth)
    against ~3 saved gathers (~0.65 ms). Semantics are EXACT vs the
    per-corner-masked form: the zero padding reproduces each corner's
    individual out-of-bounds zero for every sample point with any support
    ((sx, sy) in [-1, w] x [-1, h]), and the support mask zeroes the rest
    (tests/test_ops.py::test_bilinear_single_gather_matches_four_gather
    sweeps interior/border/outside and both formulations).

    ``packed=False`` keeps the classic four-gather form — a trace-time
    constant, retained so the two formulations can be A/B-measured in one
    session (tools/ab_warp.py) and in case a future batched profile favors
    it (gathers read only the touched rows; the pack always writes 4
    frame-copies).
    """
    h, w, c = img.shape
    sx, sy = _source_coords(transform.astype(jnp.float32), out_size, out_size)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)

    if not packed:
        flat = img.reshape(h * w, c).astype(jnp.float32)

        def fetch(xi, yi):
            ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
                idx.shape + (c,))
            return jnp.where(ok[..., None], vals, 0.0)

        v00 = fetch(x0i, y0i)
        v01 = fetch(x0i + 1, y0i)
        v10 = fetch(x0i, y0i + 1)
        v11 = fetch(x0i + 1, y0i + 1)
        top = v00 * (1 - fx) + v01 * fx
        bot = v10 * (1 - fx) + v11 * fx
        return top * (1 - fy) + bot * fy

    padded = jnp.pad(img.astype(jnp.float32), ((1, 1), (1, 1), (0, 0)))
    pack = jnp.concatenate(
        [
            padded[:-1, :-1],  # (y0, x0)
            padded[:-1, 1:],   # (y0, x0+1)
            padded[1:, :-1],   # (y0+1, x0)
            padded[1:, 1:],    # (y0+1, x0+1)
        ],
        axis=-1,
    )  # (h+1, w+1, 4c): pack[y, x] holds the 2x2 corner block at (y-1, x-1)
    support = (sx >= -1.0) & (sx <= w) & (sy >= -1.0) & (sy <= h)
    px = jnp.clip(x0i + 1, 0, w)
    py = jnp.clip(y0i + 1, 0, h)
    flat = pack.reshape((h + 1) * (w + 1), 4 * c)
    corners = jnp.take(flat, (py * (w + 1) + px).reshape(-1), axis=0).reshape(
        px.shape + (4 * c,)
    )
    corners = jnp.where(support[..., None], corners, 0.0)
    v00, v01, v10, v11 = (corners[..., i * c:(i + 1) * c] for i in range(4))
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy
