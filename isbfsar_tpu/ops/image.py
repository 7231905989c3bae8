"""Frame preprocessing ops — resize + normalization, in-graph.

The reference preprocesses on the host with OpenCV: ``cv2.resize(...,
INTER_AREA)`` + BGR->RGB + CHW + /255 for YOLO (reference
modules/hpe/hpe.py:50-56) and the ImageNet whitening used for the AR RGB
branch (reference main.py:85-91). Here both run on-device inside the same
XLA program as the networks that consume them.
"""

from __future__ import annotations

import jax.numpy as jnp

IMAGENET_SCALE = (0.229, 0.224, 0.225)
IMAGENET_SHIFT = (0.485, 0.456, 0.406)


import functools

import jax
import numpy as np


@functools.lru_cache(maxsize=None)
def _area_weights(src: int, dst: int) -> np.ndarray:
    """(dst, src) exact INTER_AREA box-overlap weight matrix (downscale)."""
    scale = src / dst
    w = np.zeros((dst, src), np.float32)
    for i in range(dst):
        lo, hi = i * scale, (i + 1) * scale
        j0, j1 = int(np.floor(lo)), int(np.ceil(hi))
        for j in range(j0, min(j1, src)):
            overlap = min(hi, j + 1) - max(lo, j)
            if overlap > 0:
                w[i, j] = overlap / scale
    return w


def resize_area(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Exact cv2.INTER_AREA downscale as two MXU matmuls.

    img: (h, w, c) any numeric dtype -> float32 (out_h, out_w, c).
    INTER_AREA is separable box-overlap averaging, i.e.
    ``out = W_rows @ img @ W_colsᵀ`` with precomputed fractional-overlap
    weight matrices — systolic-array work instead of a gather/conv resample
    (and bit-faithful to the reference's cv2.resize, hpe.py:51).
    """
    h, w, _ = img.shape
    wr = jnp.asarray(_area_weights(h, out_h))
    wc = jnp.asarray(_area_weights(w, out_w))
    hi = jax.lax.Precision.HIGHEST
    # channels as the batch dim keeps both contractions MXU-shaped
    # ((out_h, h) @ (h, w) then @ (w, out_w)) instead of an N=3 matmul.
    chw = jnp.transpose(img.astype(jnp.float32), (2, 0, 1))  # (c, h, w)
    x = jnp.einsum("ij,cjw->ciw", wr, chw, precision=hi)
    out = jnp.einsum("ciw,kw->cik", x, wc, precision=hi)
    return jnp.transpose(out, (1, 2, 0))


def yolo_preprocess(frame_bgr: jnp.ndarray, size: int = 256) -> jnp.ndarray:
    """640x480 BGR uint8 frame -> (1, size, size, 3) RGB float32 in [0, 1].

    Mirrors reference hpe.py:50-56 (resize, BGR->RGB, /255); NHWC here
    (XLA:TPU-native layout) where the reference emits CHW for TensorRT.
    """
    small = resize_area(frame_bgr, size, size)
    return (small[..., ::-1] / 255.0)[None]


def ar_rgb_preprocess(crop_bgr: jnp.ndarray) -> jnp.ndarray:
    """224x224 crop -> HWC float32 with the reference's whitening.

    Note: the reference applies ``img * scale + shift`` (main.py:90,
    dataloader.py:81) — scale-then-shift, not the standard (img - mean)/std.
    We preserve that exact (idiosyncratic) transform since the AR checkpoints
    were trained with it. NHWC layout (the reference transposes to CHW for
    torch; our models are NHWC).
    """
    x = crop_bgr.astype(jnp.float32) / 255.0
    return x * jnp.asarray(IMAGENET_SCALE) + jnp.asarray(IMAGENET_SHIFT)


def center_square_crop_resize(img: jnp.ndarray, bbox, out: int = 224) -> jnp.ndarray:
    """Square crop around bbox center, resized to (out, out).

    Mirrors the host-side crop the reference feeds the AR RGB branch
    (main.py:81-88). bbox: (x1, y1, x2, y2) pixel coords (static Python ints
    or traced scalars — when traced, uses a dynamic-slice-free gather).
    """
    import jax

    h, w, _ = img.shape
    x1, y1, x2, y2 = bbox
    xm = (x1 + x2) // 2
    ym = (y1 + y2) // 2
    half = jnp.maximum(xm - x1, ym - y1)
    half = jnp.maximum(half, 1)
    y_lo = jnp.maximum(ym - half, 0)
    x_lo = jnp.maximum(xm - half, 0)
    side = 2 * half
    # Gather-based crop: sample `out` points across the square (nearest).
    ys = y_lo + (jnp.arange(out) * side) // out
    xs = x_lo + (jnp.arange(out) * side) // out
    ys = jnp.clip(ys, 0, h - 1)
    xs = jnp.clip(xs, 0, w - 1)
    return img[ys][:, xs]


def square_box_crop_gather(frame: jnp.ndarray, box, size: int) -> jnp.ndarray:
    """Square pad-crop around a pixel box via gather resample (nearest at
    pixel centers): dynamic box, STATIC output shape — jit-safe. box:
    (x1, y1, x2, y2) traced scalars. Returns (size, size, c) float32.

    Shared by the focus-side head crops (focus/head_pose.py,
    focus/mutual.py — reference focus.py:49-66 semantics)."""
    h, w, _ = frame.shape
    x1, y1, x2, y2 = box
    cx = (x1 + x2) / 2.0
    cy = (y1 + y2) / 2.0
    half = jnp.maximum(jnp.maximum(x2 - x1, y2 - y1) / 2.0, 1.0)
    xs = jnp.clip((cx - half) + (jnp.arange(size) + 0.5) * (2 * half / size), 0, w - 1).astype(jnp.int32)
    ys = jnp.clip((cy - half) + (jnp.arange(size) + 0.5) * (2 * half / size), 0, h - 1).astype(jnp.int32)
    return frame[ys][:, xs].astype(jnp.float32)


def i420_to_bgr(yuv: jnp.ndarray, height: int) -> jnp.ndarray:
    """Planar I420 (YUV 4:2:0) -> BGR float32, in-graph.

    yuv: (height * 3 // 2, width) uint8 — the layout cameras emit natively
    (and cv2.COLOR_BGR2YUV_I420 produces). Cuts host->device bytes 2x vs
    BGR24, which matters when the transfer link is the pipeline bottleneck
    (remote-attached chips). Studio-range BT.601 (what cv2's I420 codecs
    use: Y in [16, 235], scale 1.164).
    """
    width = yuv.shape[1]
    y = (yuv[:height].astype(jnp.float32) - 16.0) * 1.164
    u_plane = yuv[height : height + height // 4].reshape(height // 2, width // 2)
    v_plane = yuv[height + height // 4 :].reshape(height // 2, width // 2)

    def up2(p):  # nearest 2x upsample
        return jnp.repeat(jnp.repeat(p, 2, axis=0), 2, axis=1).astype(jnp.float32)

    u = up2(u_plane) - 128.0
    v = up2(v_plane) - 128.0
    r = y + 1.596 * v
    g = y - 0.391 * u - 0.813 * v
    b = y + 2.018 * u
    return jnp.clip(jnp.stack([b, g, r], axis=-1), 0.0, 255.0)


def bgr_to_i420(bgr: "np.ndarray") -> "np.ndarray":
    """Host-side I420 encode (numpy/cv2) for sources that produce BGR."""
    import cv2

    return cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420)
