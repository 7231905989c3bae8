"""Pallas fused input stage: I420 decode + INTER_AREA resize + normalize.

One HBM pass over the camera frame. The composed XLA path
(``ops/image.py::i420_to_bgr`` -> ``resize_area`` -> ``/255``) materializes
the full-res float32 BGR frame in HBM between the decode and the resize
matmuls; this kernel reads the planar YUV bytes once into VMEM and emits
BOTH downstream products in a single ``pallas_call``:

  * the full-res BGR float frame (consumed by the crop/warp and focus paths),
  * the YOLO input — exact cv2.INTER_AREA downscale to (S, S), BGR->RGB,
    /255 (reference modules/hpe/hpe.py:50-56).

Bit-parity contract with the composed path (tests/test_pallas_input.py):
  * same BT.601 studio-range constants as ``i420_to_bgr``;
  * the 2x nearest chroma upsample is expressed as exact 0/1 selection
    matmuls (each output element is one input element — no rounding);
  * the resize uses the same weight matrices, contraction order, and
    HIGHEST-precision f32 dots as ``resize_area``.

Everything lives in VMEM (~12 MB peak for 480x640, under the ~16 MB/core
budget) so the only HBM traffic is the u8 YUV read, the weight reads, and
the two output writes. Outputs are planar (CHW) inside the kernel — a
(..., 3)-last layout would waste 125/128 lanes per tile — and transposed to
the HWC the consumers expect outside, where XLA folds the transpose into
the consumer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isbfsar_tpu.ops.image import _area_weights


@functools.lru_cache(maxsize=None)
def _upsample2_weights(dst: int) -> np.ndarray:
    """(dst, dst // 2) 0/1 matrix: nearest 2x upsample as a matmul."""
    w = np.zeros((dst, dst // 2), np.float32)
    w[np.arange(dst), np.arange(dst) // 2] = 1.0
    return w


def _kernel(y_ref, uh_ref, vh_ref, cupt_ref, wr_ref, wct_ref,
            bgr_ref, yolo_ref):
    """Single-program kernel: all operands resident in VMEM.

    y_ref    (H, W) u8 — the luma plane (chroma arrives pre-sliced, so the
             YUV bytes cross HBM->VMEM exactly once);
    uh_ref   (H//2, W//2) u8 — U plane, reshaped outside (cheap u8 relayout);
    vh_ref   (H//2, W//2) u8 — V plane;
    cupt_ref (W//2, W) f32 — exact 2x column upsample (0/1 selection);
    wr_ref   (S, H) f32, wct_ref (W, S) f32 — INTER_AREA overlap weights;
    bgr_ref  (3, H, W) f32 out — planes b, g, r;
    yolo_ref (3, S, S) f32 out — planes r, g, b (RGB order), in [0, 1].
    """
    hi = jax.lax.Precision.HIGHEST
    dot = functools.partial(jax.lax.dot, precision=hi,
                            preferred_element_type=jnp.float32)
    h = bgr_ref.shape[1]

    # Mosaic has no direct u8->f32 cast; widen through i32 (exact for u8).
    f32 = lambda q: q.astype(jnp.int32).astype(jnp.float32)
    y = (f32(y_ref[:, :]) - 16.0) * 1.164

    # Chroma 2x upsample: rows via an interleaving jnp.repeat (VPU relayout,
    # free vs MXU work; Mosaic lowers sublane-axis repeat but not lane-axis),
    # columns via the 0/1 selection matmul at DEFAULT (single-pass bf16)
    # precision — exact, because chroma values are integers in [-128, 127]
    # and the weights are 0/1, both exactly representable in bf16, and the
    # MXU accumulates in f32. Subtract-then-upsample == upsample-then-
    # subtract (pure selection), matching i420_to_bgr bit-for-bit.
    sel = functools.partial(jax.lax.dot, preferred_element_type=jnp.float32)
    u = sel(jnp.repeat(f32(uh_ref[:]) - 128.0, 2, axis=0), cupt_ref[:])
    v = sel(jnp.repeat(f32(vh_ref[:]) - 128.0, 2, axis=0), cupt_ref[:])

    b = jnp.clip(y + 2.018 * u, 0.0, 255.0)
    g = jnp.clip(y - 0.391 * u - 0.813 * v, 0.0, 255.0)
    r = jnp.clip(y + 1.596 * v, 0.0, 255.0)

    bgr_ref[0] = b
    bgr_ref[1] = g
    bgr_ref[2] = r

    # resize_area's contraction order: (wr @ chan) @ wc^T, HIGHEST f32;
    # true division (not reciprocal-multiply) for ulp parity with
    # yolo_preprocess's ``small / 255.0``.
    yolo_ref[0] = dot(dot(wr_ref[:], r), wct_ref[:]) / 255.0
    yolo_ref[1] = dot(dot(wr_ref[:], g), wct_ref[:]) / 255.0
    yolo_ref[2] = dot(dot(wr_ref[:], b), wct_ref[:]) / 255.0


@functools.partial(jax.jit, static_argnames=("height", "yolo_size", "interpret"))
def fused_i420_inputs(yuv: jnp.ndarray, height: int, yolo_size: int = 256,
                      interpret: bool = False):
    """Planar I420 frame -> (BGR float frame, YOLO input) in one HBM pass.

    yuv: (height * 3 // 2, width) uint8.
    Returns ``(bgr, yolo)`` with ``bgr`` (height, width, 3) float32 equal to
    ``i420_to_bgr(yuv, height)`` and ``yolo`` (1, S, S, 3) float32 equal to
    ``yolo_preprocess(bgr, S)``.
    """
    width = yuv.shape[1]
    y_plane = yuv[:height]
    uh = yuv[height: height + height // 4].reshape(height // 2, width // 2)
    vh = yuv[height + height // 4:].reshape(height // 2, width // 2)

    cupt = jnp.asarray(_upsample2_weights(width).T)
    wr = jnp.asarray(_area_weights(height, yolo_size))
    wct = jnp.asarray(_area_weights(width, yolo_size).T)

    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    bgr_chw, yolo_chw = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((3, height, width), jnp.float32),
            jax.ShapeDtypeStruct((3, yolo_size, yolo_size), jnp.float32),
        ),
        in_specs=[vmem()] * 6,
        out_specs=(vmem(), vmem()),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * height * (width // 2) * width           # chroma ups
            + 2 * 3 * (yolo_size * height * width                 # resize
                       + yolo_size * width * yolo_size),
            bytes_accessed=yuv.size + 4 * (3 * height * width
                                           + 3 * yolo_size * yolo_size),
            transcendentals=0,
        ),
        interpret=interpret,
    )(y_plane, uh, vh, cupt, wr, wct)

    bgr = jnp.transpose(bgr_chw, (1, 2, 0))
    yolo = jnp.transpose(yolo_chw, (1, 2, 0))[None]
    return bgr, yolo
