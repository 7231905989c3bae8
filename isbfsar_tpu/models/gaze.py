"""Gaze and head-pose networks (Flax) for the focus module.

The reference's focus path (F1, reference modules/focus/gaze_estimation/
focus.py:9-140) wraps the external ``ptgaze`` MPIIGaze demo: a mediapipe
face detector + an ETH-XGaze ResNet-18 gaze regressor + solvePnP head pose
(checkpoint at utils/params.py:110-116). The alternative Hopenet head-pose
path (F2, head_pose.py:42-155) uses a ResNet-50 with 66-bin yaw/pitch/roll
classification heads.

TPU-native rebuild:

- :class:`GazeNet` — ResNet-18 trunk -> Dense(2) (pitch, yaw) on normalized
  224x224 face crops, the ETH-XGaze architecture.
- :class:`HopeNet` — ResNet-50 trunk -> three 66-bin heads with in-graph
  softmax-expectation decode to degrees (the reference decodes bins on the
  host with numpy; here it is fused).
- :class:`BlazeFaceLite` — a compact single-shot face detector (BlazeFace-
  style anchor grid, 896 anchors at 128px) producing box + 6 landmarks +
  score, replacing the mediapipe dependency with an XLA program.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from isbfsar_tpu.models.resnet import resnet18, resnet50


def pitchyaw_to_vector(pitchyaw: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) pitch/yaw radians -> (..., 3) unit gaze vector (ETH-XGaze frame)."""
    pitch, yaw = pitchyaw[..., 0], pitchyaw[..., 1]
    return jnp.stack(
        [-jnp.cos(pitch) * jnp.sin(yaw), -jnp.sin(pitch), -jnp.cos(pitch) * jnp.cos(yaw)],
        axis=-1,
    )


def vector_to_pitchyaw(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) gaze vector -> (..., 2) pitch/yaw radians; exact inverse of
    :func:`pitchyaw_to_vector` for unit vectors (ETH-XGaze convention)."""
    n = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    pitch = jnp.arcsin(jnp.clip(-n[..., 1], -1.0, 1.0))
    yaw = jnp.arctan2(-n[..., 0], -n[..., 2])
    return jnp.stack([pitch, yaw], axis=-1)


class GazeNet(nn.Module):
    """ETH-XGaze-style gaze regressor: normalized face crop -> (pitch, yaw)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = resnet18(dtype=self.dtype)(x, train=train)
        return nn.Dense(2, name="gaze_fc")(feats)


class LandmarkRefiner(nn.Module):
    """Second-stage landmark regressor on the full-res face CROP.

    The single-stage detector sees the whole frame at 128px, where a
    far-branch face is ~16 px and head-yaw-induced landmark asymmetry is
    sub-pixel — unobservable. The reference's stack gets its landmarks
    from ptgaze's mediapipe dependency (reference modules/focus/
    gaze_estimation/focus.py:106-112 via GazeEstimator.detect_faces),
    which is itself two-stage: coarse detection, then a mesh/landmark
    model on the high-resolution face region. Input (n, 64, 64, 3)
    RGB/255 crop -> (n, 6, 2) landmarks in crop-normalized [0, 1]
    coordinates.
    """

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        for i, f in enumerate((24, 48, 96, 192)):  # 64 -> 4
            x = nn.Conv(f, (3, 3), (2, 2), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        x = nn.relu(nn.Dense(128, name="fc1")(x))
        out = nn.Dense(12, name="fc2")(x)
        # sigmoid keeps predictions inside the crop; init bias 0 -> 0.5
        return jax.nn.sigmoid(out).reshape(x.shape[0], 6, 2)


class HopeNet(nn.Module):
    """Head-pose network: crop -> (yaw, pitch, roll) degrees via 66-bin heads."""

    n_bins: int = 66
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = resnet50(dtype=self.dtype)(x, train=train)
        angles = []
        idx = jnp.arange(self.n_bins, dtype=jnp.float32)
        for name in ("yaw", "pitch", "roll"):
            logits = nn.Dense(self.n_bins, name=f"fc_{name}")(feats)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            # bin expectation -> degrees in [-99, 99] (3-degree bins)
            angles.append(jnp.sum(probs * idx, axis=-1) * 3.0 - 99.0)
        return jnp.stack(angles, axis=-1)


class _BlazeBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(
            x.shape[-1], (5, 5), (self.stride, self.stride), padding="SAME",
            feature_group_count=x.shape[-1], use_bias=False, dtype=self.dtype, name="dw",
        )(x)
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype, name="pw")(y)
        # momentum 0.9 (not flax's 0.99 default): the running stats converge
        # in tens of steps instead of hundreds — BlazeFaceLite is trained
        # from scratch on short synthetic-supervision budgets
        # (train/gazefocus.py) where slow stat warmup dominates early loss.
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn")(y)
        if self.stride == 2:
            residual = nn.max_pool(x, (2, 2), strides=(2, 2))
        if residual.shape[-1] != self.filters:
            pad = self.filters - residual.shape[-1]
            residual = jnp.pad(residual, ((0, 0), (0, 0), (0, 0), (0, pad)))
        return nn.relu(y + residual)


# Per-anchor base side lengths (fraction of frame). The fine 16x16 grid
# carries two small-face priors; the coarse 8x8 grid spans medium-to-
# full-frame faces, so a trained detector can express the large close-up
# faces the close/far heuristic keys on (bbox area > 0.03 of the frame,
# reference focus.py:118) instead of saturating at one fixed prior.
ANCHOR_SIZES_16 = (0.10, 0.25)
ANCHOR_SIZES_8 = (0.30, 0.42, 0.56, 0.70, 0.85, 1.00)


def blaze_anchors(input_size: int = 128) -> jnp.ndarray:
    """(896, 2) anchor centers in [0, 1]: 2/cell @16x16 + 6/cell @8x8."""
    anchors = []
    for grid, per_cell in ((input_size // 8, 2), (input_size // 16, 6)):
        xs = (jnp.arange(grid) + 0.5) / grid
        cx, cy = jnp.meshgrid(xs, xs)
        c = jnp.stack([cx.reshape(-1), cy.reshape(-1)], axis=-1)
        anchors.append(jnp.repeat(c, per_cell, axis=0))
    return jnp.concatenate(anchors, axis=0)


def blaze_anchor_sizes(input_size: int = 128) -> jnp.ndarray:
    """(896,) per-anchor base size matching :func:`blaze_anchors` order."""
    n16 = (input_size // 8) ** 2
    n8 = (input_size // 16) ** 2
    return jnp.concatenate(
        [
            jnp.tile(jnp.asarray(ANCHOR_SIZES_16, jnp.float32), n16),
            jnp.tile(jnp.asarray(ANCHOR_SIZES_8, jnp.float32), n8),
        ]
    )


class BlazeFaceLite(nn.Module):
    """Single-shot face detector: (b, 128, 128, 3) in [0,1] ->
    (boxes (b, 896, 4) [x1, y1, x2, y2] in [0,1], landmarks (b, 896, 6, 2),
    scores (b, 896)). Landmark order: right eye, left eye, nose, mouth,
    right ear, left ear (the 6-point mediapipe contract the reference's
    vendored detector emits)."""

    dtype: Any = jnp.bfloat16
    n_landmarks: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        input_size = x.shape[1]
        x = x.astype(self.dtype)
        x = nn.Conv(24, (5, 5), (2, 2), padding="SAME", dtype=self.dtype, name="stem")(x)
        x = nn.relu(x)
        for i, (f, s) in enumerate([(24, 1), (28, 1), (32, 2), (36, 1), (42, 1)]):
            x = _BlazeBlock(f, s, dtype=self.dtype, name=f"b{i}")(x, train)
        x = _BlazeBlock(48, 2, dtype=self.dtype, name="mid_down")(x, train)
        for i in range(2):
            x = _BlazeBlock(48, 1, dtype=self.dtype, name=f"mid{i}")(x, train)
        feat16 = x  # (b, 16, 16, 48) at 128px
        x = _BlazeBlock(96, 2, dtype=self.dtype, name="deep_down")(x, train)
        for i in range(2):
            x = _BlazeBlock(96, 1, dtype=self.dtype, name=f"deep{i}")(x, train)
        feat8 = x  # (b, 8, 8, 96)

        n_out = 4 + 2 * self.n_landmarks + 1
        r16 = nn.Conv(2 * n_out, (1, 1), dtype=self.dtype, name="head16")(feat16)
        r8 = nn.Conv(6 * n_out, (1, 1), dtype=self.dtype, name="head8")(feat8)
        b = x.shape[0]
        raw = jnp.concatenate(
            [r16.astype(jnp.float32).reshape(b, -1, n_out), r8.astype(jnp.float32).reshape(b, -1, n_out)],
            axis=1,
        )  # (b, 896, n_out)

        anchors = blaze_anchors(input_size)[None]  # (1, 896, 2)
        sizes = blaze_anchor_sizes(input_size)[None, :, None]  # (1, 896, 1)
        scale = 128.0 / input_size
        center = anchors + raw[..., 0:2] / (input_size * scale)
        wh = jnp.exp(raw[..., 2:4] * 0.2) * sizes  # per-anchor size prior
        boxes = jnp.concatenate([center - wh / 2, center + wh / 2], axis=-1)
        lms = anchors[:, :, None] + raw[..., 4 : 4 + 2 * self.n_landmarks].reshape(
            b, -1, self.n_landmarks, 2
        ) / (input_size * scale)
        scores = jax.nn.sigmoid(raw[..., -1])
        return boxes, lms, scores
