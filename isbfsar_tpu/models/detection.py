"""Single-stage head detector (ResNet + FPN + anchor head) — Flax.

The reference's mutual-gaze path detects heads with a torchvision
``fasterrcnn_resnet50_fpn`` fine-tuned to 2 classes (reference
modules/focus/mutual_gaze/head_detection/utils/misc.py:8-23, wrapper
head_detector.py:8-31, TensorRT export setup/1_from_pytorch_to_onnx.py).

A two-stage RPN + ROIAlign detector maps poorly onto XLA's static-shape
model (dynamic proposal counts, per-ROI control flow). This rebuild is a
RetinaNet-style single-stage head over a ResNet-FPN: dense anchor
classification + box regression, decoded in-graph and filtered with the
same fixed-shape NMS as the YOLO path — same API (boxes + scores for one
"head" class), TPU-native execution model.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from isbfsar_tpu.models.resnet import BasicBlock, ResNet


class FPN(nn.Module):
    out_channels: int = 128
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        # feats: list of (b, h, w, c), fine -> coarse
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"lat{i}")(f)
            for i, f in enumerate(feats)
        ]
        outs = [laterals[-1]]
        for i in range(len(laterals) - 2, -1, -1):
            up = jax.image.resize(outs[0], laterals[i].shape, "nearest")
            outs.insert(0, laterals[i] + up)
        return [
            nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name=f"smooth{i}")(o)
            for i, o in enumerate(outs)
        ]


class _TrunkStages(nn.Module):
    """ResNet-18-style trunk that exposes stride 8/16/32 feature maps."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda *a, **kw: nn.Conv(*a, use_bias=False, dtype=self.dtype, **kw)
        norm = lambda name: nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=name)
        x = x.astype(self.dtype)
        x = conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], name="conv1")(x)
        x = nn.relu(norm("bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        feats = []
        for i, n_blocks in enumerate((2, 2, 2, 2)):
            for j in range(n_blocks):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = BasicBlock(64 * 2**i, strides, conv=conv, norm=norm, name=f"layer{i+1}_{j}")(x)
            if i >= 1:
                feats.append(x)  # strides 8, 16, 32
        return feats


class HeadDetectorNet(nn.Module):
    """(b, s, s, 3) in [0,1] -> (boxes (b, N, 4) [x1,y1,x2,y2] in [0,1],
    scores (b, N)). One anchor scale per FPN level, 3 aspect ratios."""

    dtype: Any = jnp.bfloat16
    fpn_channels: int = 128
    anchor_sizes: Sequence[float] = (0.1, 0.25, 0.5)  # relative to image
    aspect_ratios: Sequence[float] = (0.75, 1.0, 1.33)

    @nn.compact
    def __call__(self, x, train: bool = False):
        input_size = x.shape[1]
        feats = _TrunkStages(dtype=self.dtype, name="trunk")(x, train)
        pyramid = FPN(self.fpn_channels, dtype=self.dtype, name="fpn")(feats)

        n_a = len(self.aspect_ratios)
        head_cls = nn.Conv(n_a, (3, 3), padding="SAME", dtype=self.dtype, name="cls_head")
        head_box = nn.Conv(4 * n_a, (3, 3), padding="SAME", dtype=self.dtype, name="box_head")

        all_boxes, all_scores = [], []
        b = x.shape[0]
        for lvl, (p, size) in enumerate(zip(pyramid, self.anchor_sizes)):
            h, w = p.shape[1], p.shape[2]
            cls = head_cls(p).astype(jnp.float32).reshape(b, h * w * n_a)
            reg = head_box(p).astype(jnp.float32).reshape(b, h, w, n_a, 4)

            gx = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) / w
            gy = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5) / h
            ar = jnp.asarray(self.aspect_ratios, jnp.float32)
            aw = size * jnp.sqrt(ar)
            ah = size / jnp.sqrt(ar)

            cx = gx[..., None] + reg[..., 0] * 0.1 * aw
            cy = gy[..., None] + reg[..., 1] * 0.1 * ah
            bw = aw * jnp.exp(jnp.clip(reg[..., 2] * 0.2, -4.0, 4.0))
            bh = ah * jnp.exp(jnp.clip(reg[..., 3] * 0.2, -4.0, 4.0))
            boxes = jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1)
            all_boxes.append(boxes.reshape(b, h * w * n_a, 4))
            all_scores.append(jax.nn.sigmoid(cls))

        return jnp.concatenate(all_boxes, axis=1), jnp.concatenate(all_scores, axis=1)


class BinaryGazeClassifier(nn.Module):
    """512 -> 256 -> 64 -> 1 sigmoid (reference focus_detection/utils/model.py)."""

    @nn.compact
    def __call__(self, feats):
        y = nn.relu(nn.Dense(256, name="fc1")(feats))
        y = nn.relu(nn.Dense(64, name="fc2")(y))
        return nn.sigmoid(nn.Dense(1, name="fc3")(y))


class EyeKeypointMLP(nn.Module):
    """'JustOpenPose' variant: MLP on 14 normalized eye keypoints
    (reference focus_detection/utils/model.py:JustOpenPose)."""

    @nn.compact
    def __call__(self, keypoints):
        y = keypoints.reshape(keypoints.shape[0], -1)
        y = nn.relu(nn.Dense(128, name="fc1")(y))
        y = nn.relu(nn.Dense(64, name="fc2")(y))
        return nn.sigmoid(nn.Dense(1, name="fc3")(y))
