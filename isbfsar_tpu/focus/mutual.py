"""Mutual-gaze focus detection (alternative path).

Behavioral rebuild of the reference's mutual-gaze FocusDetector + HeadDetector
(reference modules/focus/mutual_gaze/focus.py:15-106, head_detector.py:8-31):
detect heads, keep scores above ``score_thr`` after NMS, square-pad-crop to
224, run a backbone + binary "is looking at me" classifier.

TPU design: head detection (single-stage, models/detection.py), the square
crop, the backbone and the classifier head run as one fused program on the
top-1 head; NMS uses the shared fixed-shape kernel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isbfsar_tpu.configs import MutualGazeConfig
from isbfsar_tpu.models.detection import BinaryGazeClassifier, HeadDetectorNet
from isbfsar_tpu.models.resnet import resnet18, resnet50


class HeadDetector:
    """Standalone head detector (reference head_detector.py:8-31 API)."""

    def __init__(self, config: MutualGazeConfig, params=None, seed: int = 0, input_size: int = 256):
        self.config = config
        self.input_size = input_size
        self.net = HeadDetectorNet()
        if params is None:
            params = jax.jit(
                lambda k: self.net.init(k, jnp.zeros((1, input_size, input_size, 3)))
            )(jax.random.key(seed))
        # device_put: host-numpy checkpoint trees would re-upload per call
        self.params = jax.device_put(params)
        self._forward = jax.jit(self._forward_impl)

    def _forward_impl(self, params, frame):
        h, w = frame.shape[0], frame.shape[1]
        x = jax.image.resize(frame.astype(jnp.float32), (self.input_size, self.input_size, 3), "linear")
        x = (x[..., ::-1] / 255.0)[None]
        boxes, scores = self.net.apply(params, x)
        best = jnp.argmax(scores[0])
        box = boxes[0, best] * jnp.asarray([w, h, w, h], jnp.float32)
        return box, scores[0, best]

    def estimate(self, frame: np.ndarray) -> Optional[Tuple[np.ndarray, float]]:
        box, score = self._forward(self.params, jnp.asarray(frame))
        score = float(score)
        if score < self.config.score_thr:
            return None
        return np.asarray(box), score


class MutualGazeDetector:
    """Head crop -> backbone -> sigmoid "looking at me" (reference focus.py:31-81)."""

    def __init__(self, config: MutualGazeConfig, params=None, seed: int = 0):
        self.config = config
        self.detector_net = HeadDetectorNet()
        self.backbone = resnet50() if config.backbone == "resnet50" else resnet18()
        self.classifier = BinaryGazeClassifier()
        # device_put: host-numpy checkpoint trees would re-upload per call
        self.params = jax.device_put(
            params if params is not None else self._init(seed)
        )
        self._forward = jax.jit(self._forward_impl)

    def _init(self, seed: int):
        size = self.config.crop_size
        feat_dim = 2048 if self.config.backbone == "resnet50" else 512

        @jax.jit  # single program: eager init is slow over a remote TPU link
        def init(key):
            k1, k2, k3 = jax.random.split(key, 3)
            det = self.detector_net.init(k1, jnp.zeros((1, 256, 256, 3)))
            bb = self.backbone.init(k2, jnp.zeros((1, size, size, 3)))
            cls = self.classifier.init(k3, jnp.zeros((1, feat_dim)))
            return {"detector": det, "backbone": bb, "classifier": cls}

        return init(jax.random.key(seed))

    def _forward_impl(self, params, frame):
        h, w = frame.shape[0], frame.shape[1]
        size = self.config.crop_size

        det_in = jax.image.resize(frame.astype(jnp.float32), (256, 256, 3), "linear")
        boxes, scores = self.detector_net.apply(params["detector"], (det_in[..., ::-1] / 255.0)[None])
        best = jnp.argmax(scores[0])
        score = scores[0, best]
        box = boxes[0, best] * jnp.asarray([w, h, w, h], jnp.float32)

        # Square pad crop around the head (reference focus.py:49-66):
        # shared gather-resample helper, dynamic bbox / static output shape
        from isbfsar_tpu.ops.image import square_box_crop_gather

        crop = square_box_crop_gather(frame, (box[0], box[1], box[2], box[3]), size)

        x = (crop[..., ::-1] / 255.0)[None]
        feats = self.backbone.apply(params["backbone"], x)
        watching = self.classifier.apply(params["classifier"], feats)[0, 0]
        return box, score, watching

    def estimate(self, frame: np.ndarray):
        """Returns (is_watching bool, head_bbox) or None (reference focus.py:31-81)."""
        box, score, watching = self._forward(self.params, jnp.asarray(frame))
        if float(score) < self.config.score_thr:
            return None
        return bool(float(watching) > 0.5), np.asarray(box)
