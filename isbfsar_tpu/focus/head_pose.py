"""Hopenet-style head-pose detector — the reference's alternative focus path.

Rebuild of the reference's ``HeadPoseDetector`` (reference
modules/focus/gaze_estimation/head_pose.py:42-155, partially broken there:
it references an undefined ``video``): detect the face, crop it square, run
a ResNet-50 with 66-bin yaw/pitch/roll heads, decode bin expectations to
degrees. Here the detect + crop + Hopenet chain is one fused XLA program.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from isbfsar_tpu.configs import FocusConfig
from isbfsar_tpu.models.gaze import BlazeFaceLite, HopeNet


class HeadPoseDetector:
    def __init__(
        self,
        config: Optional[FocusConfig] = None,
        params=None,
        seed: int = 0,
        crop_size: int = 224,
    ):
        self.config = config or FocusConfig()
        self.crop_size = crop_size
        self.face_det = BlazeFaceLite(dtype=jnp.dtype(self.config.compute_dtype))
        self.hopenet = HopeNet(dtype=jnp.dtype(self.config.compute_dtype))
        # device_put: host-numpy checkpoint trees would re-upload per call
        self.params = jax.device_put(
            params if params is not None else self._init(seed)
        )
        self._forward = jax.jit(self._forward_impl)

    def _init(self, seed: int):
        size = self.crop_size

        @jax.jit
        def init(key):
            k1, k2 = jax.random.split(key)
            det = self.face_det.init(k1, jnp.zeros((1, 128, 128, 3)))
            hp = self.hopenet.init(k2, jnp.zeros((1, size, size, 3)))
            return {"face_det": det, "hopenet": hp}

        return init(jax.random.key(seed))

    def _forward_impl(self, params, frame):
        h, w = frame.shape[0], frame.shape[1]
        size = self.crop_size

        det_in = jax.image.resize(frame.astype(jnp.float32), (128, 128, 3), "linear")
        boxes, _, scores = self.face_det.apply(params["face_det"], (det_in[..., ::-1] / 255.0)[None])
        best = jnp.argmax(scores[0])
        score = scores[0, best]
        box = boxes[0, best] * jnp.asarray([w, h, w, h], jnp.float32)

        # Square pad crop around the head (reference focus.py:49-66):
        # shared gather-resample helper, dynamic bbox / static output shape
        from isbfsar_tpu.ops.image import square_box_crop_gather

        crop = square_box_crop_gather(frame, (box[0], box[1], box[2], box[3]), size)

        angles = self.hopenet.apply(params["hopenet"], (crop[..., ::-1] / 255.0)[None])[0]
        return box, score, angles  # (yaw, pitch, roll) degrees

    def estimate(self, frame: np.ndarray) -> Optional[Dict[str, np.ndarray]]:
        """Returns {'bbox', 'yaw', 'pitch', 'roll'} or None when no face."""
        box, score, angles = self._forward(self.params, jnp.asarray(frame))
        if float(score) < 0.5:
            return None
        yaw, pitch, roll = (float(a) for a in np.asarray(angles))
        return {"bbox": np.asarray(box), "yaw": yaw, "pitch": pitch, "roll": roll}
