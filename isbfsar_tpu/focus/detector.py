"""Gaze-based focus detection — "is the human looking at the camera?".

Behavioral rebuild of the reference's primary FocusDetector (reference
modules/focus/gaze_estimation/focus.py:9-140, config utils/params.py:119-132):

- detect the face (the reference uses mediapipe via ptgaze; here a Flax
  BlazeFace-style detector)
- estimate head pose and, when close, the gaze direction (ETH-XGaze
  ResNet-18 on a distance-normalized 224x224 crop)
- heuristic (focus.py:118-133): if the face bbox covers > ``area_thr`` of
  the 640x480 frame, the human is "close": focus iff the normalized gaze z
  < ``close_thr`` AND |head yaw rotvec| < ``foc_rot_thr``; otherwise use the
  head pose alone: focus iff |normalized head rot y| < ``dist_thr``
- majority vote over the last ``patience`` observations (focus.py:136-138)

The detect + head-pose + normalize-crop + gaze-net chain is one fused XLA
program; only the close/far branch and the patience vote stay in Python
(they gate on a single scalar).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isbfsar_tpu.configs import CameraIntrinsics, FocusConfig
from isbfsar_tpu.focus.geometry import (
    denormalize_gaze,
    head_pose_from_landmarks,
    normalization_camera,
    rotmat_to_rotvec,
)
from isbfsar_tpu.models.gaze import BlazeFaceLite, GazeNet, LandmarkRefiner, pitchyaw_to_vector
from isbfsar_tpu.ops.warp import warp_image_bilinear


@dataclasses.dataclass
class Face:
    """Per-face result bundle (mirrors the reference's ptgaze Face usage)."""

    bbox: np.ndarray  # (2, 2) [[x1, y1], [x2, y2]] pixels
    landmarks: np.ndarray  # (6, 2) pixels
    score: float
    head_position: np.ndarray  # (3,) camera-space
    head_pose_rotvec: np.ndarray  # (3,) axis-angle
    normalized_head_rot2d: np.ndarray  # (2,) pitch/yaw-ish of normalized head
    gaze_vector: np.ndarray  # (3,) camera frame
    normalized_gaze_vector: np.ndarray  # (3,) normalized-camera frame
    normalized_image: Optional[np.ndarray] = None


class FocusDetector:
    def __init__(
        self,
        config: FocusConfig,
        intrinsics: Optional[CameraIntrinsics] = None,
        params: Optional[Dict[str, Any]] = None,
        seed: int = 0,
        frame_shape: Tuple[int, int] = (480, 640),
    ):
        self.config = config
        self.frame_shape = frame_shape
        self.k_matrix = jnp.asarray((intrinsics or CameraIntrinsics()).matrix())

        self.face_det = BlazeFaceLite(dtype=jnp.dtype(config.compute_dtype))
        self.lm_refiner = LandmarkRefiner(dtype=jnp.dtype(config.compute_dtype))
        self.gaze_net = GazeNet(dtype=jnp.dtype(config.compute_dtype))
        # device_put: host-numpy checkpoint trees would re-upload per call
        self.params = jax.device_put(
            params if params is not None else self._init_params(seed)
        )

        self.focuses = []
        self.is_close: Optional[bool] = None
        self.is_focus: Optional[bool] = None

        self._forward = jax.jit(self._forward_impl)

    def _init_params(self, seed: int):
        size = self.config.gaze_image_size

        @jax.jit  # one program: eager init is minutes over a remote TPU link
        def init(key):
            k1, k2, k3 = jax.random.split(key, 3)
            det = self.face_det.init(k1, jnp.zeros((1, 128, 128, 3)))
            lm = self.lm_refiner.init(k3, jnp.zeros((1, 64, 64, 3)))
            gaze = self.gaze_net.init(k2, jnp.zeros((1, size, size, 3)))
            return {"face_det": det, "lm_refiner": lm, "gaze_net": gaze}

        return init(jax.random.key(seed))

    # --------------------------------------------------------------- fused

    def _forward_impl(self, params, frame):
        """frame (H, W, 3) uint8 BGR -> all per-face quantities + found flag."""
        h, w = frame.shape[0], frame.shape[1]
        size = self.config.gaze_image_size

        det_in = jax.image.resize(frame.astype(jnp.float32), (128, 128, 3), "linear")
        det_in = (det_in[..., ::-1] / 255.0)[None]
        boxes, lms, scores = self.face_det.apply(params["face_det"], det_in)

        # Anchor-ensemble box: score-weighted mean over the top-k scoring
        # anchors — a fixed-shape, jit-safe stand-in for NMS box averaging.
        # Individual anchor regressions are noisy; the ensemble nearly
        # doubles localization quality (measured on the CI-budget synthetic
        # detector: argmax IoU 0.38-0.52 -> top-8 weighted 0.61-0.89).
        top_s, top_i = jax.lax.top_k(scores[0], 8)
        score = top_s[0]
        wgt = top_s / jnp.maximum(jnp.sum(top_s), 1e-6)
        box = jnp.sum(boxes[0][top_i] * wgt[:, None], axis=0) * jnp.asarray(
            [w, h, w, h], jnp.float32
        )

        # Second-stage landmark refinement on a FULL-RES crop of the
        # detection (models/gaze.py::LandmarkRefiner): the 128px detector
        # input makes small-face landmark asymmetry sub-pixel; the far
        # branch's head-yaw decision needs crop-resolution landmarks.
        cx = (box[0] + box[2]) * 0.5
        cy = (box[1] + box[3]) * 0.5
        side = jnp.maximum(1.4 * jnp.maximum(box[2] - box[0], box[3] - box[1]), 8.0)
        x0 = cx - side * 0.5
        y0 = cy - side * 0.5
        s_px = side / 64.0
        crop_mat = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        crop_mat = crop_mat.at[0, 0].set(s_px).at[1, 1].set(s_px)
        crop_mat = crop_mat.at[0, 2].set(x0).at[1, 2].set(y0)
        lm_crop = warp_image_bilinear(frame.astype(jnp.float32), crop_mat[None], 64)
        lm_in = (lm_crop[..., ::-1] / 255.0).astype(jnp.float32)
        ref = self.lm_refiner.apply(params["lm_refiner"], lm_in)[0]  # (6, 2) in [0,1]
        landmarks = ref * side + jnp.asarray([x0, y0])

        rot, center = head_pose_from_landmarks(
            landmarks, self.k_matrix, self.config.normalized_camera_distance
        )
        rotvec = rotmat_to_rotvec(rot)

        warp, r_norm = normalization_camera(
            center,
            self.k_matrix,
            self.config.normalized_camera_distance,
            size,
        )
        crop = warp_image_bilinear(frame.astype(jnp.float32), warp[None], size)  # (1, s, s, 3)
        norm_img = crop[0]
        gaze_in = (crop[..., ::-1] / 255.0).astype(jnp.float32)

        pitchyaw = self.gaze_net.apply(params["gaze_net"], gaze_in)[0]
        norm_gaze = pitchyaw_to_vector(pitchyaw)
        gaze = denormalize_gaze(norm_gaze, r_norm)

        # normalized head rotation (the reference's normalized_head_rot2d):
        # head pose expressed in the normalized camera, reduced to rotvec xy.
        norm_rotvec = rotmat_to_rotvec(r_norm @ rot)
        head_rot2d = norm_rotvec[:2]

        return {
            "found": score > 0.5,
            "score": score,
            "bbox": box,
            "landmarks": landmarks,
            "head_position": center,
            "head_rotvec": rotvec,
            "normalized_head_rot2d": head_rot2d,
            "gaze_vector": gaze,
            "normalized_gaze_vector": norm_gaze,
            "normalized_image": norm_img,
        }

    # ----------------------------------------------------------- public API

    def estimate_async(self, frame):
        """Dispatch the fused face/pose/gaze program without blocking.
        The small result fields start their D2H copy eagerly (utils/
        transfer.py) so the later collect overlaps the relay RTT with
        whatever runs in between; the heavy normalized_image is NOT
        prefetched (collect drops it unless return_image=True)."""
        from isbfsar_tpu.utils.transfer import prefetch_host

        if isinstance(frame, np.ndarray):
            frame = jax.device_put(np.ascontiguousarray(frame))
        out = self._forward(self.params, frame)
        prefetch_host({k: v for k, v in out.items() if k != "normalized_image"})
        return out

    def estimate_collect(self, out, return_image: bool = False):
        """Block on a dispatched program, apply the close/far heuristic.

        ONE device_get for all fields (per-leaf fetches each pay a sync
        round-trip on remote-attached chips). The heavy normalized_image is
        excluded unless requested.
        """
        cfg = self.config
        if not return_image and hasattr(out.get("normalized_image"), "devices"):
            out = dict(out)
            out["normalized_image"] = None
        out = jax.device_get(out)
        if not bool(out["found"]):
            return None

        box = np.asarray(out["bbox"], np.float64)
        face = Face(
            bbox=box.reshape(2, 2),
            landmarks=np.asarray(out["landmarks"]),
            score=float(out["score"]),
            head_position=np.asarray(out["head_position"]),
            head_pose_rotvec=np.asarray(out["head_rotvec"]),
            normalized_head_rot2d=np.asarray(out["normalized_head_rot2d"]),
            gaze_vector=np.asarray(out["gaze_vector"]),
            normalized_gaze_vector=np.asarray(out["normalized_gaze_vector"]),
            normalized_image=np.asarray(out["normalized_image"]) if return_image else None,
        )

        h, w = self.frame_shape
        area = ((face.bbox[1][0] - face.bbox[0][0]) * (face.bbox[1][1] - face.bbox[0][1])) / (w * h)

        if area > cfg.area_thr:  # close: use eyes (focus.py:121-126)
            self.is_close = True
            score = face.normalized_gaze_vector[2]
            score_rot = abs(face.head_pose_rotvec[1])
            focus = bool(score < cfg.close_thr and score_rot < cfg.foc_rot_thr)
        else:  # far: use head pose (focus.py:128-133)
            self.is_close = False
            focus = bool(abs(face.normalized_head_rot2d[1]) < cfg.dist_thr)

        self.focuses.append(focus)
        self.focuses = self.focuses[-cfg.patience:]
        # exposed as an attribute, NOT returned: the reference also returns
        # the instantaneous focus and keeps the majority vote on
        # self.is_focus (focus.py:136-140; its main.py consumes the
        # returned value) — parity preserved, the smoothed signal is there
        # for consumers that want it
        self.is_focus = self.focuses.count(True) > len(self.focuses) / 2

        return focus, face

    def estimate(self, frame: np.ndarray, return_image: bool = False):
        """Returns (focus bool, Face) or None when no face (reference focus.py:105-140)."""
        return self.estimate_collect(self.estimate_async(frame), return_image)

    def warmup(self, n: int = 2) -> None:
        dummy = jnp.zeros(self.frame_shape + (3,), jnp.uint8)
        for _ in range(n):
            jax.block_until_ready(self._forward(self.params, dummy))
