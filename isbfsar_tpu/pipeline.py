"""FusedPipeline — the whole product as ONE XLA program.

This is the fusion pass the reference cannot express (SURVEY §7 stage 6):
the reference's frame loop crosses the host four times per frame (TensorRT
engine round-trips + numpy glue + process queues, reference main.py:59-138,
hpe.py:48-173, ar.py:30-84). Here a camera frame enters the device once and

    resize -> YOLO -> person pick -> virtual camera -> crop warp ->
    backbone -> heatmap head -> soft-argmax -> absolute reconstruction ->
    joint mapping -> root-centering -> sliding-window update ->
    skeleton MLP embed -> temporal cross-transformer match vs the cached
    support set -> softmax scores + open-set decision
    [+ face detect -> head pose -> gaze normalization -> gaze net]

runs as one jit-compiled program; only the final scalars/vectors return to
the host. The AR sliding window lives on-device as a ring state threaded
through the step function (reference ar.py:42-51 keeps it as a Python list
of device tensors). Warmup/no-person/empty-support semantics are carried by
flags exactly like the unfused modules.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isbfsar_tpu.configs import PipelineConfig
from isbfsar_tpu.ar.recognizer import ActionRecognizer
from isbfsar_tpu.focus.detector import FocusDetector
from isbfsar_tpu.hpe.estimator import HumanPoseEstimator


class StreamState(NamedTuple):
    """Device-resident recurrent state threaded through the fused step."""

    window: jnp.ndarray  # (seq_len, n_joints*3) root-relative skeleton ring
    n_valid: jnp.ndarray  # () int32 — filled frames in the window


class FusedPipeline:
    """Single-program streaming pipeline for the skeleton input mode."""

    def __init__(
        self,
        config: Optional[PipelineConfig] = None,
        hpe: Optional[HumanPoseEstimator] = None,
        ar: Optional[ActionRecognizer] = None,
        focus: Optional[FocusDetector] = None,
        with_focus: bool = True,
    ):
        self.config = config or PipelineConfig()
        assert self.config.main.input_type == "skeleton", (
            "FusedPipeline fuses the skeleton mode; rgb/hybrid use Orchestrator"
        )
        self.hpe = hpe or HumanPoseEstimator(self.config.hpe, self.config.intrinsics)
        self.ar = ar or ActionRecognizer(self.config.ar)
        self.with_focus = with_focus
        self.focus = (focus or FocusDetector(self.config.focus, self.config.intrinsics)) if with_focus else None

        self._step = jax.jit(self._step_impl, donate_argnums=(3,))

    # -------------------------------------------------------------- factory

    def init_state(self) -> StreamState:
        cfg = self.config.ar
        return StreamState(
            window=jnp.zeros((cfg.seq_len, cfg.n_joints * 3), jnp.float32),
            n_valid=jnp.zeros((), jnp.int32),
        )

    def _params(self) -> Dict[str, Any]:
        p = {"hpe": self.hpe.params, "ar": self.ar.params}
        if self.with_focus:
            p["focus"] = self.focus.params
        return p

    # ----------------------------------------------------------- fused step

    def _step_impl(self, params, frame, support_features, state, support_mask):
        """frame (H, W, 3) uint8; support_features (way, L, D); support_mask (way,).

        Returns (outputs dict, new_state).
        """
        cfg = self.config.ar

        pose, bbox, conf, found, visible = self.hpe._estimate_impl(params["hpe"], frame)
        pose_ok = jnp.logical_and(found, visible)

        distance = jnp.linalg.norm(pose[0]) * 2.5  # reference main.py:102
        rel_pose = pose - pose[0]
        sk = rel_pose.reshape(-1)

        # sliding window push (reference ar.py:42-46), only on good frames
        pushed = jnp.concatenate([state.window[1:], sk[None]], axis=0)
        window = jnp.where(pose_ok, pushed, state.window)
        n_valid = jnp.where(
            pose_ok, jnp.minimum(state.n_valid + 1, cfg.seq_len), state.n_valid
        )

        # AR match against the cached support features
        query = {"sk": window[None]}
        out = self.ar.model.apply(
            params["ar"], query, support_mask[None], support_features=support_features[None]
        )
        probs = jax.nn.softmax(out["logits"][0])
        is_true = out["is_true"][0, 0]
        ar_ready = jnp.logical_and(n_valid >= cfg.seq_len, jnp.any(support_mask))

        outputs = {
            "pose": rel_pose,
            "pose_abs": pose,
            "bbox": bbox,
            "pose_ok": pose_ok,
            "distance": distance,
            "probs": probs,
            "is_true": is_true,
            "ar_ready": ar_ready,
        }

        if self.with_focus:
            outputs["focus"] = self.focus._forward_impl(params["focus"], frame)

        return outputs, StreamState(window=window, n_valid=n_valid)

    # ------------------------------------------------------------ host API

    def start(self) -> None:
        """Materialize support features + state; call after support-set edits."""
        self._state = self.init_state()
        if self.ar.support_features is None and self.ar.support_mask.any():
            support = {m: jnp.asarray(v[None]) for m, v in self.ar.support_data.items()}
            feats = jax.jit(
                lambda p, s: self.ar.model.apply(
                    p,
                    {m: s[m][:, 0] for m in s},  # dummy query slot
                    jnp.asarray(self.ar.support_mask)[None],
                    support_data=s,
                )["support_features"][0]
            )(self.ar.params, support)
            self.ar.support_features = feats
        elif self.ar.support_features is None:
            cfg = self.config.ar
            self.ar.support_features = jnp.zeros(
                (cfg.way, cfg.seq_len, cfg.trans_linear_in_dim), jnp.float32
            )
        self._support_features = self.ar.support_features
        self._support_mask = jnp.asarray(self.ar.support_mask)
        self._device_params = self._params()

    def step(self, frame: np.ndarray) -> Dict[str, Any]:
        """One frame through the fused program; host-side decode of flags."""
        outputs, self._state = self._step(
            self._device_params,
            jnp.asarray(frame),
            self._support_features,
            self._state,
            self._support_mask,
        )
        return outputs

    def decode(self, outputs: Dict[str, Any]) -> Dict[str, Any]:
        """Convert device outputs into the orchestrator's elements contract."""
        elements: Dict[str, Any] = {}
        if bool(outputs["pose_ok"]):
            elements["pose"] = np.asarray(outputs["pose"])
            elements["distance"] = float(outputs["distance"])
            x1, x2, y1, y2 = (int(v) for v in np.asarray(outputs["bbox"]))
            elements["bbox"] = (x1, x2, y1, y2)
            elements["edges"] = self.hpe.edges
        if bool(outputs["ar_ready"]):
            probs = np.asarray(outputs["probs"])
            elements["actions"] = {
                name: float(probs[i])
                for i, name in enumerate(self.ar.class_order)
                if self.ar.support_mask[i] and name is not None
            }
            elements["is_true"] = float(outputs["is_true"])
            elements["requires_focus"] = dict(self.ar.requires_focus)
        else:
            elements["actions"] = {}
            elements["is_true"] = 0
            elements["requires_focus"] = {}
        if self.with_focus and bool(outputs["focus"]["found"]):
            res = self.focus.estimate_collect(outputs["focus"])
            if res is not None:
                elements["focus"], face = res
                elements["face_bbox"] = face.bbox.reshape(-1)
        return elements

    def warmup(self, n: int = 2) -> None:
        h, w = self.hpe.frame_shape
        dummy = np.zeros((h, w, 3), np.uint8)
        for _ in range(n):
            out = self.step(dummy)
        jax.block_until_ready(out)
