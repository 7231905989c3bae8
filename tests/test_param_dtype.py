"""PipelineConfig.param_dtype="bfloat16": the serving-memory lever.

At batch 1 every weight byte is read once per frame, so parameter storage
is the fused program's dominant HBM term; bf16 storage halves it while the
MXU compute dtype is bf16 already (docs/PERF.md "Precision decisions").
These tests pin what that costs: with the TRAINED bundled nets, the
bf16-param pipeline must track the same scenes, keep detection and
action decisions identical, and hold pose deltas below the nets' own
estimation-noise budget.
"""

import dataclasses

import numpy as np
import pytest

pytest.importorskip("cv2")

import jax.numpy as jnp

from isbfsar_tpu import pretrained
from isbfsar_tpu.ar.recognizer import ActionRecognizer
from isbfsar_tpu.configs import ARConfig, HPEConfig, MainConfig, PipelineConfig
from isbfsar_tpu.hpe.estimator import HumanPoseEstimator
from isbfsar_tpu.models.effnetv2 import V2_TINY
from isbfsar_tpu.pipeline import FusedPipeline
from isbfsar_tpu.train.posestack import (
    BOX_SIZE_M,
    CI_FRAME_HW,
    CI_INTRINSICS,
    render_motion_clip,
)

HPE_CFG = HPEConfig(yolo_input_size=128, crop_size=128, yolo_thresh=0.3)


def _build(param_dtype: str) -> FusedPipeline:
    params = pretrained.load("pose-ci-motions")
    hpe = HumanPoseEstimator(HPE_CFG, CI_INTRINSICS, params=params,
                             backbone_stages=V2_TINY,
                             frame_shape=CI_FRAME_HW, yolo_width=0.25)
    ar_cfg = ARConfig.for_input("skeleton")
    ar = ActionRecognizer(ar_cfg)
    rng = np.random.default_rng(7)
    for name in ("wave", "squat"):
        ar.train({"flag": name,
                  "data": {"poses": rng.normal(
                      size=(ar_cfg.seq_len, 90)).astype(np.float32)},
                  "requires_focus": False})
    cfg = PipelineConfig(
        main=dataclasses.replace(MainConfig.for_input("skeleton"),
                                 cam_width=CI_FRAME_HW[1],
                                 cam_height=CI_FRAME_HW[0]),
        intrinsics=CI_INTRINSICS, hpe=HPE_CFG, ar=ar_cfg,
        param_dtype=param_dtype,
    )
    pipe = FusedPipeline(cfg, hpe=hpe, ar=ar, with_focus=False)
    pipe.start()
    return pipe


@pytest.fixture(scope="module")
def outputs():
    frames, _ = render_motion_clip("wave", n_frames=10, frame_hw=CI_FRAME_HW,
                                   intrinsics=CI_INTRINSICS, seed=5)
    result = {}
    for dtype in ("float32", "bfloat16"):
        pipe = _build(dtype)
        result[dtype] = [pipe.step(f) for f in frames]
    return result


class TestBf16Params:
    def test_trunks_bf16_heads_f32(self):
        """The cast policy (pipeline.py _cast_trunk_params): yolo + bbone
        conv weights in bf16, while the decode head, the YOLO box-
        regression outputs, BatchNorm stats and the AR stay f32."""
        pipe = _build("bfloat16")
        hpe = pipe._device_params["hpe"]
        trunk = [x for x in __import__("jax").tree.leaves(
            {"y": hpe["yolo"]["params"]["backbone"],
             "b": hpe["bbone"]["params"]}) if jnp.issubdtype(
                 x.dtype, jnp.floating)]
        assert trunk and all(x.dtype == jnp.bfloat16 for x in trunk)
        kept = [x for x in __import__("jax").tree.leaves(
            {"h": hpe["head"], "s": hpe["yolo"]["batch_stats"],
             "o": hpe["yolo"]["params"]["head1_out"],
             "ar": pipe._device_params["ar"]})]
        assert kept and all(x.dtype == jnp.float32 for x in kept)

    def test_detection_decisions_identical(self, outputs):
        ok32 = [bool(o["pose_ok"]) for o in outputs["float32"]]
        ok16 = [bool(o["pose_ok"]) for o in outputs["bfloat16"]]
        assert ok32 == ok16
        assert sum(ok32) >= 8  # the trained nets track the clip either way

    def test_pose_delta_below_estimation_noise(self, outputs):
        """bf16 trunk features shift the heatmap logits, and the CI nets'
        4x4 soft-argmax decode amplifies that (one cell = 32 px), so the
        readout moves centimeters — but well below the nets' OWN ~0.095 m
        root-relative error budget (tests/test_posestack.py), i.e. the
        cast is sub-noise. (Full-tree cast measured 0.064 m mean; the
        trunk-only policy 0.04 m; the production 8x8 decode halves the
        amplification again.)"""
        deltas = [
            np.abs(np.asarray(a["pose"]) - np.asarray(b["pose"])).max()
            * BOX_SIZE_M
            for a, b in zip(outputs["float32"], outputs["bfloat16"])
            if bool(a["pose_ok"]) and bool(b["pose_ok"])
        ]
        assert np.mean(deltas) < 0.06, f"mean pose delta {np.mean(deltas):.4f} m"
        assert np.max(deltas) < 0.15, f"max pose delta {np.max(deltas):.4f} m"

    def test_action_decision_unchanged(self, outputs):
        for a, b in zip(outputs["float32"], outputs["bfloat16"]):
            pa, pb = np.asarray(a["probs"]), np.asarray(b["probs"])
            if pa.max() > 0:  # window filled, match fired
                assert int(pa.argmax()) == int(pb.argmax())
                assert np.abs(pa - pb).max() < 0.15
