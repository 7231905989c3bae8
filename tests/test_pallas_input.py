"""Pallas fused input stage: parity with the composed XLA path.

The kernel (ops/pallas_input.py) must be a drop-in for
``i420_to_bgr`` + ``yolo_preprocess`` (reference modules/hpe/hpe.py:50-56
preprocessing semantics): exact BGR decode, ulp-level resize parity. On the
CPU test platform the kernel runs in Pallas interpreter mode; the TPU
compile path is exercised by bench.py / the driver.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from isbfsar_tpu.ops.image import bgr_to_i420, i420_to_bgr, yolo_preprocess
from isbfsar_tpu.ops.pallas_input import fused_i420_inputs


@pytest.fixture(scope="module")
def yuv_frame(request):
    rng = np.random.default_rng(7)
    frame = rng.integers(0, 256, (480, 640, 3), np.uint8)
    return bgr_to_i420(frame)


class TestFusedI420Inputs:
    def test_bgr_plane_exact(self, yuv_frame):
        # Bitwise-equal on TPU and on a cold CPU cache; the persistent
        # compile cache can serve an executable AOT-compiled with different
        # host FMA features than a freshly compiled one, shifting either
        # path by one FMA contraction (~3e-5 on the 0..255 scale) — so the
        # assertion is ulp-tolerant rather than array_equal.
        ref = np.asarray(i420_to_bgr(jnp.asarray(yuv_frame), 480))
        bgr, _ = fused_i420_inputs(jnp.asarray(yuv_frame), 480, 256, interpret=True)
        np.testing.assert_allclose(np.asarray(bgr), ref, atol=1e-4, rtol=0)

    def test_yolo_input_ulp_parity(self, yuv_frame):
        ref_bgr = i420_to_bgr(jnp.asarray(yuv_frame), 480)
        ref = np.asarray(yolo_preprocess(ref_bgr, 256))
        _, yolo = fused_i420_inputs(jnp.asarray(yuv_frame), 480, 256, interpret=True)
        assert yolo.shape == (1, 256, 256, 3)
        # identical weights/order; only dot-vs-einsum summation order differs
        np.testing.assert_allclose(np.asarray(yolo), ref, atol=1e-5, rtol=0)

    def test_small_frame_odd_tiles(self):
        """Non-128-multiple W (160 lanes -> masked tile) and upscale-ish S."""
        rng = np.random.default_rng(3)
        frame = rng.integers(0, 256, (120, 160, 3), np.uint8)
        yuv = jnp.asarray(bgr_to_i420(frame))
        ref_bgr = i420_to_bgr(yuv, 120)
        ref_yolo = np.asarray(yolo_preprocess(ref_bgr, 128))
        bgr, yolo = fused_i420_inputs(yuv, 120, 128, interpret=True)
        np.testing.assert_allclose(np.asarray(bgr), np.asarray(ref_bgr), atol=1e-4, rtol=0)
        np.testing.assert_allclose(np.asarray(yolo), ref_yolo, atol=1e-5, rtol=0)


class TestPipelinePallasParity:
    def test_fused_step_matches_composed(self):
        """One fused step with the Pallas input stage == the composed path.

        Same weights, same frame; the packed output vectors must agree to
        float tolerance (the YOLO input differs only at ulp level)."""
        from isbfsar_tpu.configs import (
            ARConfig, CameraIntrinsics, HPEConfig, MainConfig, PipelineConfig,
        )
        from isbfsar_tpu.ar.recognizer import ActionRecognizer
        from isbfsar_tpu.hpe.estimator import HumanPoseEstimator
        from isbfsar_tpu.models.effnetv2 import V2_TINY
        from isbfsar_tpu.pipeline import FusedPipeline
        from isbfsar_tpu.runtime.source import SyntheticSource

        frame_shape = (120, 160)
        hpe_cfg = HPEConfig(yolo_input_size=128, crop_size=256, yolo_thresh=0.0)
        intr = CameraIntrinsics(width=frame_shape[1], height=frame_shape[0])
        hpe = HumanPoseEstimator(
            hpe_cfg, intr, backbone_stages=V2_TINY, frame_shape=frame_shape,
            yolo_width=0.25,
        )
        ar = ActionRecognizer(ARConfig.for_input("skeleton"))
        rng = np.random.default_rng(0)
        for i in range(2):
            ar.train({
                "flag": f"a{i}",
                "data": {"poses": rng.normal(size=(ar.config.seq_len, 90)).astype(np.float32)},
                "requires_focus": False,
            })

        outs = {}
        for use_pallas in (False, True):
            cfg = PipelineConfig(
                main=MainConfig.for_input("skeleton"), hpe=hpe_cfg,
                pallas_input=use_pallas,
            )
            p = FusedPipeline(cfg, hpe=hpe, ar=ar, with_focus=False,
                              input_format="i420")
            assert p._pallas_input == use_pallas
            p.start()
            src = SyntheticSource(frame_shape[1], frame_shape[0])
            frames = [bgr_to_i420(src.read()[1]) for _ in range(3)]
            outs[use_pallas] = [p.step(f) for f in frames]

        for d_pallas, d_composed in zip(outs[True], outs[False]):
            assert d_pallas.keys() == d_composed.keys()
            for key in d_composed:
                np.testing.assert_allclose(
                    d_pallas[key], d_composed[key], atol=1e-4, rtol=1e-3,
                    err_msg=f"field {key!r} diverges between input stages",
                )
