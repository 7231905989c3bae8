"""Fused pipeline tests: single-program streaming parity with the modules."""

import dataclasses

import numpy as np
import pytest

from isbfsar_tpu.configs import (
    ARConfig,
    CameraIntrinsics,
    FocusConfig,
    HPEConfig,
    MainConfig,
    PipelineConfig,
)
from isbfsar_tpu.ar.recognizer import ActionRecognizer
from isbfsar_tpu.focus.detector import FocusDetector
from isbfsar_tpu.hpe.estimator import HumanPoseEstimator
from isbfsar_tpu.models.effnetv2 import V2_TINY
from isbfsar_tpu.pipeline import FusedPipeline
from isbfsar_tpu.runtime.source import SyntheticSource

FRAME_SHAPE = (120, 160)


@pytest.fixture(scope="module")
def pipe():
    hpe_cfg = HPEConfig(yolo_input_size=128, crop_size=256, yolo_thresh=0.0)
    intr = CameraIntrinsics(width=FRAME_SHAPE[1], height=FRAME_SHAPE[0])
    hpe = HumanPoseEstimator(
        hpe_cfg, intr, backbone_stages=V2_TINY, frame_shape=FRAME_SHAPE, yolo_width=0.25
    )
    ar = ActionRecognizer(ARConfig.for_input("skeleton"))
    cfg = PipelineConfig(main=MainConfig.for_input("skeleton"), hpe=hpe_cfg)
    p = FusedPipeline(cfg, hpe=hpe, ar=ar, with_focus=False)
    rng = np.random.default_rng(0)
    for i in range(2):
        ar.train(
            {
                "flag": f"a{i}",
                "data": {"poses": rng.normal(size=(cfg.ar.seq_len, 90)).astype(np.float32)},
                "requires_focus": False,
            }
        )
    p.start()
    return p


class TestFusedPipeline:
    def test_warmup_then_actions(self, pipe):
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        seq_len = pipe.config.ar.seq_len
        for i in range(seq_len - 1):
            elements = pipe.decode(pipe.step(src.read()[1]))
            assert elements["actions"] == {}, f"frame {i}: ar fired before window full"
        elements = pipe.decode(pipe.step(src.read()[1]))
        assert set(elements["actions"]) == {"a0", "a1"}
        assert abs(sum(elements["actions"].values()) - 1.0) < 1e-5
        assert "pose" in elements and elements["pose"].shape == (30, 3)
        assert 0.0 <= elements["is_true"] <= 1.0

    def test_pose_matches_unfused_module(self, pipe):
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        frame = src.read()[1]
        fused = pipe.step(frame)
        unfused = pipe.hpe.estimate(frame)
        assert bool(fused["pose_ok"])
        np.testing.assert_allclose(
            np.asarray(fused["pose_abs"]), unfused["pose"], rtol=1e-5, atol=1e-6
        )

    def test_probs_match_unfused_recognizer(self, pipe):
        """The fused match must equal ActionRecognizer over the same stream."""
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        frames = [src.read()[1] for _ in range(pipe.config.ar.seq_len)]

        ar2 = ActionRecognizer(pipe.config.ar, params=pipe.ar.params)
        for i, name in enumerate(pipe.ar.class_order):
            if name is not None:
                ar2.train(
                    {
                        "flag": name,
                        "data": {"poses": pipe.ar.support_data["sk"][i]},
                        "requires_focus": False,
                    }
                )

        pipe._state = pipe.init_state()  # reset window
        for frame in frames:
            fused_out = pipe.step(frame)
            pose = np.asarray(fused_out["pose"])
            ref_results = ar2.inference({"sk": pose.reshape(-1)})

        fused_probs = pipe.decode(fused_out)["actions"]
        assert set(fused_probs) == set(ref_results[0])
        for k in fused_probs:
            np.testing.assert_allclose(fused_probs[k], ref_results[0][k], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            float(fused_out["is_true"]), ref_results[1], rtol=1e-4, atol=1e-5
        )

    def test_state_is_device_resident(self, pipe):
        import jax

        assert isinstance(pipe._state.window, jax.Array)
        assert int(pipe._state.n_valid) >= pipe.config.ar.seq_len


class TestBatchedStream:
    def test_batched_equals_sequential(self, pipe):
        """stream_batched must produce bit-identical per-frame results to
        sequential step() — same window recurrence, same AR matches."""
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        frames = [src.read()[1] for _ in range(10)]

        pipe._state = pipe.init_state()
        seq = [pipe.step(f) for f in frames]

        pipe._state = pipe.init_state()
        batched = list(pipe.stream_batched(iter(frames), batch_size=4))

        assert len(batched) == len(seq)
        for s, b in zip(seq, batched):
            np.testing.assert_allclose(b["pose"], s["pose"], rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(b["probs"], s["probs"], rtol=1e-4, atol=1e-5)
            assert bool(b["pose_ok"]) == bool(s["pose_ok"])
            assert bool(b["ar_ready"]) == bool(s["ar_ready"])


class TestPrefetch:
    def test_dispatch_survives_missing_copy_to_host_async(self, pipe):
        """The eager-D2H discipline must degrade to a no-op, not crash,
        where the backend's arrays lack copy_to_host_async (pipeline.py
        _start_host_copy one-shot fallback)."""

        class NoAsync:
            def copy_to_host_async(self):
                raise RuntimeError("backend does not support it")

        assert pipe._prefetch_ok  # CPU jax.Array supports it
        pipe._start_host_copy(NoAsync())
        assert not pipe._prefetch_ok  # one-shot: never tried again
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        out = pipe.decode(pipe.step(src.read()[1]))  # still serves frames
        assert "actions" in out
        pipe._prefetch_ok = True  # restore for the other module-scoped tests

    def test_prefetch_host_skips_non_array_leaves(self):
        from isbfsar_tpu.utils import transfer

        # None placeholders (e.g. focus normalized_image) must not trip it
        transfer.prefetch_host({"a": None, "b": np.zeros(3)})
        assert transfer._supported


class TestGraftEntry:
    @pytest.mark.slow  # ~16 min: the full dryrun composition matrix + multihost
    def test_dryrun_multichip_8(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestI420Pipeline:
    def test_i420_matches_bgr_closely(self, pipe):
        """i420 transport must yield near-identical pipeline outputs (chroma
        subsampling introduces small pixel error only)."""
        from isbfsar_tpu.ops.image import bgr_to_i420

        p2 = FusedPipeline(
            pipe.config, hpe=pipe.hpe, ar=pipe.ar, with_focus=False,
            input_format="i420",
        )
        p2.start()
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        frame = src.read()[1]

        pipe._state = pipe.init_state()
        bgr_out = pipe.step(frame)
        p2._state = p2.init_state()
        yuv_out = p2.step(bgr_to_i420(frame))

        assert bool(yuv_out["pose_ok"]) == bool(bgr_out["pose_ok"])
        # poses from slightly different pixels; should be close, not exact
        assert np.abs(yuv_out["bbox"] - bgr_out["bbox"]).max() <= 8


class TestFusedRgbHybrid:
    def _build(self, input_type, hpe):
        ar_cfg = dataclasses.replace(ARConfig.for_input(input_type), rgb_size=64)
        ar = ActionRecognizer(ar_cfg)
        cfg = PipelineConfig(
            main=MainConfig.for_input(input_type),
            hpe=dataclasses.replace(HPEConfig(yolo_input_size=128, crop_size=256), yolo_thresh=0.0),
            ar=ar_cfg,
        )
        p = FusedPipeline(cfg, hpe=hpe, ar=ar, with_focus=False)
        rng = np.random.default_rng(0)
        for i in range(2):
            data = {}
            if input_type in ("skeleton", "hybrid"):
                data["poses"] = rng.normal(size=(ar_cfg.seq_len, 90)).astype(np.float32)
            if input_type in ("rgb", "hybrid"):
                data["imgs"] = rng.uniform(0, 1, (ar_cfg.seq_len, 64, 64, 3)).astype(np.float32)
            ar.train({"flag": f"a{i}", "data": data, "requires_focus": False})
        p.start()
        return p

    @pytest.mark.parametrize("input_type", ["rgb", "hybrid"])
    def test_fused_mode_fires(self, pipe, input_type):
        p = self._build(input_type, pipe.hpe)
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        for _ in range(p.config.ar.seq_len):
            elements = p.decode(p.step(src.read()[1]))
        assert set(elements["actions"]) == {"a0", "a1"}
        assert abs(sum(elements["actions"].values()) - 1.0) < 1e-5
        # batched path agrees with sequential for the same stream
        frames = [src.read()[1] for _ in range(6)]
        p._state = p.init_state()
        seq = [p.step(f) for f in frames]
        p._state = p.init_state()
        batched = list(p.stream_batched(iter(frames), batch_size=3))
        for s, b in zip(seq, batched):
            np.testing.assert_allclose(b["probs"], s["probs"], rtol=1e-4, atol=1e-5)


class TestFusedRgbJustBox:
    def test_detector_only_path(self, pipe):
        """rgb + just_box (the reference's actual rgb configuration,
        configs.for_input): the fused step runs YOLO only — no pose chain —
        and decode publishes bbox but NO pose, matching the reference's rgb
        elements (main.py:76-93)."""
        from isbfsar_tpu.hpe.estimator import HumanPoseEstimator

        hpe = HumanPoseEstimator(
            dataclasses.replace(pipe.hpe.config, yolo_thresh=0.0),
            CameraIntrinsics(width=FRAME_SHAPE[1], height=FRAME_SHAPE[0]),
            params=pipe.hpe.params,
            backbone_stages=V2_TINY, frame_shape=FRAME_SHAPE,
            just_box=True, yolo_width=0.25,
        )
        ar_cfg = dataclasses.replace(ARConfig.for_input("rgb"), rgb_size=64)
        ar = ActionRecognizer(ar_cfg)
        cfg = PipelineConfig(
            main=MainConfig.for_input("rgb"),
            hpe=dataclasses.replace(
                HPEConfig(yolo_input_size=128, crop_size=256),
                yolo_thresh=0.0, just_box=True,
            ),
            ar=ar_cfg,
        )
        p = FusedPipeline(cfg, hpe=hpe, ar=ar, with_focus=False)
        rng = np.random.default_rng(0)
        for i in range(2):
            ar.train({
                "flag": f"a{i}",
                "data": {"imgs": rng.uniform(0, 1, (ar_cfg.seq_len, 64, 64, 3)).astype(np.float32)},
                "requires_focus": False,
            })
        p.start()
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        for _ in range(ar_cfg.seq_len):
            elements = p.decode(p.step(src.read()[1]))
        assert set(elements["actions"]) == {"a0", "a1"}
        assert "bbox" in elements
        assert "pose" not in elements and "distance" not in elements
        x1, x2, y1, y2 = elements["bbox"]
        assert x2 > x1 and y2 > y1
