"""Multi-stream mesh serving tests (8 streams sharded over 8 CPU devices)."""

import jax
import numpy as np
import pytest

from isbfsar_tpu.configs import (
    ARConfig,
    CameraIntrinsics,
    HPEConfig,
    MainConfig,
    PipelineConfig,
)
from isbfsar_tpu.ar.recognizer import ActionRecognizer
from isbfsar_tpu.hpe.estimator import HumanPoseEstimator
from isbfsar_tpu.models.effnetv2 import V2_TINY
from isbfsar_tpu.parallel.mesh import make_mesh
from isbfsar_tpu.pipeline import FusedPipeline
from isbfsar_tpu.runtime.source import SyntheticSource
from isbfsar_tpu.serving import MultiStreamPipeline

FRAME_SHAPE = (120, 160)


@pytest.fixture(scope="module")
def multi():
    hpe_cfg = HPEConfig(yolo_input_size=128, crop_size=256, yolo_thresh=0.0)
    intr = CameraIntrinsics(width=FRAME_SHAPE[1], height=FRAME_SHAPE[0])
    hpe = HumanPoseEstimator(
        hpe_cfg, intr, backbone_stages=V2_TINY, frame_shape=FRAME_SHAPE, yolo_width=0.25
    )
    ar = ActionRecognizer(ARConfig.for_input("skeleton"))
    cfg = PipelineConfig(main=MainConfig.for_input("skeleton"), hpe=hpe_cfg)
    pipe = FusedPipeline(cfg, hpe=hpe, ar=ar, with_focus=False)
    rng = np.random.default_rng(0)
    for i in range(2):
        ar.train(
            {
                "flag": f"a{i}",
                "data": {"poses": rng.normal(size=(cfg.ar.seq_len, 90)).astype(np.float32)},
                "requires_focus": False,
            }
        )
    m = MultiStreamPipeline(n_streams=8, mesh=make_mesh(8), pipe=pipe)
    m.start()
    return m


class TestMultiStream:
    def test_sharded_over_mesh(self, multi):
        assert multi._states.window.sharding.num_devices == 8

    def test_streams_are_independent(self, multi):
        """Stream i's window state must track only stream i's frames."""
        rng = np.random.default_rng(1)
        sources = [SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0]) for _ in range(8)]
        # advance stream 0 with distinct frames; others get constant frames
        const = np.zeros(FRAME_SHAPE + (3,), np.uint8)
        for step in range(3):
            frames = np.stack(
                [sources[0].read()[1]] + [const] * 7
            )
            outs = multi.step(frames)
        assert len(outs) == 8
        # identical inputs -> identical outputs for streams 1..7
        for i in range(2, 8):
            np.testing.assert_allclose(outs[i]["pose"], outs[1]["pose"], rtol=1e-5)
        # stream 0 saw different frames -> different pose
        assert np.abs(outs[0]["pose"] - outs[1]["pose"]).max() > 1e-4

    def test_matches_single_stream_pipeline(self, multi):
        """Stream semantics == a lone FusedPipeline fed the same frames."""
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        frames = [src.read()[1] for _ in range(multi.pipe.config.ar.seq_len + 2)]

        multi.start()  # reset states
        single = multi.pipe
        single._state = single.init_state()

        for frame in frames:
            outs = multi.step(np.stack([frame] * 8))
            ref = single.step(frame)
        np.testing.assert_allclose(outs[3]["pose"], ref["pose"], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(outs[3]["probs"], ref["probs"], rtol=1e-3, atol=1e-5)
        assert bool(outs[3]["ar_ready"]) and bool(ref["ar_ready"])

    def test_decode_contract(self, multi):
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        outs = multi.step(np.stack([src.read()[1]] * 8))
        elements = multi.decode(outs[0])
        assert "actions" in elements

    def test_stream_double_buffered_parity(self, multi):
        """multi.stream (dispatch i / fetch i-1 overlap) must yield exactly
        the sync step() sequence."""
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        ticks = [np.stack([src.read()[1] for _ in range(8)]) for _ in range(4)]

        multi.start()
        ref = [multi.step(t) for t in ticks]
        multi.start()  # reset stream states
        got = list(multi.stream(iter(ticks)))
        assert len(got) == len(ref)
        for g_tick, r_tick in zip(got, ref):
            for g, r in zip(g_tick, r_tick):
                np.testing.assert_allclose(g["pose"], r["pose"], rtol=1e-5, atol=1e-6)
                np.testing.assert_allclose(g["probs"], r["probs"], rtol=1e-5, atol=1e-6)

    def test_stream_batched_parity(self, multi):
        """Per-stream micro-batching (one round-trip per S x B block) must
        yield the same per-tick outputs, including the partial tail."""
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        ticks = [np.stack([src.read()[1] for _ in range(8)]) for _ in range(5)]

        multi.start()
        ref = [multi.step(t) for t in ticks]
        multi.start()
        got = list(multi.stream_batched(iter(ticks), batch_size=2))
        assert len(got) == len(ref)  # 2 full blocks + 1 tail tick
        for g_tick, r_tick in zip(got, ref):
            for g, r in zip(g_tick, r_tick):
                np.testing.assert_allclose(g["pose"], r["pose"], rtol=1e-5, atol=1e-6)
                np.testing.assert_allclose(g["probs"], r["probs"], rtol=1e-5, atol=1e-6)

    def test_refresh_support_propagates_edits(self, multi):
        """A post-start support edit reaches the device shards only via
        refresh_support() (ADVICE r2: start() snapshots once)."""
        rng = np.random.default_rng(7)
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        frames = np.stack([src.read()[1]] * 8)

        before_mask = np.asarray(multi._support_mask).copy()
        before_kv = np.asarray(multi._support_kv[0]).copy()
        multi.pipe.ar.train({
            "flag": "late_class",
            "data": {"poses": rng.normal(
                size=(multi.pipe.config.ar.seq_len, 90)).astype(np.float32)},
            "requires_focus": False,
        })
        # The support K/V the match actually consumes is NOT updated by the
        # edit alone (start() snapshots it — the ADVICE r2 finding). The
        # mask itself may alias the recognizer's numpy buffer on CPU
        # (zero-copy jnp.asarray), so the lazy-KV cache is the assertable
        # part of the gap.
        np.testing.assert_allclose(np.asarray(multi._support_kv[0]), before_kv)
        multi.refresh_support()
        assert np.asarray(multi._support_mask).sum() == before_mask.sum() + 1
        # the K/V cache the match consumes changed too (new class slot)
        assert np.abs(np.asarray(multi._support_kv[0]) - before_kv).max() > 1e-6
        outs = multi.step(frames)  # still serves after the refresh
        assert len(outs) == 8


class TestComposedMesh:
    def test_streams_x_way_composition(self):
        """2D mesh (4 stream-devices x 2 way-devices): streams sharded on
        'dp' AND each stream's support match split over 'way' must equal
        the 1D replicated-support serving path (docs/SCALING.md
        "Composition", certified)."""
        import dataclasses

        from isbfsar_tpu.parallel.mesh import make_mesh_2d

        hpe_cfg = HPEConfig(yolo_input_size=128, crop_size=256, yolo_thresh=0.0)
        intr = CameraIntrinsics(width=FRAME_SHAPE[1], height=FRAME_SHAPE[0])
        hpe = HumanPoseEstimator(
            hpe_cfg, intr, backbone_stages=V2_TINY, frame_shape=FRAME_SHAPE,
            yolo_width=0.25,
        )
        ar_cfg = dataclasses.replace(ARConfig.for_input("skeleton"), way=16)
        ar = ActionRecognizer(ar_cfg)
        rng = np.random.default_rng(0)
        for i in range(5):
            ar.train({
                "flag": f"a{i}",
                "data": {"poses": rng.normal(size=(ar_cfg.seq_len, 90)).astype(np.float32)},
                "requires_focus": False,
            })
        cfg = PipelineConfig(main=MainConfig.for_input("skeleton"), hpe=hpe_cfg, ar=ar_cfg)
        pipe = FusedPipeline(cfg, hpe=hpe, ar=ar, with_focus=False)

        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        frames = np.stack([src.read()[1] for _ in range(4)])

        # flat reference: 8 streams on the 1D mesh, streams 0-3 fed the
        # same frames as the composed run's 4 streams
        flat = MultiStreamPipeline(n_streams=8, mesh=make_mesh(8), pipe=pipe)
        flat.start()
        flat_frames = np.concatenate([frames, frames])  # (8, ...)
        composed = MultiStreamPipeline(
            n_streams=4, mesh=make_mesh_2d((4, 2)), pipe=pipe, way_axis="way"
        )
        composed.start()
        # the support K/V cache really is class-sharded over the way axis
        assert composed._support_kv[0].sharding.shard_shape(
            composed._support_kv[0].shape
        )[0] == 8  # 16 classes / 2 way-devices

        outs_flat = outs_comp = None
        for _ in range(3):
            outs_flat = flat.step(flat_frames)
            outs_comp = composed.step(frames)
        for i in range(4):
            np.testing.assert_allclose(
                outs_comp[i]["pose"], outs_flat[i]["pose"], rtol=1e-4, atol=1e-5
            )
            np.testing.assert_allclose(
                outs_comp[i]["probs"], outs_flat[i]["probs"], rtol=1e-3, atol=1e-5
            )
