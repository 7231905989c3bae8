"""Runtime layer tests: orchestrator loop, command protocol, IPC hub."""

import dataclasses
import queue

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
from isbfsar_tpu.runtime.orchestrator import Orchestrator
from isbfsar_tpu.runtime.source import SyntheticSource
from isbfsar_tpu.runtime.visualizer import ConsoleVisualizer, score_bar

FRAME_SHAPE = (120, 160)


class FakeClock:
    """Deterministic clock: each call advances 0.25 s."""

    def __init__(self):
        self.t = 0.0

    def __call__(self):
        self.t += 0.25
        return self.t


class AutoFrameQueue:
    """In-queue stub: always hands out a fresh synthetic frame dict."""

    def __init__(self):
        self.src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])

    def get(self):
        return {"rgb": self.src.read()[1], "msg": ""}


class Collector:
    def __init__(self):
        self.items = []

    def put(self, x):
        self.items.append(x)


@pytest.fixture(scope="module")
def orchestrator():
    hpe_cfg = HPEConfig(yolo_input_size=128, crop_size=256, yolo_thresh=0.0)
    intr = CameraIntrinsics(width=FRAME_SHAPE[1], height=FRAME_SHAPE[0])
    hpe = HumanPoseEstimator(
        hpe_cfg, intr, backbone_stages=V2_TINY, frame_shape=FRAME_SHAPE, yolo_width=0.25
    )
    focus = FocusDetector(FocusConfig(), intr, frame_shape=FRAME_SHAPE)
    ar = ActionRecognizer(ARConfig.for_input("skeleton"))
    cfg = PipelineConfig(
        main=MainConfig.for_input("skeleton"), hpe=hpe_cfg, ar=ar.config
    )
    return Orchestrator(
        cfg,
        in_queue=AutoFrameQueue(),
        out_queue=Collector(),
        hpe=hpe,
        focus=focus,
        ar=ar,
        clock=FakeClock(),
    )


class TestHumanoidSource:
    def test_reads_and_rotates_motions(self):
        from isbfsar_tpu.runtime.source import HumanoidSource, make_source

        src = make_source("humanoid", width=160, height=120,
                          motions=("wave", "squat"), frames_per_motion=3)
        frames = [src.read()[1] for _ in range(8)]
        assert all(f.shape == (120, 160, 3) and f.dtype == np.uint8
                   for f in frames)
        # motion rotation: frame 0 (wave clip) differs from frame 3 (squat)
        assert not np.array_equal(frames[0], frames[3])
        src.stop()
        assert src.intrinsics().width == 160


class TestOrchestrator:
    def test_get_frame_elements_contract(self, orchestrator):
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        elements = orchestrator.get_frame(img=src.read()[1], log="hello")
        assert "img" in elements and "fps" in elements
        assert elements["log"] == "hello"
        assert "pose" in elements  # thresh=0 slim hpe always finds someone
        assert elements["pose"].shape == (30, 3)
        np.testing.assert_allclose(elements["pose"][0], 0.0, atol=1e-6)  # root-relative
        assert "distance" in elements
        assert elements["actions"] == {}  # empty support set
        # the out queue got the same dict
        assert orchestrator._out_queue.items[-1] is elements

    def test_learn_then_recognize_and_forget(self, orchestrator):
        log = orchestrator.learn_command(["wave", "-focus"])
        assert "learned successfully" in log
        assert orchestrator.ar.n_classes == 1
        assert orchestrator.ar.requires_focus == {"wave": True}

        # window fills with seq_len frames, then actions appear
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        for _ in range(orchestrator.config.ar.seq_len + 1):
            elements = orchestrator.get_frame(img=src.read()[1])
        assert "wave" in elements["actions"]

        assert orchestrator.forget_command("wave") == "Action wave removed"
        assert "not in the support set" in orchestrator.forget_command("wave")

    def test_save_load_roundtrip(self, orchestrator, tmp_path):
        orchestrator.save_dir = str(tmp_path)
        orchestrator.learn_command(["point"])
        assert "saved successfully" in orchestrator.save()
        orchestrator.forget_command("point")
        assert orchestrator.ar.n_classes == 0
        assert orchestrator.load() == "Loaded 1 classes"
        assert orchestrator.ar.n_classes == 1
        orchestrator.forget_command("point")

    def test_debug_summary(self, orchestrator):
        info = orchestrator.debug()
        assert set(info.keys()) == {"classes", "requires_focus", "support_data", "mask"}

    def test_run_loop_commands(self, orchestrator):
        class ScriptedQueue:
            def __init__(self, msgs):
                self.src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
                self.msgs = list(msgs)

            def get(self):
                msg = self.msgs.pop(0) if self.msgs else "quit"
                return {"rgb": self.src.read()[1], "msg": msg}

        orchestrator._in_queue = ScriptedQueue(["", "bogus cmd", "remove nothere", "quit"])
        out = Collector()
        orchestrator._out_queue = out
        orchestrator.run()  # terminates on 'quit'
        logs = [e.get("log") for e in out.items if isinstance(e, dict) and e.get("log")]
        assert "Not a valid command!" in logs
        assert any("not in the support set" in (l or "") for l in logs)
        orchestrator._in_queue = AutoFrameQueue()


class TestIPC:
    def test_hub_roundtrip(self):
        from isbfsar_tpu.runtime.ipc import QueueClient, QueueHub

        hub = QueueHub(("127.0.0.1", 0)).start_background()
        addr = hub._server.address
        client = QueueClient(addr[0], addr[1])
        q1 = client.get_queue("source_human")
        q2 = client.get_queue("source_human")
        q1.put({"rgb": 1, "msg": "hi"})
        assert q2.get() == {"rgb": 1, "msg": "hi"}

    def test_capacity_one_backpressure(self):
        from isbfsar_tpu.runtime.ipc import QueueClient, QueueHub

        hub = QueueHub(("127.0.0.1", 0)).start_background()
        addr = hub._server.address
        q = QueueClient(addr[0], addr[1]).get_queue("bp")
        q.put(1)
        with pytest.raises(queue.Full):
            q.put(2, False)  # capacity-1: second put must fail
        assert q.get() == 1


class TestVisualizer:
    def test_score_bar(self):
        assert score_bar(0.5, 10) == "#####-----"
        assert score_bar(-1.0, 4) == "----"
        assert score_bar(2.0, 4) == "####"

    def test_console_show(self, capsys):
        viz = ConsoleVisualizer()
        viz.show(
            {
                "fps": 31.2,
                "distance": 1.5,
                "focus": True,
                "is_true": 0.8,
                "actions": {"wave": 0.9},
                "requires_focus": {"wave": True},
                "log": "ok",
            }
        )
        out = capsys.readouterr().out
        assert "wave" in out and "fps" in out and "focus YES" in out and "ok" in out

    def test_mpl_pose_printer(self, tmp_path, rng):
        from isbfsar_tpu.runtime.visualizer import MPLPosePrinter
        from isbfsar_tpu.utils.skeleton import get_skeleton

        viz = MPLPosePrinter(interactive=False)
        pose = rng.normal(size=(30, 3))
        viz.print_pose(pose, get_skeleton("smpl+head_30").edges)
        viz.save(str(tmp_path / "pose.png"))
        viz.clear()
        assert (tmp_path / "pose.png").exists()


class TestLiveServiceIntegration:
    @pytest.mark.slow  # ~156 s
    def test_threaded_service_add_command_no_deadlock(self, orchestrator):
        """Full source->hub->orchestrator loop with a live `add` command.

        Regression guard for the ACK deadlock class: the source must treat
        the ACK as that cycle's elements (a second blocking get while the
        compute side waits for the next acquisition frame freezes the whole
        service)."""
        import threading

        from isbfsar_tpu.runtime.ipc import QueueClient, QueueHub
        from isbfsar_tpu.runtime.source import SyntheticSource, run_source

        hub = QueueHub(("127.0.0.1", 0)).start_background()
        addr = hub._server.address
        client = QueueClient(addr[0], addr[1])
        orchestrator._in_queue = client.get_queue("source_human")
        orchestrator._out_queue = client.get_queue("human_sink")
        orchestrator.ar.remove("wave")

        def serve():
            orchestrator.run()

        t = threading.Thread(target=serve, daemon=True)
        t.start()

        def commands():
            yield "add wave"
            for _ in range(400):
                yield ""
            yield "quit"
            while True:
                yield ""

        collected = []

        class Collect:
            def show(self, elements):
                collected.append(elements)

        n = run_source(
            SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0]),
            hub_host=addr[0],
            hub_port=addr[1],
            visualizer=Collect(),
            command_stream=commands(),
            max_frames=500,
        )
        t.join(timeout=60)
        assert not t.is_alive(), "orchestrator did not exit on quit"
        logs = [e.get("log") for e in collected if e.get("log")]
        assert any("learned successfully" in (l or "") for l in logs), logs[:5]
        assert any(e.get("actions") for e in collected), "AR never fired"
        orchestrator._in_queue = None
        orchestrator._out_queue = None


class TestFusedOrchestrator:
    def test_fused_frame_path_and_commands(self, orchestrator):
        """Orchestrator backed by the FusedPipeline: same elements contract,
        support-set edits refresh the cached K/V."""
        from isbfsar_tpu.pipeline import FusedPipeline

        fused = FusedPipeline(
            orchestrator.config, hpe=orchestrator.hpe, ar=orchestrator.ar,
            with_focus=False,
        )
        orch = Orchestrator(
            orchestrator.config,
            in_queue=AutoFrameQueue(),
            out_queue=Collector(),
            fused=fused,
            clock=FakeClock(),
        )
        log = orch.learn_command(["spin"])
        assert "learned successfully" in log
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        for _ in range(orch.config.ar.seq_len + 1):
            elements = orch.get_frame(img=src.read()[1])
        assert "spin" in elements["actions"]
        assert "pose" in elements and elements["pose"].shape == (30, 3)
        assert orch.forget_command("spin") == "Action spin removed"
        elements = orch.get_frame(img=src.read()[1])
        assert elements["actions"] == {}
        orchestrator.ar.remove("spin")

    def test_fused_overlap_one_frame_lag(self, orchestrator):
        """Double-buffered fused serve path (VERDICT r2 #2): call i returns
        frame i-1's img+results; call 0 is a priming frame; results equal
        the synchronous path's for the same frame sequence."""
        from isbfsar_tpu.pipeline import FusedPipeline

        fused = FusedPipeline(
            orchestrator.config, hpe=orchestrator.hpe, ar=orchestrator.ar,
            with_focus=False,
        )
        orch = Orchestrator(
            orchestrator.config, in_queue=AutoFrameQueue(),
            out_queue=Collector(), fused=fused, clock=FakeClock(),
        )
        assert orch.fused_overlap  # overlap is the serve default
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        f0, f1, f2 = (src.read()[1] for _ in range(3))

        e0 = orch.get_frame(img=f0)
        # priming frame: full elements contract, no detection yet
        assert e0["actions"] == {} and "pose" not in e0
        assert e0["img"] is f0
        e1 = orch.get_frame(img=f1)
        assert e1["img"] is f0  # one-frame lag: results ride with THEIR img
        e2 = orch.get_frame(img=f2)
        assert e2["img"] is f1

        # numerical parity with the synchronous path over the same frames
        # (fresh Orchestrator resets the fused window state via start())
        sync = Orchestrator(
            orchestrator.config, in_queue=AutoFrameQueue(),
            out_queue=Collector(), fused=fused, fused_overlap=False,
            clock=FakeClock(),
        )
        s0 = sync.get_frame(img=f0)
        s1 = sync.get_frame(img=f1)
        np.testing.assert_allclose(e1["pose"], s0["pose"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(e2["pose"], s1["pose"], rtol=1e-5, atol=1e-6)

        # support-set edits drop the stale pending frame and re-prime
        orch.get_frame(img=src.read()[1])
        orch._refresh_support()
        assert orch._fused_pending is None
        e = orch.get_frame(img=src.read()[1])
        assert e["actions"] == {} and "pose" not in e

    def test_fused_batched_serve_parity(self, orchestrator):
        """get_frame_batch: B frames, one device round-trip, results pair
        with inputs and equal the synchronous per-frame path."""
        from isbfsar_tpu.pipeline import FusedPipeline

        fused = FusedPipeline(
            orchestrator.config, hpe=orchestrator.hpe, ar=orchestrator.ar,
            with_focus=False,
        )
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        frames = [src.read()[1] for _ in range(4)]

        batch_orch = Orchestrator(
            orchestrator.config, in_queue=AutoFrameQueue(),
            out_queue=Collector(), fused=fused, clock=FakeClock(),
        )
        outs = batch_orch.get_frame_batch(frames, log="hi")
        assert len(outs) == 4
        for img, e in zip(frames, outs):
            assert e["img"] is img and e["log"] == "hi" and "fps" in e

        sync = Orchestrator(
            orchestrator.config, in_queue=AutoFrameQueue(),
            out_queue=Collector(), fused=fused, fused_overlap=False,
            clock=FakeClock(),
        )
        for img, e in zip(frames, outs):
            ref = sync.get_frame(img=img)
            np.testing.assert_allclose(e["pose"], ref["pose"], rtol=1e-5, atol=1e-6)

        # overlap=True: batch-level double-buffering — each call returns
        # the PREVIOUS batch's results, paired with ITS imgs
        ov = Orchestrator(
            orchestrator.config, in_queue=AutoFrameQueue(),
            out_queue=Collector(), fused=fused, clock=FakeClock(),
        )
        first = ov.get_frame_batch(frames[:2], overlap=True)
        assert first == []  # pipeline fill
        second = ov.get_frame_batch(frames[2:4], overlap=True)
        assert len(second) == 2
        assert second[0]["img"] is frames[0] and second[1]["img"] is frames[1]
        np.testing.assert_allclose(second[0]["pose"], outs[0]["pose"],
                                   rtol=1e-5, atol=1e-6)
        # support edits drop the stale pending batch
        ov._refresh_support()
        assert ov._fused_batch_pending is None

    def test_fused_i420_transport(self, orchestrator):
        """serve --transport i420: the orchestrator encodes BGR frames to
        planar YUV host-side and the fused graph decodes them — same
        elements contract, half the H2D bytes."""
        from isbfsar_tpu.pipeline import FusedPipeline

        fused = FusedPipeline(
            orchestrator.config, hpe=orchestrator.hpe, ar=orchestrator.ar,
            with_focus=False, input_format="i420",
        )
        orch = Orchestrator(
            orchestrator.config,
            in_queue=AutoFrameQueue(),
            out_queue=Collector(),
            fused=fused,
            clock=FakeClock(),
        )
        log = orch.learn_command(["wave"])
        assert "learned successfully" in log
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        for _ in range(orch.config.ar.seq_len + 1):
            elements = orch.get_frame(img=src.read()[1])
        assert "wave" in elements["actions"]
        assert elements["pose"].shape == (30, 3)
        orchestrator.ar.remove("wave")


class TestRgbHybridOrchestrator:
    @pytest.mark.parametrize("input_type", ["rgb", "hybrid"])
    def test_mode_learn_and_recognize(self, orchestrator, input_type):
        """rgb/hybrid frame paths: bbox crop -> AR rgb branch (reference
        main.py:76-93). just_box for rgb, full estimate for hybrid."""
        ar_cfg = dataclasses.replace(ARConfig.for_input(input_type), rgb_size=64)
        ar = ActionRecognizer(ar_cfg)
        cfg = PipelineConfig(
            main=MainConfig.for_input(input_type),
            hpe=dataclasses.replace(
                HPEConfig(yolo_input_size=128, crop_size=256, yolo_thresh=0.0),
                just_box=(input_type == "rgb"),
            ),
            ar=ar_cfg,
        )
        hpe = HumanPoseEstimator(
            cfg.hpe, CameraIntrinsics(width=FRAME_SHAPE[1], height=FRAME_SHAPE[0]),
            params=orchestrator.hpe.params,
            backbone_stages=V2_TINY, frame_shape=FRAME_SHAPE, yolo_width=0.25,
        )
        orch = Orchestrator(
            cfg, in_queue=AutoFrameQueue(), out_queue=Collector(),
            hpe=hpe, focus=orchestrator.focus, ar=ar, clock=FakeClock(),
        )
        log = orch.learn_command(["act"])
        assert "learned successfully" in log
        assert ar.n_classes == 1
        src = SyntheticSource(FRAME_SHAPE[1], FRAME_SHAPE[0])
        for _ in range(ar_cfg.seq_len + 1):
            elements = orch.get_frame(img=src.read()[1])
        assert "act" in elements["actions"]
        assert "img_preprocessed" in elements
        assert elements["img_preprocessed"].shape == (64, 64, 3)
        assert elements["img_preprocessed"].dtype == np.float32
        # bbox order regression: the orchestrator unpacks (x1, x2, y1, y2)
        # for BOTH modes; just_box (rgb) must emit the same order — the
        # degenerate-box guard guarantees x2 >= x1+1 and y2 >= y1+1, which
        # a scrambled order (the reference's own rgb bug, main.py:80 vs
        # hpe.py:83) would not.
        x1, x2, y1, y2 = elements["bbox"]
        assert x2 > x1 and y2 > y1
