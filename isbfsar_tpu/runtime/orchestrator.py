"""Pipeline orchestrator — the live frame loop and command protocol.

Behavioral rebuild of the reference's ``ISBFSAR`` class (reference
main.py:21-342). Topology change, behavior preserved: the reference runs
focus and hpe in separate OS processes fed by capacity-1 queues
(main.py:26-38) because each TensorRT engine needs its own CUDA context;
here one JAX process owns the chip and the fan-out is two async XLA
dispatches (estimate_async) joined in the same order the reference joins its
queues (hpe -> AR -> focus, main.py:73-122).

Preserved contracts:
- per-frame ``elements`` dict: img, bbox, pose, edges, distance, actions,
  is_true, requires_focus, focus, face_bbox, fps, log (main.py:59-138)
- command protocol: add <name> [-focus] (ACK **before** acquisition or the
  host UI deadlocks, main.py:156 / SURVEY §5), remove, save, load, debug,
  close/exit/quit/q
- learn_command: 3 s countdown, ``window_size`` good frames paced over
  ``acquisition_time`` seconds (main.py:243-319)
- 10-frame moving-average FPS (main.py:127-130)
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import numpy as np

from isbfsar_tpu.ar.recognizer import ActionRecognizer
from isbfsar_tpu.configs import PipelineConfig
from isbfsar_tpu.focus.detector import FocusDetector
from isbfsar_tpu.hpe.estimator import HumanPoseEstimator
from isbfsar_tpu.ops.image import IMAGENET_SCALE, IMAGENET_SHIFT


def preprocess_ar_crop(img: np.ndarray, bbox, out: int = 224) -> np.ndarray:
    """Square crop around bbox center -> (out, out, 3) whitened float
    (reference main.py:81-91; NHWC here, CHW there)."""
    import cv2

    x1, x2, y1, y2 = bbox
    xm, ym = int((x1 + x2) / 2), int((y1 + y2) / 2)
    half = max(xm - x1, ym - y1, 1)
    crop = img[max(ym - half, 0): ym + half, max(xm - half, 0): xm + half]
    crop = cv2.resize(crop, (out, out))
    # float32 throughout: the AR extractor computes in f32/bf16 anyway, and
    # f64 would double the crop's bytes through every transport (shm slot,
    # TCP hub pickle) and the H2D upload for zero precision benefit
    crop = crop.astype(np.float32) / np.float32(255.0)
    return (crop * np.asarray(IMAGENET_SCALE, np.float32)
            + np.asarray(IMAGENET_SHIFT, np.float32))


class Orchestrator:
    def __init__(
        self,
        config: Optional[PipelineConfig] = None,
        in_queue=None,
        out_queue=None,
        hpe: Optional[HumanPoseEstimator] = None,
        focus: Optional[FocusDetector] = None,
        ar: Optional[ActionRecognizer] = None,
        save_dir: str = "saved",
        clock=time.time,
        fused=None,
        fused_overlap: bool = True,
    ):
        """fused: optional FusedPipeline — when given (skeleton mode), the
        frame path runs the single-program fused step (one H2D + one packed
        D2H per frame) instead of the three-dispatch module path; the
        command protocol is unchanged (support-set edits refresh the fused
        caches).

        fused_overlap: double-buffer the fused path (default) — each call
        dispatches frame i and decodes frame i-1, so the device computes
        frame i while the host reads frame i-1's packed vector. Semantics
        of the reference's process-queue overlap (reference main.py:73-77)
        with exactly one frame of pipeline latency; the first call after
        start/support-edit returns a priming frame (img + empty actions, no
        pose) while the pipeline fills, like the reference's empty startup
        queues. False = synchronous step per frame (lowest latency, ~half
        the throughput on remote-attached chips — docs/PERF.md)."""
        self.config = config or PipelineConfig()
        self.input_type = self.config.main.input_type
        self.window_size = self.config.main.window_size
        self.acquisition_time = self.config.main.acquisition_time
        self.skeleton_scale = self.config.main.skeleton_scale
        self.save_dir = save_dir
        self.clock = clock

        self.fused = fused
        self.fused_overlap = fused_overlap
        self._fused_pending = None  # (img, packed token) awaiting decode
        self._fused_batch_pending = None  # (imgs, packed, start) for overlapped batches
        if fused is not None:
            self.hpe, self.focus, self.ar = fused.hpe, fused.focus, fused.ar
            fused.start()
        else:
            self.hpe = hpe or HumanPoseEstimator(self.config.hpe, self.config.intrinsics)
            self.focus = focus or FocusDetector(self.config.focus, self.config.intrinsics)
            self.ar = ar or ActionRecognizer(self.config.ar)

        self._in_queue = in_queue
        self._out_queue = out_queue

        self.fps_window = []
        self.edges = None

    # ------------------------------------------------------------ frame path

    def get_frame(self, img: Optional[np.ndarray] = None, log: Optional[str] = None) -> Dict[str, Any]:
        start = self.clock()
        elements: Dict[str, Any] = {}
        ar_input: Dict[str, np.ndarray] = {}

        if img is None:
            img = self._in_queue.get()["rgb"]
        elements["img"] = img

        if self.fused is not None:
            frame = img
            if self.fused.input_format == "i420":
                # halve the H2D bytes: host-side planar encode (~1 ms cv2)
                # for the transfer-bound remote-attached chip (docs/PERF.md)
                from isbfsar_tpu.ops.image import bgr_to_i420

                frame = bgr_to_i420(img)
            if not self.fused_overlap:
                elements.update(self.fused.decode(self.fused.step(frame)))
                return self._finish_frame(elements, start, log)
            # Double-buffered dispatch: enqueue frame i, decode frame i-1
            # while the device computes frame i (reference main.py:73-77's
            # queue overlap, without the processes). One frame of lag.
            token = self.fused.dispatch(frame)
            prev = self._fused_pending
            self._fused_pending = (img, token)
            if prev is None:
                # pipeline priming (the reference's empty startup queues):
                # emit the elements contract with no detection yet
                elements.update(actions={}, is_true=0, requires_focus={})
                return self._finish_frame(elements, start, log)
            prev_img, prev_token = prev
            elements["img"] = prev_img
            elements.update(self.fused.decode(self.fused.fetch(prev_token)))
            return self._finish_frame(elements, start, log)

        # fan-out: dispatch both device programs, then join (main.py:73-77).
        # One H2D for the frame, shared by both programs.
        import jax

        frame_dev = jax.device_put(np.ascontiguousarray(img))
        hpe_token = self.hpe.estimate_async(frame_dev)
        focus_token = self.focus.estimate_async(frame_dev)

        hpe_res = self.hpe.estimate_collect(hpe_token)

        if self.input_type in ("hybrid", "rgb") and hpe_res is not None:
            x1, x2, y1, y2 = hpe_res["bbox"]
            elements["bbox"] = (x1, x2, y1, y2)
            crop = preprocess_ar_crop(img, (x1, x2, y1, y2), out=self.config.ar.rgb_size)
            ar_input["rgb"] = crop
            elements["img_preprocessed"] = crop

        if self.input_type in ("hybrid", "skeleton") and hpe_res is not None:
            pose, edges, bbox = hpe_res["pose"], hpe_res["edges"], hpe_res["bbox"]
            if self.edges is None:
                self.edges = edges
            if pose is not None:
                elements["distance"] = float(np.linalg.norm(pose[0])) * 2.5
                pose = pose - pose[0]
                elements["pose"] = pose
                ar_input["sk"] = pose.reshape(-1)
            elements["edges"] = edges
            if bbox is not None:
                elements["bbox"] = bbox

        actions, is_true, requires_focus = self.ar.inference(ar_input)
        elements["actions"] = actions
        elements["is_true"] = is_true
        elements["requires_focus"] = requires_focus

        focus_res = self.focus.estimate_collect(focus_token)
        if focus_res is not None:
            focus_flag, face = focus_res
            elements["focus"] = focus_flag
            elements["face_bbox"] = face.bbox.reshape(-1)

        return self._finish_frame(elements, start, log)

    def get_frame_batch(self, imgs, log: Optional[str] = None,
                        overlap: bool = False):
        """Micro-batched fused serve: B frames -> B elements dicts via ONE
        device round-trip (one H2D put + one packed D2H for the batch).

        The per-frame `get_frame` path pays two relay round-trips per
        frame (frame put + result get) that no amount of double-buffering
        can hide — measured 21.6 FPS through the remote-attached chip vs
        83+ FPS for this path at B=16 (docs/PERF.md round 3). Results pair
        with their inputs; each distinct batch size compiles its own
        program — pick one B and keep it.

        overlap=False (default): synchronous — the returned elements are
        THIS call's frames; up to one batch of latency. overlap=True:
        batch-level double-buffering — dispatch this batch, return the
        PREVIOUS batch's elements (paired with the previous batch's imgs;
        [] on the first call while the pipeline fills). Hides the device
        round-trip behind the next batch's host work — the stream_batched
        discipline at the service surface."""
        assert self.fused is not None, "get_frame_batch requires fused mode"
        start = self.clock()
        frames = imgs
        if self.fused.input_format == "i420":
            from isbfsar_tpu.ops.image import bgr_to_i420

            frames = [bgr_to_i420(i) for i in imgs]
        packed = self.fused.dispatch_batch(np.stack(frames))

        if overlap:
            prev = self._fused_batch_pending
            self._fused_batch_pending = (list(imgs), packed, start)
            if prev is None:
                return []
            imgs, packed, start = prev

        rows = np.asarray(packed)
        per_frame = max((self.clock() - start) / max(len(imgs), 1), 1e-9)
        out = []
        for img, row in zip(imgs, rows):
            elements = {"img": img}
            elements.update(self.fused.decode(self.fused.layout.unpack(row)))
            out.append(self._publish(elements, per_frame, log))
        return out

    def _publish(self, elements, frame_seconds: float, log):
        """Shared finishing contract for every frame path: moving-average
        FPS over the last 10 frames (main.py:127-130), log line, out queue."""
        self.fps_window.append(1.0 / max(frame_seconds, 1e-9))
        self.fps_window = self.fps_window[-10:]
        elements["fps"] = sum(self.fps_window) / len(self.fps_window)
        if log is not None:
            elements["log"] = log
        if self._out_queue is not None:
            self._out_queue.put(elements)
        return elements

    def _finish_frame(self, elements, start, log):
        return self._publish(elements, self.clock() - start, log)

    def _refresh_support(self) -> None:
        """Rebuild the fused pipeline's cached support K/V after edits."""
        if self.fused is not None:
            # a pending overlapped frame/batch was matched against the OLD
            # support set — drop it (stale actions must not surface
            # post-edit); the next call re-primes the pipeline
            self._fused_pending = None
            self._fused_batch_pending = None
            self.fused.start()

    # -------------------------------------------------------------- commands

    def run(self) -> None:
        """Main loop: pull {rgb, msg} dicts, route commands (main.py:140-176)."""
        while True:
            log = None
            data = self._in_queue.get()
            msg = data.get("msg", "")
            if msg:
                parts = msg.strip().split()
                cmd = parts[0]
                if cmd in ("close", "exit", "quit", "q"):
                    break
                elif cmd == "add" and len(parts) > 1:
                    # ACK must precede acquisition or the host blocks (main.py:156)
                    self._out_queue.put({"ACK": True})
                    log = self.learn_command(parts[1:])
                    data = self._in_queue.get()
                elif cmd == "remove" and len(parts) > 1:
                    log = self.forget_command(parts[1])
                elif cmd == "save":
                    log = self.save()
                elif cmd == "load":
                    log = self.load()
                elif cmd == "debug":
                    self.debug()
                else:
                    log = "Not a valid command!"
            self.get_frame(img=data["rgb"], log=log)

    def learn_command(self, flag) -> str:
        """Acquire a new action clip and insert it (reference main.py:243-319)."""
        requires_focus = "-focus" in flag
        flag = flag[0]

        deadline = self.clock() + 3
        while self.clock() < deadline:
            self.get_frame(log="WAIT...")
        self.get_frame(log="GO!")

        data = []
        off_time = self.acquisition_time / self.window_size
        while len(data) < self.window_size:
            start = self.clock()
            res = self.get_frame(
                log="{:.2f}%".format((len(data) / (self.window_size - 1)) * 100)
            )
            good = (
                self.input_type in ("skeleton", "hybrid")
                and res.get("pose") is not None
            ) or self.input_type == "rgb"
            if good:
                sample = {}
                if self.input_type in ("skeleton", "hybrid"):
                    sample["poses"] = res["pose"].reshape(-1)
                if self.input_type in ("rgb", "hybrid"):
                    sample["imgs"] = res["img_preprocessed"]
                data.append(sample)
            while self.clock() - start < off_time:  # pacing (main.py:267)
                time.sleep(0.001)

        inp = {"flag": flag, "data": {}, "requires_focus": requires_focus}
        for key in data[0]:
            inp["data"][key] = np.stack([s[key] for s in data])
        self.ar.train(inp)
        self._refresh_support()
        return "Action " + flag + " learned successfully!"

    def forget_command(self, flag: str) -> str:
        if self.ar.remove(flag):
            self._refresh_support()
            return f"Action {flag} removed"
        return f"Action {flag} is not in the support set"

    def save(self) -> str:
        path = self.ar.save_support_set(self.save_dir)
        return "Classes saved successfully in " + os.path.join(path, "support_set.npz")

    def load(self) -> str:
        n = self.ar.load_support_set(self.save_dir)
        self._refresh_support()
        return f"Loaded {n} classes"

    def debug(self) -> Dict[str, Any]:
        """Support-set summary (the reference pops cv2 windows, main.py:212-241;
        headless here: return the raw arrays for the frontend to render)."""
        return {
            "classes": self.ar._live_classes(),
            "requires_focus": dict(self.ar.requires_focus),
            "support_data": {k: v.copy() for k, v in self.ar.support_data.items()},
            "mask": self.ar.support_mask.copy(),
        }
