"""Render the committed demo artifact: the TRAINED pipeline doing its job.

Produces a PNG filmstrip (default ``docs/assets/demo_tracking.png``): two
rendered humanoid action clips tracked by the bundled pretrained pose
stack at the reference's 0.3 confidence gate — predicted bbox (red), the
projected 30-joint predicted skeleton (green bones), metric distance
readout — after the fused pipeline LEARNED both actions from separately
rendered clips (reference main.py:243-319 acquisition); each strip is
captioned with the live action-recognition majority vote.

This is the visual receipt of tests/test_posestack.py's e2e demo
(`test_fused_pipeline_learns_and_recognizes`) — same nets, same
thresholds — committed so a reader sees the product work without running
anything.

    python tools/demo_tracking.py [--cpu] [--out docs/assets/demo_tracking.png]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_STRIP = 6  # frames shown per clip
SCALE = 2  # upscale factor for readability (CI frames are 320x240)


def project(points_m: np.ndarray, k: np.ndarray) -> np.ndarray:
    """(N, 3) camera-space meters -> (N, 2) pixel coords."""
    z = np.maximum(points_m[:, 2:3], 1e-6)
    uv = points_m[:, :2] / z
    return uv * np.asarray([k[0, 0], k[1, 1]]) + np.asarray([k[0, 2], k[1, 2]])


def annotate(frame, est_out, k, edges, scale=SCALE):
    """Upscale + draw prediction overlays on one BGR frame."""
    import cv2

    from isbfsar_tpu.train.posestack import BOX_SIZE_M

    img = cv2.resize(frame, (frame.shape[1] * scale, frame.shape[0] * scale),
                     interpolation=cv2.INTER_NEAREST)
    pose, bbox, conf, found, visible = est_out
    if not (bool(found) and bool(visible)):
        cv2.putText(img, "no detection", (8, 22), cv2.FONT_HERSHEY_SIMPLEX,
                    0.5, (0, 0, 255), 1, cv2.LINE_AA)
        return img
    x1, x2, y1, y2 = (np.asarray(bbox, float) * scale).astype(int)
    cv2.rectangle(img, (x1, y1), (x2, y2), (0, 0, 255), 1)
    pose_m = np.asarray(pose, float) * BOX_SIZE_M
    uv = (project(pose_m, k) * scale).astype(int)
    for a, b in edges:
        cv2.line(img, tuple(uv[a]), tuple(uv[b]), (0, 200, 0), 1, cv2.LINE_AA)
    for u, v in uv:
        cv2.circle(img, (int(u), int(v)), 2, (0, 255, 255), -1)
    dist = float(np.linalg.norm(pose_m[0]))
    cv2.putText(img, f"conf {float(conf):.2f}  z {dist:.2f} m", (8, 22),
                cv2.FONT_HERSHEY_SIMPLEX, 0.45, (255, 255, 255), 1,
                cv2.LINE_AA)
    return img


def caption_bar(width: int, text: str):
    import cv2

    bar = np.full((30, width, 3), 32, np.uint8)
    cv2.putText(bar, text, (8, 21), cv2.FONT_HERSHEY_SIMPLEX, 0.55,
                (80, 255, 80), 1, cv2.LINE_AA)
    return bar


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "assets", "demo_tracking.png"))
    parser.add_argument("--cpu", action="store_true",
                        help="pin jax to CPU (sitecustomize otherwise "
                             "force-registers the TPU relay)")
    parser.add_argument("--gui-out", default=None,
                        help="also render one recognizing frame through the "
                             "live Orchestrator + GUIVisualizer 2x2 panel "
                             "(offscreen) to this path")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import cv2

    from isbfsar_tpu.ar.recognizer import ActionRecognizer
    from isbfsar_tpu.configs import ARConfig, HPEConfig, MainConfig, PipelineConfig
    from isbfsar_tpu.hpe.estimator import HumanPoseEstimator
    from isbfsar_tpu.models.effnetv2 import V2_TINY
    from isbfsar_tpu.pipeline import FusedPipeline
    from isbfsar_tpu.train.posestack import (
        CI_FRAME_HW,
        CI_INTRINSICS,
        render_motion_clip,
    )
    from isbfsar_tpu.utils.skeleton import get_skeleton
    from isbfsar_tpu import pretrained

    hw, intr = CI_FRAME_HW, CI_INTRINSICS
    params = pretrained.load("pose-ci-motions")
    hpe_cfg = HPEConfig(yolo_input_size=128, crop_size=128, yolo_thresh=0.3)
    hpe = HumanPoseEstimator(hpe_cfg, intr, params=params,
                             backbone_stages=V2_TINY, frame_shape=hw,
                             yolo_width=0.25)
    ar_cfg = ARConfig.for_input("skeleton")
    ar = ActionRecognizer(ar_cfg)
    cfg = PipelineConfig(
        main=dataclasses.replace(MainConfig.for_input("skeleton"),
                                 cam_width=hw[1], cam_height=hw[0]),
        intrinsics=intr, hpe=hpe_cfg, ar=ar_cfg,
    )
    pipe = FusedPipeline(cfg, hpe=hpe, ar=ar, with_focus=False)
    pipe.start()
    L = ar_cfg.seq_len

    # --- learn both actions through the live acquisition loop ------------
    def capture(motion, phase, seed):
        frames, _ = render_motion_clip(motion, n_frames=2 * L, frame_hw=hw,
                                       intrinsics=intr, seed=seed, phase=phase)
        poses = []
        for f in frames:
            out = pipe.step(f)
            if out["pose_ok"] > 0:
                poses.append(out["pose"].reshape(-1))
        assert len(poses) >= L, f"tracker lost the {motion} clip"
        return np.stack(poses[:L]).astype(np.float32)

    for motion, phase in (("wave", 0.0), ("squat", 0.0)):
        print(f"[demo] learning {motion!r} from a rendered clip...")
        ar.train({"flag": motion, "data": {"poses": capture(motion, phase, 11)},
                  "requires_focus": False})
    pipe.start()  # refresh support K/V

    # --- recognize fresh clips, collecting overlay frames ----------------
    k = intr.matrix()
    edges = get_skeleton("smpl+head_30").edges
    strips = []
    for motion, phase, seed in (("wave", 0.9, 21), ("squat", 0.4, 22)):
        frames, _ = render_motion_clip(motion, n_frames=2 * L + 4,
                                       frame_hw=hw, intrinsics=intr,
                                       seed=seed, phase=phase)
        pipe._state = pipe.init_state()
        votes, cells = [], []
        keep = set(np.linspace(4, len(frames) - 1, N_STRIP).astype(int))
        for i, f in enumerate(frames):
            elements = pipe.decode(pipe.step(f))
            if elements.get("actions"):
                votes.append(max(elements["actions"],
                                 key=elements["actions"].get))
            if i in keep:
                out = jax.device_get(hpe._estimate_jit(hpe.params, f))
                cells.append(annotate(f, out, k, edges))
        pred = max(set(votes), key=votes.count) if votes else "(none)"
        score = votes.count(pred) / max(len(votes), 1)
        strip = np.concatenate(cells, axis=1)
        bar = caption_bar(strip.shape[1],
                          f"clip: {motion}   recognized: {pred} "
                          f"({score:.0%} of fired frames)   "
                          f"yolo_thresh=0.3, bundled pretrained weights")
        strips.append(np.concatenate([bar, strip], axis=0))
        print(f"[demo] {motion}: recognized {pred} ({len(votes)} votes)")

    panel = np.concatenate(strips, axis=0)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    cv2.imwrite(args.out, panel)
    print(f"[demo] wrote {args.out} ({panel.shape[1]}x{panel.shape[0]})")

    if args.gui_out:
        # The SERVICE surface's view: frames through the live Orchestrator
        # (double-buffered fused path), rendered by the interactive 2x2
        # panel offscreen (reference utils/output.py VISPYVisualizer).
        from isbfsar_tpu.runtime.orchestrator import Orchestrator
        from isbfsar_tpu.runtime.visualizer import GUIVisualizer

        orch = Orchestrator(config=cfg, ar=ar, fused=pipe)
        frames, _ = render_motion_clip("wave", n_frames=L + 6, frame_hw=hw,
                                       intrinsics=intr, seed=33, phase=0.5)
        pipe._state = pipe.init_state()
        elements = {}
        for i, f in enumerate(frames):
            log = "Action wave learned successfully!" if i == 0 else None
            elements = orch.get_frame(img=f, log=log)
        gui = GUIVisualizer(backend="Agg")
        img = gui.render(elements)
        os.makedirs(os.path.dirname(args.gui_out), exist_ok=True)
        cv2.imwrite(args.gui_out, img[..., ::-1])  # RGB -> BGR for imwrite
        print(f"[demo] wrote {args.gui_out} ({img.shape[1]}x{img.shape[0]})")


if __name__ == "__main__":
    main()
