"""Compute-side service entry point (the reference's main.py role).

Run the queue hub, then this service, then a source:

    python -m isbfsar_tpu.runtime.ipc            # host or anywhere (broker)
    python -m isbfsar_tpu.runtime.serve          # owns the TPU
    python -m isbfsar_tpu.runtime.source_cli     # host with the camera

Topology preserved from the reference (README.md:20-25): source (camera+UI)
<-> hub (TCP queues) <-> this process (all compute).
"""

from __future__ import annotations

import argparse

from isbfsar_tpu.configs import PipelineConfig
from isbfsar_tpu.runtime.ipc import QueueClient
from isbfsar_tpu.runtime.orchestrator import Orchestrator


def main() -> None:
    import dataclasses

    from isbfsar_tpu.utils.cache import enable_compile_cache

    parser = argparse.ArgumentParser()
    parser.add_argument("--hub", default="localhost",
                        help="TCP hub host, or 'shm' for the same-host "
                             "native shared-memory transport (zero-copy "
                             "frames, no hub process — runtime/"
                             "shm_transport.py)")
    parser.add_argument("--input-type", default="skeleton",
                        choices=["skeleton", "rgb", "hybrid"])
    parser.add_argument("--save-dir", default="saved")
    parser.add_argument("--yolo-thresh", type=float, default=None,
                        help="override person-confidence gate (e.g. 0.0 for "
                             "random-weight smoke runs)")
    parser.add_argument("--fused", action="store_true",
                        help="skeleton mode: run the single-program fused "
                             "pipeline on the frame path (fastest)")
    parser.add_argument("--transport", choices=["i420", "bgr"], default="i420",
                        help="fused-path host->device frame format: i420 "
                             "halves the transfer bytes (planar YUV encoded "
                             "host-side, decoded in-graph; docs/PERF.md)")
    parser.add_argument("--no-overlap", action="store_true",
                        help="fused path: synchronous per-frame stepping "
                             "(lowest latency). Default double-buffers: "
                             "dispatch frame i while decoding frame i-1 — "
                             "~2x the serve-loop FPS through a remote-"
                             "attached chip at one frame of added lag")
    parser.add_argument("--weights", default="auto",
                        choices=["auto", "pretrained", "random"],
                        help="pose-stack weights: 'pretrained' loads the "
                             "bundled production fit (pose-prod-256), "
                             "'random' keeps fresh init (pair with "
                             "--yolo-thresh 0.0), 'auto' (default) loads "
                             "the bundle when present")
    parser.add_argument("--param-dtype", default="bfloat16",
                        choices=["float32", "bfloat16"],
                        help="fused-path parameter storage: bfloat16 casts "
                             "the conv-trunk weights, halving the batch-1 "
                             "HBM weight traffic at a sub-noise accuracy "
                             "cost (docs/PERF.md 'Precision decisions')")
    args = parser.parse_args()

    enable_compile_cache()

    config = dataclasses.replace(PipelineConfig.for_input(args.input_type),
                                 param_dtype=args.param_dtype)
    if args.hub == "shm":
        from isbfsar_tpu.runtime.shm_transport import serve_queues

        in_q, out_q = serve_queues(
            (config.main.cam_height, config.main.cam_width, 3),
            rgb_size=config.ar.rgb_size,
        )
    else:
        client = QueueClient(args.hub)
        in_q = client.get_queue("source_human")
        out_q = client.get_queue("human_sink")
    if args.yolo_thresh is not None:
        config = dataclasses.replace(
            config, hpe=dataclasses.replace(config.hpe, yolo_thresh=args.yolo_thresh)
        )
    hpe = None
    if args.weights != "random":
        try:
            from isbfsar_tpu import pretrained
            from isbfsar_tpu.hpe.estimator import HumanPoseEstimator

            # base fit + empty-scene calibration delta (docs/PERF.md
            # "Empty-scene FP fine-tune")
            prod = pretrained.load_calibrated("pose-prod-256")
            cam_shape = (config.main.cam_height, config.main.cam_width)
            hpe = HumanPoseEstimator(config.hpe, config.intrinsics,
                                     params=prod, frame_shape=cam_shape)
            print("[isbfsar-tpu] pose stack: bundled pose-prod-256 "
                  f"+ calib delta (gate {config.hpe.yolo_thresh})")
        except KeyError:
            if args.weights == "pretrained":
                raise
            print("[isbfsar-tpu] pose stack: bundle absent -> random init "
                  "(pass --yolo-thresh 0.0 for smoke runs)")
    fused = None
    if args.fused:
        from isbfsar_tpu.pipeline import FusedPipeline

        assert args.input_type == "skeleton", "--fused requires skeleton mode"
        fused = FusedPipeline(config, hpe=hpe, with_focus=True,
                              input_format=args.transport)
    orch = Orchestrator(config, in_queue=in_q, out_queue=out_q, hpe=hpe,
                        save_dir=args.save_dir, fused=fused,
                        fused_overlap=not args.no_overlap)
    print("[isbfsar-tpu] warming up device programs...")
    if fused is not None:
        fused.warmup()
    else:
        orch.hpe.warmup()
        orch.focus.warmup()
    print("[isbfsar-tpu] serving")
    orch.run()


if __name__ == "__main__":
    main()
