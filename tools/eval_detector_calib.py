"""A/B receipt for the empty-scene detector calibration (round-5 item 2).

Round 4 shipped a production fit whose YOLO fires on 7/10 person-free
scenes at the reference 0.3 gate, and a gate sweep proved it is confidence
MIS-calibration (empty median 0.885 / person 1.000 — no threshold
separates them; docs/PERF.md "Production fit recipe"). The fix is the
hard-negative detector fine-tune (`train/posestack.py::finetune_detector`,
bundled as the `pose-prod-256-calib` delta). This tool produces the
receipt: the SAME fresh-scene evaluation (`evaluate_pose_stack` — person
found-rate/IoU/pose error + empty & hard-empty FP + confidence stats) run
on the base fit and the calibrated fit in one session, printed as JSON.

Reference contract being repaired: YOLO person gating ahead of the pose
crop, reference modules/hpe/hpe.py:51-79 at the utils/params.py:34 gate.

    python tools/eval_detector_calib.py [--scenes 20] [--empty 10]
        [--hard-empty 10] [--out docs/CALIB_AB_r5.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--scenes", type=int, default=20)
    parser.add_argument("--empty", type=int, default=10)
    parser.add_argument("--hard-empty", type=int, default=10)
    parser.add_argument("--seed", type=int, default=1000)
    parser.add_argument("--out", default="")
    args = parser.parse_args()

    from isbfsar_tpu import pretrained
    from isbfsar_tpu.configs import CameraIntrinsics, HPEConfig
    from isbfsar_tpu.hpe.estimator import HumanPoseEstimator
    from isbfsar_tpu.train.posestack import (
        PROD_FRAME_HW,
        evaluate_pose_stack,
    )
    from isbfsar_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    intr = CameraIntrinsics()
    base = pretrained.load("pose-prod-256")
    calib = {**base, **pretrained.load("pose-prod-256-calib")}

    report = {"gate": HPEConfig().yolo_thresh, "scenes": args.scenes,
              "empty": args.empty, "hard_empty": args.hard_empty,
              "seed": args.seed}
    for label, params in (("base", base), ("calibrated", calib)):
        t0 = time.time()
        est = HumanPoseEstimator(HPEConfig(), intr, params=params,
                                 frame_shape=PROD_FRAME_HW)
        metrics = evaluate_pose_stack(
            est, PROD_FRAME_HW, intr, n_scenes=args.scenes,
            n_empty=args.empty, seed=args.seed,
            n_hard_empty=args.hard_empty)
        metrics["eval_s"] = round(time.time() - t0, 1)
        report[label] = metrics
        print(f"[calib-ab] {label}: {json.dumps(metrics)}", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
        print(f"[calib-ab] wrote {args.out}")


if __name__ == "__main__":
    main()
