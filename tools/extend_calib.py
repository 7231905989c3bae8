"""Extended hard-negative calibration candidate: train, A/B, optionally seed.

The shipped `pose-prod-256-calib` delta (200 steps, hard_frac 0.7) fully
fixes ordinary empty-scene false positives (0.9 -> 0.0 at the reference
0.3 gate, docs/CALIB_AB_r5.json) but leaves the HARD adversarial empties
(disarticulated limb strokes + head-like discs) at FP 0.7. This tool
trains a LONGER/harder candidate delta from the same base fit, A/Bs it
against the shipped calibration in one session on fresh scenes, and — on
`--seed-cache` — writes the result into the params cache under exactly
the key `prod_detector_calib_delta()` would use if `PROD_CALIB_BUDGETS`
were updated to these budgets, so a subsequent
`tools/bundle_pretrained.py --only pose-prod-256-calib` ships it without
retraining.

Ship gate (apply manually after reading the receipt): person found-rate
1.0, IoU >= shipped, empty FP 0.0, hard-empty FP materially below 0.7.

Reference contract: YOLO person gating ahead of the pose crop,
reference modules/hpe/hpe.py:51-79 at the utils/params.py:34 gate.

    python tools/extend_calib.py --steps 600 --hard-frac 0.85 \
        --out docs/CALIB_EXT_r5.json --seed-cache
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
    parser.add_argument("--steps", type=int, default=600)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--empty-frac", type=float, default=0.5)
    parser.add_argument("--hard-frac", type=float, default=0.85)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--seed", type=int, default=7)
    parser.add_argument("--scenes", type=int, default=20)
    parser.add_argument("--empty", type=int, default=10)
    parser.add_argument("--hard-empty", type=int, default=10)
    parser.add_argument("--eval-seed", type=int, default=1000,
                        help="same default as tools/eval_detector_calib.py "
                             "so rows are comparable to CALIB_AB_r5.json")
    parser.add_argument("--out", default="")
    parser.add_argument("--seed-cache", action="store_true",
                        help="write the candidate into the params cache "
                             "under the prospective PROD_CALIB_BUDGETS key")
    args = parser.parse_args()

    from flax import serialization

    from isbfsar_tpu import pretrained
    from isbfsar_tpu.configs import CameraIntrinsics, HPEConfig
    from isbfsar_tpu.hpe.estimator import HumanPoseEstimator
    from isbfsar_tpu.train.posestack import (
        PROD_FRAME_HW,
        _storage_cast_trunks,
        evaluate_pose_stack,
        finetune_detector,
        prod_calib_key,
    )
    from isbfsar_tpu.utils.cache import (
        DEFAULT_PARAMS_CACHE_DIR,
        enable_compile_cache,
        params_cache_digest,
    )

    enable_compile_cache()
    budgets = dict(n_steps=args.steps, batch_size=args.batch_size,
                   empty_frac=args.empty_frac, hard_frac=args.hard_frac,
                   lr=args.lr, seed=args.seed)
    intr = CameraIntrinsics()
    base = pretrained.load("pose-prod-256")
    shipped = {**base, **pretrained.load("pose-prod-256-calib")}

    # Relay-wedge guard (docs/PERF.md wedge recipe): the wedge signature is
    # a hang at the first compile/execute after a clean init. The hang sits
    # in C land so a thread cannot interrupt it — hard-exit rc=3 and let
    # the operator retry after a quiet period.
    import threading

    first_step = threading.Event()

    def _watch():
        if not first_step.wait(600.0):
            print("FATAL: no training step within 600s — relay-wedge "
                  "signature; kill + quiet period + retry", flush=True)
            os._exit(3)

    threading.Thread(target=_watch, daemon=True).start()

    t0 = time.time()
    yolo = finetune_detector(
        base, PROD_FRAME_HW, intr, log_every=50,
        progress_event=first_step,
        **budgets)
    train_s = round(time.time() - t0, 1)
    print(f"[extend-calib] trained {args.steps} steps in {train_s}s",
          flush=True)
    candidate = {**base, **_storage_cast_trunks({"yolo": yolo})}

    report = {"gate": HPEConfig().yolo_thresh, "budgets": budgets,
              "train_s": train_s, "scenes": args.scenes,
              "empty": args.empty, "hard_empty": args.hard_empty,
              "eval_seed": args.eval_seed}
    for label, params in (("shipped", shipped), ("candidate", candidate)):
        t0 = time.time()
        est = HumanPoseEstimator(HPEConfig(), intr, params=params,
                                 frame_shape=PROD_FRAME_HW)
        metrics = evaluate_pose_stack(
            est, PROD_FRAME_HW, intr, n_scenes=args.scenes,
            n_empty=args.empty, seed=args.eval_seed,
            n_hard_empty=args.hard_empty)
        metrics["eval_s"] = round(time.time() - t0, 1)
        report[label] = metrics
        print(f"[extend-calib] {label}: {json.dumps(metrics)}", flush=True)

    if args.seed_cache:
        digest = params_cache_digest(prod_calib_key(budgets), "1")
        cache_dir = os.environ.get("ISBFSAR_PARAMS_CACHE",
                                   DEFAULT_PARAMS_CACHE_DIR)
        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(cache_dir, f"{digest}.msgpack")
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(serialization.msgpack_serialize(
                _storage_cast_trunks({"yolo": yolo})))
        os.replace(tmp, path)
        report["seeded_cache"] = path
        print(f"[extend-calib] seeded {path} — update PROD_CALIB_BUDGETS to "
              f"these budgets and run tools/bundle_pretrained.py "
              f"--only pose-prod-256-calib to ship", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
        print(f"[extend-calib] wrote {args.out}")


if __name__ == "__main__":
    main()
