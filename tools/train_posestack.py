"""Train the pose stack (YOLOv4 + EffNetV2 + MetrabsHead) on synthetic
humanoid supervision and save the ``HumanPoseEstimator(params=...)`` tree.

CI sizes (default — the tests' budget):
    python tools/train_posestack.py --out /tmp/pose_ci.msgpack

Production sizes on the TPU (the receipt run: full-width YOLOv4, V2-L
backbone, 256 crops — the architecture the reference deploys):
    python tools/train_posestack.py --production --steps-det 300 \
        --steps-pose 300 --batch 8 --out /tmp/pose_prod.msgpack

With real datasets (COCO-person, 3D mocap) the same trainers apply — this
CLI is the synthetic-supervision route (see train/posestack.py docstring).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", required=True, help=".msgpack output path")
    parser.add_argument("--production", action="store_true",
                        help="full-size nets (YOLOv4 width 1.0 @256, "
                             "EffNetV2-L @256) on 480x640 frames")
    parser.add_argument("--steps-det", type=int, default=700)
    parser.add_argument("--steps-pose", type=int, default=700)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--log-every", type=int, default=20)
    parser.add_argument("--lr-det", type=float, default=1e-3,
                        help="detector learning rate; drop to ~1e-4 for a "
                             "warm-started fine-tune — the full-rate "
                             "default destroys a converged fit's "
                             "localization (docs/PERF.md 'Empty-scene FP "
                             "fine-tune')")
    parser.add_argument("--lr-pose", type=float, default=1e-3)
    parser.add_argument("--empty-frac", type=float, default=0.12,
                        help="fraction of person-free training scenes "
                             "(raise to suppress empty-scene false positives)")
    parser.add_argument("--pose-mode", choices=["motions", "diverse"],
                        default="motions",
                        help="'diverse' trains on random whole-space "
                             "articulations + the 16-class action library "
                             "— required for extraction-quality poses on "
                             "unseen actions (train/posestack.py "
                             "random_humanoid_pose)")
    parser.add_argument("--init", default=None,
                        help="warm-start from a previous run's .msgpack "
                             "weights (budget extension / fine-tune; "
                             "optimizer moments restart fresh); use a new "
                             "--seed for fresh scenes")
    parser.add_argument("--eval", type=int, default=0, metavar="N",
                        help="after training, run the fresh-scene receipt "
                             "on N person scenes (+ N//1.5 empty scenes) at "
                             "the reference 0.3 gate and print one JSON "
                             "line (IoU, rel/abs joint err, distance err, "
                             "empty-scene FP rate)")
    parser.add_argument("--eval-only", action="store_true",
                        help="skip training; load --init and evaluate it "
                             "(requires --init and --eval)")
    parser.add_argument("--remat", action="store_true",
                        help="per-block activation rematerialization in "
                             "both backbones (models/yolov4.py, "
                             "models/effnetv2.py): cuts saved-for-backward "
                             "bytes for ~1/3 extra FLOPs — lets --batch or "
                             "crop sizes grow past the HBM budget")
    args = parser.parse_args()

    import jax
    import numpy as np
    from flax import serialization

    from isbfsar_tpu.configs import CameraIntrinsics
    from isbfsar_tpu.train.posestack import train_pose_params
    from isbfsar_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    if args.production:
        from isbfsar_tpu.models.effnetv2 import V2_L

        kw = dict(
            frame_hw=(480, 640), intrinsics=CameraIntrinsics(),
            yolo_width=1.0, yolo_input_size=256, crop_size=256, stages=V2_L,
        )
    else:
        from isbfsar_tpu.models.effnetv2 import V2_TINY

        kw = dict(
            frame_hw=(240, 320),
            intrinsics=CameraIntrinsics(fx=192.0, fy=192.0, ppx=160.0,
                                        ppy=120.0, width=320, height=240),
            yolo_width=0.25, yolo_input_size=128, crop_size=128, stages=V2_TINY,
        )

    init_params = None
    if args.init:
        with open(args.init, "rb") as f:
            init_params = serialization.msgpack_restore(f.read())
        print(f"[train_posestack] warm-starting from {args.init}")

    if args.eval_only:
        assert init_params is not None and args.eval, "--eval-only needs --init and --eval"
        params = init_params
    else:
        t0 = time.time()
        params = train_pose_params(
            n_steps_det=args.steps_det, n_steps_pose=args.steps_pose,
            batch_size=args.batch, seed=args.seed, log_every=args.log_every,
            init_params=init_params, empty_frac=args.empty_frac,
            pose_mode=args.pose_mode, remat=args.remat,
            lr_det=args.lr_det, lr_pose=args.lr_pose,
            **kw,
        )
        print(f"[train_posestack] trained in {time.time() - t0:.0f}s")
        with open(args.out, "wb") as f:
            f.write(serialization.msgpack_serialize(jax.tree.map(np.asarray, params)))
        print(f"[train_posestack] wrote {args.out}")

    if args.eval:
        import json

        from isbfsar_tpu.configs import HPEConfig
        from isbfsar_tpu.hpe.estimator import HumanPoseEstimator
        from isbfsar_tpu.train.posestack import evaluate_pose_stack

        hpe_cfg = HPEConfig(
            yolo_input_size=kw["yolo_input_size"], crop_size=kw["crop_size"],
            yolo_thresh=0.3,
        )
        est = HumanPoseEstimator(
            hpe_cfg, kw["intrinsics"], params=params,
            backbone_stages=kw["stages"], frame_shape=kw["frame_hw"],
            yolo_width=kw["yolo_width"],
        )
        metrics = evaluate_pose_stack(
            est, kw["frame_hw"], kw["intrinsics"],
            n_scenes=args.eval, n_empty=max(args.eval * 2 // 3, 1),
        )
        print("[train_posestack:eval] " + json.dumps(metrics))


if __name__ == "__main__":
    main()
