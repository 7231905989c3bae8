"""Dataset extraction: run the live HPE over videos to emit training clips.

Rebuild of the reference's NTU-RGBD extraction pipeline (reference
modules/ar/utils/data_extraction/extract_skeleton_rgb_from_nturgbd.py:1-148):
per input clip, sample ``n_frames`` uniformly, run the pose estimator, save
the root-relative (122, 3) pose per frame (+ optional cropped rgb png),
reuse the previous pose when a frame fails (reference :110-117), and resume
by counting already-extracted clip dirs per class (reference :57-84).

Output tree: ``out_root/<class>/<clip_idx>/{i}.npy`` (+ ``{i}.png``) — the
layout isbfsar_tpu.train.dataloader consumes.

Usage:
    python tools/extract_dataset.py --videos <dir-with-class-subdirs> \
        --out <out_root> [--n-frames 16] [--with-images]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def extract_clip(estimator, video_path: str, n_frames: int, with_images: bool,
                 smooth: bool = False):
    """Returns (poses list of (122, 3) root-relative, crops list) or None.

    ``smooth=True`` runs the causal One-Euro filter over the extracted pose
    sequence (ops/smooth.py) — cuts the per-frame extraction jitter that
    bounds downstream AR accuracy (docs/PERF.md "Temporal pose smoothing")
    while staying causal, so a live consumer applying the same filter
    per-tick sees the identical distribution."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if total <= 0:
        cap.release()
        return None
    picks = set(np.linspace(0, total - 1, n_frames).astype(int).tolist())

    poses, crops = [], []
    last_pose, last_crop = None, None
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i in picks:
            res = estimator.estimate(frame)
            if res is not None:
                pose = res["pose"] - res["pose"][0]  # root-relative (:121-ish)
                last_pose = pose
                if with_images:
                    x1, x2, y1, y2 = res["bbox"]
                    xm, ym = (x1 + x2) // 2, (y1 + y2) // 2
                    half = max(xm - x1, ym - y1, 1)
                    crop = frame[max(ym - half, 0): ym + half, max(xm - half, 0): xm + half]
                    last_crop = cv2.resize(crop, (224, 224))
            # per-frame failure: reuse the last good pose (reference :110-117)
            if last_pose is None:
                cap.release()
                return None
            poses.append(last_pose)
            if with_images:
                crops.append(last_crop)
        i += 1
    cap.release()
    if len(poses) < n_frames:
        poses += [poses[-1]] * (n_frames - len(poses))
        if with_images:
            crops += [crops[-1]] * (n_frames - len(crops))
    if smooth:
        from isbfsar_tpu.ops.smooth import one_euro

        poses = list(one_euro(np.stack(poses)))
    return poses, crops


def extract_tree(estimator, videos_root: str, out_root: str, n_frames: int = 16,
                 with_images: bool = False, smooth: bool = False):
    """Walk ``videos_root/<class>/<clip-video>`` and emit the training tree.

    Resumable: clips already extracted for a class are skipped by counting
    existing clip dirs (reference extract_skeleton_rgb_from_nturgbd.py:57-84).
    Returns the list of clip dirs written THIS run.
    """
    import cv2

    written = []
    for class_name in sorted(os.listdir(videos_root)):
        class_dir = os.path.join(videos_root, class_name)
        if not os.path.isdir(class_dir):
            continue
        out_class = os.path.join(out_root, class_name)
        os.makedirs(out_class, exist_ok=True)
        # Resume-by-index (reference extract_skeleton_rgb_from_nturgbd.py:
        # 57-117 counts existing outputs): every processed video leaves a
        # clip dir named <idx>, or a .skip_<idx> marker for no-usable-pose
        # videos. Count ONLY those entries — a stray file (.DS_Store,
        # editor artifact) must not inflate the count and silently skip the
        # tail — and treat a clip dir missing its last expected frame file
        # (a killed run's partial write) as incomplete so it re-extracts.
        done_idx = set()
        for entry in os.listdir(out_class):
            if entry.startswith(".skip_") and entry[6:].isdigit():
                done_idx.add(int(entry[6:]))
            elif entry.isdigit():
                # complete = last npy AND (with images) last png: the png
                # writes after the npy, so a kill between the two must
                # leave the clip incomplete, not permanently skipped
                last = os.path.join(out_class, entry, f"{n_frames - 1}")
                if os.path.exists(last + ".npy") and (
                    not with_images or os.path.exists(last + ".png")
                ):
                    done_idx.add(int(entry))
        videos = sorted(os.listdir(class_dir))
        for idx, vid in enumerate(videos):
            if idx in done_idx:
                continue
            result = extract_clip(
                estimator, os.path.join(class_dir, vid), n_frames, with_images,
                smooth=smooth,
            )
            if result is None:
                print(f"[extract] SKIP {class_name}/{vid} (no usable pose)")
                open(os.path.join(out_class, f".skip_{idx}"), "w").close()
                continue
            poses, crops = result
            clip_dir = os.path.join(out_class, str(idx))
            os.makedirs(clip_dir, exist_ok=True)
            for i, pose in enumerate(poses):
                np.save(os.path.join(clip_dir, f"{i}.npy"), pose.astype(np.float32))
                if with_images:
                    cv2.imwrite(os.path.join(clip_dir, f"{i}.png"), crops[i])
            print(f"[extract] {class_name}/{vid} -> {clip_dir}")
            written.append(clip_dir)
    return written


def main() -> None:
    import dataclasses

    from isbfsar_tpu.configs import CameraIntrinsics, HPEConfig
    from isbfsar_tpu.hpe.estimator import HumanPoseEstimator

    parser = argparse.ArgumentParser()
    parser.add_argument("--videos", required=True, help="root with <class>/<clip>.avi")
    parser.add_argument("--out", required=True)
    parser.add_argument("--n-frames", type=int, default=16)
    parser.add_argument("--with-images", action="store_true")
    parser.add_argument("--smooth", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="causal One-Euro smoothing of each clip's "
                             "pose sequence (ops/smooth.py) — DEFAULT ON, "
                             "matching the live ARConfig.smooth_poses "
                             "default and tools/synth_workflow.py; "
                             "--no-smooth for the raw baseline")
    parser.add_argument("--checkpoint", default=None, help="HPE params msgpack")
    args = parser.parse_args()

    # skeleton=None -> the estimator emits the FULL 122-joint pose; the
    # dataset tree stores (122, 3) and the episodic loader selects the
    # 30-joint skeleton at load time (reference extraction stores 122 too,
    # extract_skeleton_rgb_from_nturgbd.py:105).
    estimator = HumanPoseEstimator(
        dataclasses.replace(HPEConfig(), skeleton=None), CameraIntrinsics()
    )
    if args.checkpoint:
        import jax

        from isbfsar_tpu.utils.checkpoint import load_checkpoint

        # device_put once: load_checkpoint returns a HOST numpy tree, and a
        # host tree assigned to .params re-uploads on EVERY jitted call
        # (~20-30 s/frame through a remote-attached chip — the round-3
        # committed-params pathology, docs/PERF.md "Committed params").
        estimator.params = jax.device_put(
            load_checkpoint(args.checkpoint, estimator.params)
        )

    extract_tree(estimator, args.videos, args.out, args.n_frames, args.with_images,
                 smooth=args.smooth)


if __name__ == "__main__":
    main()
