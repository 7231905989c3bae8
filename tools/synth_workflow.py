"""Full offline AR workflow, end to end, with the framework's own weights:

    render action videos -> extract skeletons with the TRAINED pose stack
    -> train TRXOS episodically -> FSOS-evaluate on DISJOINT held-out classes

This is the reference's complete offline loop — data production (reference
modules/ar/utils/data_extraction/extract_skeleton_rgb_from_nturgbd.py:57-117),
episodic training (modules/ar/utils/train.py), and the published FSOS
protocol (modules/ar/utils/test/compute_fsos.py:40-146) — run on synthetic
humanoid action classes so the whole chain is exercisable and certified in
this repo without NTU-RGBD. The perception stage runs at the REFERENCE
confidence gate (yolo_thresh=0.3, utils/params.py:29): the TRX sees real
estimator outputs, estimation noise included, not ground-truth joints.

Class protocol mirrors the reference split discipline: TRX trains on
ACTION_TRAIN_CLASSES and is FSOS-evaluated k-way on ACTION_TEST_CLASSES —
classes it has NEVER seen — with a separately rendered exemplar tree as the
support source (compute_fsos.py keeps exemplars apart from queries too).

CI sizes (the tests' budget, tests/test_synth_workflow.py):
    python tools/synth_workflow.py --workdir /tmp/synthwf

Production sizes (full pose stack on the TPU, 480x640 frames):
    python tools/synth_workflow.py --production \
        --pose-params /tmp/pose_prod3.msgpack --workdir /tmp/synthwf_prod \
        --clips 8 --epochs 30 --n-task 128
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def start_progress_watchdog(what: str, deadline_s: float, say,
                            exit_fn=os._exit, progress_check=None):
    """Arm a relay-wedge watchdog: if neither the returned event is set nor
    ``progress_check()`` turns true within ``deadline_s``, ``exit_fn(3)``.

    The shared relay's wedge signature is a hang at a device call (backend
    init succeeds, then a compile/execute never returns — measured FOUR
    times in one day: twice at extraction's first call, once mid-roofline,
    once at the trainer's first step; NEXT.md round-5 gotchas). The hang
    sits in C land, so a thread cannot interrupt it — hard-exit and let
    the caller retry after a quiet period (workdirs resume). ``deadline_s
    <= 0`` disarms (returns a pre-set event). ``exit_fn`` is injectable
    for the unit tests (tests/test_synth_workflow.py)."""
    import threading

    first_done = threading.Event()
    if deadline_s <= 0:
        first_done.set()
        return first_done

    progressed = progress_check or (lambda: False)
    poll_s = min(10.0, max(deadline_s / 10.0, 0.01))

    def _watch():
        t_start = time.time()
        while time.time() - t_start < deadline_s:
            if first_done.wait(poll_s) or progressed():
                return
        if not (first_done.is_set() or progressed()):
            say(f"FATAL: {what} produced nothing within "
                f"{deadline_s:.0f}s — relay-wedge signature; kill+retry "
                f"after a quiet period (the workdir resumes)")
            exit_fn(3)

    threading.Thread(target=_watch, daemon=True).start()
    return first_done


def start_first_result_watchdog(trees: Dict[str, str], deadline_s: float,
                                say, exit_fn=os._exit):
    """Extraction-stage watchdog: progress = any clip file under ``trees``
    (extract_tree writes clips long before the per-tree loop sets the
    event). See ``start_progress_watchdog``."""

    def _any_clip_extracted() -> bool:
        for t in trees.values():
            if not os.path.isdir(t):
                continue
            for cls in os.listdir(t):
                cdir = os.path.join(t, cls)
                if os.path.isdir(cdir) and os.listdir(cdir):
                    return True
        return False

    return start_progress_watchdog(
        "first extraction", deadline_s, say, exit_fn=exit_fn,
        progress_check=_any_clip_extracted,
    )


def workflow_fingerprint(pose_params, **render_extract_cfg) -> str:
    """Digest of everything the workdir's RESUMABLE artifacts depend on.

    Rendering and extraction resume by file existence, so a workdir built
    under one configuration must never be silently reused under another
    (stale clips rendered at an old z_range, or trees extracted with old
    pose weights, would poison the receipt while claiming the new config).
    The digest covers the pose params' bytes plus every render/extract
    knob; ``run_workflow`` stores it in ``workdir/manifest.json`` and
    refuses a mismatched resume."""
    h = hashlib.sha256()
    import jax

    for leaf in jax.tree.leaves(pose_params):
        h.update(np.asarray(leaf).tobytes())
    h.update(repr(sorted(render_extract_cfg.items())).encode())
    return h.hexdigest()[:16]


def render_video_library(
    root: str,
    classes: Sequence[str],
    clips_per_class: int,
    n_frames: int,
    frame_hw: Tuple[int, int],
    intrinsics,
    seed: int = 0,
    z_range: Tuple[float, float] = (2.0, 3.2),
) -> None:
    """Write ``root/<class>/<i>.mp4`` clips with randomized viewpoint.

    Per clip: random phase, yaw, depth and cycle count — the within-class
    variation a camera would see. Skips clips that already exist (the same
    resume discipline as extraction)."""
    import cv2

    from isbfsar_tpu.train.posestack import render_motion_clip

    rng = np.random.default_rng(seed)
    h, w = frame_hw
    for ci, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        os.makedirs(cdir, exist_ok=True)
        for k in range(clips_per_class):
            # draw the clip's randomization BEFORE the skip check so reruns
            # keep the rng stream aligned with a fresh run
            phase = float(rng.uniform(0, 2 * np.pi))
            yaw = float(rng.uniform(-0.6, 0.6))
            z = float(rng.uniform(*z_range))
            x = float(rng.uniform(-0.25, 0.25)) * z
            cycles = float(rng.uniform(1.2, 2.2))
            path = os.path.join(cdir, f"{k}.mp4")
            if os.path.exists(path):
                continue
            frames, _ = render_motion_clip(
                cls, n_frames=n_frames, frame_hw=frame_hw,
                intrinsics=intrinsics, center=(x, 0.15, z), yaw=yaw,
                cycles=cycles, seed=seed * 1000 + ci * 100 + k, phase=phase,
            )
            vw = cv2.VideoWriter(
                path, cv2.VideoWriter_fourcc(*"mp4v"), 15, (w, h)
            )
            assert vw.isOpened(), "cv2 mp4v encoder unavailable"
            for f in frames:
                vw.write(f)
            vw.release()


def run_workflow(
    pose_params,
    workdir: Optional[str],
    frame_hw: Tuple[int, int],
    intrinsics,
    yolo_width: float = 0.25,
    yolo_input_size: int = 128,
    crop_size: int = 256,
    backbone_stages=None,
    train_classes: Optional[Sequence[str]] = None,
    test_classes: Optional[Sequence[str]] = None,
    clips_per_class: int = 6,
    exemplar_clips: int = 2,
    n_frames: int = 16,
    seq_len: int = 8,
    way: int = 5,
    n_epochs: int = 25,
    n_task: int = 160,
    batch_size: int = 8,
    fsos_repeats: int = 5,
    z_range: Tuple[float, float] = (1.8, 2.4),
    smooth: bool = True,
    seed: int = 0,
    log: bool = True,
) -> Dict:
    """The chain. Returns the receipt dict (counts, training curve endpoints,
    FSOS results). Idempotent per ``workdir``: rendering and extraction
    resume; training and eval always run."""
    import dataclasses

    import jax

    from isbfsar_tpu.configs import ARConfig, HPEConfig
    from isbfsar_tpu.hpe.estimator import HumanPoseEstimator
    from isbfsar_tpu.models.effnetv2 import V2_TINY
    from isbfsar_tpu.parallel.mesh import make_mesh
    from isbfsar_tpu.train.dataloader import EpisodicSampler, batch_iterator
    from isbfsar_tpu.train.fsos import (
        calibrate_os_threshold,
        evaluate_fsos,
        metrics_at_threshold,
        summarize,
    )
    from isbfsar_tpu.train.posestack import (
        ACTION_TEST_CLASSES,
        ACTION_TRAIN_CLASSES,
    )
    from isbfsar_tpu.train.trainer import Trainer
    from tools.extract_dataset import extract_tree

    train_classes = list(train_classes or ACTION_TRAIN_CLASSES)
    test_classes = list(test_classes or ACTION_TEST_CLASSES)
    t0 = time.time()

    def say(msg):
        if log:
            print(f"[synth_workflow] {msg}", flush=True)

    # refuse to resume a workdir built under a different configuration —
    # render/extract resume by file existence and would silently mix data
    fp = workflow_fingerprint(
        pose_params, frame_hw=tuple(frame_hw), intrinsics=repr(intrinsics),
        yolo_width=yolo_width, yolo_input_size=yolo_input_size,
        crop_size=crop_size, stages=repr(backbone_stages),
        train_classes=tuple(train_classes), test_classes=tuple(test_classes),
        clips_per_class=clips_per_class, exemplar_clips=exemplar_clips,
        n_frames=n_frames, z_range=tuple(z_range), seed=seed,
        # only key the fingerprint when ON: keeps every pre-smoothing
        # workdir (and the suite's cached renders) valid for smooth=False
        **({"smooth": True} if smooth else {}),
    )
    if workdir is None:
        # fingerprint-keyed dir under the params cache: a retrained fixture
        # or changed config lands in a FRESH dir and resumes only itself
        from isbfsar_tpu.utils.cache import DEFAULT_PARAMS_CACHE_DIR

        workdir = os.path.join(
            os.environ.get("ISBFSAR_PARAMS_CACHE", DEFAULT_PARAMS_CACHE_DIR),
            f"synthwf_{fp}",
        )
        say(f"workdir (fingerprint-keyed): {workdir}")
    os.makedirs(workdir, exist_ok=True)
    manifest = os.path.join(workdir, "manifest.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            prior = json.load(f).get("fingerprint")
        if prior != fp:
            raise ValueError(
                f"workdir {workdir} was built under a different "
                f"configuration (manifest fingerprint {prior} != {fp}): its "
                f"resumable renders/extractions would silently poison this "
                f"run — use a fresh --workdir (or delete this one)"
            )
    elif any(os.path.isdir(os.path.join(workdir, d))
             for d in ("videos_train", "videos_test_queries",
                       "videos_test_exemplars", "tree_train", "tree_test_q",
                       "tree_test_ex")):
        # legacy/foreign dir: has resumable artifacts but no manifest — we
        # cannot prove they match this configuration, so refuse rather than
        # stamp the new fingerprint onto unknown data
        raise ValueError(
            f"workdir {workdir} contains render/extraction artifacts but no "
            f"manifest.json (built before fingerprinting, or not by this "
            f"tool) — use a fresh --workdir, or delete it to re-render"
        )
    else:
        with open(manifest, "w") as f:
            json.dump({"fingerprint": fp}, f)

    # 1. render the video libraries (train / test-queries / test-exemplars)
    vids = {
        "train": os.path.join(workdir, "videos_train"),
        "test_q": os.path.join(workdir, "videos_test_queries"),
        "test_ex": os.path.join(workdir, "videos_test_exemplars"),
    }
    # z_range sizes the subject's apparent scale to the camera. The CI
    # default keeps the person 135-180 px tall in the 240-px frame (the NTU
    # subject/frame ratio, roughly): extracted-tree 1-NN separability with
    # the extraction-grade fit measured 0.71 at z (2.0, 3.2) vs 0.79 at
    # (1.8, 2.4) — more pixels on target is more action signal.
    render_video_library(vids["train"], train_classes, clips_per_class,
                         n_frames, frame_hw, intrinsics, seed=seed,
                         z_range=z_range)
    render_video_library(vids["test_q"], test_classes, clips_per_class,
                         n_frames, frame_hw, intrinsics, seed=seed + 1,
                         z_range=z_range)
    render_video_library(vids["test_ex"], test_classes, exemplar_clips,
                         n_frames, frame_hw, intrinsics, seed=seed + 2,
                         z_range=z_range)
    t_render = time.time()
    say(f"rendered {len(train_classes)}+{len(test_classes)} classes "
        f"in {t_render - t0:.0f}s")

    # 2. extract skeleton trees with the TRAINED stack at the 0.3 gate.
    # skeleton=None: the tree stores the full (122, 3) pose — the loader
    # selects the 30-joint skeleton at load time (dataloader.load_clip).
    estimator = HumanPoseEstimator(
        HPEConfig(yolo_input_size=yolo_input_size, crop_size=crop_size,
                  yolo_thresh=0.3, skeleton=None),
        intrinsics, params=pose_params,
        backbone_stages=backbone_stages or V2_TINY,
        frame_shape=frame_hw, yolo_width=yolo_width,
    )
    trees = {k: os.path.join(workdir, f"tree_{k}") for k in vids}
    n_skipped = 0

    first_done = start_first_result_watchdog(
        trees,
        float(os.environ.get("ISBFSAR_FIRST_RESULT_TIMEOUT", "600")),
        say,
    )
    for k in vids:
        extract_tree(estimator, vids[k], trees[k], n_frames=n_frames,
                     smooth=smooth)
        first_done.set()
        for cls in os.listdir(trees[k]):
            n_skipped += sum(
                e.startswith(".skip_")
                for e in os.listdir(os.path.join(trees[k], cls))
            )
    t_extract = time.time()
    say(f"extracted trees in {t_extract - t_render:.0f}s "
        f"({n_skipped} clips skipped by the 0.3 gate)")

    # 3. episodic TRX training on the train-class tree
    cfg = dataclasses.replace(
        ARConfig.for_input("skeleton"), way=way, seq_len=seq_len,
        batch_size=batch_size, n_task=n_task, n_epochs=n_epochs,
        eval_every_n_epoch=10_000,
    )
    trainer = Trainer(cfg, mesh=make_mesh(1),
                      log_dir=os.path.join(workdir, "run"), use_wandb=False)
    # Trainer-stage wedge watchdog (the round-5 session measured a wedge at
    # the trainer's FIRST step too — 20 silent minutes after a clean
    # extraction): epoch 0 must complete within the deadline.
    epoch0_done = start_progress_watchdog(
        "first training epoch",
        float(os.environ.get("ISBFSAR_FIRST_EPOCH_TIMEOUT", "900")),
        say,
    )
    last = {}
    for epoch in range(n_epochs):
        sampler = EpisodicSampler(
            trees["train"], k=way, n_task=n_task, max_l=n_frames, l=seq_len,
            seed=seed + 100 + epoch,
        )
        batches = batch_iterator(sampler, batch_size, shuffle=False,
                                 drop_last=True)
        last = trainer.run_epoch(epoch, batches, train=True)
        epoch0_done.set()
        say(f"epoch {epoch}: fs_loss {last['train/fs_loss']:.3f} "
            f"fs_acc {last['train/fs_accuracy']:.2f} "
            f"os_acc {last['train/os_accuracy']:.2f}")
    t_train = time.time()

    # 4. FSOS on the held-out classes (reference compute_fsos protocol).
    # The open-set threshold is ALSO calibrated on the TRAIN tree (never
    # the test classes) and the held-out metrics re-scored at it from the
    # collected raw scores — reported alongside, never instead of, the
    # reference's hard-coded 0.5 (compute_fsos.py:101-102).
    params = jax.tree.map(np.asarray, trainer.params)
    calib = calibrate_os_threshold(
        cfg, params, trees["train"], k=way, n_repeats=fsos_repeats,
        batch_size=batch_size, seed=seed,
    )
    say(f"os-threshold calibration (train classes): {json.dumps(calib)}")
    results = evaluate_fsos(
        cfg, params, trees["test_q"], trees["test_ex"], k=way,
        n_repeats=fsos_repeats, batch_size=batch_size, seed=seed,
        collect_raw=True,
    )
    results_cal = metrics_at_threshold(results["_raw"], calib["os_threshold"])
    t_eval = time.time()

    receipt = {
        "train_classes": len(train_classes),
        "test_classes": len(test_classes),
        "clips_per_class": clips_per_class,
        "exemplar_clips": exemplar_clips,
        "fingerprint": fp,
        "skipped_clips": n_skipped,
        "smooth": smooth,
        "way": way,
        "seq_len": seq_len,
        "epochs": n_epochs,
        "train_fs_acc": round(last.get("train/fs_accuracy", -1.0), 3),
        "train_os_acc": round(last.get("train/os_accuracy", -1.0), 3),
        "fsos": {k: round(float(np.mean(v)), 3)
                 for k, v in results.items() if not k.startswith("_")},
        "fsos_std": {k: round(float(np.std(v)), 3)
                     for k, v in results.items() if not k.startswith("_")},
        "os_calibration": calib,
        "fsos_calibrated": {k: round(float(np.mean(v)), 3)
                            for k, v in results_cal.items()},
        "wall_s": {
            "render": round(t_render - t0, 1),
            "extract": round(t_extract - t_render, 1),
            "train": round(t_train - t_extract, 1),
            "fsos_eval": round(t_eval - t_train, 1),
        },
    }
    say("summary " + json.dumps(summarize(results)))
    say(f"summary@calibrated-os({calib['os_threshold']}) "
        + json.dumps(summarize(results_cal)))
    return receipt


def main() -> None:
    # sitecustomize force-registers the remote TPU and overrides
    # JAX_PLATFORMS; honor an explicit ISBFSAR_PLATFORM before the backend
    # initializes (ISBFSAR_PLATFORM=cpu runs the CI-scale workflow with no
    # relay dependency).
    if os.environ.get("ISBFSAR_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["ISBFSAR_PLATFORM"])

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workdir", default=None,
                        help="artifact dir (renders/trees resume in it; a "
                             "manifest refuses resumes under a changed "
                             "config). Default: a fingerprint-keyed dir "
                             "under the params cache")
    parser.add_argument("--production", action="store_true",
                        help="full-size pose stack on 480x640 frames "
                             "(requires --pose-params)")
    parser.add_argument("--pose-params", default=None,
                        help="trained pose-stack .msgpack; CI default: the "
                             "extraction-grade diverse-distribution cache "
                             "(diverse_pose_params_256). NOTE: extraction "
                             "quality requires a pose_mode='diverse' fit at "
                             "a 256 crop — a MOTIONS-only fit collapses "
                             "out-of-distribution limb placements, and a "
                             "128-crop fit's 4x4 heatmap decode collapses "
                             "temporal motion (tracking slope 0.14 vs 0.48; "
                             "see CI_EXTRACT_BUDGETS in train/posestack.py)")
    parser.add_argument("--crop-size", type=int, default=None,
                        help="pose-branch crop size; MUST match the crop "
                             "the --pose-params checkpoint was trained at "
                             "(the nets are fully convolutional, so a "
                             "mismatch runs without error but decodes "
                             "through a mis-calibrated heatmap grid and "
                             "silently collapses extraction quality). "
                             "Defaults: 256 for both CI and --production — "
                             "pass 128 for a legacy 128-crop fit")
    parser.add_argument("--clips", type=int, default=6)
    parser.add_argument("--n-frames", type=int, default=16)
    parser.add_argument("--seq-len", type=int, default=8)
    parser.add_argument("--way", type=int, default=5)
    parser.add_argument("--epochs", type=int, default=25)
    parser.add_argument("--n-task", type=int, default=160)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--smooth", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="causal One-Euro smoothing of extracted pose "
                             "sequences (ops/smooth.py) — DEFAULT ON: every "
                             "receipt improves with it (docs/PERF.md "
                             "'Temporal pose smoothing'); --no-smooth for "
                             "the raw baseline")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from isbfsar_tpu.configs import CameraIntrinsics
    from isbfsar_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    if args.production:
        from isbfsar_tpu.models.effnetv2 import V2_L
        from isbfsar_tpu.train.posestack import (
            ACTION_EXTRA_CLASSES,
            ACTION_TRAIN_CLASSES,
        )

        # production trains TRX on the EXTENDED 16-class library (the CI
        # default is the 8-class base set — suite cost): class diversity is
        # the open-set discriminator's training signal, and the extras
        # include deliberate hard negatives for the held-out classes
        # (turn/twist, punch_r/punch_l, drink/touch_head)
        kw = dict(frame_hw=(480, 640), intrinsics=CameraIntrinsics(),
                  yolo_width=1.0, yolo_input_size=256, crop_size=256,
                  backbone_stages=V2_L,
                  train_classes=ACTION_TRAIN_CLASSES + ACTION_EXTRA_CLASSES)
    else:
        from isbfsar_tpu.train.posestack import CI_FRAME_HW, CI_INTRINSICS

        kw = dict(frame_hw=CI_FRAME_HW, intrinsics=CI_INTRINSICS,
                  yolo_width=0.25, yolo_input_size=128, crop_size=256)

    if args.crop_size:
        kw["crop_size"] = args.crop_size

    if args.pose_params:
        from flax import serialization

        with open(args.pose_params, "rb") as f:
            pose_params = serialization.msgpack_restore(f.read())
    elif args.production:
        # the bundled production fit + empty-scene calibration delta
        # (isbfsar_tpu.pretrained 'pose-prod-256'/'pose-prod-256-calib';
        # trains once via the params cache when the bundle is absent)
        from isbfsar_tpu.train.posestack import prod_pose_params_calib

        pose_params = prod_pose_params_calib()
    else:
        from isbfsar_tpu.train.posestack import diverse_pose_params_256

        pose_params = diverse_pose_params_256()

    receipt = run_workflow(
        pose_params, args.workdir, clips_per_class=args.clips,
        n_frames=args.n_frames, seq_len=args.seq_len, way=args.way,
        n_epochs=args.epochs, n_task=args.n_task, batch_size=args.batch,
        fsos_repeats=args.repeats, smooth=args.smooth, seed=args.seed, **kw,
    )
    print("[synth_workflow:receipt] " + json.dumps(receipt))


if __name__ == "__main__":
    main()
