"""The reference's full offline AR loop, certified end to end in one test:

    render action videos -> extract skeletons with the TRAINED pose stack
    at the reference 0.3 gate -> episodic TRX training -> FSOS evaluation
    on DISJOINT held-out classes

i.e. data production (reference extract_skeleton_rgb_from_nturgbd.py) feeds
training (train.py) feeds the published benchmark protocol (compute_fsos.py)
— with the framework's own synthetic-supervision weights, no real dataset,
and no confidence-gate bypass. The FSOS stage scores classes TRX never saw,
exactly like the reference's NTU train/test class split.

The capstone is gated on EXTRACTION QUALITY, which took a round-3 study to
reach: the original CI pose fit (128 crop -> 4x4 heatmap decode) collapsed
temporal motion (tracking slope 0.14, extracted-tree 1-NN separability 0.36
vs a 0.98 GT-joint ceiling), leaving TRX stuck at chance. The extraction-
grade fit (diverse_pose_params_256: 256 crop -> 8x8 decode, 6000 pose
steps) plus NTU-like subject scale (z 1.8-2.4) reaches slope ~0.5 / 1-NN
0.79 — enough signal to learn. Full story: CI_EXTRACT_BUDGETS in
train/posestack.py and docs/PERF.md.

Receipt (CPU, CI budgets, round 3, seed 0): train fs_acc 0.94 / os_acc
0.85; FSOS on the 7 held-out classes 5-way: FS 0.59 +/- 0.14, OS 0.63 +/-
0.09, FSOS 0.40 +/- 0.04 (FS chance: 0.2). Held-out FS is extraction-
noise-limited near 0.6 across budget sweeps (40ep/0.59, 60ep/0.59).
Thresholds below sit WELL under those points: estimation noise, tiny
budgets and cross-platform drift (env gotcha: cached FMA variance) all
wiggle them run-to-run.
"""

import time

import numpy as np
import pytest

pytest.importorskip("cv2")

from isbfsar_tpu.train.posestack import (
    ACTION_EXTRA_CLASSES,
    ACTION_TEST_CLASSES,
    ACTION_TRAIN_CLASSES,
    MOTIONS,
    diverse_pose_params_256,
    humanoid_pose,
)

from tools.synth_workflow import run_workflow


class TestActionLibrary:
    def test_classes_are_disjoint_and_registered(self):
        train = set(ACTION_TRAIN_CLASSES) | set(ACTION_EXTRA_CLASSES)
        test = set(ACTION_TEST_CLASSES)
        assert not train & test, "train/test class leakage"
        assert not set(ACTION_TRAIN_CLASSES) & set(ACTION_EXTRA_CLASSES)
        assert len(train) >= 5 + 1  # way + an unknown source
        assert len(test) >= 5 + 1

    def test_all_motions_render_finite_and_distinct(self):
        """Every class's root-relative trajectory — the TRX input signal —
        is finite and separated from every other class's (the extended
        production classes included: the hard negatives — turn/twist,
        punch_r/punch_l, drink/touch_head, kick_l/kick_r — must be close
        in style yet still pass the separation floor)."""
        classes = sorted(set(ACTION_TRAIN_CLASSES + ACTION_EXTRA_CLASSES
                             + ACTION_TEST_CLASSES))
        trajs = {}
        for m in classes:
            T = np.stack([humanoid_pose(t, m)
                          for t in np.linspace(0, 1, 12, endpoint=False)])
            assert np.isfinite(T).all(), m
            trajs[m] = T - T[:, :1]
        for i, a in enumerate(classes):
            for b in classes[i + 1:]:
                d = np.abs(trajs[a] - trajs[b]).mean()
                assert d > 0.005, f"{a} vs {b} nearly identical ({d:.4f})"

    def test_pose_training_distribution_unchanged(self):
        """The pose trainers' scene distribution — MOTIONS plus the FROZEN
        _POSE_SCENE_ACTIONS library the diverse mode samples — must stay
        byte-stable: the cached trained fixtures and every receipt are
        keyed on budgets under this exact distribution. New action classes
        go in ACTION_EXTRA_CLASSES, never here."""
        from isbfsar_tpu.train.posestack import _POSE_SCENE_ACTIONS

        assert MOTIONS == ("idle", "wave", "squat", "walk")
        assert _POSE_SCENE_ACTIONS == (
            "raise_both", "clap", "kick_r", "bow", "lean", "march",
            "punch_l", "jumping_jack", "twist", "touch_head", "shrug",
            "sway",
        )
        # extras must NOT be in the pose-scene library (held-out guarantee)
        assert not set(ACTION_EXTRA_CLASSES) & set(_POSE_SCENE_ACTIONS)


class TestWorkdirFingerprint:
    """run_workflow must refuse resumable artifacts it cannot prove match
    the requested configuration (renders/extractions resume by file
    existence — a silent mix would poison the receipt)."""

    KW = dict(frame_hw=(24, 32), yolo_width=0.25, yolo_input_size=128,
              crop_size=128, log=False)

    def _params(self):
        return {"w": np.zeros((2, 2), np.float32)}

    def test_mismatched_manifest_refused(self, tmp_path):
        import json

        from isbfsar_tpu.configs import CameraIntrinsics

        wd = tmp_path / "wf"
        wd.mkdir()
        (wd / "manifest.json").write_text(json.dumps({"fingerprint": "feed"}))
        with pytest.raises(ValueError, match="different configuration"):
            run_workflow(self._params(), str(wd),
                         intrinsics=CameraIntrinsics(), **self.KW)

    @pytest.mark.parametrize("artifact", [
        "videos_train", "videos_test_queries", "videos_test_exemplars",
        "tree_train", "tree_test_q", "tree_test_ex",
    ])
    def test_legacy_dir_without_manifest_refused(self, tmp_path, artifact):
        """EVERY resumable artifact dir triggers the refusal — a partial
        probe would let a dir holding only the unchecked artifacts be
        silently stamped and resumed."""
        from isbfsar_tpu.configs import CameraIntrinsics

        wd = tmp_path / "wf"
        (wd / artifact).mkdir(parents=True)
        with pytest.raises(ValueError, match="no manifest"):
            run_workflow(self._params(), str(wd),
                         intrinsics=CameraIntrinsics(), **self.KW)


class TestFullOfflineLoop:
    @pytest.mark.slow  # ~204 s (TRX train runs every time)
    def test_render_extract_train_fsos(self):
        """The capstone: every offline stage chained, scored on held-out
        classes. Budgets match tools/synth_workflow.py's CI defaults."""
        from isbfsar_tpu.train.posestack import CI_FRAME_HW, CI_INTRINSICS

        # workdir=None: run_workflow derives a fingerprint-keyed dir under
        # the params cache (pose-params bytes + every render/extract knob),
        # so rendering + extraction resume across warm suites (~2 min
        # saved) while a retrained fixture or changed config lands in a
        # FRESH dir instead of resuming stale artifacts.
        receipt = run_workflow(
            diverse_pose_params_256(), workdir=None, frame_hw=CI_FRAME_HW,
            intrinsics=CI_INTRINSICS, clips_per_class=8, n_epochs=60,
            n_task=160, exemplar_clips=3, seed=0, log=False,
        )

        # the 0.3 gate must actually pass the data (a broken detector would
        # skip clips and silently shrink the dataset)
        total_clips = (receipt["train_classes"] + receipt["test_classes"]) \
            * receipt["clips_per_class"] \
            + receipt["test_classes"] * receipt["exemplar_clips"]
        assert receipt["skipped_clips"] <= total_clips * 0.1, receipt

        # training must learn its 8 seen classes (receipt 0.94; chance 0.2)
        assert receipt["train_fs_acc"] >= 0.70, receipt

        # the protocol scores 7 NEVER-SEEN classes, 5-way: chance is 0.2
        # for FS. Receipt points: FS 0.59 / OS 0.63 / FSOS 0.40 (module
        # docstring); thresholds leave room for budget-level variance while
        # still requiring clearly-above-chance generalization.
        assert receipt["fsos"]["FS-ACC"] >= 0.35, receipt
        assert receipt["fsos"]["OS-ACC"] >= 0.40, receipt
        assert receipt["fsos"]["FSOS-ACC"] >= 0.28, receipt


class TestFirstResultWatchdog:
    """The relay-wedge watchdog (tools/synth_workflow.py::
    start_first_result_watchdog): a hang at the FIRST device call must
    hard-exit(3) instead of burning the whole budget; any sign of progress
    (event set, or a clip file appearing on disk) must disarm it."""

    def _arm(self, tmp_path, deadline, calls):
        from tools.synth_workflow import start_first_result_watchdog
        tree = tmp_path / "tree_train"
        return tree, start_first_result_watchdog(
            {"train": str(tree)}, deadline,
            say=lambda *_: None, exit_fn=lambda code: calls.append(code),
        )

    def test_fires_exit3_when_nothing_appears(self, tmp_path):
        calls = []
        _, done = self._arm(tmp_path, 0.2, calls)
        time.sleep(1.0)
        assert calls == [3]
        assert not done.is_set()

    def test_disarmed_by_first_done_event(self, tmp_path):
        calls = []
        _, done = self._arm(tmp_path, 0.3, calls)
        done.set()
        time.sleep(1.0)
        assert calls == []

    def test_disarmed_by_clip_on_disk(self, tmp_path):
        # progress visible only on disk (extract_tree writes clips long
        # before the per-tree loop sets the event) also disarms
        calls = []
        tree, _ = self._arm(tmp_path, 0.4, calls)
        (tree / "wave").mkdir(parents=True)
        (tree / "wave" / "clip0.npy").write_bytes(b"x")
        time.sleep(1.2)
        assert calls == []

    def test_deadline_zero_disarms(self, tmp_path):
        calls = []
        _, done = self._arm(tmp_path, 0.0, calls)
        assert done.is_set()
        time.sleep(0.3)
        assert calls == []
