"""A7 end-to-end: real videos -> extraction tree -> one training epoch.

The reference actually ran its extraction pipeline over NTU-RGBD videos to
produce the training trees (reference modules/ar/utils/data_extraction/
extract_skeleton_rgb_from_nturgbd.py:57-117). This test closes the same
loop with cv2-synthesized .mp4s and the real (slim) pose estimator:
decode video -> uniform frame sampling -> estimate -> root-relative pose
npy tree -> resume-by-count -> EpisodicSampler -> one Trainer epoch.
"""

import dataclasses
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from isbfsar_tpu.configs import ARConfig, CameraIntrinsics, HPEConfig
from isbfsar_tpu.hpe.estimator import HumanPoseEstimator
from isbfsar_tpu.models.effnetv2 import V2_TINY

from tools.extract_dataset import extract_clip, extract_tree

N_FRAMES = 8


@pytest.fixture(scope="module")
def estimator():
    # skeleton=None: extraction stores the FULL 122-joint pose (the tree
    # contract the episodic loader expects; it selects 30 joints on load)
    return HumanPoseEstimator(
        HPEConfig(yolo_input_size=128, crop_size=256, yolo_thresh=0.0, skeleton=None),
        CameraIntrinsics(),
        backbone_stages=V2_TINY,
        frame_shape=(120, 160),
        yolo_width=0.25,
    )


def _write_video(path: str, n_frames: int = 20, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 15, (160, 120))
    assert vw.isOpened(), "cv2 mp4v encoder unavailable"
    for i in range(n_frames):
        frame = rng.integers(0, 128, (120, 160, 3)).astype(np.uint8)
        # a bright moving blob so frames differ deterministically
        cx = 20 + (i * 6) % 120
        cv2.circle(frame, (cx, 60), 18, (255, 255, 255), -1)
        vw.write(frame)
    vw.release()


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("videos")
    # 3 classes: k-way episodes need at least one class OUTSIDE the support
    # set to draw the open-set "unknown" sample from (reference dataloader)
    for c, class_name in enumerate(["wave", "point", "idle"]):
        os.makedirs(root / class_name)
        for clip in range(2):
            _write_video(str(root / class_name / f"clip{clip}.mp4"), seed=10 * c + clip)
    return str(root)


class TestExtraction:
    def test_tree_layout_and_resume(self, estimator, video_root, tmp_path):
        out = str(tmp_path / "tree")
        written = extract_tree(estimator, video_root, out, n_frames=N_FRAMES)
        assert len(written) == 6  # 3 classes x 2 clips

        for class_name in ("wave", "point"):
            clips = sorted(os.listdir(os.path.join(out, class_name)))
            assert clips == ["0", "1"]
            for clip in clips:
                d = os.path.join(out, class_name, clip)
                files = sorted(os.listdir(d))
                assert files == [f"{i}.npy" for i in range(N_FRAMES)]
                pose0 = np.load(os.path.join(d, "0.npy"))
                assert pose0.shape == (122, 3) and pose0.dtype == np.float32
                # root-relative: joint 0 at the origin (reference :121)
                np.testing.assert_array_equal(pose0[0], 0.0)

        # resume-by-count: a second run over the same tree writes nothing
        assert extract_tree(estimator, video_root, out, n_frames=N_FRAMES) == []

        # ...and picks up exactly the new clip when one is added
        _write_video(os.path.join(video_root, "wave", "clip2.mp4"), seed=99)
        more = extract_tree(estimator, video_root, out, n_frames=N_FRAMES)
        assert [os.path.basename(d) for d in more] == ["2"]
        assert sorted(os.listdir(os.path.join(out, "wave"))) == ["0", "1", "2"]

    def test_pose_reuse_on_frame_failure(self, estimator, video_root):
        """Mid-clip estimator failures reuse the last good pose (reference
        :110-117) — frame count stays n_frames."""

        class Flaky:
            def __init__(self, inner):
                self.inner, self.calls = inner, 0

            def estimate(self, frame):
                self.calls += 1
                if self.calls % 3 == 0:
                    return None
                return self.inner.estimate(frame)

        video = os.path.join(video_root, "wave", "clip0.mp4")
        poses, _ = extract_clip(Flaky(estimator), video, N_FRAMES, with_images=False)
        assert len(poses) == N_FRAMES
        assert all(p.shape == (122, 3) for p in poses)

    def test_clip_with_no_pose_is_skipped(self, video_root):
        class Blind:
            def estimate(self, frame):
                return None

        video = os.path.join(video_root, "wave", "clip0.mp4")
        assert extract_clip(Blind(), video, N_FRAMES, with_images=False) is None

    def test_resume_after_skipped_clip(self, estimator, tmp_path):
        """A skipped clip leaves a .skip marker so resume-by-count does not
        undercount and re-extract the tail on every rerun; markers are
        invisible to the episodic loader (directories only)."""
        from isbfsar_tpu.train.dataloader import _clip_subdirs

        root = tmp_path / "vids"
        os.makedirs(root / "act")
        for clip in range(3):
            _write_video(str(root / "act" / f"clip{clip}.mp4"), seed=clip)

        calls = []

        class SkipMiddle:
            def estimate(self, frame):
                # clip1's frames all fail; others delegate to the real one
                if calls[-1] == 1:
                    return None
                return estimator.estimate(frame)

        # wrap extract_clip: track which video index is running
        import tools.extract_dataset as xd

        orig = xd.extract_clip

        def tracking_extract(est, video_path, n_frames, with_images, **kw):
            calls.append(int(os.path.basename(video_path)[4]))
            return orig(est, video_path, n_frames, with_images, **kw)

        out = str(tmp_path / "tree")
        try:
            xd.extract_clip = tracking_extract
            written = xd.extract_tree(SkipMiddle(), str(root), out, n_frames=N_FRAMES)
            assert [os.path.basename(d) for d in written] == ["0", "2"]
            # marker present for the skipped idx, dirs for the extracted ones
            entries = sorted(os.listdir(os.path.join(out, "act")))
            assert entries == ["0", "2", ".skip_1"] or set(entries) == {"0", "2", ".skip_1"}
            # a rerun extracts NOTHING (was: clip2 re-extracted forever)
            calls.clear()
            assert xd.extract_tree(SkipMiddle(), str(root), out, n_frames=N_FRAMES) == []
            assert calls == []
        finally:
            xd.extract_clip = orig
        # the loader sees only the clip directories
        assert [os.path.basename(p) for p in _clip_subdirs(os.path.join(out, "act"))] == ["0", "2"]

    def test_train_epoch_from_extracted_tree(self, estimator, video_root, tmp_path):
        """The emitted tree must feed the episodic trainer directly."""
        from isbfsar_tpu.parallel.mesh import make_mesh
        from isbfsar_tpu.train.dataloader import EpisodicSampler, batch_iterator
        from isbfsar_tpu.train.trainer import Trainer

        out = str(tmp_path / "tree")
        extract_tree(estimator, video_root, out, n_frames=N_FRAMES)

        cfg = dataclasses.replace(
            ARConfig.for_input("skeleton"),
            way=2, seq_len=4, batch_size=2, n_task=4, eval_every_n_epoch=10_000,
        )
        sampler = EpisodicSampler(out, k=2, n_task=4, max_l=N_FRAMES, l=4, seed=0)
        batches = list(batch_iterator(sampler, cfg.batch_size, shuffle=False, drop_last=True))
        trainer = Trainer(cfg, mesh=make_mesh(1), log_dir=str(tmp_path / "run"), use_wandb=False)
        summary = trainer.run_epoch(0, batches, train=True)
        assert np.isfinite(summary["train/fs_loss"])
