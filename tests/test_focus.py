"""Focus module tests: geometry correctness + detector behavior contracts."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isbfsar_tpu.configs import CameraIntrinsics, FocusConfig, MutualGazeConfig
from isbfsar_tpu.focus import geometry as fg
from isbfsar_tpu.focus.detector import FocusDetector
from isbfsar_tpu.focus.mutual import HeadDetector, MutualGazeDetector
from isbfsar_tpu.models.gaze import blaze_anchors, pitchyaw_to_vector


class TestGazeGeometry:
    def test_rotvec_roundtrip(self, rng):
        from scipy.spatial.transform import Rotation  # torch image bundles scipy

        for _ in range(5):
            rv = rng.normal(size=3) * 0.8
            r = Rotation.from_rotvec(rv).as_matrix()
            got = np.asarray(fg.rotmat_to_rotvec(jnp.asarray(r, jnp.float32)))
            np.testing.assert_allclose(got, rv, atol=1e-4)

    def test_rotvec_identity(self):
        got = np.asarray(fg.rotmat_to_rotvec(jnp.eye(3)))
        np.testing.assert_allclose(got, 0.0, atol=1e-7)

    def test_kabsch_recovers_rotation(self, rng):
        from scipy.spatial.transform import Rotation

        rv = rng.normal(size=3) * 0.5
        r_true = Rotation.from_rotvec(rv).as_matrix().astype(np.float32)
        src = rng.normal(size=(6, 3)).astype(np.float32)
        dst = src @ r_true.T
        got = np.asarray(fg.kabsch(jnp.asarray(src), jnp.asarray(dst)))
        np.testing.assert_allclose(got, r_true, atol=1e-4)

    def test_pitchyaw_zero_looks_forward(self):
        v = np.asarray(pitchyaw_to_vector(jnp.zeros((2,))))
        np.testing.assert_allclose(v, [0.0, 0.0, -1.0], atol=1e-7)

    def test_head_pose_frontal_face(self):
        # A frontal face projected through the camera yields ~identity rotation.
        k = jnp.asarray(CameraIntrinsics().matrix())
        pts = fg.CANONICAL_FACE_3D + np.array([0, 0, 0.6], np.float32)
        proj = pts @ np.asarray(k).T
        lms = proj[:, :2] / proj[:, 2:]
        rot, center = fg.head_pose_from_landmarks(jnp.asarray(lms), k, 0.6)
        rotvec = np.asarray(fg.rotmat_to_rotvec(rot))
        assert np.abs(rotvec).max() < 0.2
        np.testing.assert_allclose(np.asarray(center)[2], 0.6, atol=0.05)

    def test_pitchyaw_vector_roundtrip(self):
        """vector_to_pitchyaw is the exact inverse of pitchyaw_to_vector
        (the gaze-label normalization in train/gazefocus.py relies on it)."""
        from isbfsar_tpu.models.gaze import pitchyaw_to_vector, vector_to_pitchyaw

        rng = np.random.default_rng(5)
        py = rng.uniform([-1.2, -2.5], [1.2, 2.5], size=(64, 2)).astype(np.float32)
        back = np.asarray(vector_to_pitchyaw(pitchyaw_to_vector(jnp.asarray(py))))
        np.testing.assert_allclose(back, py, atol=1e-5)

    def test_head_pose_yaw_parameterization(self):
        """The rotvec the close/far thresholds consume IS physical yaw in
        radians (VERDICT weak #8): a face turned by yaw θ about the camera
        y-axis must recover rotvec ≈ [0, θ, 0] — the same quantity ptgaze's
        ``head_pose_rot.as_rotvec()[1]`` measures (reference focus.py:125),
        so ``foc_rot_thr = 0.7`` thresholds the same physical angle."""
        from scipy.spatial.transform import Rotation

        k = jnp.asarray(CameraIntrinsics().matrix())
        for yaw in (0.0, 0.3, 0.7, 1.0, -0.5):
            r_true = Rotation.from_rotvec([0.0, yaw, 0.0]).as_matrix().astype(np.float32)
            pts = fg.CANONICAL_FACE_3D @ r_true.T + np.array([0, 0, 0.6], np.float32)
            proj = pts @ np.asarray(k).T
            lms = proj[:, :2] / proj[:, 2:]
            rot, _ = fg.head_pose_from_landmarks(jnp.asarray(lms), k, 0.6)
            rotvec = np.asarray(fg.rotmat_to_rotvec(rot))
            assert abs(rotvec[1] - yaw) < 0.07, f"yaw {yaw}: got {rotvec}"
            assert abs(rotvec[0]) < 0.07 and abs(rotvec[2]) < 0.07, rotvec
        # threshold semantics: 0.5 rad yaw passes foc_rot_thr=0.7, 1.0 fails
        for yaw, side in ((0.5, True), (1.0, False)):
            r_true = Rotation.from_rotvec([0.0, yaw, 0.0]).as_matrix().astype(np.float32)
            pts = fg.CANONICAL_FACE_3D @ r_true.T + np.array([0, 0, 0.6], np.float32)
            proj = pts @ np.asarray(k).T
            lms = proj[:, :2] / proj[:, 2:]
            rot, _ = fg.head_pose_from_landmarks(jnp.asarray(lms), k, 0.6)
            score_rot = abs(float(fg.rotmat_to_rotvec(rot)[1]))
            assert (score_rot < 0.7) is side

    def test_head_pose_pitch_parameterization(self):
        """Pitch lands on rotvec[0] with the right sign and magnitude."""
        from scipy.spatial.transform import Rotation

        k = jnp.asarray(CameraIntrinsics().matrix())
        for pitch in (0.4, -0.4):
            r_true = Rotation.from_rotvec([pitch, 0.0, 0.0]).as_matrix().astype(np.float32)
            pts = fg.CANONICAL_FACE_3D @ r_true.T + np.array([0, 0, 0.6], np.float32)
            proj = pts @ np.asarray(k).T
            lms = proj[:, :2] / proj[:, 2:]
            rot, _ = fg.head_pose_from_landmarks(jnp.asarray(lms), k, 0.6)
            rotvec = np.asarray(fg.rotmat_to_rotvec(rot))
            assert abs(rotvec[0] - pitch) < 0.07, f"pitch {pitch}: got {rotvec}"

    def test_normalized_rot2d_far_branch_semantics(self):
        """The far branch's |normalized_head_rot2d[1]| equals the yaw of a
        centered face (r_norm ≈ I there), so ``dist_thr = 0.3`` thresholds
        physical yaw radians exactly as the reference's focus.py:128-133."""
        from scipy.spatial.transform import Rotation

        k = jnp.asarray(CameraIntrinsics().matrix())
        for yaw, focus_side in ((0.15, True), (0.6, False)):
            r_true = Rotation.from_rotvec([0.0, yaw, 0.0]).as_matrix().astype(np.float32)
            pts = fg.CANONICAL_FACE_3D @ r_true.T + np.array([0, 0, 0.6], np.float32)
            proj = pts @ np.asarray(k).T
            lms = proj[:, :2] / proj[:, 2:]
            rot, center = fg.head_pose_from_landmarks(jnp.asarray(lms), k, 0.6)
            _, r_norm = fg.normalization_camera(center, k, 0.6, 224)
            rot2d = np.asarray(fg.rotmat_to_rotvec(r_norm @ rot))[:2]
            assert bool(abs(rot2d[1]) < 0.3) is focus_side, (yaw, rot2d)

    def test_normalization_camera_centers_face(self):
        k = jnp.asarray(CameraIntrinsics().matrix())
        center = jnp.asarray([0.1, -0.05, 0.7])
        warp, r_norm = fg.normalization_camera(center, k, 0.6, 224)
        # the normalizing rotation points z at the face center
        z = np.asarray(r_norm)[2]
        c = np.asarray(center) / np.linalg.norm(np.asarray(center))
        np.testing.assert_allclose(z, c, atol=1e-5)
        # R is orthonormal
        np.testing.assert_allclose(
            np.asarray(r_norm) @ np.asarray(r_norm).T, np.eye(3), atol=1e-5
        )

    def test_blaze_anchor_count(self):
        assert blaze_anchors(128).shape == (896, 2)


@pytest.fixture(scope="module")
def focus_det():
    return FocusDetector(FocusConfig(), CameraIntrinsics(), frame_shape=(120, 160))


class TestFocusDetector:
    def test_estimate_contract(self, focus_det, rng):
        frame = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
        res = focus_det.estimate(frame)
        if res is None:  # random weights may score below 0.5 — both legal
            return
        focus, face = res
        assert isinstance(focus, bool)
        assert face.bbox.shape == (2, 2)
        assert face.normalized_gaze_vector.shape == (3,)
        assert face.head_pose_rotvec.shape == (3,)

    def test_patience_majority_vote(self, focus_det):
        focus_det.focuses = []
        for verdicts, expect in [
            ([True, True, False], True),
            ([False, False, True], False),
        ]:
            focus_det.focuses = list(verdicts)
            focus_det.focuses = focus_det.focuses[-focus_det.config.patience:]
            focus_det.is_focus = focus_det.focuses.count(True) > len(focus_det.focuses) / 2
            assert focus_det.is_focus == expect

    def test_heuristic_close_vs_far(self):
        """The close/far threshold logic itself (reference focus.py:118-133)."""
        cfg = FocusConfig()
        # close + staring straight at camera (gaze z ~ -1) -> focus
        assert (-0.99 < cfg.close_thr) is True
        # far + head turned (|rot y| > dist_thr) -> not focus
        assert (abs(0.5) < cfg.dist_thr) is False


class TestMutualGaze:
    def test_head_detector_contract(self, rng):
        det = HeadDetector(MutualGazeConfig(), input_size=128)
        frame = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
        res = det.estimate(frame)
        if res is not None:
            box, score = res
            assert box.shape == (4,)
            assert 0.0 <= score <= 1.0

    def test_mutual_gaze_contract(self, rng):
        cfg = dataclasses.replace(MutualGazeConfig(), score_thr=0.0, crop_size=64)
        det = MutualGazeDetector(cfg)
        frame = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
        res = det.estimate(frame)
        assert res is not None  # thresh 0 always yields the top head
        watching, box = res
        assert isinstance(watching, bool)
        assert box.shape == (4,)


class TestHeadPose:
    def test_head_pose_detector_contract(self, rng):
        from isbfsar_tpu.focus.head_pose import HeadPoseDetector

        det = HeadPoseDetector(crop_size=64)
        frame = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
        res = det.estimate(frame)
        if res is not None:  # random weights may not clear the face gate
            assert set(res) == {"bbox", "yaw", "pitch", "roll"}
            assert -99.0 <= res["yaw"] <= 99.0  # 66-bin decode range
            assert -99.0 <= res["pitch"] <= 99.0
