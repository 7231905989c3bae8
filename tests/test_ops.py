"""Parity tests: JAX/XLA compute ops vs the numpy spec implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isbfsar_tpu import ops
from tests import reference_impls as spec


class TestNMS:
    def test_nms_matches_greedy_spec(self, rng):
        n = 40
        centers = rng.uniform(0.2, 0.8, (n, 2))
        sizes = rng.uniform(0.05, 0.3, (n, 2))
        boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], axis=1).astype(np.float32)
        scores = rng.uniform(0.0, 1.0, n).astype(np.float32)

        kept_spec = set(spec.nms_greedy(boxes, scores, 0.5).tolist())

        order = np.argsort(scores)[::-1]
        keep = ops.nms_fixed(
            jnp.asarray(boxes[order]), jnp.asarray(scores[order]), jnp.ones(n, bool), 0.5
        )
        kept_jax = set(order[np.asarray(keep)].tolist())
        assert kept_jax == kept_spec

    def test_best_person_matches_spec(self, rng):
        n_anchor = 512
        boxes = rng.uniform(0, 1, (1, n_anchor, 1, 4)).astype(np.float32)
        confs = (rng.uniform(0, 1, (1, n_anchor, 80)) ** 4).astype(np.float32)

        expected = spec.best_person_spec(boxes, confs, 0.3, 0.7)
        box, conf, found = jax.jit(ops.best_person_box)(jnp.asarray(boxes), jnp.asarray(confs))
        if expected is None:
            assert not bool(found)
        else:
            assert bool(found)
            np.testing.assert_allclose(np.asarray(box), expected[0], rtol=1e-6)
            np.testing.assert_allclose(float(conf), expected[1], rtol=1e-6)

    def test_best_person_none_when_below_threshold(self):
        boxes = np.zeros((1, 16, 1, 4), np.float32)
        confs = np.full((1, 16, 80), 0.1, np.float32)
        _, _, found = ops.best_person_box(jnp.asarray(boxes), jnp.asarray(confs), 0.3)
        assert not bool(found)

    def test_postprocess_yolo_keeps_top_person(self, rng):
        n_anchor = 256
        boxes = rng.uniform(0, 1, (n_anchor, 4)).astype(np.float32)
        confs = np.zeros((n_anchor, 80), np.float32)
        confs[:, 0] = rng.uniform(0, 1, n_anchor)
        dets, valid = jax.jit(ops.postprocess_yolo, static_argnums=(4,))(
            jnp.asarray(boxes), jnp.asarray(confs), 0.3, 0.7, 32
        )
        dets, valid = np.asarray(dets), np.asarray(valid)
        assert valid.any()
        # The top kept detection is the global max-confidence box.
        assert dets[0, 4] == pytest.approx(confs[:, 0].max(), rel=1e-6)


class TestSoftArgmax:
    def test_decode3d_matches_spec(self, rng):
        logits = rng.normal(size=(2, 8, 8, 8, 32)).astype(np.float32)
        got = np.asarray(ops.decode_heatmap3d(jnp.asarray(logits)))
        want = spec.decode_heatmap_spec(logits, axes=(2, 1, 3))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_decode2d_matches_spec(self, rng):
        logits = rng.normal(size=(2, 8, 8, 32)).astype(np.float32)
        got = np.asarray(ops.decode_heatmap2d(jnp.asarray(logits)))
        want = spec.decode_heatmap_spec(logits, axes=(2, 1)) * 255.0
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_split_head_logits(self, rng):
        logits = rng.normal(size=(1, 8, 8, 288)).astype(np.float32)
        l2, l3 = ops.split_head_logits(jnp.asarray(logits))
        assert l2.shape == (1, 8, 8, 32)
        assert l3.shape == (1, 8, 8, 8, 32)
        # channel layout: [..., :32] is 2D; rest reshapes (d j) with j=32
        np.testing.assert_array_equal(np.asarray(l2), logits[..., :32])
        np.testing.assert_array_equal(
            np.asarray(l3), logits[..., 32:].reshape(1, 8, 8, 8, 32)
        )

    def test_uniform_logits_decode_to_center(self):
        logits = jnp.zeros((1, 8, 8, 8, 32))
        got = np.asarray(ops.decode_heatmap3d(logits))
        np.testing.assert_allclose(got, 0.5, atol=1e-6)


class TestReconstruct:
    def _make_case(self, rng, b=3, j=32):
        pose = rng.normal(size=(b, j, 3)).astype(np.float32)
        pose[..., 2] += 4.0  # in front of the camera
        k = np.array([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]], np.float32)
        proj = pose @ k.T
        coords2d = (proj[..., :2] / proj[..., 2:]).astype(np.float32)
        rel = (pose - pose.mean(axis=1, keepdims=True)).astype(np.float32)
        fov = np.all((coords2d > 18) & (coords2d < 238), axis=-1)
        return pose, coords2d, rel, np.tile(k[None], (b, 1, 1)), fov

    def test_reference_point_matches_lstsq_spec(self, rng):
        _, coords2d, rel, ks, fov = self._make_case(rng)
        inv_k = np.linalg.inv(ks)
        normalized = (spec.homog(coords2d) @ inv_k.swapaxes(1, 2))[..., :2]
        want = spec.reconstruct_ref_spec(normalized, rel, fov)
        got = np.asarray(
            ops.reconstruct_reference_point(
                jnp.asarray(normalized), jnp.asarray(rel), jnp.asarray(fov)
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_absolute_matches_spec(self, rng):
        _, coords2d, rel, ks, fov = self._make_case(rng)
        want = spec.reconstruct_absolute_spec(coords2d, rel, ks, fov)
        got = np.asarray(
            ops.reconstruct_absolute(
                jnp.asarray(coords2d), jnp.asarray(rel), jnp.asarray(ks), jnp.asarray(fov)
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_recovers_true_translation(self, rng):
        # With perfect projections + full visibility, reconstruction must
        # recover the synthesized absolute pose to ~1mm (pose units ~ meters).
        pose, coords2d, rel, ks, fov = self._make_case(rng, b=1)
        fov = np.ones_like(fov)
        got = np.asarray(
            ops.reconstruct_absolute(
                jnp.asarray(coords2d), jnp.asarray(rel), jnp.asarray(ks), jnp.asarray(fov)
            )
        )
        np.testing.assert_allclose(got, pose, atol=2e-3)

    def test_fov_check(self):
        coords = jnp.asarray([[[20.0, 30.0], [10.0, 30.0], [240.0, 100.0], [100.0, 100.0]]])
        got = np.asarray(ops.is_within_fov(coords))
        np.testing.assert_array_equal(got[0], [True, False, False, True])


class TestVirtualCamera:
    def test_matches_spec(self):
        k = np.array([[384.0, 0, 319.1], [0, 384.0, 237.8], [0, 0, 1]], np.float32)
        for bbox in [(100, 300, 50, 400), (0, 640, 0, 480), (500, 620, 300, 470)]:
            x1, x2, y1, y2 = bbox
            want_k, want_r = spec.virtual_camera_spec(x1, x2, y1, y2, k, 256)
            got_k, got_r = ops.virtual_camera(
                jnp.float32(x1), jnp.float32(x2), jnp.float32(y1), jnp.float32(y2),
                jnp.asarray(k), 256,
            )
            np.testing.assert_allclose(np.asarray(got_k), want_k, rtol=1e-4)
            np.testing.assert_allclose(np.asarray(got_r), want_r, rtol=1e-4, atol=1e-6)

    def test_warp_matrix_roundtrip(self):
        k = np.array([[384.0, 0, 319.1], [0, 384.0, 237.8], [0, 0, 1]], np.float32)
        new_k, rot = ops.virtual_camera(
            jnp.float32(100), jnp.float32(300), jnp.float32(50), jnp.float32(400),
            jnp.asarray(k), 256,
        )
        h = np.asarray(ops.warp_matrix(jnp.asarray(k), new_k, rot))
        # H maps crop pixels back to frame pixels: K @ inv(new_K @ R)
        want = k.astype(np.float64) @ np.linalg.inv(
            np.asarray(new_k, np.float64)[None] @ np.asarray(rot, np.float64)
        )
        np.testing.assert_allclose(h, want, rtol=1e-4, atol=1e-5)


class TestWarp:
    def test_matches_spec_small(self, rng):
        img = rng.integers(0, 255, (40, 60, 3)).astype(np.float32)
        t = np.array(
            [
                np.eye(3),
                [[0.5, 0.1, 3.0], [-0.05, 0.7, 2.0], [1e-4, -2e-4, 1.0]],
                [[2.0, 0.0, -8.0], [0.0, 2.0, -5.0], [0.0, 0.0, 2.0]],  # H22 != 1
            ],
            dtype=np.float32,
        )
        got = np.asarray(ops.warp_image(jnp.asarray(img), jnp.asarray(t), out_size=32))
        want = spec.warp_spec(img, t, out_size=32)
        np.testing.assert_array_equal(got, want)

    def test_identity_warp(self, rng):
        img = rng.integers(0, 255, (64, 64, 3)).astype(np.float32)
        out = np.asarray(ops.warp_image(jnp.asarray(img), jnp.eye(3)[None], out_size=64))
        np.testing.assert_array_equal(out[0], img)

    def test_bilinear_identity(self, rng):
        img = rng.integers(0, 255, (64, 64, 3)).astype(np.float32)
        out = np.asarray(ops.warp_image_bilinear(jnp.asarray(img), jnp.eye(3)[None], out_size=64))
        np.testing.assert_allclose(out[0], img, atol=1e-3)

    @pytest.mark.parametrize("packed", [True, False])
    def test_bilinear_single_gather_matches_four_gather(self, rng, packed):
        """BOTH formulations (packed single-gather and classic four-gather,
        ops/warp.py round-4 note) must be EXACTLY the per-corner-masked
        bilinear sample: four independently bounds-checked fetches, zeros
        out of bounds. Sweeps transforms whose sample grids hit the
        interior, straddle every border (the 1-px padding's edge cases),
        and leave the frame entirely."""
        h, w = 48, 56
        img = rng.integers(0, 255, (h, w, 3)).astype(np.float32)

        def four_gather_spec(img, t, out_size):
            t = t / t[2, 2]
            ys, xs = np.mgrid[0:out_size, 0:out_size].astype(np.float32)
            k = t[2, 0] * xs + t[2, 1] * ys + 1.0
            sx = (t[0, 0] * xs + t[0, 1] * ys + t[0, 2]) / k
            sy = (t[1, 0] * xs + t[1, 1] * ys + t[1, 2]) / k
            x0 = np.floor(sx).astype(np.int64)
            y0 = np.floor(sy).astype(np.int64)
            fx = (sx - x0)[..., None]
            fy = (sy - y0)[..., None]

            def fetch(xi, yi):
                ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
                vals = img[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)]
                return np.where(ok[..., None], vals, 0.0)

            top = fetch(x0, y0) * (1 - fx) + fetch(x0 + 1, y0) * fx
            bot = fetch(x0, y0 + 1) * (1 - fx) + fetch(x0 + 1, y0 + 1) * fx
            return top * (1 - fy) + bot * fy

        transforms = np.asarray(
            [
                np.eye(3),                                                  # interior
                [[0.5, 0.1, -3.2], [-0.05, 0.7, -2.9], [1e-4, -2e-4, 1.0]],  # left/top straddle
                [[1.3, 0.0, 40.1], [0.0, 1.3, 30.7], [0.0, 0.0, 1.0]],       # right/bottom straddle
                [[1.0, 0.0, -0.99], [0.0, 1.0, -0.99], [0.0, 0.0, 1.0]],     # 1-px outside support edge
                [[1.0, 0.0, 500.0], [0.0, 1.0, 500.0], [0.0, 0.0, 1.0]],     # fully outside -> zeros
                [[2.0, 0.0, -8.0], [0.0, 2.0, -5.0], [0.0, 0.0, 2.0]],       # H22 != 1
            ],
            dtype=np.float32,
        )
        got = np.asarray(ops.warp_image_bilinear(
            jnp.asarray(img), jnp.asarray(transforms), out_size=32,
            packed=packed))
        for b, t in enumerate(transforms):
            want = four_gather_spec(img, t, 32)
            np.testing.assert_allclose(got[b], want, atol=2e-3,
                                       err_msg=f"transform {b}")
        assert np.all(got[4] == 0.0)  # the fully-outside grid really zeroed


class TestTuples:
    def test_pairs_16(self):
        t = ops.frame_tuples(16, 2)
        assert t.shape == (120, 2)
        assert ops.n_tuples(8, 2) == 28
        # lexicographic ordering, as itertools.combinations (reference model.py:52-55)
        assert t[0].tolist() == [0, 1] and t[-1].tolist() == [14, 15]


class TestImageOps:
    def test_yolo_preprocess_shape_range(self, rng):
        frame = rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
        out = np.asarray(ops_image().yolo_preprocess(jnp.asarray(frame)))
        assert out.shape == (1, 256, 256, 3)  # NHWC
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_ar_rgb_preprocess_matches_host_formula(self, rng):
        crop = rng.integers(0, 255, (224, 224, 3)).astype(np.uint8)
        got = np.asarray(ops_image().ar_rgb_preprocess(jnp.asarray(crop)))
        want = (crop / 255.0) * np.array([0.229, 0.224, 0.225]) + np.array([0.485, 0.456, 0.406])
        np.testing.assert_allclose(got, want, rtol=1e-5)


def ops_image():
    from isbfsar_tpu.ops import image

    return image


class TestResizeArea:
    def test_matches_cv2_inter_area(self, rng):
        import cv2

        from isbfsar_tpu.ops.image import resize_area

        img = rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
        got = np.asarray(resize_area(jnp.asarray(img), 256, 256))
        want = cv2.resize(img.astype(np.float32), (256, 256), interpolation=cv2.INTER_AREA)
        np.testing.assert_allclose(got, want, atol=0.51)  # cv2 rounds interim sums

    def test_integer_factor_exact(self, rng):
        from isbfsar_tpu.ops.image import resize_area

        img = rng.uniform(0, 255, (64, 64, 3)).astype(np.float32)
        got = np.asarray(resize_area(jnp.asarray(img), 32, 32))
        want = img.reshape(32, 2, 32, 2, 3).mean(axis=(1, 3))
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestI420:
    def test_roundtrip_matches_cv2(self, rng):
        import cv2

        from isbfsar_tpu.ops.image import bgr_to_i420, i420_to_bgr

        bgr = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
        yuv = bgr_to_i420(bgr)
        got = np.asarray(i420_to_bgr(jnp.asarray(yuv), 48))
        want = cv2.cvtColor(yuv, cv2.COLOR_YUV2BGR_I420).astype(np.float32)
        # both decoders quantize differently; 4:2:0 chroma is lossy anyway
        assert np.abs(got - want).mean() < 2.0
        assert np.abs(got - want).max() <= 16.0
