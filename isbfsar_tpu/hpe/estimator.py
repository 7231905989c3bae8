"""Human pose estimation: frame -> absolute 3D skeleton, one XLA program.

Behavioral rebuild of the reference's ``HumanPoseEstimator``
(reference modules/hpe/hpe.py:14-173). The reference splits the work across
four TensorRT engines with host numpy between them (resize/YOLO -> CPU NMS ->
host homography -> warp engine -> backbone engine -> heads engine -> host
soft-argmax + least squares). Here the entire chain — YOLO preprocess,
detection, person selection, virtual-camera homography, crop warp, backbone,
heatmap head, 2D/3D soft-argmax, FOV masking, absolute reconstruction,
de-rotation and 32 -> 30 joint mapping — is ONE jit-compiled program: a
single host->device transfer of the camera frame per call, flags instead of
early returns (XLA needs static shapes; the Python wrapper converts the
flags back into the reference's ``None`` contract).

Output contract (reference hpe.py:171-173): dict with ``pose`` (30, 3)
absolute camera-space joints, ``edges`` (29, 2), ``bbox`` (x1, x2, y1, y2).
``None`` when no person is found or when fewer than 1/4 of the joints are
inside the field of view (hpe.py:69-73, 149-153). In ``just_box`` mode only
the detector runs and the dict carries the bbox (hpe.py:82-83).

The 32->122 joint expansion and the 30-joint selection are fused into one
precomputed (32, 30) matrix (reference hpe.py:162-167 does expand-then-index;
the composition is exact and 4x fewer FLOPs).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isbfsar_tpu.configs import CameraIntrinsics, HPEConfig
from isbfsar_tpu.models.effnetv2 import V2_L, EfficientNetV2, MetrabsHead
from isbfsar_tpu.models.yolov4 import YOLOv4
from isbfsar_tpu.ops.geometry import is_within_fov, mm, virtual_camera, warp_matrix
from isbfsar_tpu.ops.image import yolo_preprocess
from isbfsar_tpu.ops.nms import best_person_box
from isbfsar_tpu.ops.reconstruct import reconstruct_absolute
from isbfsar_tpu.ops.softargmax import decode_heatmap2d, decode_heatmap3d, split_head_logits
from isbfsar_tpu.ops.warp import warp_image
from isbfsar_tpu.utils.skeleton import get_skeleton, load_expand_joints


class HumanPoseEstimator:
    def __init__(
        self,
        config: HPEConfig,
        intrinsics: CameraIntrinsics,
        params: Optional[Dict[str, Any]] = None,
        seed: int = 0,
        backbone_stages: Sequence = V2_L,
        frame_shape: Tuple[int, int] = (480, 640),
        just_box: Optional[bool] = None,
        yolo_width: float = 1.0,
    ):
        self.config = config
        self.just_box = config.just_box if just_box is None else just_box
        self.frame_shape = frame_shape
        self.k_matrix = jnp.asarray(intrinsics.matrix())

        self.yolo = YOLOv4(dtype=jnp.dtype(config.compute_dtype), width=yolo_width)
        self.bbone = EfficientNetV2(stages=backbone_stages, dtype=jnp.dtype(config.compute_dtype))
        self.head = MetrabsHead()

        self.skeleton = get_skeleton(config.skeleton) if config.skeleton else None
        expand = load_expand_joints(config.expand_joints_path)  # (32, 122)
        if self.skeleton is not None:
            # Fuse expansion + selection: (32, n_joints).
            self.joint_matrix = jnp.asarray(expand[:, list(self.skeleton.indices)])
            self.edges = np.asarray(self.skeleton.edges)
        else:
            self.joint_matrix = jnp.asarray(expand)
            self.edges = None

        if config.num_aug > 0:
            from isbfsar_tpu.ops.geometry import tta_params

            flip, rotflip, gammas, scales = tta_params(config.num_aug)
            if config.tta_aggregate == "aug0" and bool(flip[0]):
                # should_flip[0] = (0 - num_aug//2) % 2 != 0: aug 0 is a
                # FLIPPED augmentation for num_aug % 4 in {2, 3}. The
                # reference keeps aug 0 without any left/right joint swap
                # (hpe.py:109,169), so for those counts it would return a
                # mirrored pose — a latent reference defect (its production
                # default is num_aug=0, params.py:36). Refuse instead of
                # reproducing it.
                raise ValueError(
                    f"tta_aggregate='aug0' with num_aug={config.num_aug}: "
                    f"aug 0 is a flipped augmentation for this count and the "
                    f"kept prediction would be left/right mirrored. Use "
                    f"num_aug with num_aug % 4 in {{0, 1}} (e.g. 4, 5) or "
                    f"tta_aggregate='mean'."
                )
            # gammas intentionally unused: the reference computes them too
            # and never applies them to the crops (hpe.py:99-101 feeds
            # bbone_in/255 straight in) — parity preserved.
            # the reference's scale linspace yields num_aug-1 entries for
            # even num_aug (misc.py:318-320 off-by-one; it only ever ran odd
            # counts) — pad with the last scale to keep shapes consistent
            if len(scales) < config.num_aug:
                scales = np.concatenate([scales, np.repeat(scales[-1:], config.num_aug - len(scales))])
            self._tta = {
                "keep": jnp.asarray(~flip, jnp.float32),  # flipped augs would
                # need left/right joint swapping to aggregate; exclude them
                # (the reference computes flipped augs and discards all but
                # aug 0 anyway, hpe.py:169)
                "rotflip": jnp.asarray(rotflip),
                "scales": jnp.asarray(scales, jnp.float32),
            }
        else:
            self._tta = None

        # Commit params to the device ONCE. Restored checkpoints arrive as
        # host numpy trees; passing those to a jitted call re-uploads every
        # array each call — ~20-30 s/call for the production stack through
        # the remote-TPU relay (measured round 3) vs ~50 ms with committed
        # params. No-op for trees that already live on the device.
        self.params = jax.device_put(
            params if params is not None else self._init_params(seed)
        )
        self._estimate_jit = jax.jit(self._estimate_impl)
        self._box_jit = jax.jit(self._box_impl)

    # ----------------------------------------------------------------- setup

    def _init_params(self, seed: int) -> Dict[str, Any]:
        s = self.config.yolo_input_size
        c = self.config.crop_size

        # One jitted program for the whole init: eager flax init dispatches
        # thousands of tiny ops, which is minutes over a remote TPU link.
        @jax.jit
        def init(key):
            k1, k2, k3 = jax.random.split(key, 3)
            yolo = self.yolo.init(k1, jnp.zeros((1, s, s, 3)))
            bbone = self.bbone.init(k2, jnp.zeros((1, c, c, 3)))
            feat = self.bbone.apply(bbone, jnp.zeros((1, c, c, 3)))
            head = self.head.init(k3, feat)
            return {"yolo": yolo, "bbone": bbone, "head": head}

        return init(jax.random.key(seed))

    # ------------------------------------------------------------ jit bodies

    def _detect(self, params, frame, yolo_in=None):
        """frame (H, W, 3) uint8 -> clamped pixel bbox + found flag.

        yolo_in: optional precomputed (1, S, S, 3) RGB/255 network input
        (the Pallas fused input stage emits it alongside the decoded frame,
        ops/pallas_input.py); None resizes/normalizes here.
        """
        cfg = self.config
        h, w = frame.shape[0], frame.shape[1]
        if yolo_in is None:
            yolo_in = yolo_preprocess(frame, cfg.yolo_input_size)
        boxes, confs = self.yolo.apply(params["yolo"], yolo_in)
        box, conf, found = best_person_box(boxes, confs, cfg.yolo_thresh)
        # Pixel coords, truncated, clamped at 0 (reference hpe.py:76-79).
        x1 = jnp.maximum((box[0] * w).astype(jnp.int32), 0)
        y1 = jnp.maximum((box[1] * h).astype(jnp.int32), 0)
        x2 = jnp.maximum((box[2] * w).astype(jnp.int32), 0)
        y2 = jnp.maximum((box[3] * h).astype(jnp.int32), 0)
        # Degenerate-box guard (the reference never evaluates these when no
        # person is found; we compute unconditionally under jit).
        x2 = jnp.maximum(x2, x1 + 1)
        y2 = jnp.maximum(y2, y1 + 1)
        return (x1, y1, x2, y2), conf, found

    def _box_impl(self, params, frame):
        (x1, y1, x2, y2), conf, found = self._detect(params, frame)
        # Same (x1, x2, y1, y2) order as the full path (hpe.py:173). The
        # reference's just_box returns (x1, y1, x2, y2) (hpe.py:83) but its
        # consumer unpacks `x1, x2, y1, y2 = bbox` (main.py:80) — i.e. the
        # reference rgb mode crops from SCRAMBLED coordinates. Normalizing
        # both paths to one order fixes that instead of reproducing it.
        return jnp.stack([x1, x2, y1, y2]), conf, found

    def _estimate_impl(self, params, frame, yolo_in=None):
        cfg = self.config
        (x1, y1, x2, y2), conf, found = self._detect(params, frame, yolo_in=yolo_in)

        f32 = lambda v: v.astype(jnp.float32)
        new_k, rot = virtual_camera(f32(x1), f32(x2), f32(y1), f32(y2), self.k_matrix, cfg.crop_size)

        if self._tta is not None:
            # Test-time augmentation (reference hpe.py:88-97): scaled
            # intrinsics + rotated/flipped virtual cameras, batched through
            # the same crop->backbone->decode->reconstruct chain.
            a = cfg.num_aug
            new_k = jnp.tile(new_k[None], (a, 1, 1))
            new_k = new_k.at[:, :2, :2].multiply(self._tta["scales"][:, None, None])
            rot = mm(self._tta["rotflip"], jnp.tile(rot, (a, 1, 1)))
        else:
            new_k = new_k[None]  # (1, 3, 3)

        h_mat = warp_matrix(self.k_matrix, new_k, rot)  # (n, 3, 3)
        # round-to-nearest, not truncation: the i420 transport decodes to
        # FLOAT BGR (e.g. 100.97 where cv2's u8 decode rounds to 101) and
        # astype(int32) would bias every crop pixel down by up to 1/255 vs
        # the reference's uint8 input; exact no-op for uint8 frames.
        crop = warp_image(jnp.round(frame).astype(jnp.int32), h_mat, cfg.crop_size)
        bbone_in = crop.astype(jnp.float32) / 255.0

        feats = self.bbone.apply(params["bbone"], bbone_in)
        logits = self.head.apply(params["head"], feats)  # (n, 8, 8, 288)

        logits2d, logits3d = split_head_logits(logits)
        pred3d = decode_heatmap3d(logits3d)  # (n, 32, 3) in [0, 1]
        # 2D decode + FOV bounds scale with crop_size (the reference
        # hardcodes 255 / [18, 238] for its fixed 256px crop,
        # misc.py:212-220; a smaller configured crop must not decode into
        # 256px coordinates against the crop-sized intrinsics)
        c = cfg.crop_size
        pred2d = decode_heatmap2d(logits2d, scale=float(c - 1))  # (n, 32, 2)
        fov = is_within_fov(pred2d, lower=18.0 * c / 256.0,
                            upper=238.0 * c / 256.0)  # (n, 32)

        pred3d = reconstruct_absolute(pred2d, pred3d, new_k, fov)
        pred3d = mm(pred3d, rot)  # back to original camera space (hpe.py:159)
        pose_all = jnp.einsum("bjc,jn->bnc", pred3d, self.joint_matrix,
                              precision=jax.lax.Precision.HIGHEST)

        if self._tta is not None and cfg.tta_aggregate == "aug0":
            # exact reference semantics: the aug batch is computed but only
            # aug 0's decoded+de-rotated prediction survives (hpe.py:109,169)
            pose = pose_all[0]
            visible = jnp.sum(fov[0]) >= fov.shape[1] / 4
        elif self._tta is not None:
            # aggregate over non-flipped augs (visibility-weighted mean);
            # a genuine TTA ensemble instead of the reference's aug0 pick.
            # When NO kept aug passes the FOV test the weighted mean would
            # be the zero vector (while still flagged by `visible`) — fall
            # back to an unweighted mean over the kept augs; `visible` then
            # correctly reports whether any kept aug saw the person.
            keep = self._tta["keep"]
            vis_per_aug = jnp.sum(fov, axis=1) >= fov.shape[1] / 4
            w_raw = keep * vis_per_aug
            w_sum = jnp.sum(w_raw)
            keep_norm = keep / jnp.maximum(jnp.sum(keep), 1.0)
            w = jnp.where(w_sum > 0, w_raw / jnp.maximum(w_sum, 1e-6), keep_norm)
            pose = jnp.einsum("b,bnc->nc", w, pose_all)
            visible = jnp.any(jnp.logical_and(keep > 0, vis_per_aug))
        else:
            pose = pose_all[0]
            visible = jnp.sum(fov) >= fov.size / 4  # reference hpe.py:152

        bbox = jnp.stack([x1, x2, y1, y2])  # reference return order (hpe.py:173)
        return pose, bbox, conf, found, visible

    # ------------------------------------------------------------ public API

    def estimate_async(self, frame) -> Any:
        """Dispatch the fused program without blocking (JAX async dispatch).

        Replaces the reference's subprocess fan-out (main.py:73-74): the
        orchestrator dispatches HPE and focus back-to-back, then collects —
        same overlap contract, no process boundary.
        """
        # device_put, not jnp.asarray: the latter routes through a slow
        # conversion path on remote-attached chips (~40ms vs ~1ms for 921KB).
        from isbfsar_tpu.utils.transfer import prefetch_host

        frame = jax.device_put(np.ascontiguousarray(frame)) if isinstance(frame, np.ndarray) else frame
        token = (
            ("box", self._box_jit(self.params, frame))
            if self.just_box
            else ("full", self._estimate_jit(self.params, frame))
        )
        # eager D2H: the collect's device_get overlaps the relay RTT with
        # the host work dispatched between async and collect (utils/transfer.py)
        prefetch_host(token[1])
        return token

    def estimate_collect(self, token) -> Optional[Dict[str, Any]]:
        """Block on a dispatched program and decode the dict/None contract.

        ONE device_get for the whole result: per-leaf fetches each pay a
        full sync round-trip on remote-attached chips (~300ms each there).
        """
        kind, raw = token
        raw = jax.device_get(raw)
        if kind == "box":
            bbox, conf, found = raw
            if not bool(found):
                return None
            x1, x2, y1, y2 = bbox  # normalized order, see _box_impl
            return {"bbox": (int(x1), int(x2), int(y1), int(y2))}
        pose, bbox, conf, found, visible = raw
        if not bool(found) or not bool(visible):
            return None
        x1, x2, y1, y2 = (int(v) for v in bbox)
        return {
            "pose": np.asarray(pose),
            "edges": self.edges,
            "bbox": (x1, x2, y1, y2),
        }

    def estimate(self, frame: np.ndarray) -> Optional[Dict[str, Any]]:
        """frame: (H, W, 3) BGR uint8. Returns the reference's dict contract."""
        return self.estimate_collect(self.estimate_async(frame))

    def warmup(self, n: int = 2) -> None:
        """Compile + prime the programs (reference tensorrt_runner.py:60-62)."""
        dummy = jnp.zeros(self.frame_shape + (3,), jnp.uint8)
        for _ in range(n):
            if self.just_box:
                jax.block_until_ready(self._box_jit(self.params, dummy))
            else:
                jax.block_until_ready(self._estimate_jit(self.params, dummy))
