"""FusedPipeline — the whole product as ONE XLA program.

This is the fusion pass the reference cannot express (SURVEY §7 stage 6):
the reference's frame loop crosses the host four times per frame (TensorRT
engine round-trips + numpy glue + process queues, reference main.py:59-138,
hpe.py:48-173, ar.py:30-84). Here a camera frame enters the device once and

    resize -> YOLO -> person pick -> virtual camera -> crop warp ->
    backbone -> heatmap head -> soft-argmax -> absolute reconstruction ->
    joint mapping -> root-centering -> per-frame feature embed (skeleton
    MLP and/or rgb ResNet on an in-graph bbox crop) -> feature-ring update
    -> temporal cross-transformer match vs the cached support K/V ->
    softmax scores + open-set decision
    [+ face detect -> head pose -> gaze normalization -> gaze net]

runs as one jit-compiled program. The AR sliding window lives on-device as
ring state threaded through the step (reference ar.py:42-51 keeps it as a
Python list of device tensors). Warmup/no-person/empty-support semantics
are carried by flags exactly like the unfused modules.

Transfer discipline (the actual latency budget on a remote-attached TPU):
- host->device: ONE ``jax.device_put`` of the uint8 frame per step
- device->host: ONE packed float32 vector (~150 floats) per step; every
  per-frame scalar/pose/probs field is a host-side slice of it
- ``stream()`` double-buffers: frame i+1 is dispatched before frame i's
  results are read, hiding the H2D behind compute.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isbfsar_tpu.configs import PipelineConfig
from isbfsar_tpu.ar.recognizer import ActionRecognizer
from isbfsar_tpu.focus.detector import FocusDetector
from isbfsar_tpu.hpe.estimator import HumanPoseEstimator


class StreamState(NamedTuple):
    """Device-resident recurrent state threaded through the fused step."""

    window: jnp.ndarray  # (seq_len, trans_linear_in_dim) per-frame feature ring
    n_valid: jnp.ndarray  # () int32 — filled frames in the window
    # One-Euro pose-filter state (ops/smooth.py) when ARConfig.smooth_poses;
    # empty tuple otherwise — a pytree leaf-free placeholder, so programs
    # without the filter carry no extra buffers
    smooth: Any = ()


class _Layout:
    """Field -> slice map for the packed output vector."""

    def __init__(self, fields: Dict[str, Tuple[int, ...]]):
        self.specs = {}
        offset = 0
        for name, shape in fields.items():
            size = int(np.prod(shape)) if shape else 1
            self.specs[name] = (offset, offset + size, shape)
            offset += size
        self.size = offset

    def pack(self, values: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        parts = []
        for name, (_, _, shape) in self.specs.items():
            v = values[name].astype(jnp.float32)
            parts.append(v.reshape(-1) if shape else v.reshape(1))
        return jnp.concatenate(parts)

    def unpack(self, vec: np.ndarray) -> Dict[str, np.ndarray]:
        out = {}
        for name, (start, end, shape) in self.specs.items():
            v = vec[start:end]
            out[name] = v.reshape(shape) if shape else v[0]
        return out


def _cast_trunk_params(p, dt):
    """Serving mixed precision (PipelineConfig.param_dtype): cast the two
    big conv TRUNKS (hpe yolo + bbone weights — ~95% of the fused
    program's parameter bytes) to ``dt``, keeping full f32 storage for the
    precision-critical remainder: the Metrabs decode head and the YOLO
    box-regression outputs (a soft-argmax over a small heatmap amplifies
    weight rounding — full-tree bf16 measured 6.4 cm mean pose delta on
    the CI nets, the trunk-only policy 4.0 cm, both sub-noise against the
    nets' own ~9.5 cm error budget and decision-identical;
    tests/test_param_dtype.py), BatchNorm statistics (rsqrt precision),
    the TRX (f32 compute by design, configs.py ARConfig), and the focus
    nets (pixel-level landmark regression feeds yaw geometry).

    Runs as ONE jitted program: a host-side per-leaf .astype would
    dispatch hundreds of tiny programs through a remote-attached chip.
    """
    from jax.tree_util import tree_map_with_path

    def cast(path, x):
        keys = [str(getattr(k, "key", k)) for k in path]
        trunk = (
            keys[:1] == ["hpe"]
            and any(k in ("yolo", "bbone") for k in keys[1:2])
            and "batch_stats" not in keys
            and not any(k.startswith("head") and k.endswith("_out")
                        for k in keys)
        )
        if trunk and jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return x.astype(dt)
        return x

    return jax.jit(lambda t: tree_map_with_path(cast, t))(p)


class FusedPipeline:
    """Single-program streaming pipeline (skeleton | rgb | hybrid modes).

    The AR window is a ring of per-frame FEATURES: each incoming frame is
    embedded exactly once (skeleton MLP and/or rgb ResNet on the in-graph
    224-crop); extractors are per-frame pure, so this equals the reference's
    re-extraction of the whole window every step (ar.py:49-51) at 1/L the
    extractor cost.
    """

    def __init__(
        self,
        config: Optional[PipelineConfig] = None,
        hpe: Optional[HumanPoseEstimator] = None,
        ar: Optional[ActionRecognizer] = None,
        focus: Optional[FocusDetector] = None,
        with_focus: bool = True,
        input_format: str = "bgr",
    ):
        """input_format: "bgr" ((H, W, 3) uint8) or "i420" ((H*3/2, W) uint8
        planar YUV — the native camera format; half the host->device bytes,
        converted to BGR in-graph). Use i420 when the transfer link is the
        bottleneck (remote-attached chips)."""
        self.config = config or PipelineConfig()
        self.input_type = self.config.main.input_type
        assert input_format in ("bgr", "i420")
        self.input_format = input_format
        # frame geometry follows the configured camera (a 720p config must
        # not split a planar i420 frame at row 480 or compute the focus
        # area fraction against the wrong frame area)
        cam_shape = (self.config.main.cam_height, self.config.main.cam_width)
        self.hpe = hpe or HumanPoseEstimator(
            self.config.hpe, self.config.intrinsics, frame_shape=cam_shape
        )
        self.ar = ar or ActionRecognizer(self.config.ar)
        self.with_focus = with_focus
        self.focus = (
            focus
            or FocusDetector(
                self.config.focus, self.config.intrinsics, frame_shape=cam_shape
            )
        ) if with_focus else None

        # Pallas fused input stage — measured SLOWER end-to-end than the
        # composed XLA path on v5e (108.3 vs 111.3 FPS median, p50 48.6 vs
        # 44.8 ms; docs/PERF.md "Pallas input stage"), so the default
        # (None/False) is OFF; the kernel stays available behind the flag
        # as the decision record (parity-tested in tests/test_pallas_input.py).
        self._pallas_input = bool(self.config.pallas_input)
        if self._pallas_input and input_format != "i420":
            raise ValueError(
                "pallas_input=True requires input_format='i420' (the kernel "
                "fuses the I420 decode; there is nothing to fuse for bgr)"
            )
        if self._pallas_input:
            # The kernel keeps the whole frame + both outputs resident in
            # VMEM (~16 MB/core on v5e); past ~480p it would only fail at
            # TPU compile time with an opaque Mosaic error — fail here with
            # the budget instead (ADVICE r2). Dominant residents: f32 BGR
            # frame + u8 YUV in + f32 YOLO out + resize/upsample weights.
            h, w = cam_shape
            s = self.config.hpe.yolo_input_size
            vmem_bytes = (
                h * w * 3 * 4          # f32 BGR planes
                + h * w * 3 // 2       # u8 I420 input
                + s * s * 3 * 4        # f32 YOLO input out
                + (s * h + s * w + w * w // 2) * 4  # wr, wct, chroma-upsample
            )
            budget = 14 * 2**20  # leave ~2 MB headroom of the 16 MB core
            if vmem_bytes > budget:
                raise ValueError(
                    f"pallas_input=True needs the full frame resident in "
                    f"VMEM: {h}x{w} needs ~{vmem_bytes / 2**20:.1f} MB > "
                    f"{budget / 2**20:.0f} MB budget (16 MB/core minus "
                    f"headroom). Use the composed XLA path (pallas_input="
                    f"None/False — it is the measured-faster default anyway, "
                    f"docs/PERF.md) or a <=480p camera config."
                )
        # Off-TPU (CPU test meshes) the kernel runs in interpreter mode.
        self._pallas_interpret = jax.default_backend() != "tpu"

        cfg = self.config.ar
        fields = {
            "pose": (cfg.n_joints, 3),
            "pose_abs": (cfg.n_joints, 3),
            "bbox": (4,),
            "conf": (),
            "pose_ok": (),
            "distance": (),
            "probs": (cfg.way,),
            "is_true": (),
            "ar_ready": (),
        }
        if self.with_focus:
            fields.update(
                {
                    "f_found": (),
                    "f_score": (),
                    "f_bbox": (4,),
                    "f_landmarks": (6, 2),
                    "f_head_position": (3,),
                    "f_head_rotvec": (3,),
                    "f_norm_head_rot2d": (2,),
                    "f_gaze": (3,),
                    "f_norm_gaze": (3,),
                }
            )
        self.layout = _Layout(fields)

        self._step = jax.jit(self._step_impl, donate_argnums=(3,))
        self._step_batch = jax.jit(self._step_batch_impl, donate_argnums=(3,))
        # D2H prefetch (jax.Array.copy_to_host_async): start the packed
        # result's device->host copy the moment its program completes, so a
        # double-buffered consumer's later np.asarray finds the bytes
        # already resident instead of paying the get-RTT inline. On a
        # remote-attached chip this hides the second of the two relay
        # round-trips the per-frame serve path pays (docs/PERF.md "Live
        # serve surfaces"); on co-located hardware it is a no-op-grade hint.
        self._prefetch_ok = True

    # -------------------------------------------------------------- factory

    def init_state(self) -> StreamState:
        cfg = self.config.ar
        smooth = ()
        if cfg.smooth_poses and self.input_type != "rgb":
            from isbfsar_tpu.ops.smooth import one_euro_gated_state

            smooth = one_euro_gated_state((cfg.n_joints, 3))
        return StreamState(
            window=jnp.zeros((cfg.seq_len, cfg.trans_linear_in_dim), jnp.float32),
            n_valid=jnp.zeros((), jnp.int32),
            smooth=smooth,
        )

    def _params(self) -> Dict[str, Any]:
        p = {"hpe": self.hpe.params, "ar": self.ar.params}
        if self.with_focus:
            p["focus"] = self.focus.params
        if self.config.param_dtype != "float32":
            p = _cast_trunk_params(p, jnp.dtype(self.config.param_dtype))
        return p

    # ----------------------------------------------------------- fused step

    def _decode_frame(self, frame):
        """Raw transport frame -> ((H, W, 3) BGR on device, yolo_in | None).

        With the Pallas input stage enabled the fused kernel emits the
        decoded frame AND the YOLO input in one HBM pass (ops/
        pallas_input.py); otherwise the composed XLA path decodes here and
        the estimator resizes internally (yolo_in=None).
        """
        if self.input_format == "i420":
            if self._pallas_input:
                from isbfsar_tpu.ops.pallas_input import fused_i420_inputs

                return fused_i420_inputs(
                    frame,
                    self.hpe.frame_shape[0],
                    # the estimator's config is the single source of truth
                    # (a custom-injected hpe may differ from config.hpe)
                    self.hpe.config.yolo_input_size,
                    interpret=self._pallas_interpret,
                )
            from isbfsar_tpu.ops.image import i420_to_bgr

            return i420_to_bgr(frame, self.hpe.frame_shape[0]), None
        return frame, None

    def _frame_core(self, params, frame, state, support_kv, support_mask, yolo_in=None):
        """Shared single-frame body (frame already BGR-decoded): pose +
        per-frame feature + ring push + match.
        Returns (values dict, new StreamState)."""
        cfg = self.config.ar

        if self.input_type == "rgb" and self.hpe.just_box:
            # detector-only path (the reference's just_box, hpe.py:82-83):
            # rgb mode never consumes a pose, so skip the EffNetV2-L
            # backbone + head + reconstruction — the dominant per-frame
            # FLOPs — and run YOLO alone
            (bx1, by1, bx2, by2), conf, found = self.hpe._detect(
                params["hpe"], frame, yolo_in=yolo_in
            )
            bbox = jnp.stack([bx1, bx2, by1, by2])
            pose = jnp.zeros((cfg.n_joints, 3), jnp.float32)
            visible = found
        else:
            pose, bbox, conf, found, visible = self.hpe._estimate_impl(
                params["hpe"], frame, yolo_in=yolo_in
            )
        # rgb mode gates only on detection (the reference's just_box path has
        # no pose/visibility, main.py:76-93); skeleton/hybrid also require
        # the FOV-visibility flag (hpe.py:149-153)
        pose_ok = found if self.input_type == "rgb" else jnp.logical_and(found, visible)

        distance = jnp.linalg.norm(pose[0]) * 2.5  # reference main.py:102
        rel_pose = pose - pose[0]

        # causal One-Euro pose smoothing (ARConfig.smooth_poses): the live
        # twin of the extraction-side --smooth — good frames tick the
        # filter, no-detection frames leave it untouched (they never enter
        # the AR window either)
        smooth_state = state.smooth
        if self.config.ar.smooth_poses and self.input_type != "rgb":
            from isbfsar_tpu.ops.smooth import one_euro_gated_step

            smooth_state, rel_pose = one_euro_gated_step(
                smooth_state, rel_pose, pose_ok)

        # per-frame feature (embedded once, on entry to the ring)
        kwargs = {}
        if self.input_type in ("skeleton", "hybrid"):
            kwargs["sk"] = rel_pose.reshape(-1)
        if self.input_type in ("rgb", "hybrid"):
            from isbfsar_tpu.ops.image import ar_rgb_preprocess, center_square_crop_resize

            x1, x2, y1, y2 = bbox[0], bbox[1], bbox[2], bbox[3]
            crop = center_square_crop_resize(
                frame, (x1, y1, x2, y2), self.config.ar.rgb_size
            )
            kwargs["rgb"] = ar_rgb_preprocess(crop)
        feature = self.ar.model.apply(params["ar"], method="embed_frame", **kwargs)

        # sliding window push (reference ar.py:42-46), only on good frames
        pushed = jnp.concatenate([state.window[1:], feature[None]], axis=0)
        window = jnp.where(pose_ok, pushed, state.window)
        n_valid = jnp.where(
            pose_ok, jnp.minimum(state.n_valid + 1, cfg.seq_len), state.n_valid
        )

        # AR match against the cached support K/V (support-side transformer
        # work happens once per support-set edit, not per frame)
        s_k, s_v = support_kv
        out = self.ar.model.apply(
            params["ar"], window[None], support_mask[None], s_k[None], s_v[None],
            method="match_features",
        )
        probs = jax.nn.softmax(out["logits"][0])
        is_true = out["is_true"][0, 0]
        ar_ready = jnp.logical_and(n_valid >= cfg.seq_len, jnp.any(support_mask))
        values = {
            "pose": rel_pose,
            "pose_abs": pose,
            "bbox": bbox,
            "conf": conf,
            "pose_ok": pose_ok,
            "distance": distance,
            "probs": probs,
            "is_true": is_true,
            "ar_ready": ar_ready,
        }
        return values, StreamState(window=window, n_valid=n_valid,
                                   smooth=smooth_state)

    def _step_impl(self, params, frame, support_kv, state, support_mask):
        """frame: (H, W, 3) uint8 BGR or (H*3/2, W) uint8 I420;
        support_kv: (s_k, s_v) each (way, T, out); support_mask (way,).

        Returns (packed f32 vector, new_state).
        """
        frame, yolo_in = self._decode_frame(frame)
        values, state = self._frame_core(
            params, frame, state, support_kv, support_mask, yolo_in=yolo_in
        )

        if self.with_focus:
            f = self.focus._forward_impl(params["focus"], frame)
            values.update(
                f_found=f["found"],
                f_score=f["score"],
                f_bbox=f["bbox"],
                f_landmarks=f["landmarks"],
                f_head_position=f["head_position"],
                f_head_rotvec=f["head_rotvec"],
                f_norm_head_rot2d=f["normalized_head_rot2d"],
                f_gaze=f["gaze_vector"],
                f_norm_gaze=f["normalized_gaze_vector"],
            )

        return self.layout.pack(values), state

    def _step_batch_impl(self, params, frames, support_kv, state, support_mask):
        """Micro-batched step: B frames -> (B, vec) packed outputs + state.

        Identical per-frame semantics to :meth:`_step_impl`; the point is
        transfer/sync amortization on remote-attached TPUs (one H2D, one
        program, one D2H per B frames instead of per frame). Pose, per-frame
        features and focus are batched over frames (batched convs on the
        MXU); only the feature-ring recurrence runs as a (trivially cheap)
        lax.scan, and the AR match runs batched on the scanned windows.
        """
        cfg = self.config.ar
        b = frames.shape[0]
        frames, yolo_ins = jax.vmap(self._decode_frame)(frames)

        yolo_ax = None if yolo_ins is None else 0
        if self.input_type == "rgb" and self.hpe.just_box:
            # detector-only (see _frame_core): no pose consumer in rgb mode
            (bx1, by1, bx2, by2), conf, found = jax.vmap(
                lambda p, f, y: self.hpe._detect(p, f, yolo_in=y),
                in_axes=(None, 0, yolo_ax),
            )(params["hpe"], frames, yolo_ins)
            bbox = jnp.stack([bx1, bx2, by1, by2], axis=-1)
            pose = jnp.zeros((b, cfg.n_joints, 3), jnp.float32)
            visible = found
        else:
            pose, bbox, conf, found, visible = jax.vmap(
                lambda p, f, y: self.hpe._estimate_impl(p, f, yolo_in=y),
                in_axes=(None, 0, yolo_ax),
            )(params["hpe"], frames, yolo_ins)
        pose_ok = found if self.input_type == "rgb" else jnp.logical_and(found, visible)

        distance = jnp.linalg.norm(pose[:, 0], axis=-1) * 2.5
        rel_pose = pose - pose[:, :1]

        # causal pose smoothing BEFORE the (batched) embedding: the filter
        # recurrence is a trivially cheap (J, 3) scan, so running it as a
        # separate pre-pass keeps the heavy per-frame convs/MLPs batched on
        # the MXU — sequential-identical to _step_impl's per-frame tick
        smooth_state = state.smooth
        if self.config.ar.smooth_poses and self.input_type != "rgb":
            from isbfsar_tpu.ops.smooth import one_euro_gated_step

            smooth_state, rel_pose = jax.lax.scan(
                lambda st, inp: one_euro_gated_step(st, inp[0], inp[1]),
                smooth_state, (rel_pose, pose_ok))

        # per-frame features, batched over the B frames
        def frame_feature(frame, rel, box):
            kwargs = {}
            if self.input_type in ("skeleton", "hybrid"):
                kwargs["sk"] = rel.reshape(-1)
            if self.input_type in ("rgb", "hybrid"):
                from isbfsar_tpu.ops.image import ar_rgb_preprocess, center_square_crop_resize

                crop = center_square_crop_resize(
                    frame, (box[0], box[2], box[1], box[3]), cfg.rgb_size
                )
                kwargs["rgb"] = ar_rgb_preprocess(crop)
            return self.ar.model.apply(params["ar"], method="embed_frame", **kwargs)

        features = jax.vmap(frame_feature)(frames, rel_pose, bbox)

        # ring recurrence: tiny (L x D) shifts, sequential by definition
        def scan_body(st, inp):
            feat, ok = inp
            pushed = jnp.concatenate([st.window[1:], feat[None]], axis=0)
            window = jnp.where(ok, pushed, st.window)
            n_valid = jnp.where(ok, jnp.minimum(st.n_valid + 1, cfg.seq_len), st.n_valid)
            # _replace: the carry must keep the SAME pytree structure
            # (the smooth field rides through unchanged inside the scan;
            # its final value was already computed by the pre-pass)
            new = st._replace(window=window, n_valid=n_valid)
            return new, (window, n_valid)

        state, (windows, n_valids) = jax.lax.scan(scan_body, state, (features, pose_ok))
        state = state._replace(smooth=smooth_state)

        # batched AR match: all B windows against the shared cached K/V
        s_k, s_v = support_kv
        out = self.ar.model.apply(
            params["ar"],
            windows,
            jnp.broadcast_to(support_mask[None], (b, support_mask.shape[0])),
            jnp.broadcast_to(s_k[None], (b,) + s_k.shape),
            jnp.broadcast_to(s_v[None], (b,) + s_v.shape),
            method="match_features",
        )
        probs = jax.nn.softmax(out["logits"], axis=-1)
        is_true = out["is_true"][:, 0]
        ar_ready = jnp.logical_and(n_valids >= cfg.seq_len, jnp.any(support_mask))

        values = {
            "pose": rel_pose,
            "pose_abs": pose,
            "bbox": bbox,
            "conf": conf,
            "pose_ok": pose_ok,
            "distance": distance,
            "probs": probs,
            "is_true": is_true,
            "ar_ready": jnp.broadcast_to(ar_ready, (b,)),
        }

        if self.with_focus:
            f = jax.vmap(self.focus._forward_impl, in_axes=(None, 0))(params["focus"], frames)
            values.update(
                f_found=f["found"],
                f_score=f["score"],
                f_bbox=f["bbox"],
                f_landmarks=f["landmarks"],
                f_head_position=f["head_position"],
                f_head_rotvec=f["head_rotvec"],
                f_norm_head_rot2d=f["normalized_head_rot2d"],
                f_gaze=f["gaze_vector"],
                f_norm_gaze=f["normalized_gaze_vector"],
            )

        packed = jax.vmap(self.layout.pack)(values)
        return packed, state

    # ------------------------------------------------------------ host API

    def start(self) -> None:
        """Materialize support features + state; call after support-set edits."""
        self._state = self.init_state()
        if self.ar.support_features is None and self.ar.support_mask.any():
            support = {m: jnp.asarray(v[None]) for m, v in self.ar.support_data.items()}
            feats = jax.jit(
                lambda p, s: self.ar.model.apply(
                    p,
                    {m: s[m][:, 0] for m in s},  # dummy query slot
                    jnp.asarray(self.ar.support_mask)[None],
                    support_data=s,
                )["support_features"][0]
            )(self.ar.params, support)
            self.ar.support_features = feats
        elif self.ar.support_features is None:
            cfg = self.config.ar
            self.ar.support_features = jnp.zeros(
                (cfg.way, cfg.seq_len, cfg.trans_linear_in_dim), jnp.float32
            )
        self._support_features = self.ar.support_features
        kv = jax.jit(
            lambda p, f: self.ar.model.apply(p, support_features=f[None], method="support_kv")
        )(self.ar.params, self._support_features)
        self._support_kv = (kv["s_k"][0], kv["s_v"][0])
        self._support_mask = jnp.asarray(self.ar.support_mask)
        self._device_params = self._params()

    def _start_host_copy(self, packed) -> None:
        """Enqueue the packed result's D2H copy without blocking (falls back
        silently where the backend lacks copy_to_host_async)."""
        if self._prefetch_ok:
            try:
                packed.copy_to_host_async()
            except Exception:
                self._prefetch_ok = False

    def dispatch(self, frame: np.ndarray) -> jnp.ndarray:
        """Enqueue one frame (async): one H2D put + one program dispatch.
        The packed result's D2H copy is started eagerly (see
        :meth:`_start_host_copy`) so a later fetch overlaps it with
        whatever host work happens in between."""
        packed, self._state = self._step(
            self._device_params,
            jax.device_put(np.ascontiguousarray(frame, np.uint8)),
            self._support_kv,
            self._state,
            self._support_mask,
        )
        self._start_host_copy(packed)
        return packed

    def step(self, frame: np.ndarray) -> Dict[str, np.ndarray]:
        """One frame, synchronous: dispatch then read the packed vector."""
        return self.fetch(self.dispatch(frame))

    def fetch(self, packed: jnp.ndarray) -> Dict[str, np.ndarray]:
        """ONE device->host transfer; host-side field slicing."""
        return self.layout.unpack(np.asarray(packed))

    def stream(self, frames: Iterable[np.ndarray]) -> Iterator[Dict[str, np.ndarray]]:
        """Double-buffered streaming: overlap frame i+1's H2D + compute with
        frame i's readback (the queue-based overlap of the reference's
        process topology, without the processes)."""
        pending = None
        for frame in frames:
            packed = self.dispatch(frame)
            if pending is not None:
                yield self.fetch(pending)
            pending = packed
        if pending is not None:
            yield self.fetch(pending)

    def dispatch_batch(self, frames: np.ndarray) -> jnp.ndarray:
        """Enqueue B frames as one program call (async); the batch's packed
        results start their D2H copy eagerly (see :meth:`_start_host_copy`)."""
        packed, self._state = self._step_batch(
            self._device_params,
            jax.device_put(np.ascontiguousarray(frames, np.uint8)),
            self._support_kv,
            self._state,
            self._support_mask,
        )
        self._start_host_copy(packed)
        return packed

    def stream_batched(
        self, frames: Iterable[np.ndarray], batch_size: int = 8
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Micro-batched streaming: per-frame results, one device round-trip
        per ``batch_size`` frames. Amortizes the host<->device sync latency
        that dominates on remote-attached chips; adds up to one batch of
        latency. Partial tail batches fall back to single-frame steps (the
        batched program is compiled once per batch_size)."""
        buf: list = []
        pending: Optional[jnp.ndarray] = None

        def flush(buf):
            return self.dispatch_batch(np.stack(buf))

        for frame in frames:
            buf.append(frame)
            if len(buf) == batch_size:
                packed = flush(buf)
                buf = []
                if pending is not None:
                    for row in np.asarray(pending):
                        yield self.layout.unpack(row)
                pending = packed
        if pending is not None:
            for row in np.asarray(pending):
                yield self.layout.unpack(row)
        for frame in buf:  # tail
            yield self.fetch(self.dispatch(frame))

    def decode(self, outputs: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """Convert unpacked outputs into the orchestrator's elements contract."""
        elements: Dict[str, Any] = {}
        if outputs["pose_ok"] > 0:
            if not (self.input_type == "rgb" and self.hpe.just_box):
                # rgb just_box has no pose to publish (the reference's rgb
                # elements carry only bbox, main.py:76-93)
                elements["pose"] = outputs["pose"]
                elements["distance"] = float(outputs["distance"])
                elements["edges"] = self.hpe.edges
            x1, x2, y1, y2 = (int(v) for v in outputs["bbox"])
            elements["bbox"] = (x1, x2, y1, y2)
        # Actions require BOTH a full window and a person on THIS frame:
        # the reference feeds AR an empty dict when no pose was found
        # (main.py:77-108), so inference returns ({}, 0, {}) on such frames.
        if outputs["ar_ready"] > 0 and outputs["pose_ok"] > 0:
            probs = outputs["probs"]
            elements["actions"] = {
                name: float(probs[i])
                for i, name in enumerate(self.ar.class_order)
                if self.ar.support_mask[i] and name is not None
            }
            elements["is_true"] = float(outputs["is_true"])
            elements["requires_focus"] = dict(self.ar.requires_focus)
        else:
            elements["actions"] = {}
            elements["is_true"] = 0
            elements["requires_focus"] = {}
        if self.with_focus and outputs["f_found"] > 0:
            focus_out = {
                "found": True,
                "score": outputs["f_score"],
                "bbox": outputs["f_bbox"],
                "landmarks": outputs["f_landmarks"],
                "head_position": outputs["f_head_position"],
                "head_rotvec": outputs["f_head_rotvec"],
                "normalized_head_rot2d": outputs["f_norm_head_rot2d"],
                "gaze_vector": outputs["f_gaze"],
                "normalized_gaze_vector": outputs["f_norm_gaze"],
                "normalized_image": None,
            }
            res = self.focus.estimate_collect(focus_out)
            if res is not None:
                elements["focus"], face = res
                elements["face_bbox"] = face.bbox.reshape(-1)
        return elements

    def frame_shape(self):
        h, w = self.hpe.frame_shape
        return (h * 3 // 2, w) if self.input_format == "i420" else (h, w, 3)

    def warmup(self, n: int = 2) -> None:
        dummy = np.zeros(self.frame_shape(), np.uint8)
        for _ in range(n):
            out = self.step(dummy)
        jax.block_until_ready(self._state.window)
        # dummy frames must not leak into the live AR window: with a low
        # detection threshold (smoke runs) or false positives, their
        # features would occupy ring slots and fire ar_ready early
        self._state = self.init_state()
