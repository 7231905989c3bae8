"""Typed configuration for the TPU-native ISBFSAR rebuild.

Mirrors the semantics of the reference's plain-class config module
(reference utils/params.py:1-151) — same three input modes, same operating
points (way=5, shot=1, seq_len 16 skeleton / 8 rgb+hybrid, 30 joints,
YOLO conf 0.3 / NMS 0.7) — but as frozen dataclasses with no import-time
environment sniffing. Everything is explicit and hashable so configs can be
closed over by ``jax.jit`` without retracing surprises.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

InputType = str  # "skeleton" | "rgb" | "hybrid"

ASSETS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")

DEFAULT_INPUT_TYPE: InputType = "skeleton"
DEFAULT_SKELETON = "smpl+head_30"


def seq_len_for(input_type: InputType) -> int:
    """Sequence length per input mode (reference utils/params.py:8)."""
    return 16 if input_type == "skeleton" else 8


@dataclasses.dataclass(frozen=True)
class MainConfig:
    """Orchestrator-level settings (reference utils/params.py:14-22)."""

    input_type: InputType = DEFAULT_INPUT_TYPE
    cam: str = "synthetic"  # "webcam" | "realsense" | "synthetic"
    cam_width: int = 640
    cam_height: int = 480
    window_size: int = seq_len_for(DEFAULT_INPUT_TYPE)
    skeleton_scale: float = 2200.0
    acquisition_time: float = 3.0  # seconds

    @staticmethod
    def for_input(input_type: InputType) -> "MainConfig":
        return MainConfig(input_type=input_type, window_size=seq_len_for(input_type))


@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    """RealSense D435i defaults (reference utils/params.py:40-47)."""

    fx: float = 384.025146484375
    fy: float = 384.025146484375
    ppx: float = 319.09661865234375
    ppy: float = 237.75723266601562
    width: int = 640
    height: int = 480

    def matrix(self):
        import numpy as np

        k = np.zeros((3, 3), np.float32)
        k[0, 0] = self.fx
        k[0, 2] = self.ppx
        k[1, 1] = self.fy
        k[1, 2] = self.ppy
        k[2, 2] = 1.0
        return k


@dataclasses.dataclass(frozen=True)
class HPEConfig:
    """Human-pose-estimation settings (reference utils/params.py:25-37).

    Engine paths are replaced by a checkpoint directory holding this
    framework's own serialized parameters; the four TensorRT engines of the
    reference collapse into one jit-compiled XLA program.
    """

    skeleton: str = DEFAULT_SKELETON
    yolo_thresh: float = 0.3
    nms_thresh: float = 0.7
    num_aug: int = 0  # test-time augmentation count; 0 disables
    # "mean": visibility-weighted average over non-flipped augs (this
    # framework's improvement). "aug0": the reference's literal semantics —
    # compute the aug batch, keep only aug 0's de-rotated prediction
    # (reference hpe.py:109 reshape(1, ...) + :169 pred3d[0]).
    tta_aggregate: str = "mean"
    just_box: bool = False  # rgb mode: only the person bbox is needed
    yolo_input_size: int = 256
    crop_size: int = 256
    max_detections: int = 64  # static NMS capacity (XLA needs fixed shapes)
    expand_joints_path: str = os.path.join(ASSETS_DIR, "joints_32_to_122.npy")
    skeletons_path: str = os.path.join(ASSETS_DIR, "skeletons.npz")
    checkpoint_dir: Optional[str] = None
    compute_dtype: str = "bfloat16"  # conv/matmul dtype on the MXU


@dataclasses.dataclass(frozen=True)
class ARConfig:
    """TRX one-shot open-set recognizer settings (reference utils/params.py:50-95)."""

    model: str = "DISC"  # "DISC" | "EXP"
    input_type: InputType = DEFAULT_INPUT_TYPE
    way: int = 5
    shot: int = 1
    n_joints: int = 30
    seq_len: int = seq_len_for(DEFAULT_INPUT_TYPE)
    rgb_size: int = 224  # AR rgb crop side (reference main.py:86)

    # model dims (reference utils/params.py:79-84)
    trans_linear_out_dim: int = 128
    query_per_class: int = 1
    trans_dropout: float = 0.0
    temp_set: Tuple[int, ...] = (2,)
    pe_scale_factor: float = 0.1

    # training (reference utils/params.py:66-76)
    initial_lr: float = 1e-2
    n_task: int = 10000
    optimize_every: int = 1
    batch_size: int = 32
    n_epochs: int = 10000
    start_discriminator_after_epoch: int = 0
    first_milestone: int = 10000
    second_milestone: int = 10000
    eval_every_n_epoch: int = 10
    checkpoint_dir: Optional[str] = None
    # "msgpack" (single-file, live-service format) or "orbax"
    # (sharding-aware directory format for multi-chip training runs).
    ckpt_backend: str = "msgpack"
    data_path: Optional[str] = None

    compute_dtype: str = "float32"  # the TRX is tiny; f32 keeps parity tight

    # Rematerialize the rgb extractor's activations in the backward pass,
    # PER residual block (nn.remat in models/resnet.py — block granularity
    # is what makes it a win, see the note there): the ResNet-50 conv
    # activations over b*way*L frames are the training step's dominant
    # memory term, so trading ~1/3 extra extractor FLOPs cuts peak HBM
    # (receipt: tests/test_train.py::test_remat_cuts_train_step_memory,
    # compiled memory_analysis). Numerically identical math, recomputed.
    remat: bool = False
    # Causal One-Euro smoothing of the per-frame pose before it feeds the
    # AR feature ring (ops/smooth.py; live twin of the offline extraction
    # --smooth flag — train and serve must see the same distribution).
    # Default ON since the production receipt landed (docs/PERF.md
    # "Temporal pose smoothing": CI A/B lifts every FSOS metric, production
    # capstone FS 0.953 smoothed; the offline workflow defaults smooth=True
    # so live must match). No effect in rgb mode (no pose consumer).
    smooth_poses: bool = True

    # Open-set accept threshold for the live display (reference
    # utils/output.py:252-258 hard-codes 0.66 for the green action label).
    # train/fsos.py::calibrate_os_threshold picks a better one on TRAIN
    # classes (round-5 receipt: held-out FSOS 0.574 -> 0.709 at production
    # scale, docs/PERF.md "Train-calibrated open-set threshold") — feed its
    # result here or via `source_cli --os-threshold`.
    os_threshold: float = 0.66

    @property
    def trans_linear_in_dim(self) -> int:
        # reference utils/params.py:79
        if self.input_type == "skeleton":
            return 256
        if self.input_type == "rgb":
            return 256  # post-resnet projection (reference model.py:207-216)
        return 512  # hybrid: concat(sk 256, rgb 256)

    @staticmethod
    def for_input(input_type: InputType, **kw) -> "ARConfig":
        lr = 1e-2 if input_type == "skeleton" else 3e-4
        return ARConfig(
            input_type=input_type,
            seq_len=seq_len_for(input_type),
            initial_lr=lr,
            **kw,
        )


@dataclasses.dataclass(frozen=True)
class FocusConfig:
    """Gaze-based focus detection (reference utils/params.py:119-132)."""

    mode: str = "gaze"  # "gaze" | "mutual"
    area_thr: float = 0.03  # head bbox area fraction above which human is "close"
    close_thr: float = -0.95  # close: normalized gaze z below this is focus
    dist_thr: float = 0.3  # far: |normalized head rot y| under this is focus
    foc_rot_thr: float = 0.7  # close: |head yaw rotvec| above this is not focus
    patience: int = 3  # majority vote over last N observations
    gaze_image_size: int = 224
    normalized_camera_distance: float = 0.6
    checkpoint_dir: Optional[str] = None
    compute_dtype: str = "bfloat16"


@dataclasses.dataclass(frozen=True)
class MutualGazeConfig:
    """Mutual-gaze alternative focus head (reference utils/params.py:135-151)."""

    backbone: str = "resnet18"  # "resnet18" | "resnet50" | "mobilenet"
    crop_size: int = 224
    score_thr: float = 0.8
    nms_thr: float = 0.01
    batch_size: int = 8
    lr: float = 1e-6
    n_epochs: int = 1000
    checkpoint_dir: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Top-level bundle used by the orchestrator and the fused pipeline."""

    main: MainConfig = dataclasses.field(default_factory=MainConfig)
    intrinsics: CameraIntrinsics = dataclasses.field(default_factory=CameraIntrinsics)
    hpe: HPEConfig = dataclasses.field(default_factory=HPEConfig)
    ar: ARConfig = dataclasses.field(default_factory=ARConfig)
    focus: FocusConfig = dataclasses.field(default_factory=FocusConfig)
    # Fused Pallas I420 decode+resize+normalize input stage
    # (ops/pallas_input.py). None = default OFF: measured slower end-to-end
    # than the composed XLA path on v5e (docs/PERF.md "Pallas input
    # stage"); both are parity-exact, the kernel stays as the measured
    # decision record.
    pallas_input: Optional[bool] = None
    # Storage dtype for the fused program's parameters. "bfloat16"
    # (default, round 4) halves the weight HBM traffic — at batch 1 every
    # weight byte is read once per frame, so this targets the serving
    # path's dominant device-memory term (compute already runs bf16 on the
    # MXU; see docs/PERF.md "Precision decisions"). Measured on-chip
    # (fetch-synced receipts, docs/ROOFLINE_r4_fetch_*.json): fused_step
    # 4.47 -> 4.09 ms/frame — the 363 MB weight-byte cut at HBM bandwidth,
    # matching the model's 0.44 ms prediction; batch-16 unchanged
    # (weights amortize);
    # accuracy deltas on the trained CI nets are decision-identical and
    # pose deltas sub-noise (tests/test_param_dtype.py — the receipt that
    # justified flipping the default). "float32" keeps full storage
    # precision for accuracy forensics.
    param_dtype: str = "bfloat16"

    @staticmethod
    def for_input(input_type: InputType) -> "PipelineConfig":
        return PipelineConfig(
            main=MainConfig.for_input(input_type),
            hpe=HPEConfig(just_box=(input_type == "rgb")),
            ar=ARConfig.for_input(input_type),
        )
