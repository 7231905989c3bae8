"""Training harness for the pose stack (N2/N4/N5's route to weights).

The reference's pose nets are externally-pretrained engines it can never
train (Tianxiaomo YOLOv4 + MetrABS EffNetV2-L, reference
modules/hpe/setup/1_extract_yolo_onnx.py, 2_extract_bbone_heads.py, consumed
hpe.py:48-173). This framework's YOLOv4/EfficientNetV2/MetrabsHead
(models/yolov4.py, models/effnetv2.py) are its own nets, so — like the focus
stack (train/gazefocus.py) — they get a training path with exact synthetic
supervision:

- :func:`render_humanoid_scene` — an articulated 32-joint humanoid with
  EXACT projective ground truth: camera-space 3D joints, their 2D
  projections, and the pixel bbox of the rendered body.
- :class:`YoloTrainer` — person-detection loss on the decoded 4032-anchor
  contract (anchor assignment like train/detection.py; the full 80-class
  vector is supervised because ``best_person_box`` requires class 0 to be
  the argmax, ops/nms.py:118-131).
- :class:`HeatmapTrainer` — trains EffNetV2+MetrabsHead through the SAME
  in-graph virtual-camera + warp chain the live estimator runs
  (hpe/estimator.py:173-216), supervising the soft-argmax decodes:
  2D in crop pixels, 3D in the [0,1]^3 heatmap box.
- :func:`train_pose_params` — end-to-end: returns the ``{"yolo", "bbone",
  "head"}`` params dict ``HumanPoseEstimator(params=...)`` consumes.

3D unit convention (self-consistency proof): the reference feeds the [0,1]
soft-argmax decode straight into ``reconstruct_absolute`` and reads distance
as ``norm(pose[0]) * 2.5`` (reference hpe.py:155-159, main.py:102) — i.e.
its pose unit is a 2.5 m heatmap box. We train ``pred3d = (X_crop -
centroid) / 2.5 + 0.5``: the reconstruction ``abs = rel + ref`` then has the
exact solution ``ref = centroid/2.5 - 0.5`` giving ``abs = X_crop/2.5``,
whose perspective projection equals the true 2D observations (projection is
scale-invariant), so both reconstruction branches agree and the pipeline's
``distance`` comes out in true meters.

With real datasets (COCO-person boxes + any 3D mocap set) the same trainers
apply unchanged; the synthetic generator exists so the full loop is
exercisable and tested in this repo.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from isbfsar_tpu.configs import CameraIntrinsics
from isbfsar_tpu.models.effnetv2 import V2_TINY, EfficientNetV2, MetrabsHead
from isbfsar_tpu.models.yolov4 import YOLOv4
from isbfsar_tpu.ops.geometry import mm, project, virtual_camera, warp_matrix
from isbfsar_tpu.ops.warp import warp_image
from isbfsar_tpu.ops.softargmax import decode_heatmap2d, decode_heatmap3d, split_head_logits
from isbfsar_tpu.train.detection import pairwise_iou

# 3D heatmap box size in meters (see module docstring).
BOX_SIZE_M = 2.5

# ------------------------------------------------------------ humanoid model
#
# 32 joints in SMPL order (0-23) + 8 head/face joints — the raw-joint count
# of the MetrabsHead contract (288 = 32 x 9 channels). Body-local frame:
# x right, y DOWN (camera convention), z away from camera; origin at pelvis;
# the subject faces the camera (nose at negative z).

JOINT_NAMES = (
    "pelvis", "l_hip", "r_hip", "spine1", "l_knee", "r_knee", "spine2",
    "l_ankle", "r_ankle", "spine3", "l_foot", "r_foot", "neck", "l_collar",
    "r_collar", "head", "l_shoulder", "r_shoulder", "l_elbow", "r_elbow",
    "l_wrist", "r_wrist", "l_hand", "r_hand",
    "nose", "l_eye", "r_eye", "l_ear", "r_ear", "head_top", "jaw", "chest",
)

_J = {n: i for i, n in enumerate(JOINT_NAMES)}

# Rendered limb segments (index pairs) with their capsule radii in meters.
HUMANOID_EDGES: Tuple[Tuple[int, int, float], ...] = (
    (_J["pelvis"], _J["spine1"], 0.07), (_J["spine1"], _J["spine2"], 0.07),
    (_J["spine2"], _J["spine3"], 0.07), (_J["spine3"], _J["neck"], 0.06),
    (_J["neck"], _J["head"], 0.04),
    (_J["pelvis"], _J["l_hip"], 0.06), (_J["pelvis"], _J["r_hip"], 0.06),
    (_J["l_hip"], _J["l_knee"], 0.055), (_J["r_hip"], _J["r_knee"], 0.055),
    (_J["l_knee"], _J["l_ankle"], 0.045), (_J["r_knee"], _J["r_ankle"], 0.045),
    (_J["l_ankle"], _J["l_foot"], 0.035), (_J["r_ankle"], _J["r_foot"], 0.035),
    (_J["neck"], _J["l_collar"], 0.04), (_J["neck"], _J["r_collar"], 0.04),
    (_J["l_collar"], _J["l_shoulder"], 0.045), (_J["r_collar"], _J["r_shoulder"], 0.045),
    (_J["l_shoulder"], _J["l_elbow"], 0.04), (_J["r_shoulder"], _J["r_elbow"], 0.04),
    (_J["l_elbow"], _J["l_wrist"], 0.035), (_J["r_elbow"], _J["r_wrist"], 0.035),
    (_J["l_wrist"], _J["l_hand"], 0.03), (_J["r_wrist"], _J["r_hand"], 0.03),
)

MOTIONS = ("idle", "wave", "squat", "walk")

# Action-class library for the offline AR workflow (tools/synth_workflow.py):
# extra parametric motions that are NOT in MOTIONS, so the detection/pose
# trainers' scene distribution — and the cached trained fixtures keyed on it
# — stay byte-stable, and the pose nets must GENERALIZE to these held-out
# motions exactly as they would to real unseen actions. Split mirrors the
# reference protocol (train TRX on one class set, FSOS-eval on a disjoint
# one — reference modules/ar/utils/test/compute_fsos.py:40-79).
ACTION_TRAIN_CLASSES = (
    "wave", "squat", "walk", "raise_both", "clap", "kick_r", "bow", "lean",
)
ACTION_TEST_CLASSES = (
    "march", "punch_l", "jumping_jack", "twist", "touch_head", "shrug",
    "sway",
)
# Extended train-side classes for production-scale runs
# (tools/synth_workflow.py --production trains on TRAIN + EXTRA = 16
# classes). More class diversity is the discriminator's training signal —
# the reference trains its open-set head against 100 NTU classes
# (modules/ar/utils/train.py); 8 synthetic classes under-feed it. Several
# extras are deliberate HARD negatives for the held-out set (turn vs twist,
# punch_r vs punch_l, drink vs touch_head): mirror/near-miss classes that
# force the embedding to encode laterality and joint-group identity rather
# than gross motion energy. CI keeps the 8-class default (suite cost).
# NOTE: these classes are NOT in the pose-training scene library
# (_POSE_SCENE_ACTIONS below stays frozen), so the pose nets meet them as
# genuinely unseen articulations — and the cached fixtures stay valid.
ACTION_EXTRA_CLASSES = (
    "jump", "kick_l", "wave_l", "reach_fwd", "turn", "lunge", "drink",
    "punch_r",
)

# joints that ride the torso for trunk motions (bow/twist/lean)
_UPPER = (
    "spine1", "spine2", "spine3", "chest", "neck", "l_collar", "r_collar",
    "head", "head_top", "nose", "jaw", "l_eye", "r_eye", "l_ear", "r_ear",
    "l_shoulder", "r_shoulder", "l_elbow", "r_elbow", "l_wrist", "r_wrist",
    "l_hand", "r_hand",
)


def _arm_chain(j: np.ndarray, side: str, ang: float, plane: str = "frontal") -> None:
    """Pose one arm as a straight chain at ``ang`` rad from straight-down.

    ``frontal`` rotates in the body x-y plane (lateral raise), ``sagittal``
    in y-z (forward raise). Overwrites elbow/wrist/hand from the shoulder.
    """
    sign = 1.0 if side == "l" else -1.0
    sh = j[_J[f"{side}_shoulder"]]
    if plane == "frontal":
        d = np.asarray([sign * np.sin(ang), np.cos(ang), 0.0], np.float32)
    else:
        d = np.asarray([0.0, np.cos(ang), -np.sin(ang)], np.float32)
    j[_J[f"{side}_elbow"]] = sh + 0.27 * d
    j[_J[f"{side}_wrist"]] = sh + 0.53 * d
    j[_J[f"{side}_hand"]] = sh + 0.62 * d


def _check_warmstart_shapes(given, expected_shapes, what: str) -> None:
    """Fail fast with the offending path when a warm-start tree doesn't
    match the selected architecture (a CI-size checkpoint fed to a
    --production run would otherwise die minutes later inside a jitted
    apply with a traceback that never mentions --init)."""
    import flax

    g = flax.traverse_util.flatten_dict(given)
    e = flax.traverse_util.flatten_dict(expected_shapes)
    if set(g) != set(e):
        missing = sorted(set(e) - set(g))[:3]
        extra = sorted(set(g) - set(e))[:3]
        raise ValueError(
            f"warm-start {what} tree does not match this architecture: "
            f"missing={['/'.join(k) for k in missing]} "
            f"extra={['/'.join(k) for k in extra]}"
        )
    for k in g:
        if tuple(np.shape(g[k])) != tuple(e[k].shape):
            raise ValueError(
                f"warm-start {what} leaf {'/'.join(k)} has shape "
                f"{np.shape(g[k])}, this architecture expects {e[k].shape} "
                f"— was the checkpoint trained at a different size preset?"
            )


def humanoid_pose(t: float, motion: str = "idle", phase: float = 0.0) -> np.ndarray:
    """(32, 3) body-local joint positions at cycle position ``t`` in [0, 1).

    Deterministic parametric motion — the ground truth IS the parameter
    evaluation, no rendering approximation. Motions are chosen to produce
    visibly distinct relative-pose dynamics (the AR demo's class signal):
    ``wave`` moves one arm chain, ``squat`` moves the pelvis/knees
    vertically, ``walk`` counter-swings legs and arms in z.

    Beyond the four pose-training motions, the AR action library
    (ACTION_TRAIN_CLASSES / ACTION_EXTRA_CLASSES / ACTION_TEST_CLASSES)
    adds twenty more classes, each exercising a distinct joint group x axis
    combination so the root-relative 30-joint trajectory — the TRX input
    signal — separates them (tools/synth_workflow.py is the consumer).
    """
    assert motion in MOTIONS or motion in _ACTIONS, motion
    s = np.sin(2 * np.pi * t + phase)
    j = np.zeros((32, 3), np.float32)

    def put(name, x, y, z):
        j[_J[name]] = (x, y, z)

    put("pelvis", 0, 0, 0)
    put("l_hip", 0.09, 0.02, 0); put("r_hip", -0.09, 0.02, 0)
    put("spine1", 0, -0.12, 0); put("spine2", 0, -0.24, 0)
    put("spine3", 0, -0.34, 0); put("chest", 0, -0.38, -0.02)
    put("neck", 0, -0.46, 0)
    put("l_collar", 0.06, -0.42, 0); put("r_collar", -0.06, -0.42, 0)
    put("head", 0, -0.58, 0); put("head_top", 0, -0.72, 0)
    put("nose", 0, -0.64, -0.09); put("jaw", 0, -0.56, -0.06)
    put("l_eye", 0.04, -0.66, -0.07); put("r_eye", -0.04, -0.66, -0.07)
    put("l_ear", 0.08, -0.62, 0); put("r_ear", -0.08, -0.62, 0)
    put("l_shoulder", 0.20, -0.42, 0); put("r_shoulder", -0.20, -0.42, 0)
    # arms hanging by default
    put("l_elbow", 0.24, -0.15, 0); put("r_elbow", -0.24, -0.15, 0)
    put("l_wrist", 0.26, 0.09, 0); put("r_wrist", -0.26, 0.09, 0)
    put("l_hand", 0.27, 0.17, 0); put("r_hand", -0.27, 0.17, 0)
    # legs straight by default
    put("l_knee", 0.10, 0.42, 0); put("r_knee", -0.10, 0.42, 0)
    put("l_ankle", 0.10, 0.82, 0); put("r_ankle", -0.10, 0.82, 0)
    put("l_foot", 0.10, 0.88, -0.10); put("r_foot", -0.10, 0.88, -0.10)

    if motion == "wave":
        # right arm raised, forearm oscillating about the elbow
        sh = j[_J["r_shoulder"]]
        j[_J["r_elbow"]] = sh + (-0.26, -0.06, 0)
        ang = 0.9 + 0.5 * s  # rad from vertical
        fore = 0.26 * np.asarray([-np.sin(ang), -np.cos(ang), 0.0])
        j[_J["r_wrist"]] = j[_J["r_elbow"]] + fore
        j[_J["r_hand"]] = j[_J["r_elbow"]] + fore * 1.3
    elif motion == "squat":
        drop = 0.14 * (1 + s)  # 0 .. 0.28 m vertical drop
        upper = [i for i in range(32) if i not in
                 (_J["l_knee"], _J["r_knee"], _J["l_ankle"], _J["r_ankle"],
                  _J["l_foot"], _J["r_foot"])]
        j[upper, 1] += drop
        for knee in ("l_knee", "r_knee"):
            j[_J[knee], 1] += 0.4 * drop
            j[_J[knee], 2] -= 0.6 * drop  # knees come forward (toward camera)
    elif motion == "walk":
        swing = 0.22 * s
        for side, sign in (("l", 1.0), ("r", -1.0)):
            j[_J[f"{side}_knee"], 2] += 0.5 * sign * swing
            for p in ("ankle", "foot"):
                j[_J[f"{side}_{p}"], 2] += sign * swing
            # arms counter-swing
            for p in ("elbow",):
                j[_J[f"{side}_{p}"], 2] += -0.4 * sign * swing
            for p in ("wrist", "hand"):
                j[_J[f"{side}_{p}"], 2] += -0.8 * sign * swing
    elif motion == "idle":
        j[:, 0] += 0.01 * s  # breathing sway
    elif motion in _ACTIONS:
        _ACTIONS[motion](j, s, t, phase)

    return j


# ------------------------------------------------------- action-class motions
#
# Each mutates the default skeleton like the branches above. The primary
# oscillator ``s`` is sin(2*pi*t + phase); fast motions derive their own
# double-frequency oscillator from (t, phase).


def _act_raise_both(j, s, t, phase):
    # both full arms sweep down<->overhead in the frontal plane
    ang = 1.2 + 0.9 * s
    _arm_chain(j, "l", ang)
    _arm_chain(j, "r", ang)


def _act_clap(j, s, t, phase):
    # hands oscillate laterally toward the chest midline, forward of torso
    spread = 0.05 + 0.11 * (1 + s)
    for side, sign in (("l", 1.0), ("r", -1.0)):
        j[_J[f"{side}_elbow"]] = (sign * 0.24, -0.26, -0.10)
        j[_J[f"{side}_wrist"]] = (sign * spread, -0.31, -0.20)
        j[_J[f"{side}_hand"]] = (sign * spread * 0.5, -0.32, -0.23)


def _act_kick_r(j, s, t, phase):
    # right leg swings forward/up; left leg and arms stay planted
    lift = 0.5 * (1 + s)
    j[_J["r_knee"]] += (0, -0.22 * lift, -0.28 * lift)
    for p in ("r_ankle", "r_foot"):
        j[_J[p]] += (0, -0.38 * lift, -0.52 * lift)


def _act_bow(j, s, t, phase):
    # torso pitches forward about the pelvis x-axis
    th = 0.35 * (1 + s)
    u = [_J[n] for n in _UPPER]
    y = j[u, 1].copy()
    j[u, 2] += y * np.sin(th)  # y is negative above the pelvis -> z forward
    j[u, 1] = y * np.cos(th)


def _act_lean(j, s, t, phase):
    # lateral trunk bend: upper joints shear sideways with height
    u = [_J[n] for n in _UPPER]
    j[u, 0] += (-j[u, 1]) * 0.45 * s


def _act_march(j, s, t, phase):
    # knees alternately raise vertically (no arm swing — distinct from walk)
    for side, osc in (("l", s), ("r", -s)):
        lift = max(osc, 0.0)
        j[_J[f"{side}_knee"]] += (0, -0.45 * lift, -0.24 * lift)
        for p in ("ankle", "foot"):
            j[_J[f"{side}_{p}"]] += (0, -0.40 * lift, 0.06 * lift)


def _act_punch_l(j, s, t, phase):
    # left fist thrusts far forward in z with a shoulder turn; the right
    # stays in a static guard (distinct mean posture AND dynamics)
    ext = 0.5 * (1 + s)
    j[_J["l_shoulder"], 2] -= 0.10 * ext
    j[_J["r_shoulder"], 2] += 0.10 * ext
    j[_J["l_elbow"]] = (0.14, -0.32, -0.26 * ext)
    j[_J["l_wrist"]] = (0.06, -0.34, -0.18 - 0.45 * ext)
    j[_J["l_hand"]] = (0.04, -0.34, -0.24 - 0.50 * ext)
    j[_J["r_elbow"]] = (-0.22, -0.28, -0.08)
    j[_J["r_wrist"]] = (-0.12, -0.34, -0.16)
    j[_J["r_hand"]] = (-0.10, -0.35, -0.18)


def _act_jumping_jack(j, s, t, phase):
    # arms AND legs abduct laterally together
    ab = 0.5 * (1 + s)
    ang = 0.3 + 2.2 * ab
    _arm_chain(j, "l", ang)
    _arm_chain(j, "r", ang)
    for side, sign in (("l", 1.0), ("r", -1.0)):
        j[_J[f"{side}_knee"], 0] += sign * 0.15 * ab
        for p in ("ankle", "foot"):
            j[_J[f"{side}_{p}"], 0] += sign * 0.30 * ab


def _act_twist(j, s, t, phase):
    # torso yaw oscillation about the vertical axis
    th = 1.0 * s
    u = [_J[n] for n in _UPPER]
    x, z = j[u, 0].copy(), j[u, 2].copy()
    j[u, 0] = x * np.cos(th) - z * np.sin(th)
    j[u, 2] = x * np.sin(th) + z * np.cos(th)


def _act_touch_head(j, s, t, phase):
    # both hands rise from hanging to the ears, elbows flaring out
    r = 0.5 * (1 + s)
    for side, sign in (("l", 1.0), ("r", -1.0)):
        base_e = np.asarray(j[_J[f"{side}_elbow"]])
        base_w = np.asarray(j[_J[f"{side}_wrist"]])
        j[_J[f"{side}_elbow"]] = base_e * (1 - r) + r * np.asarray(
            [sign * 0.30, -0.46, -0.05])
        j[_J[f"{side}_wrist"]] = base_w * (1 - r) + r * np.asarray(
            [sign * 0.11, -0.60, -0.03])
        j[_J[f"{side}_hand"]] = j[_J[f"{side}_wrist"]] + (0, -0.05, 0)


def _act_shrug(j, s, t, phase):
    # shoulder girdle + bent-out arms bob vertically (amplitude sized above
    # the trained pose net's per-frame noise floor; the bent-elbow posture
    # separates the MEAN signature from idle/march arms)
    lift = 0.16 * (1 + s)
    for side, sign in (("l", 1.0), ("r", -1.0)):
        j[_J[f"{side}_elbow"]] = (sign * 0.34, -0.22, 0.0)
        j[_J[f"{side}_wrist"]] = (sign * 0.30, -0.05, -0.10)
        j[_J[f"{side}_hand"]] = (sign * 0.29, 0.02, -0.12)
    for n in ("l_collar", "r_collar", "l_shoulder", "r_shoulder",
              "l_elbow", "r_elbow", "l_wrist", "r_wrist", "l_hand", "r_hand"):
        j[_J[n], 1] -= lift


def _act_sway(j, s, t, phase):
    # whole upper body circles laterally while feet stay planted: x AND z
    # of the trunk move in quadrature (distinct from lean's pure x shear)
    c = np.cos(2 * np.pi * t + phase)
    u = [_J[n] for n in _UPPER]
    j[u, 0] += (-j[u, 1]) * 0.50 * s
    j[u, 2] += (-j[u, 1]) * 0.38 * c


def _act_jump(j, s, t, phase):
    # the WHOLE body (feet included) oscillates vertically — the only class
    # whose global y translates everything; arms counter-swing for signal
    h = 0.18 * max(s, 0.0)          # airborne half-cycle only
    j[:, 1] -= h
    ang = 0.25 + 0.5 * max(s, 0.0)  # arms flare out on the way up
    _arm_chain(j, "l", ang)
    _arm_chain(j, "r", ang)


def _act_kick_l(j, s, t, phase):
    # mirror of kick_r: LEFT leg swings forward/up (laterality signal)
    lift = 0.5 * (1 + s)
    j[_J["l_knee"]] += (0, -0.22 * lift, -0.28 * lift)
    for p in ("l_ankle", "l_foot"):
        j[_J[p]] += (0, -0.38 * lift, -0.52 * lift)


def _act_wave_l(j, s, t, phase):
    # mirror of the MOTIONS 'wave': left arm raised, forearm oscillating
    sh = j[_J["l_shoulder"]]
    j[_J["l_elbow"]] = sh + (0.26, -0.06, 0)
    ang = 0.9 + 0.5 * s
    fore = 0.26 * np.asarray([np.sin(ang), -np.cos(ang), 0.0])
    j[_J["l_wrist"]] = j[_J["l_elbow"]] + fore
    j[_J["l_hand"]] = j[_J["l_elbow"]] + fore * 1.3


def _act_reach_fwd(j, s, t, phase):
    # both arms sweep hanging<->horizontal in the SAGITTAL plane
    # (raise_both is the frontal-plane counterpart)
    ang = 0.8 + 0.7 * s
    _arm_chain(j, "l", ang, plane="sagittal")
    _arm_chain(j, "r", ang, plane="sagittal")


def _act_turn(j, s, t, phase):
    # WHOLE-body yaw about the vertical axis, hips and legs included —
    # the held-out 'twist' rotates the upper body only
    th = 0.9 * s
    x, z = j[:, 0].copy(), j[:, 2].copy()
    j[:, 0] = x * np.cos(th) - z * np.sin(th)
    j[:, 2] = x * np.sin(th) + z * np.cos(th)


def _act_lunge(j, s, t, phase):
    # right leg strides forward while the pelvis and torso drop and shift
    # forward; left leg trails — asymmetric lower-body y+z (squat is
    # symmetric pure-y, kicks lift a leg without the weight drop)
    d = 0.5 * (1 + s)
    j[_J["r_knee"]] += (0, 0.02 * d, -0.30 * d)
    for p in ("r_ankle", "r_foot"):
        j[_J[p]] += (0, 0.0, -0.38 * d)
    upper = [i for i in range(32) if i not in
             (_J["l_knee"], _J["r_knee"], _J["l_ankle"], _J["r_ankle"],
              _J["l_foot"], _J["r_foot"])]
    j[upper, 1] += 0.14 * d
    j[upper, 2] -= 0.12 * d


def _act_drink(j, s, t, phase):
    # ONE hand rises from hanging to the jaw (touch_head raises both to the
    # ears); elbow stays low and forward — single-sided arm flexion
    r = 0.5 * (1 + s)
    base_e = np.asarray(j[_J["r_elbow"]])
    base_w = np.asarray(j[_J["r_wrist"]])
    j[_J["r_elbow"]] = base_e * (1 - r) + r * np.asarray([-0.20, -0.24, -0.12])
    j[_J["r_wrist"]] = base_w * (1 - r) + r * np.asarray([-0.06, -0.50, -0.10])
    j[_J["r_hand"]] = j[_J["r_wrist"]] + (0.02, -0.05, -0.02)


def _act_punch_r(j, s, t, phase):
    # mirror of the held-out punch_l: right fist thrusts forward with a
    # shoulder turn, left in static guard
    ext = 0.5 * (1 + s)
    j[_J["r_shoulder"], 2] -= 0.10 * ext
    j[_J["l_shoulder"], 2] += 0.10 * ext
    j[_J["r_elbow"]] = (-0.14, -0.32, -0.26 * ext)
    j[_J["r_wrist"]] = (-0.06, -0.34, -0.18 - 0.45 * ext)
    j[_J["r_hand"]] = (-0.04, -0.34, -0.24 - 0.50 * ext)
    j[_J["l_elbow"]] = (0.22, -0.28, -0.08)
    j[_J["l_wrist"]] = (0.12, -0.34, -0.16)
    j[_J["l_hand"]] = (0.10, -0.35, -0.18)


_ACTIONS = {
    "raise_both": _act_raise_both,
    "clap": _act_clap,
    "kick_r": _act_kick_r,
    "bow": _act_bow,
    "lean": _act_lean,
    "march": _act_march,
    "punch_l": _act_punch_l,
    "jumping_jack": _act_jumping_jack,
    "twist": _act_twist,
    "touch_head": _act_touch_head,
    "shrug": _act_shrug,
    "sway": _act_sway,
    "jump": _act_jump,
    "kick_l": _act_kick_l,
    "wave_l": _act_wave_l,
    "reach_fwd": _act_reach_fwd,
    "turn": _act_turn,
    "lunge": _act_lunge,
    "drink": _act_drink,
    "punch_r": _act_punch_r,
}
assert set(ACTION_TRAIN_CLASSES + ACTION_EXTRA_CLASSES + ACTION_TEST_CLASSES
           ) - set(MOTIONS) == set(_ACTIONS)

# The pose-training scene library is FROZEN at the original 12-action set:
# the diverse-mode samplers (random_humanoid_pose / SyntheticHumanSampler)
# draw from MOTIONS + this tuple ONLY, so the cached trained fixtures and
# receipts — keyed on budgets, not the library — stay byte-stable, and any
# class added later (ACTION_EXTRA_CLASSES) is held out from pose training
# exactly like a real unseen action would be.
_POSE_SCENE_ACTIONS = (
    "raise_both", "clap", "kick_r", "bow", "lean", "march", "punch_l",
    "jumping_jack", "twist", "touch_head", "shrug", "sway",
)
assert set(_POSE_SCENE_ACTIONS) <= set(_ACTIONS)


# per-joint drawn radius (meters) for the exact bbox of the rendering
_JOINT_RADIUS = np.full(32, 0.05, np.float32)
for _a, _b, _r in HUMANOID_EDGES:
    _JOINT_RADIUS[_a] = max(_JOINT_RADIUS[_a], _r)
    _JOINT_RADIUS[_b] = max(_JOINT_RADIUS[_b], _r)
_HEAD_R = 0.11
for _n in ("head", "head_top", "nose", "jaw", "l_eye", "r_eye", "l_ear", "r_ear"):
    _JOINT_RADIUS[_J[_n]] = _HEAD_R


def place_in_camera(local: np.ndarray, center: Sequence[float], yaw: float = 0.0) -> np.ndarray:
    """Rotate the body about the vertical (y) axis by ``yaw`` and translate
    its pelvis to camera-space ``center`` (meters)."""
    c, s = np.cos(yaw), np.sin(yaw)
    rot_y = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    return local @ rot_y.T + np.asarray(center, np.float32)


def render_humanoid_scene(
    joints_cam: np.ndarray,
    intrinsics: CameraIntrinsics,
    frame_hw: Tuple[int, int] = (240, 320),
    rng: Optional[np.random.Generator] = None,
    n_distractors: int = 3,
    person: bool = True,
    humanlike_clutter: int = 0,
) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Render the humanoid and return EXACT ground truth.

    joints_cam: (32, 3) camera-space joints (meters). Returns
    (frame uint8 BGR, {"bbox": (4,) x1y1x2y2 pixels, "joints2d": (32, 2)
    pixels, "joints3d": (32, 3) camera-space}). The bbox is the projected
    silhouette extent: every joint's projection expanded by its drawn
    capsule radius (exact for this renderer).

    ``humanlike_clutter``: extra DISARTICULATED body-part-like shapes —
    limb-colored bent capsule strokes and a head-like disc with eye dots,
    drawn with the same primitives/color ranges/stroke widths the person
    is, but with no coherent articulation. These are the hard negatives
    the detector-calibration fine-tune trains on (finetune_detector): the
    round-4 gate sweep showed empty scenes score a median 0.885 person
    confidence because ordinary rectangles/circles are too easy — only
    clutter that locally mimics limbs forces the score head to learn
    global body structure. Default 0 keeps every pre-existing rng stream
    (and therefore every cached trained fixture) byte-identical.
    """
    import cv2

    rng = rng or np.random.default_rng(0)
    h, w = frame_hw
    k = intrinsics.matrix()
    f = float(k[0, 0])

    # cluttered background: noise + gradient + distractor shapes
    frame = rng.integers(20, 90, (h, w, 3)).astype(np.uint8)
    grad = np.linspace(0, rng.integers(20, 70), w, dtype=np.int32)
    frame = np.clip(frame.astype(np.int32) + grad[None, :, None], 0, 255).astype(np.uint8)
    for _ in range(n_distractors):
        color = tuple(int(v) for v in rng.integers(40, 220, 3))
        x0, y0 = int(rng.integers(0, w)), int(rng.integers(0, h))
        if rng.random() < 0.5:
            cv2.rectangle(frame, (x0, y0),
                          (x0 + int(rng.integers(8, w // 4)), y0 + int(rng.integers(8, h // 4))),
                          color, -1)
        else:
            cv2.circle(frame, (x0, y0), int(rng.integers(4, h // 6)), color, -1)

    for _ in range(humanlike_clutter):
        # a fake depth picks limb-plausible stroke widths/lengths: the same
        # r*f/z law the person's edges use (HUMANOID_EDGES radii 0.04-0.09)
        z = float(rng.uniform(1.8, 3.6))
        if rng.random() < 0.75:  # bent two-segment "limb"
            color = tuple(int(v) for v in rng.integers(60, 255, 3))
            t = max(1, int(rng.uniform(0.04, 0.09) * f / z))
            p0 = np.asarray([rng.integers(0, w), rng.integers(0, h)], np.float32)
            ang = rng.uniform(0, 2 * np.pi)
            seg = rng.uniform(0.25, 0.45) * f / z  # upper/lower-limb lengths
            p1 = p0 + seg * np.asarray([np.cos(ang), np.sin(ang)])
            ang2 = ang + rng.uniform(-1.2, 1.2)
            p2 = p1 + seg * rng.uniform(0.7, 1.0) * np.asarray(
                [np.cos(ang2), np.sin(ang2)])
            for a, b in ((p0, p1), (p1, p2)):
                cv2.line(frame, tuple(a.astype(int)), tuple(b.astype(int)),
                         color, 2 * t)
        else:  # head-like disc with eye dots
            skin = tuple(int(v) for v in rng.integers(120, 230, 3))
            c = (int(rng.integers(0, w)), int(rng.integers(0, h)))
            r = max(2, int(_HEAD_R * f / z))
            cv2.circle(frame, c, r, skin, -1)
            for dx in (-r // 3, r // 3):
                cv2.circle(frame, (c[0] + dx, c[1] - r // 6),
                           max(1, r // 5), (30, 30, 30), -1)

    proj = joints_cam @ k.T
    j2d = (proj[:, :2] / proj[:, 2:3]).astype(np.float32)  # (32, 2) pixels

    if not person:
        return frame, {
            "bbox": np.zeros(4, np.float32),
            "joints2d": j2d,
            "joints3d": joints_cam.astype(np.float32),
        }

    # per-sample "clothing": top / bottom / skin colors
    top = tuple(int(v) for v in rng.integers(60, 255, 3))
    bottom = tuple(int(v) for v in rng.integers(60, 255, 3))
    skin = tuple(int(v) for v in rng.integers(120, 230, 3))

    z = joints_cam[:, 2]
    px_r = _JOINT_RADIUS * f / np.maximum(z, 0.2)  # drawn radius per joint, px

    def color_for(a, b):
        upper = {_J[n] for n in ("pelvis", "spine1", "spine2", "spine3", "neck",
                                 "chest", "l_collar", "r_collar", "l_shoulder",
                                 "r_shoulder", "l_elbow", "r_elbow")}
        lower = {_J[n] for n in ("l_hip", "r_hip", "l_knee", "r_knee",
                                 "l_ankle", "r_ankle", "l_foot", "r_foot")}
        if a in lower or b in lower:
            return bottom
        if a in upper and b in upper:
            return top
        return skin

    # torso quad first (shoulders + hips), then limbs far-to-near
    torso = np.asarray([j2d[_J["l_shoulder"]], j2d[_J["r_shoulder"]],
                        j2d[_J["r_hip"]], j2d[_J["l_hip"]]], np.int32)
    cv2.fillConvexPoly(frame, torso, top)
    order = np.argsort([-0.5 * (z[a] + z[b]) for a, b, _ in HUMANOID_EDGES])
    for idx in order:
        a, b, r = HUMANOID_EDGES[idx]
        t = max(1, int(r * f / max(0.5 * (z[a] + z[b]), 0.2)))
        cv2.line(frame, tuple(j2d[a].astype(int)), tuple(j2d[b].astype(int)),
                 color_for(a, b), 2 * t)
    head_px = int(_HEAD_R * f / max(z[_J["head"]], 0.2))
    cv2.circle(frame, tuple(j2d[_J["head"]].astype(int)), head_px, skin, -1)
    for eye in ("l_eye", "r_eye"):
        cv2.circle(frame, tuple(j2d[_J[eye]].astype(int)),
                   max(1, head_px // 5), (30, 30, 30), -1)

    lo = (j2d - px_r[:, None]).min(axis=0)
    hi = (j2d + px_r[:, None]).max(axis=0)
    bbox = np.asarray([lo[0], lo[1], hi[0], hi[1]], np.float32)
    return frame, {
        "bbox": bbox,
        "joints2d": j2d,
        "joints3d": joints_cam.astype(np.float32),
    }


def random_humanoid_pose(rng: np.random.Generator) -> np.ndarray:
    """A random articulated configuration spanning the WHOLE pose space.

    The four MOTIONS cover a thin slice of arm/torso/leg configurations; a
    pose net trained only on them collapses unseen limb placements toward
    that slice (measured: action classes with raised/forward arms extracted
    with ~0 amplitude). This generator is the synthetic analog of training
    metrabs on broad mocap diversity: random per-limb chain angles, torso
    pitch/yaw/lean, and leg raises, layered on a random library motion
    frame so the in-distribution poses stay covered too.
    """
    base = list(MOTIONS) + list(_POSE_SCENE_ACTIONS)
    j = humanoid_pose(float(rng.random()), base[rng.integers(len(base))],
                      phase=float(rng.uniform(0, 2 * np.pi)))
    for side in "lr":
        if rng.random() < 0.7:
            _arm_chain(j, side, float(rng.uniform(0.0, np.pi)),
                       "frontal" if rng.random() < 0.5 else "sagittal")
            if rng.random() < 0.5:  # random elbow bend
                el, wr = j[_J[f"{side}_elbow"]], j[_J[f"{side}_wrist"]]
                bend = rng.uniform(-0.18, 0.18, 3).astype(np.float32)
                j[_J[f"{side}_wrist"]] = el + (wr - el) * 0.7 + bend
                j[_J[f"{side}_hand"]] = j[_J[f"{side}_wrist"]] + (wr - el) * 0.3
    u = [_J[n] for n in _UPPER]
    if rng.random() < 0.5:  # pitch
        th = float(rng.uniform(-0.25, 0.7))
        y = j[u, 1].copy()
        j[u, 2] += y * np.sin(th)
        j[u, 1] = y * np.cos(th)
    if rng.random() < 0.5:  # yaw
        th = float(rng.uniform(-1.0, 1.0))
        x, z = j[u, 0].copy(), j[u, 2].copy()
        j[u, 0] = x * np.cos(th) - z * np.sin(th)
        j[u, 2] = x * np.sin(th) + z * np.cos(th)
    if rng.random() < 0.4:  # lateral lean
        j[u, 0] += (-j[u, 1]) * float(rng.uniform(-0.5, 0.5))
    for side in "lr":
        if rng.random() < 0.35:  # leg raise
            lift = float(rng.uniform(0.2, 1.0))
            j[_J[f"{side}_knee"]] += (0, -0.40 * lift, -0.22 * lift)
            for p in ("ankle", "foot"):
                j[_J[f"{side}_{p}"]] += (0, -0.36 * lift, 0.02 * lift)
    return j


class SyntheticHumanSampler:
    """Random scenes: motion x phase x placement x yaw x depth.

    ``pose_mode="motions"`` (default) draws from the four MOTIONS — the
    byte-stable distribution the round-3 fixtures/receipts were trained on.
    ``pose_mode="diverse"`` mixes 50% :func:`random_humanoid_pose` with 50%
    library motions (MOTIONS + the frozen ``_POSE_SCENE_ACTIONS`` set) —
    the distribution a general-purpose pose net needs (see
    random_humanoid_pose docstring).
    """

    def __init__(self, frame_hw: Tuple[int, int] = (240, 320),
                 intrinsics: Optional[CameraIntrinsics] = None, seed: int = 0,
                 z_range: Tuple[float, float] = (1.8, 3.6),
                 pose_mode: str = "motions"):
        assert pose_mode in ("motions", "diverse"), pose_mode
        self.frame_hw = frame_hw
        self.intrinsics = intrinsics or CameraIntrinsics()
        self.rng = np.random.default_rng(seed)
        self.z_range = z_range
        self.pose_mode = pose_mode

    def sample(self, motion: Optional[str] = None, person: bool = True,
               t: Optional[float] = None, center=None, yaw: Optional[float] = None,
               hard: bool = False):
        """Returns (frame, gt). The body is placed so its full vertical
        extent projects inside the frame. ``hard`` (person-free scenes
        only): add disarticulated body-part-like clutter — the hard
        negatives of the detector-calibration fine-tune
        (render_humanoid_scene ``humanlike_clutter``)."""
        rng = self.rng
        if motion is None and self.pose_mode == "diverse" and person:
            if rng.random() < 0.5:
                local = random_humanoid_pose(rng)
                motion = "random"
            else:
                lib = list(MOTIONS) + list(_POSE_SCENE_ACTIONS)
                motion = lib[rng.integers(len(lib))]
                local = humanoid_pose(
                    float(rng.random()) if t is None else t, motion,
                    phase=float(rng.uniform(0, 2 * np.pi)),
                )
        else:
            # "motions" mode consumes the rng EXACTLY as round 3 did — the
            # cached trained fixtures and receipts are keyed on this stream
            motion = motion or MOTIONS[rng.integers(len(MOTIONS))]
            t = float(rng.random()) if t is None else t
            local = humanoid_pose(t, motion,
                                  phase=float(rng.uniform(0, 2 * np.pi)))
        h, w = self.frame_hw
        k = self.intrinsics.matrix()
        f = float(k[0, 0])
        z = float(rng.uniform(*self.z_range))
        if center is None:
            if self.pose_mode == "diverse":
                # exact per-pose extent: raised arms / split legs exceed the
                # fixed-span assumption below, so bound from `local` itself
                # (x/z mix under yaw -> use the radial x-z extent)
                up = -float(local[:, 1].min()) + 0.17
                dn = float(local[:, 1].max()) + 0.10
                rad = float(np.hypot(local[:, 0], local[:, 2]).max()) + 0.12
                x_span = rad * f / z
                lo_y, hi_y = up * f / z, h - dn * f / z
            else:
                # keep the projected body inside the frame: the body spans
                # y in [-0.75, 0.95] around the pelvis, x in +-0.45
                y_span = 0.95 * f / z
                x_span = 0.50 * f / z
                lo_y, hi_y = 0.85 * y_span, h - 1.1 * y_span
            cx = rng.uniform(x_span, w - x_span) if w > 2 * x_span else w / 2
            cy = rng.uniform(lo_y, hi_y) if hi_y > lo_y else h / 2
            center = ((cx - k[0, 2]) / f * z, (cy - k[1, 2]) / f * z, z)
        yaw = float(rng.uniform(-0.7, 0.7)) if yaw is None else yaw
        joints = place_in_camera(local, center, yaw)
        frame, gt = render_humanoid_scene(
            joints, self.intrinsics, self.frame_hw, rng, person=person,
            humanlike_clutter=int(rng.integers(3, 7))
            if hard and not person else 0,
        )
        gt["motion"] = motion
        return frame, gt


def render_motion_clip(
    motion: str,
    n_frames: int = 16,
    frame_hw: Tuple[int, int] = (240, 320),
    intrinsics: Optional[CameraIntrinsics] = None,
    center=(0.0, 0.2, 2.5),
    yaw: float = 0.0,
    cycles: float = 1.5,
    seed: int = 0,
    phase: float = 0.0,
):
    """A moving-humanoid clip: ``n_frames`` of one motion cycle(s).

    Returns (frames [(H, W, 3) uint8 BGR], gts [dict]) — the AR demo's
    acquisition source (reference main.py:243-319 captures the same thing
    from a camera)."""
    intrinsics = intrinsics or CameraIntrinsics()
    rng = np.random.default_rng(seed)
    frames, gts = [], []
    for i in range(n_frames):
        t = cycles * i / n_frames
        joints = place_in_camera(humanoid_pose(t, motion, phase=phase), center, yaw)
        frame, gt = render_humanoid_scene(joints, intrinsics, frame_hw, rng)
        gt["motion"] = motion
        frames.append(frame)
        gts.append(gt)
    return frames, gts


# ------------------------------------------------------------- YOLO trainer


def yolo_person_loss(boxes, confs, gt_box, has_person,
                     pos_iou: float = 0.35, neg_iou: float = 0.3):
    """Single image, <=1 GT person. boxes (n, 1, 4)/(n, 4) normalized;
    confs (n, 80); gt_box (4,) normalized x1y1x2y2; has_person () bool.

    Every anchor above ``pos_iou`` (plus the best) is positive — the live
    picker is argmax-SCORE (ops/nms.py best_person_box), so any anchor
    allowed to score high must carry a trained box (the gazefocus rule,
    train/gazefocus.py blazeface_loss). The FULL class vector is supervised:
    ``best_person_box`` requires class 0 to be the per-anchor argmax, so
    classes 1..79 are pushed to 0 everywhere.
    """
    boxes = boxes.reshape(-1, 4)
    confs = confs.reshape(boxes.shape[0], -1)
    person = confs[:, 0]
    n = boxes.shape[0]

    iou = pairwise_iou(boxes, gt_box[None])[:, 0]  # (n,)
    best = jnp.argmax(iou)
    pos_mask = jnp.logical_or(
        iou >= pos_iou, jnp.zeros(n, bool).at[best].set(True)
    )
    pos_mask = jnp.logical_and(pos_mask, has_person)
    neg_mask = jnp.logical_and(iou < neg_iou, jnp.logical_not(pos_mask))
    neg_mask = jnp.logical_or(neg_mask, jnp.logical_not(has_person))
    n_pos = jnp.maximum(jnp.sum(pos_mask), 1.0)

    p = jnp.clip(person, 1e-6, 1 - 1e-6)
    score_loss = -(
        jnp.sum(jnp.log(p) * pos_mask) / n_pos
        + jnp.sum(jnp.log(1 - p) * neg_mask) / jnp.maximum(jnp.sum(neg_mask), 1.0)
    )

    other = jnp.clip(confs[:, 1:], 1e-6, 1.0)
    other_loss = -jnp.mean(jnp.log(1 - other + 1e-6))

    def smooth_l1(x):
        a = jnp.abs(x)
        return jnp.where(a < 1.0, 0.5 * a * a, a - 0.5)

    box_loss = jnp.sum(smooth_l1(boxes - gt_box[None]).sum(-1) * pos_mask) / n_pos
    total = score_loss + 5.0 * box_loss + 0.5 * other_loss
    return total, {"score_loss": score_loss, "box_loss": box_loss,
                   "other_cls_loss": other_loss}


class YoloTrainer:
    """Person-detection trainer for the YOLOv4 contract.

    batch: {"image": (b, S, S, 3) RGB float in [0,1] (the yolo_preprocess
    distribution — INTER_AREA-resized full frames), "bbox": (b, 4)
    normalized x1y1x2y2, "has_person": (b,) bool}.
    """

    def __init__(self, width: float = 1.0, input_size: int = 256, seed: int = 0,
                 lr: float = 3e-4, dtype=jnp.float32, variables=None,
                 remat: bool = False):
        """variables: optional {"params", "batch_stats"} to warm-start from
        (fine-tune / extend a previous run's output; optimizer state
        restarts fresh). remat: per-ResBlock activation rematerialization
        (models/yolov4.py) — buys batch/input-size when HBM binds; same
        params, same step."""
        self.net = YOLOv4(width=width, dtype=dtype, remat=remat)
        self.input_size = input_size
        if variables is None:
            variables = jax.jit(
                lambda k: self.net.init(k, jnp.zeros((1, input_size, input_size, 3)))
            )(jax.random.key(seed))
        else:
            _check_warmstart_shapes(
                variables,
                jax.eval_shape(
                    lambda k: self.net.init(k, jnp.zeros((1, input_size, input_size, 3))),
                    jax.random.key(0),
                ),
                "yolo",
            )
            # deep-copy: the train step DONATES its param buffers, which
            # would delete the caller's arrays out from under them
            variables = jax.tree.map(lambda x: jnp.array(x, copy=True), variables)
        self.params = variables["params"]
        self.batch_stats = variables["batch_stats"]
        self.optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
        self.opt_state = self.optimizer.init(self.params)

        # train=True + mutable batch_stats (the gazefocus trainers' rule:
        # BN on frozen init statistics never normalizes and learning stalls)
        def loss_fn(params, batch_stats, batch):
            (boxes, confs), new_state = self.net.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["image"], train=True, mutable=["batch_stats"],
            )
            losses, aux = jax.vmap(yolo_person_loss)(
                boxes, confs, batch["bbox"], batch["has_person"]
            )
            return jnp.mean(losses), (jax.tree.map(jnp.mean, aux), new_state["batch_stats"])

        def step(params, batch_stats, opt_state, batch):
            (loss, (aux, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch_stats, batch)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_stats, opt_state, loss, aux

        self._step = jax.jit(step, donate_argnums=(0, 1, 2))

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    def train_step(self, batch) -> float:
        batch = jax.tree.map(jnp.asarray, batch)
        self.params, self.batch_stats, self.opt_state, loss, _ = self._step(
            self.params, self.batch_stats, self.opt_state, batch
        )
        return float(loss)


# ---------------------------------------------------------- heatmap trainer


class HeatmapTrainer:
    """EffNetV2 + MetrabsHead through the live crop chain.

    Replicates hpe/estimator.py:173-216 in the TRAINING graph: virtual
    camera from a (jittered) person box, homography warp to the crop,
    backbone, head, soft-argmax decode — then supervises the decodes
    against exact projections:

    - pred2d vs the GT joints projected through the virtual camera
      (crop-pixel coords, normalized by crop size in the loss),
    - pred3d vs ``(X_crop - centroid)/BOX_SIZE_M + 0.5`` (the [0,1]^3
      heatmap box; see module docstring for why this reconstructs to true
      metric poses).

    batch: {"frame": (b, H, W, 3) uint8, "box_px": (b, 4) pixel x1y1x2y2
    (jittered detector-like boxes), "joints3d": (b, 32, 3) camera-space}.
    """

    def __init__(self, intrinsics: CameraIntrinsics, crop_size: int = 256,
                 stages: Sequence = V2_TINY, seed: int = 0, lr: float = 1e-3,
                 dtype=jnp.float32, w3d: float = 1.0, variables=None,
                 huber_beta: float = 0.05, remat: bool = False):
        """variables: optional {"bbone": full vars, "head": {"params"}} (the
        :attr:`variables` of a previous trainer) to warm-start from.
        huber_beta: smooth-L1 knee in box units — 0.05 = 0.125 m; tighten
        toward ~0.02 when the target is fine-scale pose sensitivity (the
        default's quadratic zone under-weights sub-0.1 m errors, which is
        exactly the temporal action signal extraction needs).
        remat: per-MBConv activation rematerialization (models/effnetv2.py)
        — buys batch/crop-size when HBM binds; same params, same step."""
        self.bbone = EfficientNetV2(stages=stages, dtype=dtype, remat=remat)
        self.head = MetrabsHead()
        self.crop_size = crop_size
        self.k_matrix = jnp.asarray(intrinsics.matrix())

        c = crop_size

        if variables is not None:
            def expected(key):
                k1, k2 = jax.random.split(key)
                bb = self.bbone.init(k1, jnp.zeros((1, c, c, 3)))
                feat = self.bbone.apply(bb, jnp.zeros((1, c, c, 3)))
                return {"bbone": bb, "head": self.head.init(k2, feat)}

            _check_warmstart_shapes(
                variables, jax.eval_shape(expected, jax.random.key(0)), "pose"
            )
            # deep-copy (donation — see YoloTrainer)
            variables = jax.tree.map(lambda x: jnp.array(x, copy=True), variables)
            self.params = {"bbone": variables["bbone"]["params"],
                           "head": variables["head"]["params"]}
            self.batch_stats = variables["bbone"]["batch_stats"]
        else:
            @jax.jit
            def init(key):
                k1, k2 = jax.random.split(key)
                bb = self.bbone.init(k1, jnp.zeros((1, c, c, 3)))
                feat = self.bbone.apply(bb, jnp.zeros((1, c, c, 3)))
                hd = self.head.init(k2, feat)
                return bb, hd

            bb_vars, hd_vars = init(jax.random.key(seed))
            self.params = {"bbone": bb_vars["params"], "head": hd_vars["params"]}
            self.batch_stats = bb_vars["batch_stats"]
        self.optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
        self.opt_state = self.optimizer.init(self.params)

        def crop_and_targets(frame, box_px, joints3d):
            x1, y1, x2, y2 = box_px[0], box_px[1], box_px[2], box_px[3]
            new_k, rot = virtual_camera(x1, x2, y1, y2, self.k_matrix, c)
            h_mat = warp_matrix(self.k_matrix, new_k[None], rot)
            crop = warp_image(jnp.round(frame).astype(jnp.int32), h_mat, c)[0]
            # original camera -> crop camera: X_crop = X @ rot^T
            # (the estimator de-rotates with `mm(pred3d, rot)`, :214)
            x_crop = mm(joints3d[None], jnp.swapaxes(rot, 1, 2))[0]  # (32, 3)
            uv = project(x_crop)  # (32, 2) normalized image plane
            gt2d = uv * jnp.asarray([new_k[0, 0], new_k[1, 1]]) + jnp.asarray(
                [new_k[0, 2], new_k[1, 2]]
            )
            centroid = jnp.mean(x_crop, axis=0, keepdims=True)
            gt3d = (x_crop - centroid) / BOX_SIZE_M + 0.5
            return crop, gt2d, gt3d

        def loss_fn(params, batch_stats, batch):
            crops, gt2d, gt3d = jax.vmap(crop_and_targets)(
                batch["frame"], batch["box_px"], batch["joints3d"]
            )
            bbone_in = crops.astype(jnp.float32) / 255.0
            feats, new_state = self.bbone.apply(
                {"params": params["bbone"], "batch_stats": batch_stats},
                bbone_in, train=True, mutable=["batch_stats"],
            )
            logits = self.head.apply({"params": params["head"]}, feats)
            l2d, l3d = split_head_logits(logits)
            pred3d = decode_heatmap3d(l3d)
            pred2d = decode_heatmap2d(l2d, scale=float(c - 1))

            def smooth_l1(x, beta=huber_beta):
                a = jnp.abs(x)
                return jnp.where(a < beta, 0.5 * a * a / beta, a - 0.5 * beta)

            loss2d = jnp.mean(smooth_l1((pred2d - gt2d) / c))
            loss3d = jnp.mean(smooth_l1(pred3d - gt3d))
            loss = loss2d + w3d * loss3d
            return loss, ({"loss2d": loss2d, "loss3d": loss3d},
                          new_state["batch_stats"])

        def step(params, batch_stats, opt_state, batch):
            (loss, (aux, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch_stats, batch)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_stats, opt_state, loss, aux

        self._step = jax.jit(step, donate_argnums=(0, 1, 2))

    @property
    def variables(self):
        """{"bbone": full vars, "head": {"params": ...}} — the estimator's
        params["bbone"]/params["head"] slots."""
        return {
            "bbone": {"params": self.params["bbone"], "batch_stats": self.batch_stats},
            "head": {"params": self.params["head"]},
        }

    def train_step(self, batch) -> float:
        batch = jax.tree.map(jnp.asarray, batch)
        self.params, self.batch_stats, self.opt_state, loss, _ = self._step(
            self.params, self.batch_stats, self.opt_state, batch
        )
        return float(loss)


# -------------------------------------------------------------- end-to-end


def train_pose_params(
    frame_hw: Tuple[int, int] = (240, 320),
    intrinsics: Optional[CameraIntrinsics] = None,
    n_steps_det: int = 300,
    n_steps_pose: int = 300,
    batch_size: int = 8,
    yolo_width: float = 0.25,
    yolo_input_size: int = 128,
    crop_size: int = 128,
    stages: Sequence = V2_TINY,
    seed: int = 0,
    lr_det: float = 1e-3,
    lr_pose: float = 1e-3,
    box_jitter: float = 0.08,
    empty_frac: float = 0.12,
    log_every: int = 0,
    init_params: Optional[Dict] = None,
    pose_mode: str = "motions",
    pose_huber_beta: float = 0.05,
    remat: bool = False,
) -> Dict:
    """Train YOLOv4 + EffNetV2 + MetrabsHead on synthetic humanoid scenes
    and return the params dict ``HumanPoseEstimator(params=...)`` consumes.

    The defaults are the CI budget (slim width-0.25 YOLO at 128 px, V2_TINY
    at a 128 crop); production sizes are the same call with
    ``yolo_width=1.0, yolo_input_size=256, crop_size=256, stages=V2_L``.
    ``box_jitter`` feeds the heatmap phase detector-like box noise so the
    crop chain is robust to the live detector's localization error.
    ``init_params``: a previous call's return value — warm-starts both
    trainers from those WEIGHTS (optimizer moments restart fresh, so this
    is fine-tuning/budget-extension semantics, not bit-exact resumption;
    expect a small transient in the first resumed steps). Pass a different
    ``seed`` to draw fresh scenes. PARTIAL dicts are honored: a dict with
    only ``"yolo"`` warm-starts the detector and trains the pose nets from
    scratch (and vice versa) — reuse a proven detector while re-fitting the
    pose branch at a different crop size, whose param shapes would not
    transfer anyway.
    """
    import cv2

    intrinsics = intrinsics or CameraIntrinsics()
    h, w = frame_hw
    norm = np.asarray([w, h, w, h], np.float32)

    det_sampler = SyntheticHumanSampler(frame_hw, intrinsics, seed=seed,
                                        pose_mode=pose_mode)
    det = YoloTrainer(width=yolo_width, input_size=yolo_input_size,
                      seed=seed, lr=lr_det, remat=remat,
                      variables=init_params.get("yolo") if init_params else None)
    for step in range(n_steps_det):
        imgs, boxes, flags = [], [], []
        for _ in range(batch_size):
            person = det_sampler.rng.random() >= empty_frac
            frame, gt = det_sampler.sample(person=person)
            # the estimator resizes with exact INTER_AREA (ops/image.py
            # resize_area == cv2.INTER_AREA) — train on that distribution
            small = cv2.resize(frame, (yolo_input_size, yolo_input_size),
                               interpolation=cv2.INTER_AREA)
            imgs.append(small[..., ::-1] / 255.0)
            boxes.append(gt["bbox"] / norm)
            flags.append(person)
        loss = det.train_step({
            "image": np.asarray(imgs, np.float32),
            "bbox": np.stack(boxes),
            "has_person": np.asarray(flags),
        })
        if log_every and step % log_every == 0:
            print(f"[posestack:det] step {step} loss {loss:.4f}", flush=True)

    # independent sampler: decouples the pose phase's data stream from
    # n_steps_det (the gazefocus budget-decoupling rule)
    pose_sampler = SyntheticHumanSampler(frame_hw, intrinsics, seed=seed + 1,
                                         pose_mode=pose_mode)
    pose_warm = {k for k in ("bbone", "head") if init_params and k in init_params}
    if len(pose_warm) == 1:
        raise ValueError(
            f"init_params has {sorted(pose_warm)} but the pose branch warm-"
            f"start needs BOTH 'bbone' and 'head' (or neither, to train the "
            f"branch from scratch)"
        )
    pose = HeatmapTrainer(
        intrinsics, crop_size=crop_size, stages=stages, seed=seed, lr=lr_pose,
        variables={k: init_params[k] for k in ("bbone", "head")}
        if pose_warm else None,
        huber_beta=pose_huber_beta, remat=remat,
    )
    for step in range(n_steps_pose):
        frames, boxes, joints = [], [], []
        for _ in range(batch_size):
            frame, gt = pose_sampler.sample()
            b = gt["bbox"]
            bw, bh = b[2] - b[0], b[3] - b[1]
            jit = pose_sampler.rng.normal(0, box_jitter, 4) * np.asarray(
                [bw, bh, bw, bh]
            )
            frames.append(frame)
            boxes.append((b + jit).astype(np.float32))
            joints.append(gt["joints3d"])
        loss = pose.train_step({
            "frame": np.asarray(frames, np.uint8),
            "box_px": np.stack(boxes),
            "joints3d": np.stack(joints),
        })
        if log_every and step % log_every == 0:
            print(f"[posestack:pose] step {step} loss {loss:.4f}", flush=True)

    return {"yolo": det.variables, **pose.variables}


# CI operating point shared by the test fixtures (tests/test_posestack.py)
# and tools/synth_workflow.py — one cache entry serves both.
CI_FRAME_HW = (240, 320)
CI_INTRINSICS = CameraIntrinsics(fx=192.0, fy=192.0, ppx=160.0, ppy=120.0,
                                 width=320, height=240)
CI_BUDGETS = dict(n_steps_det=700, n_steps_pose=700, batch_size=8,
                  empty_frac=0.2)

# Cache-key material for the motions-distribution CI fixture (version, key
# builder) — shared by ci_pose_params and the pretrained-bundle registry
# (isbfsar_tpu/pretrained.py), which must recompute the exact digests.
_CI_KEY_V = ("1", lambda: (f"posestack:{CI_INTRINSICS!r}:{CI_FRAME_HW!r}:"
                           f"{sorted(CI_BUDGETS.items())!r}"))


def ci_pose_params():
    """CI-budget trained pose stack, train-once cached on disk.

    Budgets from the round-3 calibration curves: IoU ~0.7, 0-1/20 empty-
    scene false positives, ~0.1 m root-relative joint error on detections
    (see tests/test_posestack.py fixture comment). The cache key matches
    the test fixture's exactly so warm suites and the workflow tool share
    one fit (utils/cache.py cached_params).
    """
    from isbfsar_tpu.utils.cache import cached_params

    return cached_params(
        _CI_KEY_V[1](),
        lambda: train_pose_params(CI_FRAME_HW, CI_INTRINSICS, **CI_BUDGETS),
        version=_CI_KEY_V[0],
    )


# Cache-key material for the diverse CI fixture. The 256 extraction-grade
# fixture warm-starts its detector from this one, so ITS key embeds this
# string — retraining the base (budget or version bump) invalidates both.
_DIVERSE_KEY_V = ("1", lambda: (f"posestack-diverse:{CI_INTRINSICS!r}:"
                                f"{CI_FRAME_HW!r}:{sorted(CI_BUDGETS.items())!r}"))


def diverse_pose_params():
    """CI-budget pose stack trained on the DIVERSE pose distribution.

    Same budgets as :func:`ci_pose_params` but ``pose_mode="diverse"`` —
    random whole-space articulations + the full 16-class action library.
    This is the fit the offline AR workflow extracts with: a net trained
    only on the four MOTIONS collapses out-of-distribution limb placements
    (raised/forward arms come out with near-zero amplitude), which destroys
    the action signal (see random_humanoid_pose). Separate cache entry;
    the round-3 "motions" fixture stays byte-stable."""
    from isbfsar_tpu.utils.cache import cached_params

    return cached_params(
        _DIVERSE_KEY_V[1](),
        lambda: train_pose_params(CI_FRAME_HW, CI_INTRINSICS,
                                  pose_mode="diverse", **CI_BUDGETS),
        version=_DIVERSE_KEY_V[0],
    )


# Production operating point (tools/synth_workflow.py --production, bench.py
# trained headline): full-width YOLOv4 @ 256 with EffNetV2-L @ 256 crop on
# 480x640 frames — the reference's model sizes (utils/params.py yolo/bbone
# engines).
#
# pose_mode="motions" — a MEASURED choice (round 4, docs/PERF.md "Production
# fit recipe"): a diverse-mode production fit at 300 det + 600 pose steps
# evaluated at IoU 0.43 / abs 0.90 m / empty-FP 0.7 and collapsed the
# offline workflow to FS 0.36 — the diverse distribution needs CI-scale
# budgets (700 det + 6000 pose at 1/16 the pixel cost) that cost hours at
# production size. The motions distribution at this budget reproduces the
# round-3 pose_prod3 operating point (IoU 0.68 / abs 0.16 m / FS 0.685)
# with double the pose budget against the extraction-noise ceiling.
PROD_FRAME_HW = (480, 640)
PROD_BUDGETS = dict(n_steps_det=300, n_steps_pose=600, batch_size=8,
                    crop_size=256, seed=3, pose_huber_beta=0.02,
                    pose_mode="motions")

_PROD_KEY_V = ("1", lambda: (
    f"posestack-prod256:{CameraIntrinsics()!r}:{PROD_FRAME_HW!r}:"
    f"{sorted(PROD_BUDGETS.items())!r}:yolo_w1.0:yolo_in256:stages=V2_L"))


def _storage_cast_trunks(params, dt=None):
    """Trunk-bf16 storage cast for a posestack params dict — the
    pipeline._cast_trunk_params policy mirrored at this layout: yolo+bbone
    float weights -> bf16, keeping f32 for BatchNorm statistics, the YOLO
    box-regression output convs (head*_out) and the whole Metrabs decode
    head (soft-argmax amplifies weight rounding; accuracy receipts in
    tests/test_param_dtype.py). Halves the committed bundle entry and
    matches the serving default (PipelineConfig.param_dtype="bfloat16")
    byte-for-byte — load-and-serve with zero conversion."""
    import jax
    import jax.numpy as jnp
    from jax.tree_util import tree_map_with_path

    dt = dt or jnp.bfloat16

    def cast(path, x):
        keys = [str(getattr(k, "key", k)) for k in path]
        trunk = (
            keys[:1] in (["yolo"], ["bbone"])
            and "batch_stats" not in keys
            and not any(k.startswith("head") and k.endswith("_out")
                        for k in keys)
        )
        if trunk and jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return np.asarray(jnp.asarray(x).astype(dt))
        return np.asarray(x)

    return tree_map_with_path(cast, jax.tree.map(np.asarray, params))


def prod_pose_params():
    """Production-size trained pose stack, train-once cached + bundled.

    The fit bench.py's trained headline and the --production offline AR
    workflow run (VERDICT r3 weak #3: the production stack must come OUT
    OF THE BOX — a fresh clone loads this from the pretrained bundle
    instead of paying ~40 min of on-chip training). Stored with bf16
    trunks (see _storage_cast_trunks) — consumers that want full-f32
    storage retrain via tools/train_posestack.py --production."""
    from isbfsar_tpu.utils.cache import cached_params

    def build():
        from isbfsar_tpu.models.effnetv2 import V2_L

        params = train_pose_params(
            PROD_FRAME_HW, CameraIntrinsics(), yolo_width=1.0,
            yolo_input_size=256, stages=V2_L, log_every=50, **PROD_BUDGETS)
        return _storage_cast_trunks(params)

    return cached_params(
        _PROD_KEY_V[1](), build, version=_PROD_KEY_V[0],
    )


# ------------------------------------ detector confidence calibration


def finetune_detector(
    params: Dict,
    frame_hw: Tuple[int, int],
    intrinsics: Optional[CameraIntrinsics] = None,
    *,
    n_steps: int = 200,
    batch_size: int = 8,
    empty_frac: float = 0.5,
    hard_frac: float = 0.7,
    lr: float = 1e-4,
    seed: int = 7,
    yolo_width: float = 1.0,
    yolo_input_size: int = 256,
    pose_mode: str = "motions",
    log_every: int = 0,
    progress_event=None,
) -> Dict:
    """Detector-only confidence-calibration fine-tune on hard empty scenes.

    The round-4 production fit over-fires on person-free scenes (empty-FP
    0.7 at the reference 0.3 gate; docs/PERF.md "Production fit recipe"),
    and a 20+20-scene gate sweep proved it is MIS-CALIBRATION, not
    under-thresholding: person confidence saturates at 1.000 while empty
    scenes read median 0.885 — no gate separates them. Root cause: at
    ``empty_frac=0.12`` the detector sees almost no person-free frames and
    the ordinary rectangle/circle distractors are too easy, so the score
    head never learns that limb-LIKE texture without global body structure
    is background. This is that fix, training-side as the sweep
    prescribed: warm-start ONLY the YOLO branch from an existing fit
    (``params["yolo"]``; bf16-stored trunks are cast up to f32 master
    weights first) and fine-tune at a low rate on a 50% person-free stream
    whose empties are mostly HARD (disarticulated limb strokes + head-like
    discs — render_humanoid_scene ``humanlike_clutter``). Returns the
    updated yolo variables dict; the caller merges it over the base fit
    (the pose branch is untouched by construction).

    Reference analog: hard-negative mining rounds in the detector
    literature; the reference itself never fixes this (its YOLO ships
    COCO-trained, utils/params.py:34 just sets the 0.3 gate).
    """
    import cv2

    intrinsics = intrinsics or CameraIntrinsics()
    h, w = frame_hw
    norm = np.asarray([w, h, w, h], np.float32)

    # f32 master weights: the bundled production entry stores bf16 trunks
    # (_storage_cast_trunks); fine-tuning in bf16 would quantize every
    # update to ~8 mantissa bits
    yolo = jax.tree.map(
        lambda x: np.asarray(x, np.float32)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else np.asarray(x),
        params["yolo"],
    )
    det = YoloTrainer(width=yolo_width, input_size=yolo_input_size,
                      seed=seed, lr=lr, variables=yolo)
    sampler = SyntheticHumanSampler(frame_hw, intrinsics, seed=seed + 100,
                                    pose_mode=pose_mode)
    for step in range(n_steps):
        imgs, boxes, flags = [], [], []
        for _ in range(batch_size):
            person = sampler.rng.random() >= empty_frac
            hard = (not person) and sampler.rng.random() < hard_frac
            frame, gt = sampler.sample(person=person, hard=hard)
            small = cv2.resize(frame, (yolo_input_size, yolo_input_size),
                               interpolation=cv2.INTER_AREA)
            imgs.append(small[..., ::-1] / 255.0)
            boxes.append(gt["bbox"] / norm)
            flags.append(person)
        loss = det.train_step({
            "image": np.asarray(imgs, np.float32),
            "bbox": np.stack(boxes),
            "has_person": np.asarray(flags),
        })
        if progress_event is not None and step == 0:
            # relay-wedge watchdog hook: a FETCHED first loss proves the
            # device round-trip is live — block_until_ready is not a relay
            # barrier and dispatch alone proves nothing (NEXT.md round-4
            # gotcha; tools/extend_calib.py arms the watchdog)
            float(loss)
            progress_event.set()
        if log_every and step % log_every == 0:
            print(f"[posestack:calib] step {step} loss {loss:.4f}", flush=True)
    return det.variables


# Calibration budgets for the production fit (measured on-chip, receipts in
# docs/PERF.md "Empty-scene FP fine-tune"). lr follows the proven
# warm-start fine-tune rate (tools/train_posestack.py --lr-det help).
PROD_CALIB_BUDGETS = dict(n_steps=200, batch_size=8, empty_frac=0.5,
                          hard_frac=0.7, lr=1e-4, seed=7)

# The delta entry's key embeds the BASE production fit's key: retraining
# the base invalidates the calibration delta too (same discipline as
# _DIVERSE256_KEY_V).
def prod_calib_key(budgets: Dict) -> str:
    """Cache key for a prod detector-calibration delta at ``budgets``.

    The ONE key constructor — used by the shipped entry (via
    ``_PROD_CALIB_KEY_V``) and by ``tools/extend_calib.py --seed-cache``,
    which pre-seeds a candidate under the key these budgets WOULD get so
    bundling after a `PROD_CALIB_BUDGETS` update never retrains."""
    return (f"posestack-prod256-calib:{sorted(budgets.items())!r}:"
            f"base=v{_PROD_KEY_V[0]}:{_PROD_KEY_V[1]()}")


_PROD_CALIB_KEY_V = ("1", lambda: prod_calib_key(PROD_CALIB_BUDGETS))


def prod_detector_calib_delta() -> Dict:
    """The calibrated YOLO branch for the production fit — a DELTA entry.

    Cached/bundled as ``{"yolo": variables}`` only (~135 MB bf16) rather
    than a second full fit (~368 MB): the pose branch is untouched by the
    fine-tune, so :func:`prod_pose_params_calib` merges this over the base
    ``pose-prod-256`` entry at load time."""
    from isbfsar_tpu.utils.cache import cached_params

    def build():
        base = prod_pose_params()
        yolo = finetune_detector(
            base, PROD_FRAME_HW, CameraIntrinsics(), yolo_width=1.0,
            yolo_input_size=256, pose_mode="motions", log_every=25,
            **PROD_CALIB_BUDGETS)
        return _storage_cast_trunks({"yolo": yolo})

    return cached_params(
        _PROD_CALIB_KEY_V[1](), build, version=_PROD_CALIB_KEY_V[0],
    )


def prod_pose_params_calib() -> Dict:
    """Production pose stack with the empty-scene-calibrated detector.

    What bench.py's trained headline, the live service, and the
    --production offline workflow load: the :func:`prod_pose_params` base
    with its YOLO branch replaced by the hard-negative fine-tune
    (:func:`finetune_detector`; receipts in docs/PERF.md "Empty-scene FP
    fine-tune")."""
    return {**prod_pose_params(), **prod_detector_calib_delta()}


# CI-size calibration: same recipe at the test operating point. Measured
# effect on the CI fit (tests/test_posestack.py::TestDetectorCalibration):
# hard-empty FP 15/15 @ conf median 0.999 -> 5/15 @ conf max 0.49, person
# found-rate 15/15 / IoU 0.67 / rel err 0.089 m unharmed.
CI_CALIB_BUDGETS = dict(n_steps=120, batch_size=8, empty_frac=0.5,
                        hard_frac=0.7, lr=1e-4, seed=7)

_CI_CALIB_KEY_V = ("1", lambda: (
    f"posestack-ci-calib:{sorted(CI_CALIB_BUDGETS.items())!r}:"
    f"base=v{_CI_KEY_V[0]}:{_CI_KEY_V[1]()}"))


def ci_detector_calib_delta() -> Dict:
    """Calibrated YOLO branch for the CI fit — a delta entry like
    :func:`prod_detector_calib_delta` (f32: the CI entries all are)."""
    from isbfsar_tpu.utils.cache import cached_params

    def build():
        yolo = finetune_detector(
            ci_pose_params(), CI_FRAME_HW, CI_INTRINSICS,
            yolo_width=0.25, yolo_input_size=128, pose_mode="motions",
            **CI_CALIB_BUDGETS)
        return {"yolo": yolo}

    return cached_params(
        _CI_CALIB_KEY_V[1](), build, version=_CI_CALIB_KEY_V[0],
    )


def ci_pose_params_calib() -> Dict:
    """CI pose stack with the empty-scene-calibrated detector."""
    return {**ci_pose_params(), **ci_detector_calib_delta()}


# Extraction-grade budgets: the offline AR workflow needs the estimator to
# TRACK motion, not just localize pose. Round-3 tracking-slope study (regress
# root-relative estimate deviations on GT deviations over a clip): the 128-
# crop fits read out through a 4x4 heatmap whose quantization collapses
# temporal signal — slope 0.14 at the CI budget, 0.33 after 3000 extra steps
# (tight huber_beta=0.02). Doubling decode resolution (crop 256 -> 8x8, the
# same lever that tightened ABSOLUTE error 3.3x for the production fit) with
# a 6000-step pose-only fit reaches slope ~0.5 and lifts extracted-tree 1-NN
# class separability 0.36 -> 0.71 (GT-joint ceiling 0.98) — enough signal for
# episodic TRX training (tools/synth_workflow.py). The detector is reused
# from :func:`diverse_pose_params` (partial init_params warm-start); only the
# pose branch is refit at the larger crop.
CI_EXTRACT_BUDGETS = dict(n_steps_det=0, n_steps_pose=6000, batch_size=8,
                          crop_size=256, seed=12, pose_huber_beta=0.02)

# Cache-key material for the extraction-grade fixture (see _CI_KEY_V note).
# The key embeds the diverse BASE fixture's key: the detector is warm-
# started from it, so a base retrain must invalidate this entry too.
_DIVERSE256_KEY_V = ("1", lambda: (
    f"posestack-diverse256:{CI_INTRINSICS!r}:{CI_FRAME_HW!r}:"
    f"{sorted(CI_EXTRACT_BUDGETS.items())!r}:"
    f"base=v{_DIVERSE_KEY_V[0]}:{_DIVERSE_KEY_V[1]()}"))


def diverse_pose_params_256():
    """Extraction-grade diverse fit: 256 crop (8x8 decode), 6000 pose steps.

    The fit the offline AR workflow uses (see CI_EXTRACT_BUDGETS rationale).
    Train-once cached; ~22 min cold on the TPU, longer on CPU — warm suites
    load it from the params cache like every other trained fixture."""
    from isbfsar_tpu.utils.cache import cached_params

    def build():
        base = diverse_pose_params()
        return train_pose_params(CI_FRAME_HW, CI_INTRINSICS,
                                 pose_mode="diverse",
                                 init_params={"yolo": base["yolo"]},
                                 **CI_EXTRACT_BUDGETS)

    return cached_params(
        _DIVERSE256_KEY_V[1](), build, version=_DIVERSE256_KEY_V[0],
    )


def evaluate_pose_stack(
    estimator,
    frame_hw: Tuple[int, int],
    intrinsics: CameraIntrinsics,
    n_scenes: int = 15,
    n_empty: int = 10,
    seed: int = 1000,
    n_hard_empty: int = 0,
) -> Dict[str, float]:
    """Fresh-scene receipt for a trained estimator at ITS configured gate.

    Runs ``n_scenes`` person scenes + ``n_empty`` person-free scenes from a
    NEW sampler seed through the full live program (``_estimate_jit``) and
    returns every number the receipts in docs/PERF.md track:

    - ``found_rate``, ``iou_mean``/``iou_min`` (detector quality),
    - ``rel_err_m`` — root-relative joint error in meters (what the AR
      consumer sees, pipeline.py rel_pose),
    - ``abs_err_m`` — ABSOLUTE camera-space joint error (pose * 2.5 m vs GT;
      dominated by the 2D decode resolution — the crop's heatmap grid),
    - ``dist_err_m`` — metric distance error (reference main.py:102),
    - ``empty_fp_rate`` — detections on person-free scenes (plus the
      calibration stats ``empty_conf_median``/``empty_conf_max`` and
      ``person_conf_min`` — the gate-sweep separability story in one row),
    - ``hard_empty_fp_rate`` — same on ``n_hard_empty`` person-free scenes
      with disarticulated body-part clutter (the fine-tune's hard
      negatives; 0 scenes by default to keep older receipts comparable).
    """
    from isbfsar_tpu.utils.skeleton import get_skeleton, load_expand_joints

    jm = load_expand_joints("")[:, list(get_skeleton("smpl+head_30").indices)]

    def _iou(a, b):
        lt = np.maximum(a[:2], b[:2])
        rb = np.minimum(a[2:], b[2:])
        wh = np.maximum(rb - lt, 0)
        inter = wh[0] * wh[1]
        ua = ((a[2] - a[0]) * (a[3] - a[1])
              + (b[2] - b[0]) * (b[3] - b[1]) - inter)
        return float(inter / (ua + 1e-9))

    s = SyntheticHumanSampler(frame_hw, intrinsics, seed=seed)
    found_n = 0
    ious, rel_errs, abs_errs, dist_errs, person_confs = [], [], [], [], []
    for _ in range(n_scenes):
        frame, gt = s.sample()
        pose, bbox, conf, found, visible = jax.device_get(
            estimator._estimate_jit(estimator.params, frame)
        )
        person_confs.append(float(conf))
        if not (bool(found) and bool(visible)):
            continue
        found_n += 1
        x1, x2, y1, y2 = bbox
        ious.append(_iou(np.asarray([x1, y1, x2, y2], float), gt["bbox"]))
        gt30 = np.einsum("jc,jn->nc", gt["joints3d"], jm)
        pose_m = np.asarray(pose) * BOX_SIZE_M
        rel_errs.append(float(np.linalg.norm(
            (pose_m - pose_m[0]) - (gt30 - gt30[0]), axis=-1).mean()))
        abs_errs.append(float(np.linalg.norm(pose_m - gt30, axis=-1).mean()))
        dist_errs.append(abs(float(
            np.linalg.norm(pose_m[0]) - np.linalg.norm(gt30[0]))))

    def count_fps(n, hard):
        fp, confs = 0, []
        for _ in range(n):
            frame, _ = s.sample(person=False, hard=hard)
            _, _, conf, found, _ = jax.device_get(
                estimator._estimate_jit(estimator.params, frame)
            )
            fp += int(bool(found))
            confs.append(float(conf))
        return fp, confs

    fp, empty_confs = count_fps(n_empty, hard=False)
    hard_fp, hard_confs = count_fps(n_hard_empty, hard=True)

    def m(x):
        return float(np.mean(x)) if x else float("nan")

    out = {
        "n_scenes": n_scenes,
        "found_rate": found_n / max(n_scenes, 1),
        "iou_mean": m(ious),
        "iou_min": float(np.min(ious)) if ious else float("nan"),
        "rel_err_m": m(rel_errs),
        "abs_err_m": m(abs_errs),
        "dist_err_m": m(dist_errs),
        "empty_fp_rate": fp / max(n_empty, 1),
        "empty_conf_median": float(np.median(empty_confs)) if empty_confs else float("nan"),
        "empty_conf_max": float(np.max(empty_confs)) if empty_confs else float("nan"),
        "person_conf_min": float(np.min(person_confs)) if person_confs else float("nan"),
    }
    if n_hard_empty:
        out["hard_empty_fp_rate"] = hard_fp / n_hard_empty
        out["hard_empty_conf_max"] = float(np.max(hard_confs))
    return out
