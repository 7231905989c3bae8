"""Detection postprocessing: fixed-shape NMS + YOLO output decoding.

TPU-native replacement for the reference's host-side numpy hot loop
(reference modules/hpe/utils/misc.py:27-107): greedy IoU NMS over the
highest-confidence detections and person-box selection, all inside one XLA
program with static shapes (the CPU loop `while order.size > 0` becomes a
masked ``lax.fori_loop`` over a top-K prefix).

Two entry points:

- :func:`postprocess_yolo` — full parity with the reference's
  ``postprocess_yolo_output``: per-class threshold + NMS, returning a padded
  (max_det, 6) [x1, y1, x2, y2, conf, cls] tensor + validity mask.
- :func:`best_person_box` — the pipeline fast path. The reference keeps only
  the highest-probability person box after NMS (hpe.py:63-73); greedy NMS
  never suppresses the top-scoring box of a class, so that choice equals the
  plain argmax over person-class confidences above threshold. We exploit that
  identity: O(n) instead of O(n^2), bit-identical final pose.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU for (n, 4) [x1, y1, x2, y2] boxes -> (n, n)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(0.0, xx2 - xx1) * jnp.maximum(0.0, yy2 - yy1)
    union = areas[:, None] + areas[None, :] - inter
    return inter / union


def nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float = 0.7,
) -> jnp.ndarray:
    """Greedy NMS over a fixed-size candidate set.

    boxes: (n, 4), scores: (n,), valid: (n,) bool. Candidates must already be
    sorted by descending score (use :func:`top_candidates`). Returns (n,) bool
    keep mask. Matches the reference's ``nms_cpu`` (misc.py:27-61): a box is
    kept iff no higher-scoring kept box overlaps it with IoU > thresh.
    """
    n = boxes.shape[0]
    iou = iou_matrix(boxes)

    def body(i, keep):
        # Suppress i if any kept j < i overlaps too much.
        overlap = jnp.logical_and(iou[i] > iou_thresh, keep)
        suppressed = jnp.any(jnp.logical_and(overlap, jnp.arange(n) < i))
        keep_i = jnp.logical_and(valid[i], jnp.logical_not(suppressed))
        return keep.at[i].set(keep_i)

    return jax.lax.fori_loop(0, n, body, jnp.zeros((n,), jnp.bool_))


def top_candidates(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Select the top-k scored boxes under ``mask`` (descending order)."""
    masked = jnp.where(mask, scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(masked, k)
    return boxes[idx], top_scores, jnp.isfinite(top_scores)


def postprocess_yolo(
    boxes: jnp.ndarray,
    confidences: jnp.ndarray,
    conf_thresh: float = 0.3,
    nms_thresh: float = 0.7,
    max_det: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode YOLO outputs into padded detections (reference misc.py:64-107).

    boxes: (n, 4) or (1, n, 1, 4) normalized [x1, y1, x2, y2];
    confidences: (n, 80) or (1, n, 80) per-class scores.
    Returns (detections (max_det, 6) [x1, y1, x2, y2, conf, cls], valid (max_det,)).

    Reference semantics: per anchor take the max-confidence class, threshold,
    then per-class NMS. The reference only ever queries class 0 with
    ``num_classes=1`` (misc.py:64, hpe.py:61-67), so we NMS the person class;
    extending to all classes is a vmap over the class axis.
    """
    boxes = boxes.reshape(-1, 4)
    confidences = confidences.reshape(boxes.shape[0], -1)
    max_conf = jnp.max(confidences, axis=1)
    max_id = jnp.argmax(confidences, axis=1)

    person = jnp.logical_and(max_conf > conf_thresh, max_id == 0)
    cand_boxes, cand_scores, cand_valid = top_candidates(boxes, max_conf, person, max_det)
    keep = nms_fixed(cand_boxes, cand_scores, cand_valid, nms_thresh)

    dets = jnp.concatenate(
        [
            cand_boxes,
            jnp.where(cand_valid, cand_scores, 0.0)[:, None],
            jnp.zeros((max_det, 1), cand_boxes.dtype),
        ],
        axis=1,
    )
    return dets, keep


def best_person_box(
    boxes: jnp.ndarray,
    confidences: jnp.ndarray,
    conf_thresh: float = 0.3,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Highest-confidence person box — the pipeline fast path.

    Returns (box (4,) normalized coords, conf scalar, found flag). Equals the
    reference's post-NMS highest-probability human (hpe.py:63-73) because
    greedy NMS always keeps the top-scored box.
    """
    boxes = boxes.reshape(-1, 4)
    confidences = confidences.reshape(boxes.shape[0], -1)
    max_conf = jnp.max(confidences, axis=1)
    max_id = jnp.argmax(confidences, axis=1)
    person_conf = jnp.where(max_id == 0, max_conf, -jnp.inf)
    best = jnp.argmax(person_conf)
    conf = person_conf[best]
    found = conf > conf_thresh
    return boxes[best], jnp.where(found, conf, 0.0), found
