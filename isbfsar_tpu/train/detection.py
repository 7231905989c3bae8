"""Head-detector training: datasets + single-stage detection loss.

Rebuild of the reference's head-detection finetuning stack (reference
modules/focus/mutual_gaze/head_detection/: finetune.py:32-168 torchvision
detection-reference loop, SCUTDataset.py:16-90 Pascal-VOC XML parsing, and
~1.3k LoC of vendored torchvision engine/transforms/coco_eval helpers).

TPU-native formulation: the detector is single-stage (models/detection.py),
so the vendored two-stage training machinery collapses into one jit'd step:

- assignment: for each ground-truth box, the highest-IoU decoded prediction
  is positive (score target 1, box L1); predictions under ``neg_iou`` to all
  GT are negatives (score target 0); the rest are ignored. Static shapes via
  a fixed ``max_boxes`` GT pad + validity mask.
- loss: BCE on scores + smooth-L1 on positive box coords, batched over the
  ``dp`` mesh axis like the AR trainer.

:class:`VOCHeadDataset` parses Pascal-VOC XML annotations (the SCUT-HEAD
format the reference finetunes on).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from isbfsar_tpu.configs import MutualGazeConfig
from isbfsar_tpu.models.detection import HeadDetectorNet


class VOCHeadDataset:
    """Pascal-VOC XML head boxes (SCUT-HEAD layout: JPEGImages/ +
    Annotations/*.xml; reference SCUTDataset.py:16-90)."""

    def __init__(self, root: str, image_size: int = 256, max_boxes: int = 16):
        self.root = root
        self.image_size = image_size
        self.max_boxes = max_boxes
        ann_dir = os.path.join(root, "Annotations")
        self.ids = sorted(os.path.splitext(f)[0] for f in os.listdir(ann_dir) if f.endswith(".xml"))

    def __len__(self) -> int:
        return len(self.ids)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        import cv2

        name = self.ids[i]
        tree = ET.parse(os.path.join(self.root, "Annotations", f"{name}.xml"))
        root = tree.getroot()
        size = root.find("size")
        w = float(size.find("width").text)
        h = float(size.find("height").text)

        boxes = []
        for obj in root.findall("object"):
            bb = obj.find("bndbox")
            boxes.append(
                [
                    float(bb.find("xmin").text) / w,
                    float(bb.find("ymin").text) / h,
                    float(bb.find("xmax").text) / w,
                    float(bb.find("ymax").text) / h,
                ]
            )
        boxes = np.asarray(boxes[: self.max_boxes], np.float32).reshape(-1, 4)
        padded = np.zeros((self.max_boxes, 4), np.float32)
        padded[: len(boxes)] = boxes
        valid = np.zeros(self.max_boxes, bool)
        valid[: len(boxes)] = True

        img = cv2.imread(os.path.join(self.root, "JPEGImages", f"{name}.jpg"))
        img = cv2.resize(img, (self.image_size, self.image_size))
        return {"image": (img[..., ::-1] / 255.0).astype(np.float32), "boxes": padded, "valid": valid}


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU between (n, 4) and (m, 4) boxes -> (n, m)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-9)


def detection_loss(
    pred_boxes: jnp.ndarray,
    pred_scores: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    neg_iou: float = 0.3,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Single image: pred (n,4)/(n,), gt (m,4) with (m,) validity."""
    iou = pairwise_iou(pred_boxes, gt_boxes)  # (n, m)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)

    best_pred = jnp.argmax(iou, axis=0)  # (m,) best prediction per GT
    # Invalid (padding) GTs all argmax to prediction 0; scattering their
    # False there could nondeterministically erase a REAL positive at
    # index 0 (duplicate-index scatter order is unspecified). Route them to
    # an out-of-range index dropped by the scatter instead.
    n = pred_scores.shape[0]
    safe_pred = jnp.where(gt_valid, best_pred, n)
    pos_mask = jnp.zeros(n, bool).at[safe_pred].set(True, mode="drop")
    max_iou = jnp.max(iou, axis=1)
    neg_mask = jnp.logical_and(max_iou < neg_iou, jnp.logical_not(pos_mask))

    p = jnp.clip(pred_scores, 1e-6, 1 - 1e-6)
    score_loss = -(
        jnp.sum(jnp.log(p) * pos_mask) + jnp.sum(jnp.log(1 - p) * neg_mask)
    ) / jnp.maximum(jnp.sum(pos_mask) + jnp.sum(neg_mask), 1.0)

    matched = pred_boxes[best_pred]  # (m, 4)
    l1 = jnp.abs(matched - gt_boxes)
    box_loss = jnp.sum(
        jnp.where(l1 < 1.0, 0.5 * l1 * l1, l1 - 0.5) * gt_valid[:, None]
    ) / jnp.maximum(jnp.sum(gt_valid) * 4, 1.0)

    return score_loss + box_loss, {"score_loss": score_loss, "box_loss": box_loss}


class DetectorTrainer:
    def __init__(self, config: MutualGazeConfig, input_size: int = 256, seed: int = 0,
                 lr: float = 1e-4):
        self.net = HeadDetectorNet()
        self.input_size = input_size
        variables = jax.jit(
            lambda k: self.net.init(k, jnp.zeros((1, input_size, input_size, 3)))
        )(jax.random.key(seed))
        # split params from BN stats: stats must update via the train-mode
        # forward (mutable), NOT receive Adam updates as if they were
        # weights, and the forward must normalize with batch statistics —
        # the gazefocus trainers' rule ("frozen init stats barely learns")
        self._stats0 = variables.get("batch_stats", {})
        self.params = {"params": variables["params"]}
        self.batch_stats = dict(self._stats0)
        self.optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
        self.opt_state = self.optimizer.init(self.params)

        def loss_fn(params, batch_stats, batch):
            if batch_stats:
                (boxes, scores), new_state = self.net.apply(
                    {"params": params["params"], "batch_stats": batch_stats},
                    batch["image"], train=True, mutable=["batch_stats"],
                )
                new_stats = new_state["batch_stats"]
            else:
                boxes, scores = self.net.apply(params, batch["image"])
                new_stats = batch_stats
            losses, aux = jax.vmap(detection_loss)(
                boxes, scores, batch["boxes"], batch["valid"]
            )
            return jnp.mean(losses), (jax.tree.map(jnp.mean, aux), new_stats)

        def step(params, batch_stats, opt_state, batch):
            (loss, (aux, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch_stats, batch)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_stats, opt_state, loss, aux

        self._step = jax.jit(step, donate_argnums=(0, 1, 2))

    @property
    def variables(self):
        v = dict(self.params)
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    def train_step(self, batch: Dict[str, np.ndarray]) -> float:
        batch = jax.tree.map(jnp.asarray, batch)
        self.params, self.batch_stats, self.opt_state, loss, _ = self._step(
            self.params, self.batch_stats, self.opt_state, batch
        )
        return float(loss)

    def fit(self, dataset, n_epochs: int = 1, batch_size: int = 4) -> List[float]:
        losses = []
        for _ in range(n_epochs):
            for i in range(0, len(dataset) - batch_size + 1, batch_size):
                items = [dataset[j] for j in range(i, i + batch_size)]
                batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
                losses.append(self.train_step(batch))
        return losses
