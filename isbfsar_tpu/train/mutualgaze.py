"""Mutual-gaze ("is looking at me") classifier training + evaluation.

Rebuild of the reference's focus-detection training stack (reference
modules/focus/mutual_gaze/focus_detection/): the session-split MARIA loader
(my_dataloader.py:24-97), flip/rotation augmentation (augmentations.py:1-101),
the 5-session cross-validation trainer with best-F1 checkpointing
(train.py:14-200), the stored-accuracy test (test.py) and the heuristic
evaluation over an annotated eye-contact set (gaze_estimation/utils/
test_on_maria_dataset.py:1-125).

TPU-native: backbone + binary head in one jit'd BCE step; augmentation on
the host in numpy; cross-validation = the same trainer over rotating session
splits.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from isbfsar_tpu.configs import MutualGazeConfig
from isbfsar_tpu.models.detection import BinaryGazeClassifier
from isbfsar_tpu.models.resnet import resnet18, resnet50
from isbfsar_tpu.utils import checkpoint as ckpt
from isbfsar_tpu.utils.metrics import MetricsLogger, binary_prf


class WatchingDataset:
    """Directory-of-crops dataset: root/<session>/<label 0|1>/*.png
    (the reference's participant-session NPZ splits reduce to the same
    (crop, label, session) triples, my_dataloader.py:24-97)."""

    def __init__(self, root: str, sessions: Optional[List[str]] = None, crop_size: int = 224):
        self.crop_size = crop_size
        self.items: List[Tuple[str, int]] = []
        for session in sessions or sorted(os.listdir(root)):
            for label in ("0", "1"):
                d = os.path.join(root, session, label)
                if not os.path.isdir(d):
                    continue
                for f in sorted(os.listdir(d)):
                    self.items.append((os.path.join(d, f), int(label)))

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, int]:
        import cv2

        path, label = self.items[i]
        img = cv2.resize(cv2.imread(path), (self.crop_size, self.crop_size))
        return (img[..., ::-1] / 255.0).astype(np.float32), label


def augment_flip(img: np.ndarray, label: int, rng: np.random.Generator):
    """Horizontal flip preserves the looking-at-me label (reference
    augmentations.py)."""
    if rng.random() < 0.5:
        return img[:, ::-1].copy(), label
    return img, label


def session_splits(sessions: List[str]) -> Iterator[Tuple[List[str], List[str]]]:
    """Leave-one-session-out cross-validation splits (reference train.py)."""
    for held in sessions:
        yield [s for s in sessions if s != held], [held]


class MutualGazeTrainer:
    def __init__(self, config: MutualGazeConfig, seed: int = 0, log_dir: str = "runs/mutualgaze"):
        self.config = config
        self.backbone = resnet50() if config.backbone == "resnet50" else resnet18()
        self.head = BinaryGazeClassifier()
        self.logger = MetricsLogger(log_dir, use_wandb=False)
        feat_dim = 2048 if config.backbone == "resnet50" else 512
        size = config.crop_size

        @jax.jit
        def init(key):
            k1, k2 = jax.random.split(key)
            bb = self.backbone.init(k1, jnp.zeros((1, size, size, 3)))
            hd = self.head.init(k2, jnp.zeros((1, feat_dim)))
            # split weights from BN running stats: stats update through the
            # train-mode forward (mutable collection), NOT via Adam as if
            # they were weights — and the forward must normalize with batch
            # statistics (frozen init stats never normalize; the gazefocus
            # trainers document the same rule)
            return (
                {"backbone": bb["params"], "head": hd["params"]},
                {"backbone": bb.get("batch_stats", {})},
            )

        self._init = init
        self.optimizer = optax.adam(config.lr)
        self.reset(seed)

        def loss_fn(params, batch_stats, images, labels):
            feats, new_state = self.backbone.apply(
                {"params": params["backbone"], "batch_stats": batch_stats["backbone"]},
                images, train=True, mutable=["batch_stats"],
            )
            pred = self.head.apply({"params": params["head"]}, feats)[:, 0]
            p = jnp.clip(pred, 1e-6, 1 - 1e-6)
            loss = -jnp.mean(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
            return loss, (pred, {"backbone": new_state["batch_stats"]})

        def step(params, batch_stats, opt_state, images, labels):
            (loss, (pred, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch_stats, images, labels)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_stats, opt_state, loss, pred

        self._step = jax.jit(step, donate_argnums=(0, 1, 2))
        self._predict = jax.jit(lambda p, st, x: self.head.apply(
            {"params": p["head"]},
            self.backbone.apply(
                {"params": p["backbone"], "batch_stats": st["backbone"]}, x
            ))[:, 0])

    def reset(self, seed: int = 0) -> None:
        """Fresh params + optimizer state (a new model, reference train.py
        builds one per session)."""
        self.params, self.batch_stats = self._init(jax.random.key(seed))
        self.opt_state = self.optimizer.init(self.params)

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    def train_epoch(self, dataset, batch_size: int = 8, augment: bool = True,
                    seed: int = 0) -> float:
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(dataset))
        losses = []
        for i in range(0, len(order) - batch_size + 1, batch_size):
            imgs, labels = [], []
            for j in order[i : i + batch_size]:
                img, label = dataset[int(j)]
                if augment:
                    img, label = augment_flip(img, label, rng)
                imgs.append(img)
                labels.append(label)
            self.params, self.batch_stats, self.opt_state, loss, _ = self._step(
                self.params, self.batch_stats, self.opt_state,
                jnp.asarray(np.stack(imgs)), jnp.asarray(np.asarray(labels, np.float32)),
            )
            losses.append(float(loss))
        return float(np.mean(losses)) if losses else 0.0

    def evaluate(self, dataset, batch_size: int = 8) -> Dict[str, float]:
        trues, preds = [], []
        for i in range(0, len(dataset), batch_size):
            items = [dataset[j] for j in range(i, min(i + batch_size, len(dataset)))]
            imgs = jnp.asarray(np.stack([it[0] for it in items]))
            pred = np.asarray(self._predict(self.params, self.batch_stats, imgs))
            preds.append(pred > 0.5)
            trues.append(np.asarray([it[1] for it in items], bool))
        return binary_prf(np.concatenate(trues), np.concatenate(preds))

    def cross_validate(self, root: str, n_epochs: int = 1, batch_size: int = 8,
                       ckpt_dir: Optional[str] = None,
                       augment: bool = True) -> List[Dict[str, float]]:
        """Leave-one-session-out CV with best-F1 checkpointing (train.py:14-200)."""
        sessions = sorted(os.listdir(root))
        results = []
        for fold, (train_s, test_s) in enumerate(session_splits(sessions)):
            # Fresh model per fold (reference train.py:70-76 constructs a new
            # Model each session) — carrying weights across folds would let
            # fold k test on sessions folds <k already trained on.
            self.reset(seed=fold)
            train_data = WatchingDataset(root, train_s, self.config.crop_size)
            test_data = WatchingDataset(root, test_s, self.config.crop_size)
            best_f1 = -1.0
            for epoch in range(n_epochs):
                loss = self.train_epoch(train_data, batch_size, augment=augment,
                                        seed=epoch)
                metrics = self.evaluate(test_data, batch_size)
                self.logger.log({"fold": fold, "loss": loss, **metrics}, step=epoch)
                if ckpt_dir and metrics["f1"] > best_f1:
                    best_f1 = metrics["f1"]
                    ckpt.save_checkpoint(
                        ckpt_dir, fold, self.variables,
                        meta={"fold": fold, "f1": metrics["f1"]},
                    )
            results.append(self.evaluate(test_data, batch_size))
        return results


def evaluate_gaze_heuristic(detector, labeled_frames) -> Dict[str, float]:
    """Run the gaze-estimation FocusDetector heuristic over annotated frames
    ((frame, is_focused) pairs) and score it — the reference's
    test_on_maria_dataset.py:1-125 protocol."""
    trues, preds = [], []
    for frame, label in labeled_frames:
        res = detector.estimate(frame)
        if res is None:
            continue
        focus, _ = res
        preds.append(bool(focus))
        trues.append(bool(label))
    return binary_prf(np.asarray(trues), np.asarray(preds))
