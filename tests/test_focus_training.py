"""Tests for the head-detector and mutual-gaze training harnesses."""

import dataclasses
import os

import numpy as np
import pytest

from isbfsar_tpu.configs import MutualGazeConfig
from isbfsar_tpu.train.detection import (
    DetectorTrainer,
    VOCHeadDataset,
    detection_loss,
    pairwise_iou,
)
from isbfsar_tpu.train.mutualgaze import (
    MutualGazeTrainer,
    WatchingDataset,
    evaluate_gaze_heuristic,
    session_splits,
)


def _write_voc_sample(root, name, boxes, size=64):
    import cv2

    os.makedirs(os.path.join(root, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    objs = "".join(
        f"<object><name>head</name><bndbox>"
        f"<xmin>{x1*size}</xmin><ymin>{y1*size}</ymin>"
        f"<xmax>{x2*size}</xmax><ymax>{y2*size}</ymax></bndbox></object>"
        for x1, y1, x2, y2 in boxes
    )
    xml = (
        f"<annotation><size><width>{size}</width><height>{size}</height>"
        f"<depth>3</depth></size>{objs}</annotation>"
    )
    with open(os.path.join(root, "Annotations", f"{name}.xml"), "w") as f:
        f.write(xml)
    img = np.zeros((size, size, 3), np.uint8)
    for x1, y1, x2, y2 in boxes:
        img[int(y1 * size): int(y2 * size), int(x1 * size): int(x2 * size)] = 255
    cv2.imwrite(os.path.join(root, "JPEGImages", f"{name}.jpg"), img)


class TestDetectionTraining:
    def test_voc_parsing(self, tmp_path):
        root = str(tmp_path)
        _write_voc_sample(root, "a", [(0.1, 0.1, 0.4, 0.5), (0.6, 0.6, 0.9, 0.9)])
        ds = VOCHeadDataset(root, image_size=64, max_boxes=4)
        assert len(ds) == 1
        item = ds[0]
        assert item["image"].shape == (64, 64, 3)
        assert item["valid"].sum() == 2
        np.testing.assert_allclose(item["boxes"][0], [0.1, 0.1, 0.4, 0.5], atol=1e-6)

    def test_pairwise_iou(self):
        import jax.numpy as jnp

        a = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
        b = jnp.asarray([[0.0, 0.0, 0.5, 1.0], [2.0, 2.0, 3.0, 3.0]])
        iou = np.asarray(pairwise_iou(a, b))
        np.testing.assert_allclose(iou[0], [0.5, 0.0], atol=1e-6)

    def test_trainer_loss_decreases(self, tmp_path):
        root = str(tmp_path)
        for i in range(4):
            _write_voc_sample(root, f"s{i}", [(0.2, 0.2, 0.6, 0.7)])
        ds = VOCHeadDataset(root, image_size=64, max_boxes=4)
        trainer = DetectorTrainer(MutualGazeConfig(), input_size=64, lr=1e-4)
        losses = trainer.fit(ds, n_epochs=8, batch_size=4)
        assert min(losses[-3:]) < losses[0]
        assert np.isfinite(losses).all()


def _make_watching_dataset(root, n_per=3, size=32):
    import cv2

    for session in ("s0", "s1"):
        for label in (0, 1):
            d = os.path.join(root, session, str(label))
            os.makedirs(d, exist_ok=True)
            for i in range(n_per):
                img = np.full((size, size, 3), 40 + 180 * label, np.uint8)
                cv2.imwrite(os.path.join(d, f"{i}.png"), img)


class TestMutualGazeTraining:
    def test_session_splits(self):
        splits = list(session_splits(["a", "b", "c"]))
        assert len(splits) == 3
        assert splits[0] == (["b", "c"], ["a"])

    def test_train_and_evaluate(self, tmp_path):
        root = str(tmp_path)
        _make_watching_dataset(root)
        cfg = dataclasses.replace(MutualGazeConfig(), crop_size=32, lr=1e-3)
        trainer = MutualGazeTrainer(cfg, log_dir=str(tmp_path / "log"))
        ds = WatchingDataset(root, crop_size=32)
        assert len(ds) == 12
        first = trainer.train_epoch(ds, batch_size=4, seed=0)
        for e in range(1, 6):
            last = trainer.train_epoch(ds, batch_size=4, seed=e)
        assert last < first  # trivially separable labels
        metrics = trainer.evaluate(ds, batch_size=4)
        assert metrics["accuracy"] > 0.6

    def test_cross_validation_runs(self, tmp_path):
        root = str(tmp_path / "data")
        _make_watching_dataset(root, n_per=2)
        cfg = dataclasses.replace(MutualGazeConfig(), crop_size=32, lr=1e-3)
        trainer = MutualGazeTrainer(cfg, log_dir=str(tmp_path / "log"))
        results = trainer.cross_validate(
            root, n_epochs=1, batch_size=4, ckpt_dir=str(tmp_path / "ck")
        )
        assert len(results) == 2  # one fold per session
        assert all(0 <= r["f1"] <= 1 for r in results)
        assert os.listdir(tmp_path / "ck")  # best-F1 checkpoint saved

    def test_gaze_heuristic_eval(self):
        class FakeDetector:
            def estimate(self, frame):
                return bool(frame.mean() > 128), None

        frames = [
            (np.full((8, 8, 3), 200, np.uint8), True),
            (np.full((8, 8, 3), 10, np.uint8), False),
            (np.full((8, 8, 3), 220, np.uint8), True),
        ]
        metrics = evaluate_gaze_heuristic(FakeDetector(), frames)
        assert metrics["accuracy"] == 1.0 and metrics["f1"] == 1.0


class TestMutualGazeSweep:
    """The 8-config sweep driver (reference train_with_multiple_configurations.py)."""

    def test_default_grid_names(self):
        from isbfsar_tpu.train.sweep import default_grid

        grid = default_grid()
        assert [e.group for e in grid] == [
            "RNET MARIA SMALL", "RNET MARIA BIG", "RNET MY SMALL", "RNET MY BIG",
            "MNET MARIA SMALL", "MNET MARIA BIG", "MNET MY SMALL", "MNET MY BIG",
        ]
        assert grid[0].config.backbone == "resnet50"
        assert grid[4].config.backbone == "resnet18"
        assert grid[0].augment and not grid[2].augment

    def test_sweep_runs_and_skips_missing(self, tmp_path):
        from isbfsar_tpu.train.sweep import SweepEntry, run_sweep

        root = str(tmp_path / "sweeproot")
        _make_watching_dataset(os.path.join(root, "tiny"), n_per=2)
        cfg = dataclasses.replace(MutualGazeConfig(), crop_size=32, lr=1e-3)
        grid = [
            SweepEntry("A TINY", cfg, "tiny", augment=True),
            SweepEntry("B MISSING", cfg, "absent_dataset", augment=False),
        ]
        summary = run_sweep(
            root, grid=grid, n_epochs=1, batch_size=4,
            log_dir=str(tmp_path / "log"), ckpt_dir=str(tmp_path / "ck"),
            only_best=False,
        )
        # present dataset ran the 2-fold CV, absent one was skipped not crashed
        assert set(summary) == {"A TINY"}
        assert "f1" in summary["A TINY"] and "f1_var" in summary["A TINY"]
        assert 0.0 <= summary["A TINY"]["f1"] <= 1.0
        assert os.listdir(tmp_path / "ck" / "A_TINY")

    def test_only_best_runs_first_entry(self, tmp_path):
        from isbfsar_tpu.train.sweep import SweepEntry, run_sweep

        root = str(tmp_path / "sweeproot")
        _make_watching_dataset(os.path.join(root, "tiny"), n_per=2)
        cfg = dataclasses.replace(MutualGazeConfig(), crop_size=32, lr=1e-3)
        grid = [
            SweepEntry("FIRST", cfg, "tiny"),
            SweepEntry("SECOND", cfg, "tiny"),
        ]
        summary = run_sweep(root, grid=grid, n_epochs=1, batch_size=4,
                            log_dir=str(tmp_path / "log"))
        assert set(summary) == {"FIRST"}  # reference's groups[:1] quirk


class TestCrossValidationIsolation:
    def test_fresh_model_per_fold(self, tmp_path):
        """Each leave-one-session-out fold must start from fresh weights
        (reference train.py builds a new Model per session) — carrying
        weights across folds lets fold k test on sessions earlier folds
        trained on, inflating every downstream sweep statistic."""
        root = str(tmp_path / "data")
        _make_watching_dataset(root, n_per=2)
        cfg = dataclasses.replace(MutualGazeConfig(), crop_size=32, lr=1e-3)
        trainer = MutualGazeTrainer(cfg, log_dir=str(tmp_path / "log"))

        resets = []
        orig = trainer.reset
        trainer.reset = lambda seed=0: (resets.append(seed), orig(seed))[1]
        trainer.cross_validate(root, n_epochs=1, batch_size=4)
        assert resets == [0, 1]  # one fresh init per fold
