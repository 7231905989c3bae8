"""Mutual-gaze configuration sweep — the reference's 8-config grid driver.

Rebuild of reference modules/focus/mutual_gaze/focus_detection/utils/
train_with_multiple_configurations.py:17-46: the named grid is
{rnet | mnet backbone} x {maria | my augmentation} x {small | big dataset},
each config run through the 5-session cross-validation with best-F1
checkpointing, per-group metrics logged (wandb-compatible through
MetricsLogger), and overall mean +- variance over sessions reported per
group (reference :229-246).

TPU-native deltas: the trainer is the jit'd BCE step of
``MutualGazeTrainer`` (one program per batch, donated optimizer state);
"mnet" maps to resnet18 (MobileNet's role — the small/fast backbone — with
an MXU-shaped residual topology instead of depthwise convs, which waste the
128x128 systolic array); the augmentation axis toggles the online flip
augmentation ("MARIA" on, "MY" off) where the reference selects from a
pregenerated augmented pool via augmentation_size (-1 = all) — same sweep
dimension, host-side generation replaced by on-the-fly transforms.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from isbfsar_tpu.configs import MutualGazeConfig
from isbfsar_tpu.train.mutualgaze import MutualGazeTrainer
from isbfsar_tpu.utils.metrics import MetricsLogger


@dataclasses.dataclass(frozen=True)
class SweepEntry:
    """One named grid point (reference :20-46 builds these imperatively)."""

    group: str
    config: MutualGazeConfig
    dataset: str  # subdirectory name under the sweep root
    augment: bool = True  # online flip augmentation (the MARIA/MY axis)


def default_grid(small: str = "focus_dataset",
                 big: str = "focus_dataset_big_easy") -> List[SweepEntry]:
    """The reference's 8 named configurations in its ordering (:20-46)."""
    grid = []
    for model, mname in (("resnet50", "RNET"), ("resnet18", "MNET")):
        for aug, aname in (("maria", "MARIA"), ("my", "MY")):
            for dataset, dname in ((small, "SMALL"), (big, "BIG")):
                grid.append(SweepEntry(
                    group=f"{mname} {aname} {dname}",
                    config=MutualGazeConfig(backbone=model),
                    dataset=dataset,
                    augment=(aug == "maria"),
                ))
    return grid


def run_sweep(
    root: str,
    grid: Optional[Sequence[SweepEntry]] = None,
    n_epochs: int = 1,
    batch_size: int = 8,
    log_dir: str = "runs/mutualgaze_sweep",
    ckpt_dir: Optional[str] = None,
    only_best: bool = True,
    seed: int = 0,
) -> Dict[str, Dict[str, float]]:
    """Run the grid; returns {group: {metric: mean, metric_var: var}}.

    root: directory holding one subdirectory per dataset variant, each a
    session tree as ``WatchingDataset`` expects. Grid entries whose dataset
    directory is absent are skipped with a log line (the reference hard-
    crashes on a missing path).
    only_best: the reference ships with ``groups = groups[:1]`` — "Just
    best configuration!" (:48-50) — so the default runs only the first
    entry; pass False for the full 8-config sweep.
    """
    grid = list(grid if grid is not None else default_grid())
    if only_best:
        grid = grid[:1]
    logger = MetricsLogger(log_dir, project="mutual_gaze")
    summary: Dict[str, Dict[str, float]] = {}
    try:
        for entry in grid:
            data_root = os.path.join(root, entry.dataset)
            if not os.path.isdir(data_root):
                logger.log({"group": entry.group, "skipped": 1,
                            "reason": f"missing dataset {entry.dataset}"})
                continue
            trainer = MutualGazeTrainer(
                entry.config, seed=seed,
                log_dir=os.path.join(log_dir, entry.group.replace(" ", "_")),
            )
            fold_ckpt = (os.path.join(ckpt_dir, entry.group.replace(" ", "_"))
                         if ckpt_dir else None)
            try:
                results = trainer.cross_validate(
                    data_root, n_epochs=n_epochs, batch_size=batch_size,
                    ckpt_dir=fold_ckpt, augment=entry.augment,
                )
            finally:
                trainer.logger.close()
            if not results:  # dataset dir present but holds no sessions
                logger.log({"group": entry.group, "skipped": 1,
                            "reason": f"no sessions under {entry.dataset}"})
                continue
            # OVERALL mean +- variance over sessions (reference :241-246
            # prints mean and np.var, not std — preserved).
            stats: Dict[str, float] = {}
            for key in results[0]:
                vals = np.asarray([r[key] for r in results], np.float64)
                stats[key] = float(vals.mean())
                stats[f"{key}_var"] = float(vals.var())
            summary[entry.group] = stats
            logger.log({"group": entry.group, **stats})
    finally:
        logger.close()
    return summary


def main(argv: Optional[List[str]] = None) -> None:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("root", help="directory of dataset variants")
    parser.add_argument("--epochs", type=int, default=1)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--log-dir", default="runs/mutualgaze_sweep")
    parser.add_argument("--ckpt-dir", default=None)
    parser.add_argument("--all", action="store_true",
                        help="run the full 8-config grid (default: first only)")
    parser.add_argument("--small", default="focus_dataset")
    parser.add_argument("--big", default="focus_dataset_big_easy")
    args = parser.parse_args(argv)

    summary = run_sweep(
        args.root,
        grid=default_grid(args.small, args.big),
        n_epochs=args.epochs,
        batch_size=args.batch_size,
        log_dir=args.log_dir,
        ckpt_dir=args.ckpt_dir,
        only_best=not args.all,
    )
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
