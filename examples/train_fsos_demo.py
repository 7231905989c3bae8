"""End-to-end learning demo: episodic training + FSOS eval on synthetic data.

Reproduces docs/PERF.md's learning receipt: generate an NTU-like synthetic
dataset (class-distinct joint sinusoids), train the TRX-OS episodic
objective on 14 classes, evaluate the FSOS protocol on 6 held-out classes.

    python examples/train_fsos_demo.py [--epochs 30] [--out /tmp/demo]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from isbfsar_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from isbfsar_tpu.configs import ARConfig
    from isbfsar_tpu.train.dataloader import EpisodicSampler, batch_iterator
    from isbfsar_tpu.train.fsos import evaluate_fsos, summarize
    from isbfsar_tpu.train.synthetic import generate_dataset
    from isbfsar_tpu.train.trainer import Trainer

    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--out", default="/tmp/isbfsar_demo")
    args = parser.parse_args()

    root = os.path.join(args.out, "data")
    os.makedirs(root, exist_ok=True)
    names = generate_dataset(root, n_classes=20, clips_per_class=6, n_frames=16, seed=3)
    print("dataset: 20 classes x 6 clips (14 train / 6 held out)")

    cfg = dataclasses.replace(
        ARConfig.for_input("skeleton"),
        n_task=64, batch_size=16, eval_every_n_epoch=10_000,
        checkpoint_dir=os.path.join(args.out, "ckpt"),
    )
    sampler = EpisodicSampler(root, k=5, n_task=cfg.n_task, max_l=16, l=16, seed=1)
    sampler.all_classes = names[:14]

    trainer = Trainer(cfg, sampler, log_dir=os.path.join(args.out, "run"), use_wandb=False)
    t0 = time.time()
    for epoch in range(args.epochs):
        summary = trainer.run_epoch(
            epoch, batch_iterator(sampler, cfg.batch_size, seed=epoch), train=True
        )
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch}: fs_loss={summary['train/fs_loss']:.3f} "
                  f"fs_acc={summary['train/fs_accuracy']:.3f} "
                  f"os_acc={summary['train/os_accuracy']:.3f}")
    print(f"trained {args.epochs} epochs in {time.time() - t0:.0f}s")

    test_root = os.path.join(args.out, "test")
    if os.path.isdir(test_root):
        shutil.rmtree(test_root)
    for c in names[14:]:
        shutil.copytree(os.path.join(root, c), os.path.join(test_root, c))
    results = evaluate_fsos(
        cfg, trainer.params, test_root, test_root,
        k=5, n_repeats=5, batch_size=6, n_test_classes=6,
    )
    print("FSOS on held-out classes:", summarize(results))


if __name__ == "__main__":
    main()
