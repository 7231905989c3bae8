"""Training entry point — the reference's ``python modules/ar/utils/train.py``.

Reproduces the reference's dataset protocol (reference train.py:27-95):
- the 20 NTU-120 hold-out test classes (every 6th class A1, A7, ... A115,
  train.py:33-43) are excluded from training
- the remaining classes split 80/20 into train/val by list order
  (train.py:62-64)
- class ids resolve through assets/nturgbd_classes.txt ("A{n}. name." lines)

Usage:
    python -m isbfsar_tpu.train.train_cli --data <dataset_root> \
        [--input-type skeleton] [--epochs 100] [--batch-size 32]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Dict, List, Tuple

from isbfsar_tpu.configs import ASSETS_DIR, ARConfig

NTU_TEST_IDS = [f"A{i}" for i in range(1, 116, 6)]  # A1, A7, ..., A115


def load_ntu_class_names(path: str = "") -> Dict[str, str]:
    """'A{n}. name.' lines -> {A{n}: sanitized_name} (reference train.py:36-42)."""
    path = path or os.path.join(ASSETS_DIR, "nturgbd_classes.txt")
    mapping = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            if "." not in line:
                continue
            index, name, *_ = line.split(".")
            name = name.strip().replace(" ", "_").replace("/", "-").replace("’", "")
            mapping[index.strip()] = name
    return mapping


def ntu_splits(all_classes: List[str]) -> Tuple[List[str], List[str], List[str]]:
    """(train, val, test) class-name lists per the reference protocol."""
    mapping = load_ntu_class_names()
    test_names = {mapping[i] for i in NTU_TEST_IDS if i in mapping}
    test = [c for c in all_classes if c in test_names]
    rest = [c for c in all_classes if c not in test_names]
    idx = int(len(rest) * 0.8)
    return rest[:idx], rest[idx:], test


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", required=True)
    parser.add_argument("--input-type", default="skeleton",
                        choices=["skeleton", "rgb", "hybrid"])
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--n-task", type=int, default=None)
    parser.add_argument("--log-dir", default="runs/trx")
    parser.add_argument("--resume", default=None, help="checkpoint to resume (msgpack file or orbax dir)")
    parser.add_argument("--param-sharding", default="replicated",
                        choices=["replicated", "fsdp", "tp"],
                        help="fsdp = ZeRO parameter/optimizer-state sharding "
                             "over the dp mesh; tp = Megatron-style tensor "
                             "parallelism over a dp x tp mesh (--tp-degree). "
                             "Both certified step-equivalent by "
                             "parallel/parity.py (docs/SCALING.md)")
    parser.add_argument("--tp-degree", type=int, default=2,
                        help="tensor-parallel axis size when "
                             "--param-sharding tp (devices split dp x tp)")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize rgb-extractor activations in "
                             "the backward pass (jax.checkpoint): multi-x "
                             "peak-memory cut for ~1/3 extra extractor "
                             "FLOPs — the lever for bigger batches or "
                             "backbones on a fixed HBM budget")
    parser.add_argument("--sp-degree", type=int, default=0,
                        help="sequence-parallel axis size: shard every "
                             "clip's TIME axis over a dp x sp mesh so each "
                             "device embeds only L/sp frames per clip (the "
                             "within-sample lever for rgb/hybrid once dp is "
                             "one-episode-per-device; certified "
                             "step-equivalent by parallel/parity.py::"
                             "sp_parity_check). Composes with fsdp, not tp.")
    args = parser.parse_args()

    from isbfsar_tpu.train.dataloader import EpisodicSampler, list_classes
    from isbfsar_tpu.train.trainer import Trainer
    from isbfsar_tpu.utils.checkpoint import load_checkpoint

    cfg = ARConfig.for_input(args.input_type)
    overrides = {}
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.n_task:
        overrides["n_task"] = args.n_task
    if args.remat:
        overrides["remat"] = True
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)

    mesh = None
    seq_axis = None
    if args.param_sharding == "tp":
        import jax

        from isbfsar_tpu.parallel.mesh import make_mesh_2d

        if args.sp_degree:
            raise SystemExit("--sp-degree composes with replicated/fsdp "
                             "param sharding, not tp (would need a 3D mesh)")
        n = len(jax.devices())
        tp = args.tp_degree
        if n % tp:
            raise SystemExit(f"--tp-degree {tp} does not divide {n} devices")
        mesh = make_mesh_2d((n // tp, tp), ("dp", "tp"))
        print(f"[train] tensor-parallel mesh: dp{n // tp} x tp{tp}")
    elif args.sp_degree:
        import jax

        from isbfsar_tpu.parallel.mesh import make_mesh_2d

        n = len(jax.devices())
        sp = args.sp_degree
        if n % sp:
            raise SystemExit(f"--sp-degree {sp} does not divide {n} devices")
        if cfg.seq_len % sp:
            raise SystemExit(f"--sp-degree {sp} does not divide "
                             f"seq_len={cfg.seq_len}")
        mesh = make_mesh_2d((n // sp, sp), ("dp", "sp"))
        seq_axis = "sp"
        print(f"[train] sequence-parallel mesh: dp{n // sp} x sp{sp}")

    train_classes, val_classes, test_classes = ntu_splits(list_classes(args.data))
    print(f"[train] classes: {len(train_classes)} train / {len(val_classes)} val / "
          f"{len(test_classes)} held-out test")

    common = dict(k=cfg.way, n_task=cfg.n_task, max_l=16, l=cfg.seq_len,
                  input_type=cfg.input_type)
    train_sampler = EpisodicSampler(args.data, seed=0, **common)
    valid_sampler = EpisodicSampler(args.data, seed=1, **common)
    train_sampler.all_classes = train_classes or train_sampler.all_classes
    valid_sampler.all_classes = val_classes or valid_sampler.all_classes

    trainer = Trainer(cfg, train_sampler, valid_sampler, log_dir=args.log_dir,
                      mesh=mesh, param_sharding=args.param_sharding,
                      seq_axis=seq_axis)
    if args.resume:
        state = load_checkpoint(
            args.resume,
            {"params": trainer.params, "batch_stats": trainer.batch_stats,
             "opt_state": trainer.opt_state},
        )
        # re-places every tree under the trainer's sharding rule (device
        # residency + fsdp layout survive the restore)
        trainer.load_state(state)
        print(f"[train] resumed from {args.resume}")

    summary = trainer.fit(n_epochs=args.epochs)
    print(f"[train] done: {summary}")


if __name__ == "__main__":
    main()
