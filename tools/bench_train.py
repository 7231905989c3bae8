"""Training-throughput bench: episodic TRX steps/s under every scaling knob.

bench.py measures the SERVING surfaces; this is its training counterpart —
one JSON line of steps/s and episodes/s for the full episodic objective
(CE + gated discriminator BCE, reference modules/ar/utils/train.py:31-117)
with the framework's training levers applied:

    python tools/bench_train.py                        # skeleton, defaults
    python tools/bench_train.py --input-type rgb --remat
    python tools/bench_train.py --param-sharding fsdp  # over all devices
    python tools/bench_train.py --sp-degree 2          # dp x sp mesh
    python tools/bench_train.py --accum 4              # gradient accumulation

Timing discipline: N warmup steps (compile + cache), then M timed steps
with ONE device sync at the end of each block (back-to-back queued
dispatches — the relay-spike-stripping receipt bench.py uses); reports
median and best block. Data is synthetic and pre-built OUTSIDE the timed
region: this measures the device step, not the host sampler (the real
sampler's cost is a separate, host-side concern — docs/PERF.md).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--input-type", default="skeleton",
                        choices=["skeleton", "rgb", "hybrid"])
    parser.add_argument("--batch-size", type=int, default=None,
                        help="global episode batch (default: one per device)")
    parser.add_argument("--rgb-size", type=int, default=224,
                        help="rgb crop side (the AR contract is 224)")
    parser.add_argument("--param-sharding", default="replicated",
                        choices=["replicated", "fsdp", "tp"])
    parser.add_argument("--tp-degree", type=int, default=2)
    parser.add_argument("--sp-degree", type=int, default=0,
                        help="shard the clip TIME axis over a dp x sp mesh")
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--accum", type=int, default=1,
                        help="gradient-accumulation factor (optimize_every)")
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--blocks", type=int, default=3)
    parser.add_argument("--block", type=int, default=10,
                        help="steps per timed block (one sync per block)")
    parser.add_argument("--json", default=None, help="also write the row here")
    parser.add_argument("--peak-tflops", type=float, default=197.0,
                        help="per-device matmul peak for the MFU figure "
                             "(default TPU v5e bf16)")
    parser.add_argument("--init-timeout", type=float, default=120.0)
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. 'cpu'; pair with "
                             "XLA_FLAGS=--xla_force_host_platform_device_count"
                             "=8 for a virtual mesh). Set via jax.config "
                             "because sitecustomize overrides the env var.")
    args = parser.parse_args()

    if args.warmup < 1 or args.blocks < 1 or args.block < 1:
        raise SystemExit("--warmup/--blocks/--block must all be >= 1 "
                         "(warmup pays the compile; blocks/block define "
                         "the timed measurement)")
    if args.param_sharding == "tp" and args.sp_degree:
        raise SystemExit("--sp-degree composes with replicated/fsdp param "
                         "sharding, not tp (would need a 3D mesh) — same "
                         "rule as isbfsar-train")

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from isbfsar_tpu.utils.watchdog import await_backend

    cause = await_backend(args.init_timeout)
    if cause is not None:
        print(f"[bench_train] FATAL: {cause}", file=sys.stderr)
        os._exit(2)

    import jax

    from isbfsar_tpu.configs import ARConfig
    from isbfsar_tpu.parallel.mesh import make_mesh, make_mesh_2d
    from isbfsar_tpu.train.synthetic import episodic_batch
    from isbfsar_tpu.train.trainer import Trainer
    from isbfsar_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    n = len(jax.devices())

    mesh, seq_axis = None, None
    if args.param_sharding == "tp":
        if n % args.tp_degree:
            raise SystemExit(f"--tp-degree {args.tp_degree} !| {n} devices")
        mesh = make_mesh_2d((n // args.tp_degree, args.tp_degree), ("dp", "tp"))
        dp = n // args.tp_degree
    elif args.sp_degree:
        if n % args.sp_degree:
            raise SystemExit(f"--sp-degree {args.sp_degree} !| {n} devices")
        mesh = make_mesh_2d((n // args.sp_degree, args.sp_degree), ("dp", "sp"))
        seq_axis = "sp"
        dp = n // args.sp_degree
    else:
        mesh = make_mesh(n)
        dp = n

    b = args.batch_size or dp
    cfg = dataclasses.replace(
        ARConfig.for_input(args.input_type),
        batch_size=b,
        n_task=b,
        rgb_size=args.rgb_size,
        optimize_every=args.accum,
        eval_every_n_epoch=10_000,
        remat=args.remat,
    )
    batch = episodic_batch(cfg, b, args.rgb_size, args.input_type)

    trainer = Trainer(cfg, mesh=mesh, log_dir="/tmp/isbfsar_bench_train",
                      use_wandb=False, seed=0,
                      param_sharding=args.param_sharding, seq_axis=seq_axis)
    placed = trainer._prepare(batch)

    def step():
        trainer.params, trainer.batch_stats, trainer.opt_state, metrics = (
            trainer._train_step(trainer.params, trainer.batch_stats,
                                trainer.opt_state, placed, disc_on=True)
        )
        return metrics

    def sync(metrics) -> float:
        # Fetch a VALUE, not just block_until_ready: the relay backend's
        # block_until_ready can return before execution actually completes
        # (first sweep measured 439% MFU — physically impossible — with
        # block-only sync; a data fetch forces the real barrier).
        return float(np.asarray(jax.device_get(
            jax.tree.leaves(metrics)[0])).sum())

    t0 = time.time()
    for _ in range(args.warmup):
        metrics = step()
    sync(metrics)
    print(f"[bench_train] warmup ({args.warmup} steps incl. compile): "
          f"{time.time() - t0:.1f}s", file=sys.stderr)

    block_s = []
    for _ in range(args.blocks):
        t0 = time.time()
        for _ in range(args.block):
            metrics = step()
        sync(metrics)
        block_s.append((time.time() - t0) / args.block)
    med = float(np.median(block_s))

    # Training MFU: the compiled step's own cost-model FLOPs over the
    # measured median step time, against the per-device matmul peak
    # (lowering never executes, so the donated buffers are safe). On the
    # virtual CPU mesh the % is meaningless — report it only off-CPU.
    from tools.roofline import cost_of

    step_flops = cost_of(
        trainer._train_step.lower(trainer.params, trainer.batch_stats,
                                  trainer.opt_state, placed, True).compile()
    )["flops"]
    backend = jax.devices()[0].platform
    mfu_pct = (
        round(100.0 * step_flops / med / (n * args.peak_tflops * 1e12), 4)
        if backend != "cpu" else None
    )

    row = {
        "metric": "train_steps_per_s",
        "value": round(1.0 / med, 3),
        "unit": "steps/s",
        "episodes_per_s": round(b / med, 3),
        "best_steps_per_s": round(1.0 / min(block_s), 3),
        "input_type": args.input_type,
        "batch_size": b,
        "rgb_size": args.rgb_size if args.input_type != "skeleton" else None,
        "devices": n,
        "mesh": "x".join(f"{k}{v}" for k, v in mesh.shape.items()),
        "param_sharding": args.param_sharding,
        "sp_degree": args.sp_degree or None,
        "remat": args.remat,
        "accum": args.accum,
        "backend": backend,
        "step_gflops": round(step_flops / 1e9, 2),
        "train_mfu_pct": mfu_pct,
    }
    print(json.dumps(row))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(row, f, indent=1)


if __name__ == "__main__":
    main()
