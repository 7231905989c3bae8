"""Per-op device profile of the TRAINED production stack (round-5 item 3).

The round-2 profile that PERF.md's "no single op >5%" claim cites traced
the RANDOM-INIT stack with the old warp; the trained production stack
(full-width YOLO + V2-L, packed warp, bf16 trunks) is a materially
different program that had never been re-profiled. This tool captures a
`jax.profiler` device trace of the live fused step (and optionally the
standalone hpe_frame program) with the CALIBRATED trained weights, parses
the xplane.pb directly (the tensorboard-plugin converter is
version-mismatched with the installed TF), and emits a JSON receipt of
per-op self-times — the evidence for taking or refusing kernel-level
levers (int8 weight storage, pallas rewrites).

Reference analog: the per-engine speed tests the reference runs on its
TRT engines (modules/hpe/utils/test_yolo_speed.py:44-92).

    python tools/profile_prod.py [--frames 30] [--program fused|hpe]
        [--out docs/PROFILE_prod_r5.json]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xspace(trace_dir: str, min_pct: float = 0.2):
    """Aggregate device-plane op durations by op name from an xplane.pb.

    Returns (total_ms, rows) where rows are
    {name, total_ms, calls, pct} sorted by total self duration. Only the
    TPU/accelerator device planes count (host threads are skipped);
    per-plane, durations aggregate across every line (core) and event.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())

    per_op = collections.Counter()
    calls = collections.Counter()
    planes = []
    module_ms = {}
    for plane in space.planes:
        # device planes: '/device:TPU:0' (and '#Chip'/custom names on some
        # backends); skip host threads / python tracer planes
        name = plane.name
        if "TPU" not in name and "device" not in name.lower():
            continue
        if "Host" in name or "python" in name.lower():
            continue
        planes.append(name)
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            # the plane is a hierarchy: 'XLA Modules' (program envelopes),
            # 'XLA Ops' (per-op self times), 'XLA Async Ops', 'Steps' —
            # summing across lines double-counts, so per-op totals take
            # ONLY the op line(s) and the module line reports separately
            if line.name.startswith("XLA Modules"):
                for ev in line.events:
                    n = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                    agg = module_ms.setdefault(n.split("(")[0], [0.0, 0])
                    agg[0] += ev.duration_ps / 1e9
                    agg[1] += 1
                continue
            if not line.name.startswith("XLA Ops"):
                continue
            for ev in line.events:
                n = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                per_op[n] += ev.duration_ps
                calls[n] += 1
    total_ps = sum(per_op.values())
    rows = [
        {
            "name": n,
            "total_ms": round(ps / 1e9, 4),
            "calls": calls[n],
            "pct": round(100.0 * ps / max(total_ps, 1), 2),
        }
        for n, ps in per_op.most_common()
    ]
    kept = [r for r in rows if r["pct"] >= min_pct]
    modules = {
        n: {"total_ms": round(ms, 3), "calls": c}
        for n, (ms, c) in sorted(module_ms.items(),
                                 key=lambda kv: -kv[1][0])
    }
    return total_ps / 1e9, kept, planes, len(rows), modules


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--frames", type=int, default=30)
    parser.add_argument("--program", default="fused", choices=["fused", "hpe"])
    parser.add_argument("--trace-dir", default="/tmp/isbfsar_prof_r5")
    parser.add_argument("--out", default="")
    parser.add_argument("--param-dtype", default="bfloat16")
    args = parser.parse_args()

    import jax

    from isbfsar_tpu import pretrained
    from isbfsar_tpu.configs import PipelineConfig
    from isbfsar_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    config = PipelineConfig(param_dtype=args.param_dtype)
    prod = pretrained.load_calibrated("pose-prod-256")
    cam_hw = (config.main.cam_height, config.main.cam_width)

    rng = np.random.default_rng(0)
    # rendered humanoid frames: the detector must FIRE so the traced
    # program is the detection-taken path, same discipline as bench.py's
    # trained gate receipt
    from isbfsar_tpu.train.posestack import render_motion_clip

    bgr, _ = render_motion_clip("wave", n_frames=min(args.frames, 32),
                                frame_hw=cam_hw,
                                intrinsics=config.intrinsics, cycles=2.0)
    frames = [bgr[i % len(bgr)] for i in range(args.frames)]

    if args.program == "fused":
        from isbfsar_tpu.hpe.estimator import HumanPoseEstimator
        from isbfsar_tpu.pipeline import FusedPipeline

        hpe = HumanPoseEstimator(config.hpe, config.intrinsics, params=prod,
                                 frame_shape=cam_hw)
        pipe = FusedPipeline(config, hpe=hpe, with_focus=True,
                             input_format="i420")
        for i in range(2):
            pipe.ar.train({
                "flag": f"action_{i}",
                "data": {"poses": rng.normal(
                    size=(config.ar.seq_len, 90)).astype(np.float32)},
                "requires_focus": False,
            })
        pipe.start()
        print("[profile] warmup...", flush=True)
        pipe.warmup(3)

        from isbfsar_tpu.ops.image import bgr_to_i420

        payloads = [bgr_to_i420(f) for f in frames]
        t0 = time.perf_counter()
        jax.profiler.start_trace(args.trace_dir)
        for p in payloads:
            pipe.step(p)
        jax.profiler.stop_trace()
        wall = time.perf_counter() - t0
    else:
        from isbfsar_tpu.hpe.estimator import HumanPoseEstimator

        hpe = HumanPoseEstimator(config.hpe, config.intrinsics, params=prod,
                                 frame_shape=cam_hw)
        print("[profile] warmup...", flush=True)
        for f in frames[:3]:
            hpe.estimate(f)
        t0 = time.perf_counter()
        jax.profiler.start_trace(args.trace_dir)
        for f in frames:
            hpe.estimate(f)
        jax.profiler.stop_trace()
        wall = time.perf_counter() - t0

    total_ms, rows, planes, n_ops, modules = parse_xspace(args.trace_dir)
    report = {
        "program": args.program,
        "param_dtype": args.param_dtype,
        "frames": args.frames,
        "wall_s": round(wall, 2),
        "device_op_total_ms": round(total_ms, 2),
        "device_op_ms_per_frame": round(total_ms / args.frames, 3),
        "planes": planes,
        "distinct_ops": n_ops,
        "modules": modules,
        "top_ops": rows[:40],
    }
    print(json.dumps({k: v for k, v in report.items() if k != "top_ops"},
                     indent=2))
    for r in rows[:25]:
        print(f"  {r['pct']:6.2f}%  {r['total_ms']:9.3f} ms  x{r['calls']:<5d}"
              f" {r['name'][:100]}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"[profile] wrote {args.out}")


if __name__ == "__main__":
    main()
