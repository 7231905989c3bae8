"""Speed-of-light audit: measured device time vs the XLA cost model vs peak.

For every shipped hot program (the fused step, its B=16 micro-batch, and
the three standalone module programs) this tool pulls the compiled
executable's own cost analysis (FLOPs + HBM bytes accessed), measures the
amortized per-call device time (min over interleaved blocks of queued
dispatches — the relay-spike-stripping receipt bench.py uses), and reports

    achieved TFLOP/s, achieved GB/s, arithmetic intensity,
    bound-by (compute vs bandwidth at the machine balance point),
    and % of the binding roofline actually achieved.

This answers "is each kernel at speed of light?" with numbers instead of
vibes (docs/PERF.md "Roofline audit"): a program far under its binding
roof has fusion/layout headroom; one near it is done — further e2e gains
must come from the host path, not the kernels.

Peaks default to TPU v5e (v5 lite): 197 bf16 TFLOP/s, 819 GB/s HBM
(public chip specs). Pass --peak-tflops/--peak-gbs for other targets.

    python tools/roofline.py [--json out.json] [--blocks 5 --block 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Any, Callable, Dict, Sequence

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_TFLOPS = 197.0
V5E_PEAK_GBS = 819.0


def cost_of(compiled) -> Dict[str, float]:
    """FLOPs + bytes from the executable's cost analysis (version-tolerant:
    older jax returns a list of one dict per program)."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes": float(ca.get("bytes accessed", 0.0)),
    }


def _fetch_sync(out) -> None:
    """Force REAL completion by fetching a few bytes of one output leaf.

    Two relay pathologies make `block_until_ready` untrustworthy as a
    timing barrier (measured, docs/PERF.md "Sync gotcha"): (1) it can
    return before execution completes (bench_train first read 439% MFU);
    (2) a loop of IDENTICAL (fn, args) dispatches block-synced at 0.022 ms
    for a 34-GFLOP matmul — physically impossible — while the chained
    variant read 1.7 ms. A small data fetch is the only barrier that
    survives both; fetching ~8 floats costs well under 0.1 ms amortized
    over a block."""
    import jax

    leaves = jax.tree.leaves(out)
    x = leaves[0]
    if hasattr(x, "reshape"):
        # slice ON DEVICE first — np.asarray(whole) would fetch the full
        # buffer (a 16 MB D2H for a 2048x2048 f32, ~0.5 s on a loaded relay)
        np.asarray(x.reshape(-1)[:8])
    else:
        np.asarray(x)


def device_time(fn: Callable[[], Any], n_blocks: int, block: int,
                warmup: int = 5) -> Dict[str, float]:
    """Amortized per-call seconds: median and min over interleaved blocks of
    `block` queued dispatches (ONE data-fetch sync per block — see
    _fetch_sync; block_until_ready is not a faithful barrier on the relay).
    The min is the device-time receipt — back-to-back queued programs leave
    no host gap, and the min strips shared-relay load spikes (docs/PERF.md
    relay cost model)."""
    for _ in range(warmup):
        out = fn()
    _fetch_sync(out)
    times = []
    for _ in range(n_blocks):
        t0 = time.perf_counter()
        for _ in range(block):
            out = fn()
        _fetch_sync(out)
        times.append((time.perf_counter() - t0) / block)
    return {"median_s": float(np.median(times)), "min_s": float(np.min(times))}


def _tree_nbytes(tree) -> int:
    """Total bytes of every array leaf (program I/O accounting)."""
    import jax

    total = 0
    for x in jax.tree.leaves(tree):
        shape = getattr(x, "shape", None)
        dtype = getattr(x, "dtype", None)
        if shape is None or dtype is None:
            continue
        total += int(np.prod(shape, dtype=np.int64)) * np.dtype(dtype).itemsize
    return total


def trace_envelope(fn: Callable[[], Any], n: int = 20) -> float:
    """Per-call DEVICE seconds from a jax.profiler trace: the mean duration
    of the largest 'XLA Modules' envelope. Round-5 finding
    (docs/PERF.md "Trained-stack device profile"): the queued-block fetch
    timing above is a THROUGHPUT ceiling that still contains per-dispatch
    relay/host gaps — hpe_frame read 3.10 ms by blocks but 1.69 ms by
    trace. The trace envelope is the authoritative device time; blocks
    remain the serving-rate receipt."""
    import glob
    import shutil
    import tempfile

    import jax

    trace_dir = tempfile.mkdtemp(prefix="isbfsar_roofline_trace_")
    try:
        jax.profiler.start_trace(trace_dir)
        out = None
        for _ in range(n):
            out = fn()
        _fetch_sync(out)
        jax.profiler.stop_trace()
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from profile_prod import parse_xspace

        _, _, _, _, modules = parse_xspace(trace_dir)
        if not modules:
            return float("nan")
        top = max(modules.values(), key=lambda m: m["total_ms"])
        return top["total_ms"] / max(top["calls"], 1) / 1e3
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)


def audit(name: str, jitted, args: Sequence[Any], n_blocks: int, block: int,
          peak_tflops: float, peak_gbs: float,
          calls_per_item: int = 1, timed_fn=None,
          with_trace: bool = False) -> Dict[str, Any]:
    """One roofline row. `calls_per_item` divides time AND cost per logical
    frame for batched programs (cost_analysis covers the whole batch).
    `timed_fn` overrides the timing callable — needed for donating
    programs, where the caller must thread the donated buffer between
    calls (lowering for cost analysis never executes, so it is safe on
    the original args either way).

    Two speed-of-light bounds (round-4 finding, docs/PERF.md "Roofline
    audit"): XLA's ``cost_analysis`` bytes are PRE-FUSION — each op's
    operands+results counted even when fusion keeps them in VMEM — so they
    are an UPPER bound on HBM traffic (the first on-chip run measured
    "656% of roof": the measurement disproving its own bytes term). The
    defensible floor uses the bytes that MUST cross HBM: the program's
    inputs (weights included — every step reads them) + outputs.

        sol_floor = max(flops/peak_flops, io_bytes/peak_bw)   <= true SoL
        sol_upper = max(flops/peak_flops, cost_bytes/peak_bw) >= true SoL

    ``pct_of_roofline`` = sol_floor/measured: a conservative "we are AT
    LEAST this close to speed of light". A program whose measured time
    beats sol_upper has out-fused the cost model (``fused_beyond_cost_
    model``); one far above sol_floor with low FLOPs is overhead- or
    layout-bound and has real headroom."""
    import jax

    compiled = jitted.lower(*args).compile()
    cost = cost_of(compiled)
    io_bytes = _tree_nbytes(args) + _tree_nbytes(
        getattr(compiled, "out_info", ())
    )
    t = device_time(timed_fn or (lambda: jitted(*args)), n_blocks, block)
    dt = t["min_s"]
    flops, bytes_ = cost["flops"], cost["bytes"]
    flops_s = flops / (peak_tflops * 1e12)
    sol_floor = max(flops_s, io_bytes / (peak_gbs * 1e9))
    sol_upper = max(flops_s, bytes_ / (peak_gbs * 1e9))
    floor_bound = "compute" if flops_s >= io_bytes / (peak_gbs * 1e9) else "bandwidth"
    row = {
        "name": name,
        "per_frame_ms": round(dt / calls_per_item * 1e3, 4),
        "median_ms": round(t["median_s"] / calls_per_item * 1e3, 4),
        "gflops": round(flops / 1e9, 3),
        "cost_model_mbytes": round(bytes_ / 1e6, 3),
        "io_mbytes": round(io_bytes / 1e6, 3),
        "floor_bound": floor_bound,
        "achieved_tflops": round(flops / dt / 1e12, 2),
        "sol_floor_ms": round(sol_floor / calls_per_item * 1e3, 4),
        "sol_upper_ms": round(sol_upper / calls_per_item * 1e3, 4),
        "pct_of_roofline": round(100.0 * sol_floor / dt, 1),
        "fused_beyond_cost_model": bool(dt < sol_upper),
        "mfu_pct": round(100.0 * flops / dt / (peak_tflops * 1e12), 4),
    }
    if with_trace:
        env = trace_envelope(timed_fn or (lambda: jitted(*args)))
        if env == env:  # not NaN
            row["device_envelope_ms"] = round(env / calls_per_item * 1e3, 4)
            row["mfu_envelope_pct"] = round(
                100.0 * flops / env / (peak_tflops * 1e12), 4)
            row["pct_of_roofline_envelope"] = round(
                100.0 * sol_floor / env, 1)
    print(
        f"[roofline] {name:18s} {row['per_frame_ms']:8.3f} ms/frame  "
        f"{row['gflops']:9.2f} GF  io {row['io_mbytes']:8.1f} MB "
        f"(cost-model {row['cost_model_mbytes']:9.1f} MB)  "
        f"{floor_bound:9s}-floor  SoL [{row['sol_floor_ms']:.3f}, "
        f"{row['sol_upper_ms']:.3f}] ms  -> >={row['pct_of_roofline']:5.1f}% "
        f"of SoL, MFU {row['mfu_pct']:.1f}%",
        file=sys.stderr,
    )
    return row


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--json", default=None, help="write rows to a file")
    parser.add_argument("--blocks", type=int, default=5)
    parser.add_argument("--block", type=int, default=100)
    parser.add_argument("--peak-tflops", type=float, default=V5E_PEAK_TFLOPS)
    parser.add_argument("--peak-gbs", type=float, default=V5E_PEAK_GBS)
    parser.add_argument("--skip-fused", action="store_true",
                        help="only the standalone module programs (faster)")
    parser.add_argument("--param-dtype", default="bfloat16",
                        choices=["float32", "bfloat16"],
                        help="PipelineConfig.param_dtype for the fused "
                             "programs — 'bfloat16' audits the trunk-weight "
                             "storage cast (expect the bytes term to drop "
                             "~2x-of-weights; docs/PERF.md)")
    parser.add_argument("--trace", action=argparse.BooleanOptionalAction,
                        default=False,
                        help="also capture a jax.profiler trace per row and "
                             "report the module-envelope device time "
                             "(device_envelope_ms / mfu_envelope_pct) — the "
                             "authoritative device number; the block timing "
                             "stays as the serving-rate receipt. Off by "
                             "default: per-row profiler sessions through a "
                             "loaded relay add minutes and one more way to "
                             "wedge (a wedged relay ate the first --trace "
                             "run of round 5); opt in for receipt runs")
    parser.add_argument("--init-timeout", type=float, default=240.0,
                        help="seconds to wait for backend init before "
                             "erroring out instead of hanging on a wedged "
                             "relay (0 disables)")
    args = parser.parse_args()

    from isbfsar_tpu.utils.watchdog import await_backend

    cause = await_backend(args.init_timeout)
    if cause is not None:
        print(f"[roofline] FATAL: {cause}", file=sys.stderr)
        os._exit(2)

    import jax
    import jax.numpy as jnp

    from isbfsar_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    kw = dict(n_blocks=args.blocks, block=args.block,
              peak_tflops=args.peak_tflops, peak_gbs=args.peak_gbs,
              with_trace=args.trace)
    rows = []

    # --- standalone module programs (bench.py's per-module setups) -------
    from isbfsar_tpu.ar.recognizer import ActionRecognizer
    from isbfsar_tpu.configs import ARConfig, CameraIntrinsics, FocusConfig, HPEConfig
    from isbfsar_tpu.focus.detector import FocusDetector
    from isbfsar_tpu.hpe.estimator import HumanPoseEstimator

    rng = np.random.default_rng(0)

    est = HumanPoseEstimator(HPEConfig(yolo_thresh=0.0), CameraIntrinsics())
    frame = jax.device_put(np.zeros((480, 640, 3), np.uint8))
    rows.append(audit("hpe_frame", est._estimate_jit, (est.params, frame), **kw))

    det = FocusDetector(FocusConfig(), CameraIntrinsics())
    rows.append(audit("focus_frame", det._forward, (det.params, frame), **kw))

    cfg = ARConfig.for_input("skeleton")
    ar = ActionRecognizer(cfg)
    for i in range(5):
        ar.train({"flag": f"a{i}",
                  "data": {"poses": rng.normal(size=(cfg.seq_len, 90)).astype(np.float32)},
                  "requires_focus": False})
    for _ in range(cfg.seq_len):  # fill the window -> support cache built
        ar.inference({"sk": rng.normal(size=90).astype(np.float32)})
    query = {"sk": jnp.asarray(rng.normal(size=(1, cfg.seq_len, 90)), jnp.float32)}
    mask = jnp.asarray(ar.support_mask)
    rows.append(audit("trx_match", ar._infer_cached,
                      (ar.params, query, ar.support_features, mask), **kw))

    # --- the shipped fused programs --------------------------------------
    if not args.skip_fused:
        import dataclasses

        from isbfsar_tpu.configs import PipelineConfig
        from isbfsar_tpu.pipeline import FusedPipeline

        config = PipelineConfig(param_dtype=args.param_dtype)
        config = dataclasses.replace(
            config, hpe=dataclasses.replace(config.hpe, yolo_thresh=0.0))
        pipe = FusedPipeline(config, with_focus=True, input_format="i420")
        for i in range(2):
            pipe.ar.train({"flag": f"action_{i}",
                           "data": {"poses": rng.normal(size=(config.ar.seq_len, 90)).astype(np.float32)},
                           "requires_focus": False})
        pipe.start()
        # The SHIPPED executables donate the state buffer, so the timing
        # loop must thread the returned state back in (the serve loops'
        # own discipline); lowering for cost analysis never executes, so
        # the original args are safe there.
        yuv = jax.device_put(np.zeros((480 * 3 // 2, 640), np.uint8))
        held = {"s": pipe.init_state()}

        def run_step():
            packed, held["s"] = pipe._step(
                pipe._device_params, yuv, pipe._support_kv, held["s"],
                pipe._support_mask)
            return packed

        rows.append(audit(
            "fused_step", pipe._step,
            (pipe._device_params, yuv, pipe._support_kv, pipe.init_state(),
             pipe._support_mask), timed_fn=run_step, **kw))
        b = 16
        yuv_b = jax.device_put(np.zeros((b, 480 * 3 // 2, 640), np.uint8))
        held_b = {"s": pipe.init_state()}

        def run_batch():
            packed, held_b["s"] = pipe._step_batch(
                pipe._device_params, yuv_b, pipe._support_kv, held_b["s"],
                pipe._support_mask)
            return packed

        rows.append(audit(
            "fused_batch16", pipe._step_batch,
            (pipe._device_params, yuv_b, pipe._support_kv, pipe.init_state(),
             pipe._support_mask), calls_per_item=b, timed_fn=run_batch,
            **{**kw, "block": max(args.block // b, 5)}))

    out = {"device": str(jax.devices()[0]),
           "peak_tflops": args.peak_tflops, "peak_gbs": args.peak_gbs,
           "param_dtype": args.param_dtype, "rows": rows}
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
