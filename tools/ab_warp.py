"""One-session A/B of the bilinear-warp formulations (and param dtypes).

The round-4 cross-session receipts (docs/ROOFLINE_r4*.json) could not
attribute deltas cleanly: hpe_frame "improved" 30% between two sessions
with zero code change on its path — shared-relay drift swamps
cross-session comparison. This tool builds EVERY variant in one process
and times them in interleaved round-robin blocks (variant order rotates
per block), so drift hits all variants equally and the per-variant min is
a same-weather comparison.

Variants:
  - focus_frame standalone, packed single-gather vs classic four-gather
    (ops/warp.py::warp_image_bilinear's two formulations)
  - fused _step and _step_batch(B=16) under both formulations
  - optionally (--with-f32) the packed fused step at float32 params, for a
    same-session param_dtype A/B against the bf16 row

    python tools/ab_warp.py [--json docs/AB_WARP_r4.json] [--with-f32]
                            [--blocks 6 --block 40] [--skip-fused]

Reference analog for the measure-then-decide discipline:
/root/reference/modules/hpe/utils/test_yolo_speed.py:44-92.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time
from typing import Any, Callable, Dict, List

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _patch_warp(packed: bool) -> None:
    """Rebind the focus detector's trace-time warp formulation."""
    import isbfsar_tpu.focus.detector as det_mod
    from isbfsar_tpu.ops.warp import warp_image_bilinear

    det_mod.warp_image_bilinear = functools.partial(
        warp_image_bilinear, packed=packed
    )


def _build_focus(rng) -> Callable[[], Any]:
    import jax

    from isbfsar_tpu.configs import CameraIntrinsics, FocusConfig
    from isbfsar_tpu.focus.detector import FocusDetector

    det = FocusDetector(FocusConfig(), CameraIntrinsics())
    frame = jax.device_put(np.zeros((480, 640, 3), np.uint8))
    out = det._forward(det.params, frame)  # trace under the active patch
    jax.block_until_ready(out)
    return lambda: det._forward(det.params, frame)


def _build_fused(rng, param_dtype: str):
    """Returns (run_step, run_batch, batch_size) under the active patch."""
    import dataclasses

    import jax

    from isbfsar_tpu.configs import PipelineConfig
    from isbfsar_tpu.pipeline import FusedPipeline

    config = PipelineConfig(param_dtype=param_dtype)
    config = dataclasses.replace(
        config, hpe=dataclasses.replace(config.hpe, yolo_thresh=0.0))
    pipe = FusedPipeline(config, with_focus=True, input_format="i420")
    for i in range(2):
        pipe.ar.train({
            "flag": f"action_{i}",
            "data": {"poses": rng.normal(
                size=(config.ar.seq_len, 90)).astype(np.float32)},
            "requires_focus": False,
        })
    pipe.start()
    yuv = jax.device_put(np.zeros((480 * 3 // 2, 640), np.uint8))
    held = {"s": pipe.init_state()}

    def run_step():
        packed_out, held["s"] = pipe._step(
            pipe._device_params, yuv, pipe._support_kv, held["s"],
            pipe._support_mask)
        return packed_out

    b = 16
    yuv_b = jax.device_put(np.zeros((b, 480 * 3 // 2, 640), np.uint8))
    held_b = {"s": pipe.init_state()}

    def run_batch():
        packed_out, held_b["s"] = pipe._step_batch(
            pipe._device_params, yuv_b, pipe._support_kv, held_b["s"],
            pipe._support_mask)
        return packed_out

    return run_step, run_batch, b


def interleaved_times(progs: Dict[str, Dict[str, Any]], n_blocks: int,
                      block: int) -> None:
    """Time every program in rotating round-robin blocks; fill rows."""
    from tools.roofline import _fetch_sync

    names = list(progs)
    for name in names:  # warmup all first: no compile inside the timing
        out = None
        for _ in range(3):
            out = progs[name]["fn"]()
        _fetch_sync(out)
    times: Dict[str, List[float]] = {n: [] for n in names}
    for i in range(n_blocks):
        order = names[i % len(names):] + names[:i % len(names)]
        for name in order:
            fn = progs[name]["fn"]
            t0 = time.perf_counter()
            out = None
            for _ in range(block):
                out = fn()
            _fetch_sync(out)
            times[name].append((time.perf_counter() - t0) / block)
    for name in names:
        per_call = progs[name].get("calls_per_item", 1)
        ts = np.asarray(times[name]) / per_call * 1e3
        progs[name]["per_frame_ms"] = round(float(ts.min()), 4)
        progs[name]["median_ms"] = round(float(np.median(ts)), 4)
        progs[name]["blocks_ms"] = [round(float(t), 4) for t in ts]


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--json", default=None)
    parser.add_argument("--blocks", type=int, default=6)
    parser.add_argument("--block", type=int, default=40)
    parser.add_argument("--skip-fused", action="store_true")
    parser.add_argument("--with-f32", action="store_true",
                        help="also audit the packed fused step at float32 "
                             "params (same-session param_dtype A/B)")
    parser.add_argument("--param-dtype", default="bfloat16",
                        choices=["float32", "bfloat16"],
                        help="param dtype for the fused A/B pair")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. 'cpu' to smoke-test "
                             "the harness off-chip; sitecustomize overrides "
                             "JAX_PLATFORMS, so env alone does not stick)")
    parser.add_argument("--init-timeout", type=float, default=240.0)
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from isbfsar_tpu.utils.watchdog import await_backend

    cause = await_backend(args.init_timeout)
    if cause is not None:
        print(f"[ab_warp] FATAL: {cause}", file=sys.stderr)
        os._exit(2)

    from isbfsar_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    progs: Dict[str, Dict[str, Any]] = {}

    for packed, tag in ((True, "packed"), (False, "fourgather")):
        _patch_warp(packed)
        progs[f"focus_frame/{tag}"] = {"fn": _build_focus(rng)}
        if not args.skip_fused:
            step, batch, b = _build_fused(rng, args.param_dtype)
            progs[f"fused_step/{tag}/{args.param_dtype}"] = {"fn": step}
            progs[f"fused_batch16/{tag}/{args.param_dtype}"] = {
                "fn": batch, "calls_per_item": b}
    if args.with_f32 and not args.skip_fused and args.param_dtype != "float32":
        _patch_warp(True)
        step, batch, b = _build_fused(rng, "float32")
        progs["fused_step/packed/float32"] = {"fn": step}
        progs["fused_batch16/packed/float32"] = {
            "fn": batch, "calls_per_item": b}
    _patch_warp(True)  # restore the shipped default

    interleaved_times(progs, args.blocks, args.block)

    rows = []
    for name, p in progs.items():
        rows.append({"name": name, "per_frame_ms": p["per_frame_ms"],
                     "median_ms": p["median_ms"], "blocks_ms": p["blocks_ms"]})
        print(f"[ab_warp] {name:36s} {p['per_frame_ms']:8.3f} ms/frame "
              f"(median {p['median_ms']:.3f}, blocks {p['blocks_ms']})",
              file=sys.stderr)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"blocks": args.blocks, "block": args.block,
                       "rows": rows}, f, indent=2)
        print(f"[ab_warp] wrote {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()
