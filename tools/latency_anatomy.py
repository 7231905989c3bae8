"""Latency anatomy: decompose the sync serve path against the 33 ms budget.

Round 4's serve-discipline table left the HRI question open: serve_loop
reads ~44 ms p50 submit->result — 1.35x over the reference's 33 ms frame
budget (reference source.py:33 runs the camera at 30 FPS) — with the gap
ATTRIBUTED to relay RTT only in prose. This tool measures the parts in ONE
session so the attribution is arithmetic, not prose:

- ``rtt_tiny_ms``      round-trip of a 512-byte fetch through the relay
                       (pure transport+dispatch floor; no compute)
- ``h2d_frame_ms``     device_put of the real i420 payload, round-trip-
                       confirmed by a 1-element fetch
- ``device_ms``        the fused step's on-device envelope from a
                       jax.profiler trace captured IN THIS SESSION
                       (block_until_ready is NOT a barrier on the relay —
                       NEXT.md round-4 finding — so device time comes from
                       the trace, never from host timers)
- ``host_encode_ms``   bgr -> i420 on the host (numpy)
- ``host_decode_ms``   packed-vector unpack + element decode on the host
- ``sync_step_ms``     the end-to-end submit->result p50/p95 the serve
                       table quotes

The relay share is then sync - device - encode - decode (closed-form), and
the locally-attached projection is device + encode + decode + bytes/PCIe
(the reference's premise: a chip on the host bus, not behind a shared
relay). Receipt: docs/LATENCY_ANATOMY_r5.json + PERF.md table.

    python tools/latency_anatomy.py [--frames 100] [--out ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pct(xs, q):
    return float(np.percentile(np.asarray(xs) * 1000.0, q))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--frames", type=int, default=100)
    parser.add_argument("--trace-frames", type=int, default=30)
    parser.add_argument("--out", default="docs/LATENCY_ANATOMY_r5.json")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from isbfsar_tpu import pretrained
    from isbfsar_tpu.configs import PipelineConfig
    from isbfsar_tpu.hpe.estimator import HumanPoseEstimator
    from isbfsar_tpu.ops.image import bgr_to_i420
    from isbfsar_tpu.pipeline import FusedPipeline
    from isbfsar_tpu.train.posestack import render_motion_clip
    from isbfsar_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    config = PipelineConfig()
    prod = pretrained.load_calibrated("pose-prod-256")
    cam_hw = (config.main.cam_height, config.main.cam_width)
    hpe = HumanPoseEstimator(config.hpe, config.intrinsics, params=prod,
                             frame_shape=cam_hw)
    pipe = FusedPipeline(config, hpe=hpe, with_focus=True,
                         input_format="i420")
    rng = np.random.default_rng(0)
    for i in range(2):
        pipe.ar.train({
            "flag": f"action_{i}",
            "data": {"poses": rng.normal(
                size=(config.ar.seq_len, 90)).astype(np.float32)},
            "requires_focus": False,
        })
    pipe.start()
    print("[anatomy] warmup...", flush=True)
    pipe.warmup(3)

    bgr, _ = render_motion_clip("wave", n_frames=32, frame_hw=cam_hw,
                                intrinsics=config.intrinsics, cycles=2.0)
    payloads = [bgr_to_i420(f) for f in bgr]

    report = {"frames": args.frames}

    # --- pure transport floor: fetch 128 floats (512 B) of an on-device
    # constant; the jit is identity so compute ~ 0
    tiny = jax.device_put(np.zeros(128, np.float32))
    tiny_id = jax.jit(lambda x: x + 1.0)
    _ = np.asarray(tiny_id(tiny))  # compile
    ts = []
    for _ in range(50):
        t0 = time.perf_counter()
        _ = np.asarray(tiny_id(tiny))
        ts.append(time.perf_counter() - t0)
    report["rtt_tiny_ms"] = {"p50": pct(ts, 50), "p95": pct(ts, 95)}

    # --- H2D of the real payload, round-trip confirmed by a 1-element jit
    first = jax.jit(lambda x: x.reshape(-1)[:1].astype(jnp.float32))
    _ = np.asarray(first(jax.device_put(payloads[0])))
    ts = []
    for i in range(50):
        p = payloads[i % len(payloads)]
        t0 = time.perf_counter()
        _ = np.asarray(first(jax.device_put(p)))
        ts.append(time.perf_counter() - t0)
    report["h2d_frame_plus_rtt_ms"] = {"p50": pct(ts, 50), "p95": pct(ts, 95)}
    report["payload_bytes"] = int(payloads[0].nbytes)

    # --- host encode (bgr -> i420, numpy)
    ts = []
    for i in range(100):
        t0 = time.perf_counter()
        bgr_to_i420(bgr[i % len(bgr)])
        ts.append(time.perf_counter() - t0)
    report["host_encode_ms"] = {"p50": pct(ts, 50), "p95": pct(ts, 95)}

    # --- end-to-end sync step (submit -> decoded elements), the serve
    # table's quantity
    ts, dec = [], []
    for i in range(args.frames):
        p = payloads[i % len(payloads)]
        t0 = time.perf_counter()
        out = pipe.step(p)
        t1 = time.perf_counter()
        pipe.decode(out)
        t2 = time.perf_counter()
        ts.append(t1 - t0)
        dec.append(t2 - t1)
    report["sync_step_ms"] = {"p50": pct(ts, 50), "p95": pct(ts, 95)}
    report["host_decode_ms"] = {"p50": pct(dec, 50), "p95": pct(dec, 95)}
    report["packed_out_bytes"] = int(getattr(pipe.layout, "size", 0) * 4)

    # --- block-vs-fetch cross-validation (round-4 item: the 439%-MFU
    # incident showed relay block_until_ready is NOT a barrier; time the
    # SAME program both ways in one session to quantify what block-timing
    # under-reports)
    ts_block = []
    for i in range(args.frames):
        p = payloads[i % len(payloads)]
        t0 = time.perf_counter()
        packed = pipe.dispatch(p)
        packed.block_until_ready()
        ts_block.append(time.perf_counter() - t0)
    report["block_synced_step_ms"] = {"p50": pct(ts_block, 50),
                                      "p95": pct(ts_block, 95)}

    # --- device envelope from a trace in THIS session
    trace_dir = "/tmp/isbfsar_anatomy_trace"
    jax.profiler.start_trace(trace_dir)
    for i in range(args.trace_frames):
        pipe.step(payloads[i % len(payloads)])
    jax.profiler.stop_trace()
    from profile_prod import parse_xspace

    _, _, _, _, modules = parse_xspace(trace_dir)
    env = modules.get("jit__step_impl")
    device_ms = env["total_ms"] / env["calls"] if env else float("nan")
    report["device_ms_per_frame"] = round(device_ms, 3)

    # --- the arithmetic
    sync = report["sync_step_ms"]["p50"]
    enc = report["host_encode_ms"]["p50"]
    dec_ms = report["host_decode_ms"]["p50"]
    relay = sync - device_ms - dec_ms  # encode happens before submit here
    report["relay_share_ms"] = round(relay, 2)
    # locally-attached projection: device + hosts + payload over PCIe gen4
    # x16 (~25 GB/s effective) both ways
    pcie = (report["payload_bytes"] + 4096) / 25e9 * 1000
    proj = device_ms + enc + dec_ms + pcie
    report["projected_local_ms"] = round(proj, 2)
    report["projected_local_fps"] = round(1000.0 / proj, 1)
    report["budget_33ms_met_locally"] = bool(proj < 33.0)

    print(json.dumps(report, indent=2))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"[anatomy] wrote {args.out}")


if __name__ == "__main__":
    main()
