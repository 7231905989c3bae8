"""Headline benchmark: end-to-end streaming FPS on one TPU chip.

Measures the fused frame->pose->embed->match(->focus) pipeline
(isbfsar_tpu/pipeline.py) on a synthetic 640x480 BGR stream with a 2-action
support set: production model sizes (YOLOv4 width 1.0, EfficientNetV2-L),
honest per-frame cost including the host->device frame transfer and the
host-side flag decode. Baseline: 30 FPS (BASELINE.json target; the
reference never published a number — its RealSense pipeline is 30-FPS-class
on an RTX GPU per SURVEY §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

def main() -> None:
    import jax

    # Persistent XLA compile cache: warmup compiles the big fused programs
    # once (~15 min through the remote-compile relay); later runs reuse them.
    jax.config.update("jax_compilation_cache_dir", "/tmp/isbfsar_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from isbfsar_tpu.configs import PipelineConfig
    from isbfsar_tpu.pipeline import FusedPipeline
    from isbfsar_tpu.runtime.source import SyntheticSource

    import dataclasses

    config = PipelineConfig()
    # Random-init weights never clear the reference's 0.3 confidence gate;
    # thresh 0 keeps the full detect->pose->match path engaged so the bench
    # measures the real per-frame work.
    config = dataclasses.replace(config, hpe=dataclasses.replace(config.hpe, yolo_thresh=0.0))
    t0 = time.time()
    print("[bench] building pipeline (param init)...", file=sys.stderr)
    pipe = FusedPipeline(config, with_focus=True)
    print(f"[bench] built in {time.time() - t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    for i in range(2):
        pipe.ar.train(
            {
                "flag": f"action_{i}",
                "data": {
                    "poses": rng.normal(size=(config.ar.seq_len, 90)).astype(np.float32)
                },
                "requires_focus": False,
            }
        )
    pipe.start()

    print("[bench] compiling + warmup...", file=sys.stderr)
    t0 = time.time()
    pipe.warmup(3)
    print(f"[bench] warmup done in {time.time() - t0:.1f}s", file=sys.stderr)

    source = SyntheticSource(640, 480)
    frames = [source.read()[1] for _ in range(32)]

    # prime the window so the AR path is in steady state
    for f in frames[:20]:
        out = pipe.step(f)

    # synchronous per-frame latency (dispatch -> decoded elements)
    n = 100
    lat = []
    for i in range(n):
        t0 = time.perf_counter()
        elements = pipe.decode(pipe.step(frames[i % len(frames)]))
        lat.append(time.perf_counter() - t0)
    p50 = float(np.percentile(lat, 50) * 1000)
    p99 = float(np.percentile(lat, 99) * 1000)

    # micro-batched streaming throughput (one device round-trip per 8 frames;
    # amortizes the host<->device sync that dominates on remote-attached chips)
    batch = 8
    warm = pipe.stream_batched((frames[i % len(frames)] for i in range(2 * batch)), batch)
    for elements_raw in warm:
        pass
    n_stream = 128
    t_start = time.time()
    count = 0
    for out in pipe.stream_batched((frames[i % len(frames)] for i in range(n_stream)), batch):
        elements = pipe.decode(out)
        count += 1
    total = time.time() - t_start
    fps = count / total

    print(
        f"[bench] fps={fps:.1f} (stream batch={batch}) p50={p50:.2f}ms "
        f"p99={p99:.2f}ms (sync single-frame) "
        f"actions={list(elements.get('actions', {}).keys())}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "e2e_fps_pose_embed_match_640x480_v5e1",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
