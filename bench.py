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
import sys
import time

import numpy as np


def main() -> None:
    import jax

    from isbfsar_tpu.configs import PipelineConfig
    from isbfsar_tpu.pipeline import FusedPipeline
    from isbfsar_tpu.runtime.source import SyntheticSource

    config = PipelineConfig()
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
    jax.block_until_ready(out)

    n = 100
    lat = []
    t_start = time.time()
    for i in range(n):
        t0 = time.perf_counter()
        out = pipe.step(frames[i % len(frames)])
        elements = pipe.decode(out)  # forces device->host sync of the scalars
        lat.append(time.perf_counter() - t0)
    total = time.time() - t_start

    fps = n / total
    p50 = float(np.percentile(lat, 50) * 1000)
    p99 = float(np.percentile(lat, 99) * 1000)
    print(
        f"[bench] fps={fps:.1f} p50={p50:.2f}ms p99={p99:.2f}ms "
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
