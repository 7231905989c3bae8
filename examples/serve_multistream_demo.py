"""Multi-stream mesh serving demo: S cameras on one program, composable
way-sharding for big support sets.

Runs on any device count — use a virtual mesh to try the sharding without
hardware:

    python examples/serve_multistream_demo.py \
        --way-devices 2 --virtual-devices 8

On a real v5e-8 slice drop --virtual-devices: 8 streams ride the 8 chips
at the single-chip frame rate (docs/SCALING.md). The virtual-CPU run uses
the production model sizes, so it is minutes-slow — it demonstrates the
sharding wiring, not speed; action scores appear once a stream's window
holds seq_len (16) frames.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--streams", type=int, default=0,
                        help="0 = one stream per dp-device (always valid)")
    parser.add_argument("--way-devices", type=int, default=1,
                        help=">1 also shards the support classes over a "
                        "second mesh axis (way must divide evenly)")
    parser.add_argument("--way", type=int, default=16)
    parser.add_argument("--frames", type=int, default=32)
    parser.add_argument("--virtual-devices", type=int, default=0,
                        help="force an N-device virtual CPU mesh (this "
                        "box's sitecustomize overrides JAX_PLATFORMS env "
                        "vars, so the flag sets jax.config directly)")
    args = parser.parse_args()

    import jax

    if args.virtual_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.virtual_devices)

    from isbfsar_tpu.ar.recognizer import ActionRecognizer
    from isbfsar_tpu.configs import ARConfig, PipelineConfig
    from isbfsar_tpu.parallel.mesh import make_mesh, make_mesh_2d
    from isbfsar_tpu.pipeline import FusedPipeline
    from isbfsar_tpu.runtime.source import SyntheticSource
    from isbfsar_tpu.serving import MultiStreamPipeline

    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].platform}")

    ar_cfg = dataclasses.replace(ARConfig.for_input("skeleton"), way=args.way)
    ar = ActionRecognizer(ar_cfg)
    rng = np.random.default_rng(0)
    for i in range(min(5, args.way)):
        ar.train({
            "flag": f"action_{i}",
            "data": {"poses": rng.normal(size=(ar_cfg.seq_len, 90)).astype(np.float32)},
            "requires_focus": False,
        })
    cfg = dataclasses.replace(
        PipelineConfig(), ar=ar_cfg,
        hpe=dataclasses.replace(PipelineConfig().hpe, yolo_thresh=0.0),
    )
    pipe = FusedPipeline(cfg, ar=ar, with_focus=False)

    if args.way_devices > 1:
        mesh = make_mesh_2d((n_dev // args.way_devices, args.way_devices))
        n_streams = args.streams or (n_dev // args.way_devices)
        multi = MultiStreamPipeline(
            n_streams=n_streams, mesh=mesh, pipe=pipe, way_axis="way"
        )
        print(f"mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}: "
              f"{n_streams} streams on dp, {args.way} classes sharded over "
              f"{args.way_devices} way-devices")
    else:
        n_streams = args.streams or n_dev
        multi = MultiStreamPipeline(n_streams=n_streams, mesh=make_mesh(), pipe=pipe)
        print(f"1D mesh ({n_dev} devices): {n_streams} streams sharded, "
              f"support replicated")

    multi.start()
    sources = [SyntheticSource(640, 480) for _ in range(n_streams)]

    t0 = time.time()
    outs = None
    for _ in range(args.frames):
        frames = np.stack([s.read()[1] for s in sources])
        outs = multi.step(frames)
    dt = time.time() - t0
    print(f"{args.frames} steps x {n_streams} streams in {dt:.1f}s "
          f"-> {args.frames * n_streams / dt:.1f} stream-frames/s")
    for i, out in enumerate(outs):
        elements = multi.decode(out)
        print(f"stream {i}: actions={ {k: round(v, 3) for k, v in elements.get('actions', {}).items()} }")


if __name__ == "__main__":
    main()
