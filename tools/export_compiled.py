"""AOT export of the fused pipeline — the TPU analog of the reference's
engine-build toolchain.

The reference freezes its networks offline into TensorRT engines and parity
-checks the exports (reference modules/hpe/setup/1-7, modules/ar/setup/
1_extract_onnx.py:36-46 "diff vs PyTorch"). The XLA equivalent is
``jax.export``: serialize the jit-compiled fused step (StableHLO) to disk so
serving loads a frozen program with zero retracing, then numerically diff
the reloaded program against the live one — the same boundary-parity
philosophy (SURVEY §4.2).

Usage:
    python tools/export_compiled.py --out exported/ [--check]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export_pipeline(out_dir: str, check: bool = True, with_focus: bool = True) -> str:
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from isbfsar_tpu.pipeline import StreamState

    # the fused step threads a StreamState namedtuple; jax.export needs
    # custom pytree containers registered for serialization
    try:
        jexport.register_namedtuple_serialization(
            StreamState, serialized_name="isbfsar_tpu.StreamState"
        )
    except ValueError:
        pass  # already registered (repeat invocation in one process)

    from isbfsar_tpu.configs import PipelineConfig
    from isbfsar_tpu.pipeline import FusedPipeline

    pipe = FusedPipeline(PipelineConfig(), with_focus=with_focus)
    rng = np.random.default_rng(0)
    for i in range(2):
        pipe.ar.train(
            {
                "flag": f"a{i}",
                "data": {"poses": rng.normal(size=(pipe.config.ar.seq_len, 90)).astype(np.float32)},
                "requires_focus": False,
            }
        )
    pipe.start()

    h, w = pipe.hpe.frame_shape
    frame = jnp.zeros((h, w, 3), jnp.uint8)
    args = (
        pipe._device_params,
        frame,
        pipe._support_kv,
        pipe.init_state(),
        pipe._support_mask,
    )

    exported = jexport.export(jax.jit(pipe._step_impl))(*args)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "fused_step.stablehlo")
    with open(path, "wb") as f:
        f.write(exported.serialize())
    print(f"[export] wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB)")

    if check:
        # boundary parity: reload and diff against the live program.
        # pipe._step donates its state argument (donate_argnums=(3,)), so
        # each call gets a FRESH state buffer — reusing one would pass a
        # deleted array to the second call.
        with open(path, "rb") as f:
            reloaded = jexport.deserialize(f.read())
        live_out, _ = pipe._step(*args[:3], pipe.init_state(), args[4])
        exp_out, _ = reloaded.call(*args[:3], pipe.init_state(), args[4])
        diff = float(jnp.max(jnp.abs(live_out - exp_out)))
        print(f"[export] parity max|diff| = {diff:.3e}")
        assert diff < 1e-4, "exported program diverges from the live one"
    return path


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="exported")
    parser.add_argument("--check", action=argparse.BooleanOptionalAction, default=True)
    parser.add_argument("--no-focus", action="store_true")
    args = parser.parse_args()
    export_pipeline(args.out, check=args.check, with_focus=not args.no_focus)


if __name__ == "__main__":
    main()
