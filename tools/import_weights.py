"""Real-weight wiring: upstream checkpoint files -> framework params.

The proven importers (isbfsar_tpu/utils/checkpoint.py, certified against
vendored upstream layer orders in tests/test_upstream_import.py) need only
the FILES — which cannot be downloaded in this environment. This CLI is the
single documented command that, the day the files exist, goes files ->
params -> (optionally) the real FSOS protocol:

    python tools/import_weights.py --out weights/ \
        --trxos DISC.pth --input-type skeleton \
        --yolo yolov4.pth \
        --effnetv2 metrabs_effnetv2l_vars.npz \
        --gaze-resnet eth-xgaze_resnet18.pth \
        --fsos-data data/test --fsos-exemplars data/exemplars

Source files (reference utils/params.py:110-116 + setup scripts):
- ``DISC.pth`` / ``EXP.pth`` — reference TRXOS checkpoints
  (modules/ar/utils/model.py); rgb/hybrid checkpoints include the
  ResNet-50 branch (``import_trxos_full`` handles both).
- ``yolov4.pth`` — Tianxiaomo pytorch-YOLOv4 (the file the reference's
  engine toolchain consumes, setup/1_extract_yolo_onnx.py).
- MetrABS EffNetV2-L variables — the reference extracts
  ``model.crop_model.variables`` from the TF SavedModel
  (setup/2_extract_bbone_heads.py:36-47). TensorFlow is not a dependency
  here; export the list once on any machine that has it:
      np.savez("metrabs_effnetv2l_vars.npz",
               **{v.name: v.numpy() for v in model.crop_model.variables})
  A TF checkpoint path also works when tensorflow IS importable.
- ``eth-xgaze_resnet18.pth`` — ptgaze's gaze regressor (the reference's
  focus alt path, modules/focus/gaze_estimation).

Each section SKIPS cleanly (exit code stays 0) when its file is absent, so
the command is safe to run incrementally. Outputs are flax-msgpack files in
``--out``: hpe.msgpack ({"yolo","bbone","head"} — the
``HumanPoseEstimator(params=...)`` tree), trxos.msgpack
(``ActionRecognizer``/``TRXOS`` variables), gaze_resnet.msgpack. With
--fsos-data, runs the reference's FSOS protocol (compute_fsos.py:40-146)
on the imported TRXOS and prints the score to compare against the
published 0.67 +- 0.06 (BASELINE.md #2).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_torch(path: str):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):  # whole-module checkpoint
        sd = sd.state_dict()
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return sd


def _load_tf_vars(path: str):
    """(name, array) list from an .npz export or a TF checkpoint path."""
    if path.endswith(".npz"):
        data = np.load(path)
        return [(name, data[name]) for name in data.files]
    try:
        import tensorflow as tf  # optional — not a baked-in dependency
    except ImportError:
        raise SystemExit(
            f"{path}: not an .npz and tensorflow is not importable. Export "
            f"the variables to .npz as documented in this file's docstring."
        )
    reader = tf.train.load_checkpoint(path)
    return [
        (name, reader.get_tensor(name))
        for name in sorted(reader.get_variable_to_shape_map())
    ]


def _save(tree, out_dir: str, name: str) -> str:
    from flax import serialization

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, name)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            __import__("jax").tree.map(np.asarray, tree)))
    print(f"[import] wrote {path}")
    return path


def load_imported(out_dir: str, name: str):
    """Read back a tree written by this tool (plain dicts of numpy arrays,
    the shape ``params=`` consumers expect)."""
    from flax import serialization

    with open(os.path.join(out_dir, name), "rb") as f:
        return serialization.msgpack_restore(f.read())


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    parser.add_argument("--out", required=True, help="output weights dir")
    parser.add_argument("--trxos", default=None, help="DISC.pth / EXP.pth")
    parser.add_argument("--input-type", default="skeleton",
                        choices=["skeleton", "rgb", "hybrid"])
    parser.add_argument("--yolo", default=None, help="Tianxiaomo yolov4.pth")
    parser.add_argument("--effnetv2", default=None,
                        help="MetrABS EffNetV2-L vars (.npz or TF ckpt)")
    parser.add_argument("--gaze-resnet", default=None,
                        help="ETH-XGaze resnet18 .pth (ptgaze)")
    parser.add_argument("--fsos-data", default=None,
                        help="query dataset root: run the FSOS protocol "
                             "on the imported TRXOS")
    parser.add_argument("--fsos-exemplars", default=None)
    parser.add_argument("--k", type=int, default=5)
    parser.add_argument("--repeats", type=int, default=10)
    args = parser.parse_args(argv)

    from isbfsar_tpu.utils import checkpoint as ckpt

    def have(path, label):
        if path is None:
            return False
        if not os.path.exists(path):
            print(f"[import] SKIP {label}: {path} not found")
            return False
        return True

    def zeros_template(model, input_shape):
        """Shape-only variables tree (no init compute): the importers
        overwrite every leaf (certified in tests/test_upstream_import.py),
        so a zeros template is exact and costs nothing."""
        import jax
        import jax.numpy as jnp

        shapes = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros(input_shape)), jax.random.key(0)
        )
        return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)

    trxos_vars = None
    if have(args.trxos, "TRXOS"):
        trxos_vars = ckpt.import_trxos_full(_load_torch(args.trxos), args.input_type)
        _save(trxos_vars, args.out, "trxos.msgpack")

    hpe_tree = {}
    if have(args.yolo, "YOLOv4"):
        import jax.numpy as jnp

        from isbfsar_tpu.models.yolov4 import YOLOv4

        variables = zeros_template(YOLOv4(dtype=jnp.bfloat16), (1, 256, 256, 3))
        hpe_tree["yolo"] = ckpt.import_yolov4_tianxiaomo(
            _load_torch(args.yolo), variables
        )
    if have(args.effnetv2, "EffNetV2-L"):
        import jax.numpy as jnp

        from isbfsar_tpu.models.effnetv2 import V2_L, EfficientNetV2

        variables = zeros_template(
            EfficientNetV2(stages=V2_L, dtype=jnp.bfloat16), (1, 256, 256, 3)
        )
        tf_vars = _load_tf_vars(args.effnetv2)
        # split off the MetrABS head (a single dense "conv_final"/288-out
        # layer rides with the backbone vars in the reference's extraction,
        # setup/4_create_heads_onnx.py:7-26)
        head_vars = [(n, v) for n, v in tf_vars
                     if "conv_final" in n or "head_final" in n]
        bbone_vars = [nv for nv in tf_vars if nv not in head_vars]
        hpe_tree["bbone"] = ckpt.import_metrabs_effnetv2(bbone_vars, variables)
        if head_vars:
            kernels = [np.asarray(v) for n, v in head_vars if np.asarray(v).ndim >= 2]
            if not kernels:
                raise SystemExit(
                    f"{args.effnetv2}: matched head variables "
                    f"{[n for n, _ in head_vars]} contain no >=2-D kernel — "
                    f"the MetrABS conv_final export looks malformed"
                )
            kernel = kernels[0]
            kernel = kernel.reshape(kernel.shape[-2], kernel.shape[-1])
            bias_arrs = [np.asarray(v) for n, v in head_vars if np.asarray(v).ndim == 1]
            head = {"conv_final": {"kernel": kernel}}
            if bias_arrs:
                head["conv_final"]["bias"] = bias_arrs[0]
            hpe_tree["head"] = {"params": head}
    if hpe_tree:
        _save(hpe_tree, args.out, "hpe.msgpack")

    if have(args.gaze_resnet, "gaze ResNet-18"):
        rn = ckpt.import_resnet_torch(_load_torch(args.gaze_resnet),
                                      stage_sizes=(2, 2, 2, 2))
        _save(rn, args.out, "gaze_resnet.msgpack")

    if args.fsos_data:
        if trxos_vars is None:
            print("[import] FSOS requested but no TRXOS checkpoint imported",
                  file=sys.stderr)
            return 1
        from isbfsar_tpu.configs import ARConfig
        from isbfsar_tpu.train.fsos import evaluate_fsos, summarize

        cfg = ARConfig.for_input(args.input_type)
        results = evaluate_fsos(
            cfg, trxos_vars, args.fsos_data,
            args.fsos_exemplars or args.fsos_data,
            k=args.k, n_repeats=args.repeats,
        )
        print(f"[import] FSOS on imported TRXOS: {summarize(results)} "
              f"(reference publishes 0.67 +- 0.06, BASELINE.md #2)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
