"""Evaluation CLI — the reference's test-script entry points in one tool.

    python -m isbfsar_tpu.train.eval_cli fsos --data <queries> --exemplars <ex> \
        --checkpoint runs/trx/checkpoints/29.msgpack [--repeats 10] [--plot fsos.png]
    python -m isbfsar_tpu.train.eval_cli episodic --data <queries> --checkpoint ...
    python -m isbfsar_tpu.train.eval_cli confusion --data <queries> --exemplars <ex> \
        --checkpoint ... [--plot cm.png]

Covers reference modules/ar/utils/test/compute_fsos.py, utils/test.py and
test/create_confusion_matrix.py + the plot scripts.
"""

from __future__ import annotations

import argparse
import json


def _load_params(cfg, path):
    import jax
    import jax.numpy as jnp

    from isbfsar_tpu.models.trx import TRXOS
    from isbfsar_tpu.utils.checkpoint import load_checkpoint

    model = TRXOS(cfg)
    shapes = {"sk": (cfg.n_joints * 3,), "rgb": (cfg.rgb_size, cfg.rgb_size, 3)}
    keys = {"skeleton": ("sk",), "rgb": ("rgb",), "hybrid": ("rgb", "sk")}[cfg.input_type]
    q = {m: jnp.zeros((1, cfg.seq_len) + shapes[m]) for m in keys}
    s = {m: jnp.zeros((1, cfg.way, cfg.seq_len) + shapes[m]) for m in keys}
    template = jax.jit(
        lambda k: model.init(k, q, jnp.ones((1, cfg.way), bool), support_data=s)
    )(jax.random.key(0))
    state = load_checkpoint(
        path,
        {
            "params": template["params"],
            # rgb/hybrid checkpoints carry trained BN running stats; an
            # empty template would silently drop them and the eval forward
            # (use_running_average=True) could not find its mean/var
            "batch_stats": template.get("batch_stats", {}),
            "opt_state": None,
        },
    )
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]
    return variables


def main() -> None:
    # Env-var platform selection does NOT survive this box's sitecustomize
    # (it force-registers the remote TPU and overrides JAX_PLATFORMS);
    # honor an explicit ISBFSAR_PLATFORM by setting the config before the
    # backend initializes. ISBFSAR_PLATFORM=cpu makes this CLI runnable
    # while the shared relay is wedged or busy.
    import os

    if os.environ.get("ISBFSAR_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["ISBFSAR_PLATFORM"])

    from isbfsar_tpu.configs import ARConfig
    from isbfsar_tpu.utils.cache import enable_compile_cache

    parser = argparse.ArgumentParser()
    parser.add_argument("mode", choices=["fsos", "episodic", "confusion"])
    parser.add_argument("--data", required=True)
    parser.add_argument("--exemplars", default=None)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--input-type", default="skeleton")
    parser.add_argument("--k", type=int, default=5)
    parser.add_argument("--repeats", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--plot", default=None)
    parser.add_argument("--os-threshold", type=float, default=0.5,
                        help="open-set decision threshold for fsos mode "
                             "(reference protocol 0.5, compute_fsos.py:"
                             "101-102; pass a calibrate_os_threshold "
                             "result to score at the calibrated gate)")
    parser.add_argument("--calibrate", default=None, metavar="TRAIN_TREE",
                        help="fsos mode: first calibrate the open-set "
                             "threshold on this TRAIN-class tree "
                             "(train/fsos.py::calibrate_os_threshold) and "
                             "report both thresholds' metrics")
    args = parser.parse_args()

    enable_compile_cache()
    cfg = ARConfig.for_input(args.input_type)
    params = _load_params(cfg, args.checkpoint)

    if args.mode == "fsos":
        from isbfsar_tpu.train.dataloader import list_classes
        from isbfsar_tpu.train.fsos import (
            calibrate_os_threshold,
            evaluate_fsos,
            metrics_at_threshold,
            summarize,
        )

        exemplars = args.exemplars or args.data
        results = evaluate_fsos(
            cfg, params, args.data, exemplars, k=args.k, n_repeats=args.repeats,
            batch_size=args.batch_size, n_test_classes=len(list_classes(exemplars)),
            os_threshold=args.os_threshold, collect_raw=bool(args.calibrate),
        )
        print(json.dumps(summarize(results)))
        if args.calibrate:
            calib = calibrate_os_threshold(
                cfg, params, args.calibrate, k=args.k,
                n_repeats=args.repeats, batch_size=args.batch_size,
            )
            print(json.dumps({"os_calibration": calib}))
            print(json.dumps({
                f"fsos@{calib['os_threshold']}": summarize(
                    metrics_at_threshold(results["_raw"],
                                         calib["os_threshold"])
                )
            }))
        if args.plot:
            from isbfsar_tpu.train.evals import plot_fsos

            plot_fsos(results, args.plot)
    elif args.mode == "episodic":
        from isbfsar_tpu.train.evals import episodic_test

        metrics = episodic_test(cfg, params, args.data, batch_size=args.batch_size)
        print(json.dumps(metrics))
    else:
        from isbfsar_tpu.train.evals import discriminator_confusion, plot_confusion
        from isbfsar_tpu.train.dataloader import list_classes

        exemplars = args.exemplars or args.data
        classes = list_classes(exemplars)
        matrix = discriminator_confusion(cfg, params, args.data, exemplars, classes)
        print(json.dumps({"classes": classes, "matrix": matrix.tolist()}))
        if args.plot:
            plot_confusion(matrix, classes, args.plot)


if __name__ == "__main__":
    main()
