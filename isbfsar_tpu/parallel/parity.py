"""Data-parallel numerical-parity certification.

The dp design's correctness claim is not "it runs on N devices" but "an
N-device step computes THE SAME update as the 1-device step" (the reference
analog: ``torch.nn.DataParallel`` is semantically transparent,
modules/ar/utils/model.py:360-369). This module runs one full TRX-OS
episodic training step (CE + gated discriminator BCE, optimizer update,
BN stats) on a 1-device mesh and an n-device mesh from identical inits and
identical batches, and reports the worst parameter/metric deviation.

Used by the driver's ``dryrun_multichip`` (so the multichip artifact
certifies equivalence, not just finiteness) and by tests/test_parallel.py.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import numpy as np


def _one_step_params(cfg, mesh, batch, seed: int = 0):
    from isbfsar_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, mesh=mesh, log_dir="/tmp/isbfsar_dryrun", use_wandb=False, seed=seed)
    summary = trainer.run_epoch(0, [batch], train=True)
    params = jax.tree.map(np.asarray, trainer.params)
    stats = jax.tree.map(np.asarray, trainer.batch_stats)
    return params, stats, summary


def dp_parity_check(n_devices: int, atol: float = 2e-6) -> Dict[str, float]:
    """Assert 1-device vs n-device dp training-step equivalence.

    Returns {"max_param_diff", "max_stats_diff", "max_metric_diff"} after
    asserting each is within ``atol``. The batch size equals ``n_devices``
    so the n-device run places exactly one episode per device — the
    strictest sharding (any cross-device reduction bug shows immediately).
    """
    from isbfsar_tpu.configs import ARConfig
    from isbfsar_tpu.parallel.mesh import make_mesh

    cfg = dataclasses.replace(
        ARConfig.for_input("skeleton"),
        batch_size=n_devices,
        n_task=n_devices,
        eval_every_n_epoch=10_000,
    )
    rng = np.random.default_rng(0)
    b, way, L, d = n_devices, cfg.way, cfg.seq_len, cfg.n_joints * 3
    batch = {
        "support_set": {"sk": rng.normal(size=(b, way, L, d)).astype(np.float32)},
        "target_set": {"sk": rng.normal(size=(b, L, d)).astype(np.float32)},
        "unknown_set": {"sk": rng.normal(size=(b, L, d)).astype(np.float32)},
        "support_classes": np.tile(np.arange(way, dtype=np.int32), (b, 1)),
        "target_class": np.zeros((b,), np.int32),
        "known": np.ones((b,), bool),
    }

    p1, s1, m1 = _one_step_params(cfg, make_mesh(1), batch)
    pn, sn, mn = _one_step_params(cfg, make_mesh(n_devices), batch)

    def max_diff(a, b):
        diffs = jax.tree.leaves(
            jax.tree.map(lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()), a, b)
        )
        return max(diffs) if diffs else 0.0

    report = {
        "max_param_diff": max_diff(p1, pn),
        "max_stats_diff": max_diff(s1, sn),
        "max_metric_diff": max(
            abs(float(m1[k]) - float(mn[k])) for k in m1 if k in mn
        ),
    }
    for name, v in report.items():
        assert v <= atol, (
            f"dp parity violated: {name}={v:.3e} > atol={atol:.1e} "
            f"(1 device vs {n_devices} devices)\n1-dev metrics: {m1}\nn-dev metrics: {mn}"
        )
    return report


def way_sharding_parity_check(n_devices: int, atol: float = 1e-5) -> Dict[str, float]:
    """Assert the way-sharded (expert-parallel) support match equals the
    single-device cached match (parallel/support.py's correctness claim):
    a 2*n_devices-class support set sharded over the mesh must reproduce
    the recognizer's own probabilities and open-set score."""
    from isbfsar_tpu.ar.recognizer import ActionRecognizer
    from isbfsar_tpu.configs import ARConfig
    from isbfsar_tpu.parallel.mesh import make_mesh
    from isbfsar_tpu.parallel.support import WayShardedMatcher

    cfg = dataclasses.replace(ARConfig.for_input("skeleton"), way=2 * n_devices)
    ar = ActionRecognizer(cfg)
    rng = np.random.default_rng(0)
    # at least one live class even on a 1-device mesh (way=2 -> train 1)
    for i in range(max(1, cfg.way - 3)):  # some masked slots stay empty
        ar.train({
            "flag": f"class_{i}",
            "data": {"poses": rng.normal(size=(cfg.seq_len, 90)).astype(np.float32)},
            "requires_focus": False,
        })
    frames = [rng.normal(size=90).astype(np.float32) for _ in range(cfg.seq_len)]
    for f in frames[:-1]:
        ar.inference({"sk": f})
    ref_probs, ref_ist, _ = ar.inference({"sk": frames[-1]})

    matcher = WayShardedMatcher(ar, make_mesh(n_devices))
    probs, ist = matcher.match_window({"sk": np.stack(frames)})
    assert set(probs) == set(ref_probs)
    max_prob_diff = max(abs(probs[n] - ref_probs[n]) for n in ref_probs)
    report = {
        "max_prob_diff": max_prob_diff,
        "is_true_diff": abs(ist - ref_ist),
        "classes_per_device": matcher._features.sharding.shard_shape(
            matcher._features.shape
        )[0],
    }
    assert max_prob_diff <= atol and report["is_true_diff"] <= atol, (
        f"way-sharding parity violated: {report}"
    )
    return report
