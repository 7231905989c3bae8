"""FSOS evaluation protocol: few-shot + open-set accuracy.

Rebuild of the reference's headline benchmark harness (reference
modules/ar/utils/test/compute_fsos.py:40-146): sample K support classes
from the held-out test classes, build an exemplar support set, run every
query clip, and score

- FS-ACC: argmax accuracy on known queries (compute_fsos.py:105-108)
- OS-ACC: (is_true > 0.5) == known over all queries (compute_fsos.py:101-102)
- FSOS-ACC: known & FS-correct & OS-correct, or unknown & OS-correct
  (compute_fsos.py:110-114)

repeated ``n_repeats`` times with fresh class draws. This is the metric the
reference publishes (0.67 +/- 0.06 FSOS at ckpt 2500, BASELINE.md).

TPU design: queries are batched and the whole support set's features are
embedded once per repeat and cached — the per-batch forward is the cached
path (identical to the live recognizer's steady state).
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from isbfsar_tpu.configs import ARConfig
from isbfsar_tpu.models.trx import TRXOS
from isbfsar_tpu.train.dataloader import FSOSEpisodicSampler, batch_iterator


def evaluate_fsos(
    config: ARConfig,
    params,
    queries_path: str,
    exemplars_path: str,
    k: int = 5,
    n_repeats: int = 10,
    batch_size: int = 8,
    n_test_classes: Optional[int] = None,
    seed: int = 0,
) -> Dict[str, List[float]]:
    model = TRXOS(config)
    if "params" not in params:  # accept a bare param collection (Trainer.params)
        params = {"params": params}
    rng = random.Random(seed)

    @jax.jit
    def forward(params, support, mask, target):
        out = model.apply(params, target, mask, support_data=support)
        return out["logits"], out["is_true"][:, 0]

    # Repeats must draw DIFFERENT support classes (compute_fsos.py:77-79
    # samples from the full held-out class list every repetition) — default
    # to the actual class count on disk, never to k, which would degenerate
    # every repeat to the same support set. The ids index the EXEMPLARS
    # tree (FSOSEpisodicSampler.support_class_ids -> exemplar classes), so
    # the count must come from that tree — a query tree with extra classes
    # would otherwise yield out-of-range ids.
    if n_test_classes is None:
        from isbfsar_tpu.train.dataloader import list_classes

        n_test_classes = len(list_classes(exemplars_path))

    results = {"FSOS-ACC": [], "FS-ACC": [], "OS-ACC": []}
    k_eff = min(k, n_test_classes)
    for rep in range(n_repeats):
        sampler = FSOSEpisodicSampler(
            queries_path,
            exemplars_path,
            support_class_ids=rng.sample(range(n_test_classes), k_eff),
            l=config.seq_len,
            input_type=config.input_type,
        )
        fs_hits: List[np.ndarray] = []
        os_hits: List[np.ndarray] = []
        fsos_hits: List[np.ndarray] = []

        # drop_last=False: queries are listed class-by-class in sorted
        # order, so dropping the tail would systematically under-sample the
        # last class on EVERY repeat (the tail batch costs one extra jit
        # compile for its size — once, cached after).
        for batch in batch_iterator(sampler, batch_size, shuffle=False, drop_last=False):
            b = batch["target_class"].shape[0]
            # mask width must match the support tensor (k_eff classes), not
            # config.way — k != way crashed the forward with a shape error
            mask = jnp.ones((b, k_eff), bool)
            support = jax.tree.map(jnp.asarray, batch["support_set"])
            target = jax.tree.map(jnp.asarray, batch["target_set"])
            logits, is_true = forward(params, support, mask, target)

            known = np.asarray(batch["known"], bool)
            sc = np.asarray(batch["support_classes"])
            tc = np.asarray(batch["target_class"])[:, None]
            target_idx = np.argmax(sc == tc, axis=1)

            pred = np.asarray(jnp.argmax(logits, axis=1))
            os_pred = np.asarray(is_true) > 0.5

            true_os = os_pred == known
            true_fs = pred == target_idx
            os_hits.append(true_os)
            fs_hits.append(true_fs[known])
            fsos_hits.append((known & true_fs & true_os) | (~known & true_os))

        def ratio(parts):
            flat = np.concatenate(parts) if parts else np.zeros(0)
            return float(flat.mean()) if flat.size else -1.0

        results["FS-ACC"].append(ratio(fs_hits))
        results["OS-ACC"].append(ratio(os_hits))
        results["FSOS-ACC"].append(ratio(fsos_hits))
    return results


def summarize(results: Dict[str, List[float]]) -> Dict[str, str]:
    return {
        k: f"{np.mean(v):.3f} +/- {np.std(v):.3f}" for k, v in results.items() if v
    }
