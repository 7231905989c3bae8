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
    os_threshold: float = 0.5,
    collect_raw: bool = False,
    exclude_exemplar_queries: bool = False,
) -> Dict[str, List[float]]:
    """``os_threshold`` parametrizes the open-set decision (the reference
    hard-codes 0.5, compute_fsos.py:101-102 — keep the default for parity
    receipts; ``calibrate_os_threshold`` below picks a better one on TRAIN
    classes with no test leakage). ``collect_raw`` additionally returns the
    per-query (score, known, fs_correct) triples per repeat under the
    ``"_raw"`` key so ``metrics_at_threshold`` can re-score any threshold
    without re-running the device forward. ``exclude_exemplar_queries``
    drops the exact exemplar clips from the query list — required when
    queries_path == exemplars_path (self-calibration), where the support
    clip would otherwise score itself."""
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

    results: Dict[str, List] = {"FSOS-ACC": [], "FS-ACC": [], "OS-ACC": []}
    raw: List[Dict[str, np.ndarray]] = []
    k_eff = min(k, n_test_classes)
    for rep in range(n_repeats):
        sampler = FSOSEpisodicSampler(
            queries_path,
            exemplars_path,
            support_class_ids=rng.sample(range(n_test_classes), k_eff),
            l=config.seq_len,
            input_type=config.input_type,
            exclude_exemplar_queries=exclude_exemplar_queries,
        )
        fs_hits: List[np.ndarray] = []
        os_hits: List[np.ndarray] = []
        fsos_hits: List[np.ndarray] = []
        rep_scores: List[np.ndarray] = []
        rep_known: List[np.ndarray] = []
        rep_fs: List[np.ndarray] = []

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
            scores = np.asarray(is_true)
            os_pred = scores > os_threshold

            true_os = os_pred == known
            true_fs = pred == target_idx
            os_hits.append(true_os)
            fs_hits.append(true_fs[known])
            fsos_hits.append((known & true_fs & true_os) | (~known & true_os))
            if collect_raw:
                rep_scores.append(scores)
                rep_known.append(known)
                rep_fs.append(true_fs)

        def ratio(parts):
            flat = np.concatenate(parts) if parts else np.zeros(0)
            return float(flat.mean()) if flat.size else -1.0

        results["FS-ACC"].append(ratio(fs_hits))
        results["OS-ACC"].append(ratio(os_hits))
        results["FSOS-ACC"].append(ratio(fsos_hits))
        if collect_raw:
            raw.append({
                "scores": np.concatenate(rep_scores) if rep_scores else np.zeros(0),
                "known": np.concatenate(rep_known) if rep_known else np.zeros(0, bool),
                "fs_correct": np.concatenate(rep_fs) if rep_fs else np.zeros(0, bool),
            })
    if collect_raw:
        results["_raw"] = raw
    return results


def metrics_at_threshold(
    raw: List[Dict[str, np.ndarray]], os_threshold: float
) -> Dict[str, List[float]]:
    """Re-score collected (score, known, fs_correct) triples at another
    open-set threshold — the device forward is threshold-independent, so a
    threshold sweep costs zero TPU time."""
    out: Dict[str, List[float]] = {"FSOS-ACC": [], "FS-ACC": [], "OS-ACC": []}
    for rep in raw:
        scores, known, fs = rep["scores"], rep["known"], rep["fs_correct"]
        true_os = (scores > os_threshold) == known
        out["OS-ACC"].append(float(true_os.mean()) if scores.size else -1.0)
        out["FS-ACC"].append(float(fs[known].mean()) if known.any() else -1.0)
        out["FSOS-ACC"].append(
            float(((known & fs & true_os) | (~known & true_os)).mean())
            if scores.size else -1.0
        )
    return out


def calibrate_os_threshold(
    config: ARConfig,
    params,
    tree_path: str,
    k: int = 5,
    n_repeats: int = 10,
    batch_size: int = 8,
    seed: int = 0,
    grid: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Pick the open-set threshold on TRAINING classes (no test leakage).

    The reference's protocol hard-codes ``is_true > 0.5``
    (compute_fsos.py:101-102), but the discriminator's sigmoid is not
    calibrated — the round-5 capstone measured OS-ACC as the weakest
    metric. This runs the SAME episodic protocol the evaluation uses, but
    with the train tree as both query and exemplar source (exact exemplar
    clips excluded from the queries, so no clip scores itself), then sweeps
    a threshold grid maximizing BALANCED accuracy (mean of known-TPR and
    unknown-TNR — plain accuracy would chase the class mix of the draw).

    Returns {os_threshold, balanced_acc, os_acc_at_default, os_acc_at_best,
    n_queries}. Feed ``os_threshold`` to ``evaluate_fsos`` /
    ``metrics_at_threshold`` — report it ALONGSIDE the 0.5-protocol
    numbers, never instead of them."""
    res = evaluate_fsos(
        config, params, tree_path, tree_path, k=k, n_repeats=n_repeats,
        batch_size=batch_size, seed=seed, collect_raw=True,
        exclude_exemplar_queries=True,
    )
    raw = res["_raw"]
    scores = np.concatenate([r["scores"] for r in raw])
    known = np.concatenate([r["known"] for r in raw])
    if grid is None:
        grid = np.linspace(0.02, 0.98, 97)
    best_thr, best_bal = 0.5, -1.0
    for t in grid:
        pred = scores > t
        tpr = float(pred[known].mean()) if known.any() else 0.0
        tnr = float((~pred[~known]).mean()) if (~known).any() else 0.0
        bal = 0.5 * (tpr + tnr)
        if bal > best_bal:
            best_bal, best_thr = bal, float(t)
    return {
        "os_threshold": round(best_thr, 3),
        "balanced_acc": round(best_bal, 3),
        "os_acc_at_default": round(float(((scores > 0.5) == known).mean()), 3),
        "os_acc_at_best": round(float(((scores > best_thr) == known).mean()), 3),
        "n_queries": int(scores.size),
    }


def summarize(results: Dict[str, List[float]]) -> Dict[str, str]:
    return {
        k: f"{np.mean(v):.3f} +/- {np.std(v):.3f}"
        for k, v in results.items() if v and not k.startswith("_")
    }
