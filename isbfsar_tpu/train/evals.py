"""Offline evaluation harnesses beyond FSOS.

Rebuilds the reference's remaining test tooling (SURVEY §2 A5):

- :func:`episodic_test` — the held-out-class episodic test with fs/os
  loss + accuracy + P/R/F1 (reference modules/ar/utils/test.py:26-149)
- :func:`discriminator_confusion` — 1-vs-1 open-set confusion: support set
  pinned to one class, queries drawn from another, mean discriminator score
  per (support, query) pair (reference modules/ar/utils/test/
  create_confusion_matrix.py:38-105)
- :func:`plot_fsos` / :func:`plot_confusion` — matplotlib renderings
  (reference test/plot_fsos_graph.py:1-55, visualize_confusion_matrix.py)
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from isbfsar_tpu.configs import ARConfig
from isbfsar_tpu.models.trx import TRXOS
from isbfsar_tpu.train.dataloader import EpisodicSampler, batch_iterator
from isbfsar_tpu.utils.metrics import binary_prf


def episodic_test(
    config: ARConfig,
    params,
    queries_path: str,
    test_classes: Optional[List[str]] = None,
    n_task: int = 100,
    batch_size: int = 8,
    seed: int = 0,
) -> Dict[str, float]:
    """Episodic accuracy on (held-out) classes (reference utils/test.py)."""
    model = TRXOS(config)
    if "params" not in params:
        params = {"params": params}

    @jax.jit
    def forward(params, support, mask, target):
        out = model.apply(params, target, mask, support_data=support)
        return out["logits"], out["is_true"][:, 0]

    sampler = EpisodicSampler(
        queries_path, k=config.way, n_task=n_task, max_l=16, l=config.seq_len,
        input_type=config.input_type, seed=seed,
    )
    if test_classes:
        sampler.all_classes = [c for c in sampler.all_classes if c in test_classes]

    fs_hits, os_true, os_pred = [], [], []
    for batch in batch_iterator(sampler, batch_size, seed=seed):
        b = batch["target_class"].shape[0]
        mask = jnp.ones((b, config.way), bool)
        logits, is_true = forward(
            params,
            jax.tree.map(jnp.asarray, batch["support_set"]),
            mask,
            jax.tree.map(jnp.asarray, batch["target_set"]),
        )
        target_idx = np.argmax(
            np.asarray(batch["support_classes"]) == np.asarray(batch["target_class"])[:, None],
            axis=1,
        )
        fs_hits.append(np.asarray(jnp.argmax(logits, 1)) == target_idx)
        os_pred.append(np.asarray(is_true) > 0.5)
        os_true.append(np.ones(b, bool))  # known episodes

        # unknown episode for the open-set negative (reference pairs them)
        logits_u, is_true_u = forward(
            params,
            jax.tree.map(jnp.asarray, batch["support_set"]),
            mask,
            jax.tree.map(jnp.asarray, batch["unknown_set"]),
        )
        os_pred.append(np.asarray(is_true_u) > 0.5)
        os_true.append(np.zeros(b, bool))

    prf = binary_prf(np.concatenate(os_true), np.concatenate(os_pred))
    return {
        "fs_accuracy": float(np.concatenate(fs_hits).mean()),
        "os_accuracy": prf["accuracy"],
        "os_precision": prf["precision"],
        "os_recall": prf["recall"],
        "os_f1": prf["f1"],
    }


def discriminator_confusion(
    config: ARConfig,
    params,
    queries_path: str,
    exemplars_path: str,
    classes: Optional[List[str]] = None,
    max_queries_per_class: int = 8,
) -> np.ndarray:
    """(n_classes, n_classes) mean discriminator score: rows = support class,
    cols = query class (reference create_confusion_matrix.py:53-105)."""
    from isbfsar_tpu.train.dataloader import list_classes

    model = TRXOS(config)
    if "params" not in params:
        params = {"params": params}
    loader = EpisodicSampler(
        queries_path, max_l=16, l=config.seq_len, input_type=config.input_type
    )
    classes = classes or list_classes(exemplars_path)
    n = len(classes)

    @jax.jit
    def forward(params, support, mask, target):
        out = model.apply(params, target, mask, support_data=support)
        return out["is_true"][:, 0]

    import os

    from isbfsar_tpu.train.dataloader import _clip_subdirs

    # exemplar clip per class, tiled into the way-width support tensor
    # (directories only — extraction leaves .skip_<idx> marker FILES)
    exemplars = {}
    for c in classes:
        exemplars[c] = loader.load_clip(_clip_subdirs(os.path.join(exemplars_path, c))[0])

    matrix = np.zeros((n, n), np.float64)
    for i, s_class in enumerate(classes):
        ss = {
            m: jnp.asarray(np.tile(v[None, None], (1, config.way) + (1,) * v.ndim))
            for m, v in exemplars[s_class].items()
        }
        mask = jnp.zeros((1, config.way), bool).at[0, 0].set(True)
        for j, q_class in enumerate(classes):
            base = os.path.join(queries_path, q_class)
            scores = []
            for clip_dir in _clip_subdirs(base)[:max_queries_per_class]:
                q = loader.load_clip(clip_dir)
                score = forward(
                    params, ss, mask, {m: jnp.asarray(v[None]) for m, v in q.items()}
                )
                scores.append(float(score[0]))
            matrix[i, j] = float(np.mean(scores)) if scores else np.nan
    return matrix


def plot_fsos(results: Dict[str, List[float]], path: str) -> None:
    """Bar plot of FSOS/FS/OS means +/- std (reference plot_fsos_graph.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    keys = [k for k in ("FSOS-ACC", "FS-ACC", "OS-ACC") if results.get(k)]
    means = [float(np.mean(results[k])) for k in keys]
    stds = [float(np.std(results[k])) for k in keys]
    fig, ax = plt.subplots(figsize=(5, 3.5))
    ax.bar(keys, means, yerr=stds, capsize=4)
    ax.set_ylim(0, 1)
    ax.set_ylabel("accuracy")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def plot_confusion(matrix: np.ndarray, classes: List[str], path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(matrix, vmin=0, vmax=1, cmap="viridis")
    ax.set_xticks(range(len(classes)), classes, rotation=90, fontsize=6)
    ax.set_yticks(range(len(classes)), classes, fontsize=6)
    ax.set_xlabel("query class")
    ax.set_ylabel("support class")
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
