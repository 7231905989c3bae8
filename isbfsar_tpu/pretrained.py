"""Pretrained weights bundled with the package.

The reference ships its nets as downloadable weight/engine files the user
drops into place (reference README.md:31-38 "Download weights" + the
modules' `.engine`/`.pth` paths in utils/params.py). This repo's analog is
a committed bundle of the synthetic-supervision fits under
``isbfsar_tpu/assets/pretrained/``: every file is a
:func:`isbfsar_tpu.utils.cache.cached_params` entry (flax msgpack of a
plain numpy pytree) named by its key digest, so the TRAINED fixtures —
pose stack, extraction-grade pose stack, focus stack — load instantly on a
fresh machine instead of refitting for minutes.

Consistency contract: a bundle entry is addressed by the SHA of its
trainer key + version (utils/cache.py `params_cache_digest`). If trainer
code or budgets move, the digest moves, the stale bundled file is simply
never consulted again, and `verify()` (pinned by tests/test_pretrained.py)
fails loudly so the bundle gets regenerated (`tools/bundle_pretrained.py`)
rather than silently shipping dead weight.

API:
    >>> from isbfsar_tpu import pretrained
    >>> pretrained.available()          # name -> description
    >>> params = pretrained.load("pose-diverse-256")
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, NamedTuple

from isbfsar_tpu.utils.cache import (
    params_cache_digest,
    pretrained_bundle_dir,
)

MANIFEST_NAME = "MANIFEST.json"


class Spec(NamedTuple):
    """A bundle-able trained fixture: where its key lives + how to build."""

    key: Callable[[], str]  # exact cached_params key (lazy: reprs of configs)
    version: str
    builder: Callable[[], Any]  # the fixture function (trains on miss)
    description: str


def _specs() -> Dict[str, Spec]:
    # Lazy imports: pulling the trainer modules at package-import time would
    # drag jax/flax into every `import isbfsar_tpu.pretrained` caller.
    from isbfsar_tpu.train import gazefocus as gf
    from isbfsar_tpu.train import posestack as ps

    return {
        "pose-ci-motions": Spec(
            ps._CI_KEY_V[1], ps._CI_KEY_V[0], ps.ci_pose_params,
            "CI pose stack (YOLO + backbone/head) trained on the four-"
            "MOTIONS scene distribution; the tests/test_posestack.py "
            "operating point (IoU ~0.7, ~0.1 m root-relative error).",
        ),
        "pose-ci-diverse": Spec(
            ps._DIVERSE_KEY_V[1], ps._DIVERSE_KEY_V[0], ps.diverse_pose_params,
            "CI pose stack trained on the diverse pose distribution "
            "(random whole-space articulations + the frozen 12-action "
            "scene library); detector donor for pose-diverse-256.",
        ),
        "pose-diverse-256": Spec(
            ps._DIVERSE256_KEY_V[1], ps._DIVERSE256_KEY_V[0],
            ps.diverse_pose_params_256,
            "Extraction-grade pose stack: 256 crop (8x8 heatmap decode), "
            "6000 pose steps — the fit the offline AR workflow extracts "
            "skeletons with (tracking slope 0.48, 1-NN sep 0.79).",
        ),
        "focus-ci": Spec(
            lambda: (f"gazefocus:{gf.CI_FOCUS_CFG!r}:"
                     f"{sorted(gf.CI_FOCUS_BUDGETS.items())!r}"),
            "1", gf.ci_focus_params,
            "CI focus stack (BlazeFaceLite + LandmarkRefiner + GazeNet) "
            "trained on exact-projective synthetic faces; passes the "
            "absolute far-branch yaw thresholds in tests/test_gazefocus.py.",
        ),
        "pose-prod-256": Spec(
            ps._PROD_KEY_V[1], ps._PROD_KEY_V[0], ps.prod_pose_params,
            "PRODUCTION pose stack (full-width YOLOv4 @ 256 + EffNetV2-L "
            "@ 256 crop, 480x640 frames, MOTIONS pose distribution — the "
            "measured production recipe, docs/PERF.md 'Production fit "
            "recipe' — bf16 trunk storage): the trained operating point "
            "bench.py's headline and the --production offline AR workflow "
            "run.",
        ),
        "pose-prod-256-calib": Spec(
            ps._PROD_CALIB_KEY_V[1], ps._PROD_CALIB_KEY_V[0],
            ps.prod_detector_calib_delta,
            "Empty-scene calibration DELTA for pose-prod-256: the YOLO "
            "branch alone, fine-tuned on hard person-free scenes "
            "(disarticulated limb clutter) to kill the base fit's 0.7 "
            "empty-scene FP rate (train/posestack.py finetune_detector; "
            "receipts in docs/PERF.md 'Empty-scene FP fine-tune'). "
            "Loaded merged over the base by prod_pose_params_calib().",
        ),
        "pose-ci-calib": Spec(
            ps._CI_CALIB_KEY_V[1], ps._CI_CALIB_KEY_V[0],
            ps.ci_detector_calib_delta,
            "Empty-scene calibration delta for pose-ci-motions (same "
            "recipe at the CI operating point): hard-empty FP 15/15 -> "
            "5/15 with person found-rate/IoU unharmed — the fixture "
            "tests/test_posestack.py::TestDetectorCalibration pins.",
        ),
    }


def bundle_dir() -> str:
    return pretrained_bundle_dir()


def _manifest() -> Dict[str, Dict[str, str]]:
    path = os.path.join(bundle_dir(), MANIFEST_NAME)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def available() -> Dict[str, str]:
    """name -> description for every entry actually present in the bundle."""
    d = bundle_dir()
    return {
        name: meta.get("description", "")
        for name, meta in _manifest().items()
        if os.path.exists(os.path.join(d, meta["file"]))
    }


def load(name: str) -> Any:
    """Restore a bundled params pytree (plain dicts of numpy arrays)."""
    from flax import serialization

    meta = _manifest().get(name)
    if meta is None:
        raise KeyError(
            f"no bundled pretrained entry {name!r}; available: "
            f"{sorted(available())}"
        )
    with open(os.path.join(bundle_dir(), meta["file"]), "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_calibrated(base: str = "pose-prod-256") -> Any:
    """A base pose-stack entry with its detector-calibration DELTA merged
    over it — what every production consumer (bench.py's trained headline,
    the live service `runtime/serve.py`, the --production offline workflow)
    loads. The delta entry (`<base>-calib`) holds only the YOLO branch,
    fine-tuned on hard person-free scenes to kill the base fit's
    empty-scene false positives (receipt: docs/PERF.md "Empty-scene FP
    fine-tune" — empty-FP 0.9 -> 0.0 at the reference 0.3 gate with person
    found-rate 1.0 and IoU improved). Missing BASE raises; a missing delta
    falls back to the base loudly (stderr), never silently — the round-4
    wiring bug this function exists to prevent was a registered-but-
    unbundled delta nobody loaded."""
    import sys

    params = load(base)
    try:
        delta = load(f"{base}-calib")
    except KeyError:
        print(
            f"[pretrained] WARNING: {base}-calib delta not bundled — "
            f"serving the UNCALIBRATED {base} (empty-scene FP risk; "
            f"rebuild with tools/bundle_pretrained.py)",
            file=sys.stderr,
        )
        return params
    return {**params, **delta}


def verify() -> Dict[str, str]:
    """Assert the bundle and the registry agree BOTH ways: every manifest
    entry is fresh (its digest, recomputed from the LIVE trainer keys, must
    equal the shipped filename) AND every registered spec is actually
    bundled (a fixture added to ``_specs()`` without rerunning
    ``tools/bundle_pretrained.py`` would otherwise ship weightless and only
    surface as a minutes-long refit on a cold machine). Returns
    name -> digest on success; raises naming the offenders otherwise."""
    specs = _specs()
    manifest = _manifest()
    stale, out = [], {}
    for name, meta in manifest.items():
        spec = specs.get(name)
        digest = params_cache_digest(spec.key(), spec.version) if spec else None
        if spec is None or f"{digest}.msgpack" != meta["file"]:
            stale.append(name)
        else:
            out[name] = digest
    unbundled = sorted(set(specs) - set(manifest))
    if stale or unbundled:
        raise AssertionError(
            f"pretrained bundle out of sync — stale entries {stale} "
            f"(trainer keys/budgets moved since the bundle was built), "
            f"specs missing from the manifest {unbundled} — regenerate "
            f"with tools/bundle_pretrained.py"
        )
    return out
