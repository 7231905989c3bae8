"""Causal temporal pose smoothing — the One-Euro filter.

The round-3 tracking-slope study (docs/PERF.md) pinned the offline-AR
accuracy ceiling on PER-FRAME extraction noise: the production pose stack
reads ~0.045 m of frame-to-frame jitter against ~0.038 m of true motion
signal, so the TRX sees sequences whose noise floor rivals the action
content. A plain moving average would cut the jitter but also dampen the
motion (the tracking slope is already 0.48 < 1). The One-Euro filter
(Casiez, Roussel & Vogel, CHI 2012 — the standard interactive-pose
smoother) adapts its cutoff to the measured speed: near-static joints get
a low cutoff (strong smoothing), fast joints a high one (little lag), so
it trades noise for lag only where lag is cheap.

    alpha(fc) = 1 / (1 + fs / (2*pi*fc))        # EMA weight at rate fs
    dx_hat    = EMA(dx, alpha(d_cutoff))        # smoothed speed
    fc        = min_cutoff + beta * |dx_hat|    # speed-adaptive cutoff
    x_hat     = EMA(x, alpha(fc))

Everything is per-coordinate and elementwise, so one filter instance
smooths a whole (J, 3) pose. Two implementations with a parity test
(tests/test_smooth.py):

- :func:`one_euro` — numpy, whole-sequence, for the offline extraction
  path (tools/extract_dataset.py) and any host-side consumer.
- :func:`one_euro_step` / :func:`one_euro_init` — jnp, single-tick with
  carried state, jit-safe (pure elementwise ops, static shapes), for the
  live fused pipeline where the pose never leaves the device.

The reference has no temporal filtering (it feeds raw per-frame MetrABS
poses to the TRX — reference modules/ar/utils/data_extraction/
extract_skeleton_rgb_from_nturgbd.py:110-117 reuses the previous pose on
failure, which is the degenerate hold-last filter); this is a
beyond-reference accuracy lever, applied identically at extraction and
(optionally) inference so train and serve see the same distribution.
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np

__all__ = ["one_euro", "one_euro_init", "one_euro_step",
           "one_euro_gated_state", "one_euro_gated_step"]

# Defaults tuned by sweep on rendered humanoid clips + the measured 0.045 m
# white extraction noise (docs/PERF.md "Temporal pose smoothing"): frame
# ticks are unit time (fs = 1 sample/tick, cutoffs in cycles/frame). At
# these values the filter cuts pose RMSE 0.045 -> 0.030 m while keeping
# tracking slope 0.91 (raw 1.0; plain-EMA candidates with equal noise cuts
# fell to ~0.8) — sweep grid mc x beta x dc in the PERF.md section.
MIN_CUTOFF = 0.05
BETA = 2.0
D_CUTOFF = 0.3


def _alpha(cutoff, fs: float):
    tau = 1.0 / (2.0 * math.pi * cutoff)
    te = 1.0 / fs
    return 1.0 / (1.0 + tau / te)


def one_euro(
    xs: np.ndarray,
    min_cutoff: float = MIN_CUTOFF,
    beta: float = BETA,
    d_cutoff: float = D_CUTOFF,
    fs: float = 1.0,
) -> np.ndarray:
    """Filter a whole sequence. xs: (T, ...) — any trailing shape.

    Causal: output t depends only on inputs <= t; the first sample passes
    through unchanged (the filter state initializes on it)."""
    xs = np.asarray(xs, np.float32)
    out = np.empty_like(xs)
    out[0] = xs[0]
    x_hat = xs[0].astype(np.float64)
    dx_hat = np.zeros_like(x_hat)
    a_d = _alpha(d_cutoff, fs)
    for t in range(1, xs.shape[0]):
        dx = (xs[t] - x_hat) * fs
        dx_hat = a_d * dx + (1.0 - a_d) * dx_hat
        fc = min_cutoff + beta * np.abs(dx_hat)
        a = _alpha(fc, fs)
        x_hat = a * xs[t] + (1.0 - a) * x_hat
        out[t] = x_hat
    return out


def one_euro_init(x0) -> Dict:
    """Filter state from the first observation (jnp or numpy array)."""
    import jax.numpy as jnp

    x0 = jnp.asarray(x0, jnp.float32)
    return {"x": x0, "dx": jnp.zeros_like(x0)}


def one_euro_step(
    state: Dict,
    x,
    min_cutoff: float = MIN_CUTOFF,
    beta: float = BETA,
    d_cutoff: float = D_CUTOFF,
    fs: float = 1.0,
):
    """One causal tick. Returns (new_state, x_hat). Pure jnp elementwise —
    safe inside jit/vmap/scan; thread ``state`` through the carried loop
    state (the fused pipeline keeps it next to the AR pose buffer)."""
    import jax.numpy as jnp

    x = jnp.asarray(x, jnp.float32)
    a_d = _alpha(d_cutoff, fs)
    dx = (x - state["x"]) * fs
    dx_hat = a_d * dx + (1.0 - a_d) * state["dx"]
    fc = min_cutoff + beta * jnp.abs(dx_hat)
    a = 1.0 / (1.0 + fs / (2.0 * math.pi * fc))
    a = a.astype(jnp.float32)
    x_hat = a * x + (1.0 - a) * state["x"]
    return {"x": x_hat, "dx": dx_hat.astype(jnp.float32)}, x_hat


def one_euro_gated_state(shape) -> Dict:
    """Zero-initialized gated-filter state for the fused pipeline's carried
    StreamState (static shapes, jit-safe). ``init`` latches on the first
    good frame — until then the filter passes inputs through unchanged."""
    import jax.numpy as jnp

    return {
        "x": jnp.zeros(shape, jnp.float32),
        "dx": jnp.zeros(shape, jnp.float32),
        "init": jnp.zeros((), bool),
    }


def one_euro_gated_step(state: Dict, x, ok, **kw):
    """One causal tick that only ingests GOOD observations.

    ``ok=False`` frames leave the filter state untouched and return ``x``
    unfiltered (the fused pipeline's pose_ok gate: a no-detection frame's
    zero pose must not pollute the motion estimate — it is also never
    pushed into the AR window). The first good frame passes through
    unchanged: with ``state.x == x`` the update reduces to
    ``x_hat = a*x + (1-a)*x = x`` and ``dx = 0``, matching
    :func:`one_euro`'s first-sample semantics exactly."""
    import jax.numpy as jnp

    x = jnp.asarray(x, jnp.float32)
    prev = {
        "x": jnp.where(state["init"], state["x"], x),
        "dx": jnp.where(state["init"], state["dx"], 0.0),
    }
    new, x_hat = one_euro_step(prev, x, **kw)
    out_state = {
        "x": jnp.where(ok, new["x"], state["x"]),
        "dx": jnp.where(ok, new["dx"], state["dx"]),
        "init": jnp.logical_or(state["init"], ok),
    }
    return out_state, jnp.where(ok, x_hat, x)
