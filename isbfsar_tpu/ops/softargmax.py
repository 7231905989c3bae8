"""Soft-argmax heatmap decoding for the MetrABS head — pure JAX, jit-safe.

The reference decodes the 8x8x288 head output on the host with numpy per
frame (reference modules/hpe/hpe.py:108-146). Here the split, joint softmax
over heatmap axes, and per-axis expectation are one fused XLA computation
that runs in-graph with the backbone — no device->host round-trip.

Layout contract (reference hpe.py:109-112):
  head logits (b, 8, 8, 288) -> logits2d = [..., :32], the remaining 256
  channels reshape to (b, h, w, d=8, j=32). Heatmap axes are (w, h, d) for
  3D and (w, h) for 2D; decoded coordinates are the expectation of
  ``linspace(0, 1, size)`` along each axis, stacked as (x, y[, z]).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def split_head_logits(logits: jnp.ndarray, n_joints: int = 32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(b, h, w, 9*j) -> 2D logits (b, h, w, j) and 3D logits (b, h, w, d, j)."""
    b, h, w, c = logits.shape
    logits2d = logits[..., :n_joints]
    logits3d = logits[..., n_joints:].reshape(b, h, w, (c - n_joints) // n_joints, n_joints)
    return logits2d, logits3d


def _axis_expectation(probs: jnp.ndarray, axes: Tuple[int, ...]) -> jnp.ndarray:
    """Expectation of normalized grid coordinates along each of ``axes``.

    probs sums to 1 jointly over ``axes``; returns (..., len(axes)) stacked in
    the order given (the reference uses (w, h, d) -> (x, y, z), hpe.py:115-146).
    """
    coords = []
    for ax in axes:
        others = tuple(a for a in axes if a != ax)
        marginal = jnp.sum(probs, axis=others, keepdims=True)
        grid = jnp.linspace(0.0, 1.0, probs.shape[ax], dtype=probs.dtype)
        shape = [1] * probs.ndim
        shape[ax] = probs.shape[ax]
        expect = jnp.sum(marginal * grid.reshape(shape), axis=axes)
        coords.append(expect)
    return jnp.stack(coords, axis=-1)


def _joint_softmax(logits: jnp.ndarray, axes: Tuple[int, ...]) -> jnp.ndarray:
    m = jnp.max(logits, axis=axes, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=axes, keepdims=True)


def decode_heatmap3d(logits3d: jnp.ndarray) -> jnp.ndarray:
    """(b, h, w, d, j) -> (b, j, 3) coords in [0, 1], order (x, y, z)."""
    probs = _joint_softmax(logits3d.astype(jnp.float32), axes=(2, 1, 3))
    return _axis_expectation(probs, axes=(2, 1, 3))


def decode_heatmap2d(logits2d: jnp.ndarray, scale: float = 255.0) -> jnp.ndarray:
    """(b, h, w, j) -> (b, j, 2) pixel coords in [0, scale], order (x, y)."""
    probs = _joint_softmax(logits2d.astype(jnp.float32), axes=(2, 1))
    return _axis_expectation(probs, axes=(2, 1)) * scale
