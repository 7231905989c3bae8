"""Explainability: attention maps + GRAD-CAM.

Rebuild of the reference's heatmap visualizer (reference
modules/ar/visualize_heatmaps.py:17-235): it hooks ResNet layer-4
activations/gradients, backprops the chosen class logit, and renders
per-frame CAMs plus the strongest cross-attention tuple pairs.

JAX formulation (no hooks):
- attention comes straight out of the transformer's return dict
  (models/trx.py exposes it; the reference's ``add_hook`` capture)
- GRAD-CAM uses flax's perturb/sow pattern: the ResNet (enable_cam=True)
  sows its last-stage activation and adds a zero "perturbation" at the same
  point, so ``jax.grad`` w.r.t. that perturbation equals
  d(score)/d(activation) — functionally identical to torch's backward hook.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from isbfsar_tpu.configs import ARConfig
from isbfsar_tpu.models.resnet import resnet50
from isbfsar_tpu.models.trx import TRXOS
from isbfsar_tpu.ops.tuples import frame_tuples


def top_attention_pairs(
    attention: np.ndarray, seq_len: int, class_idx: int, k: int = 5
) -> List[Dict]:
    """Strongest (query-tuple, support-tuple) pairs for one class.

    attention: (way, T, T) from a batch element (model output
    ``attention[b]``). Returns the top-k pairs with their frame indices —
    the reference renders exactly these (visualize_heatmaps.py).
    """
    tuples = frame_tuples(seq_len, 2)
    att = np.asarray(attention)[class_idx]  # (T_q, T_s)
    flat = np.argsort(att, axis=None)[::-1][:k]
    out = []
    for idx in flat:
        qi, si = np.unravel_index(idx, att.shape)
        out.append(
            {
                "score": float(att[qi, si]),
                "query_frames": tuples[qi].tolist(),
                "support_frames": tuples[si].tolist(),
            }
        )
    return out


def grad_cam(
    variables,
    images: jnp.ndarray,
    class_idx: int = 0,
    n_classes: int = 0,
) -> np.ndarray:
    """Per-image CAM heatmaps from a CAM-enabled ResNet-50.

    variables: init dict of ``resnet50`` built with ``enable_cam=True`` and
    a classifier head (num_classes=n_classes) — must contain the
    'perturbations' collection. images: (n, h, w, 3) float.
    Returns (n, h/32, w/32) normalized heatmaps.
    """
    from isbfsar_tpu.models.resnet import Bottleneck, ResNet

    model = ResNet(
        stage_sizes=(3, 4, 6, 3), block=Bottleneck, num_classes=n_classes,
        dtype=jnp.float32, enable_cam=True,
    )

    pert0 = jax.tree.map(jnp.zeros_like, variables["perturbations"])

    def score(pert):
        out, state = model.apply(
            {**variables, "perturbations": pert},
            images,
            mutable=["intermediates"],
        )
        target = out[:, class_idx] if out.ndim == 2 and out.shape[1] > 1 else out.reshape(-1)
        return jnp.sum(target), state["intermediates"]["stage4"][0]

    (_, acts), grads = jax.value_and_grad(score, has_aux=True)(pert0)
    g = grads["stage4"]  # d score / d activation, (n, h', w', c)
    weights = jnp.mean(g, axis=(1, 2), keepdims=True)  # GAP of gradients
    cam = jax.nn.relu(jnp.sum(weights * acts, axis=-1))  # (n, h', w')
    cam = cam / (jnp.max(cam, axis=(1, 2), keepdims=True) + 1e-8)
    return np.asarray(cam)


def explain_episode(
    config: ARConfig,
    params,
    support: Dict[str, jnp.ndarray],
    query: Dict[str, jnp.ndarray],
) -> Dict:
    """Full explanation bundle for one episode: logits, chosen class, and the
    strongest attention pairs for that class (skeleton + rgb modes)."""
    model = TRXOS(config)
    b = next(iter(query.values())).shape[0]
    mask = jnp.ones((b, config.way), bool)
    out = model.apply(params, query, mask, support_data=support)
    chosen = int(np.asarray(jnp.argmax(out["logits"], 1))[0])
    pairs = top_attention_pairs(np.asarray(out["attention"])[0], config.seq_len, chosen)
    return {
        "logits": np.asarray(out["logits"])[0],
        "is_true": float(np.asarray(out["is_true"])[0, 0]),
        "chosen_class": chosen,
        "top_attention_pairs": pairs,
    }


def render_cam_overlay(image: np.ndarray, cam: np.ndarray) -> np.ndarray:
    """Upscale a CAM onto the image as a red overlay (uint8 BGR)."""
    import cv2

    h, w = image.shape[:2]
    heat = cv2.resize((cam * 255).astype(np.uint8), (w, h))
    heat = cv2.applyColorMap(heat, cv2.COLORMAP_JET)
    return cv2.addWeighted(image.astype(np.uint8), 0.6, heat, 0.4, 0)
