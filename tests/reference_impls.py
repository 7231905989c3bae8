"""Pure-numpy specification implementations used as golden references.

Each function here states, in the most literal host-side numpy possible, the
behavioral contract extracted from the reference pipeline (file:line cites in
docstrings point at /root/reference). The JAX/XLA fast paths in
``isbfsar_tpu`` are tested against these. Keep these slow and obvious — they
are the spec, not the product.
"""

from __future__ import annotations

import numpy as np


def homog(x):
    return np.concatenate([x, np.ones_like(x[..., :1])], axis=-1)


# ---------------------------------------------------------------- NMS / YOLO


def nms_greedy(boxes, scores, iou_thresh=0.7):
    """Greedy IoU NMS (spec of reference misc.py:27-61). Returns kept indices."""
    order = np.argsort(scores)[::-1]
    kept = []
    while order.size:
        i = order[0]
        kept.append(i)
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(0.0, xx2 - xx1) * np.maximum(0.0, yy2 - yy1)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / (area_i + area_r - inter)
        order = rest[iou <= iou_thresh]
    return np.asarray(kept, dtype=np.int64)


def best_person_spec(boxes, confs, conf_thresh=0.3, nms_thresh=0.7):
    """Spec of the reference's person pick: threshold -> per-class NMS ->
    highest-probability class-0 detection (misc.py:64-107 + hpe.py:63-73).
    Returns (box, conf) or None.
    """
    boxes = boxes.reshape(-1, 4)
    confs = confs.reshape(boxes.shape[0], -1)
    max_conf = confs.max(axis=1)
    max_id = confs.argmax(axis=1)
    sel = max_conf > conf_thresh
    b, c, k = boxes[sel], max_conf[sel], max_id[sel]
    person = k == 0
    b, c = b[person], c[person]
    if b.shape[0] == 0:
        return None
    kept = nms_greedy(b, c, nms_thresh)
    b, c = b[kept], c[kept]
    best = np.argmax(c)
    return b[best], c[best]


# ------------------------------------------------------------- soft-argmax


def decode_heatmap_spec(logits, axes):
    """Joint softmax over ``axes`` then per-axis expectation of linspace(0,1)
    (spec of reference hpe.py:114-146)."""
    m = logits.max(axis=axes, keepdims=True)
    e = np.exp(logits - m)
    probs = e / e.sum(axis=axes, keepdims=True)
    out = []
    for ax in axes:
        others = tuple(a for a in axes if a != ax)
        marg = probs.sum(axis=others, keepdims=True)
        coords = np.linspace(0.0, 1.0, logits.shape[ax])
        dec = np.tensordot(marg, coords, axes=[[ax], [0]])
        out.append(np.squeeze(np.expand_dims(dec, ax), axis=axes))
    return np.stack(out, axis=-1)


# ------------------------------------------------------ absolute reconstruction


def reconstruct_ref_spec(normalized_2d, coords3d_rel, validity):
    """Spec of reference misc.py:141-176 (single batch element, lstsq)."""
    b, j, _ = normalized_2d.shape
    out = []
    for i in range(b):
        n2 = normalized_2d[i].reshape(2 * j)
        s2 = np.sqrt(np.mean(np.square(n2)))
        a = np.zeros((2 * j, 3), np.float64)
        a[0::2, 0] = 1.0
        a[1::2, 1] = 1.0
        a[:, 2] = -n2 / s2
        rb = (normalized_2d[i] * coords3d_rel[i][:, 2:] - coords3d_rel[i][:, :2]).reshape(2 * j)
        sb = np.sqrt(np.mean(np.square(rb)))
        rhs = rb / sb
        w = np.repeat(validity[i].astype(np.float64) + 1e-4, 2)
        sol = np.linalg.lstsq(a * w[:, None], rhs * w, rcond=None)[0]
        sol = np.array([sol[0], sol[1], sol[2] / s2]) * sb
        out.append(sol)
    return np.stack(out)


def reconstruct_absolute_spec(coords2d, coords3d_rel, intrinsics, in_fov):
    """Spec of reference misc.py:183-204."""
    inv_k = np.linalg.inv(intrinsics.astype(np.float32))
    normalized = (homog(coords2d) @ inv_k.swapaxes(1, 2))[..., :2]
    ref = reconstruct_ref_spec(normalized, coords3d_rel, in_fov)
    abs3d = coords3d_rel + ref[:, None]
    depth = coords3d_rel[..., 2] + ref[:, 2][:, None]
    abs2d = homog(normalized) * depth[..., None]
    return np.where(in_fov[..., None], abs2d, abs3d)


# ----------------------------------------------------------------- homography


def virtual_camera_spec(x1, x2, y1, y2, K, out_dim):
    """Spec of reference misc.py:243-296 (float64, as numpy promotes there)."""
    K = K.astype(np.float64)
    pts = homog(
        np.array(
            [
                [
                    [(x1 + x2) / 2, (y1 + y2) / 2],
                    [(x1 + x2) / 2, y1],
                    [x2, (y1 + y2) / 2],
                    [(x1 + x2) / 2, y2],
                    [x1, (y1 + y2) / 2],
                ]
            ],
            dtype=np.float64,
        )
    )
    cam = pts @ np.linalg.inv(K[None]).transpose(0, 2, 1)
    cam = homog(cam[..., :2])
    center = cam[:, 0]
    up = np.array([[0.0, -1.0, 0.0]])
    z = center / np.linalg.norm(center, axis=-1, keepdims=True)
    x = np.cross(z, up)
    x_alt = np.stack([z[:, 2], np.zeros_like(z[:, 2]), -z[:, 0]], axis=1)
    x = np.where(np.linalg.norm(x, axis=-1, keepdims=True) == 0, x_alt, x)
    x = x / np.linalg.norm(x, axis=-1, keepdims=True)
    y = np.cross(z, x)
    rot = np.stack([x, y, z], axis=1)

    side = cam[:, 1:5]
    proj = side @ (K[None] @ rot).transpose(0, 2, 1)
    side_new = proj[..., :2] / proj[..., 2:3]
    vert = np.linalg.norm(side_new[:, 0] - side_new[:, 2], axis=-1)
    horiz = np.linalg.norm(side_new[:, 1] - side_new[:, 3], axis=-1)
    scale = out_dim / np.maximum(vert, horiz)
    new_k = np.concatenate(
        [
            np.concatenate([K[:2, :2] * scale, np.full((2, 1), out_dim / 2, K.dtype)], axis=1),
            np.array([[0.0, 0.0, 1.0]], K.dtype),
        ],
        axis=0,
    )
    return new_k, rot


# ----------------------------------------------------------------------- warp


def warp_spec(img, transforms, out_size=256):
    """Spec of the reference ImageTransformer
    (setup/6_create_image_transformation_onnx.py:23-56): truncation-nearest
    projective sampling with out-of-bounds zeroing."""
    h, w, c = img.shape
    n = transforms.shape[0]
    out = np.zeros((n, out_size, out_size, c), img.dtype)
    for b in range(n):
        t = transforms[b] / transforms[b, 2, 2]
        for oy in range(out_size):
            for ox in range(out_size):
                k = t[2, 0] * ox + t[2, 1] * oy + 1.0
                sx = int((t[0, 0] * ox + t[0, 1] * oy + t[0, 2]) / k)
                sy = int((t[1, 0] * ox + t[1, 1] * oy + t[1, 2]) / k)
                if 0 <= sx < w and 0 <= sy < h:
                    out[b, oy, ox] = img[sy, sx]
    return out


# ------------------------------------------------------------------ TRX spec


def pe_table_spec(max_len, d, scale=0.1):
    """Spec of reference model.py:17-23."""
    pos = np.arange(max_len)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, d, 2) * -(np.log(10000.0) / d))
    pe = np.zeros((max_len, d), np.float64)
    pe[:, 0::2] = np.sin(pos * div) * scale
    pe[:, 1::2] = np.cos(pos * div) * scale
    return pe


def layernorm_spec(x, gamma, beta, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * gamma + beta


def trx_transformer_spec(params, support_feats, query_feats, live_classes, seq_len, out_dim=128):
    """Spec of the TemporalCrossTransformer forward (reference model.py:59-148),
    literal per-class loop. params: the flax param subtree for the transformer.
    support_feats: (way, L, D); query_feats: (L, D); live_classes: list of
    slot indices to evaluate (the reference iterates only live labels).
    Returns (logits (n_live,), diffs (n_live, T, out_dim)).
    """
    import itertools

    d = query_feats.shape[-1]
    pe = pe_table_spec(int(seq_len * 1.5), d)[:seq_len]
    s = support_feats.astype(np.float64) + pe
    q = query_feats.astype(np.float64) + pe

    tuples = list(itertools.combinations(range(seq_len), 2))
    s_tup = np.stack([s[:, list(t)].reshape(s.shape[0], -1) for t in tuples], axis=1)  # (way, T, 2D)
    q_tup = np.stack([q[list(t)].reshape(-1) for t in tuples], axis=0)  # (T, 2D)

    kw, kb = np.asarray(params["k_linear"]["kernel"], np.float64), np.asarray(params["k_linear"]["bias"], np.float64)
    vw, vb = np.asarray(params["v_linear"]["kernel"], np.float64), np.asarray(params["v_linear"]["bias"], np.float64)
    gamma = np.asarray(params["norm_k"]["scale"], np.float64)
    beta = np.asarray(params["norm_k"]["bias"], np.float64)

    s_k = layernorm_spec(s_tup @ kw + kb, gamma, beta)
    q_k = layernorm_spec(q_tup @ kw + kb, gamma, beta)
    s_v = s_tup @ vw + vb
    q_v = q_tup @ vw + vb

    logits, diffs = [], []
    for c in live_classes:
        scores = (q_k @ s_k[c].T) / np.sqrt(out_dim)  # (T_q, T_s)
        # softmax over the query-tuple axis (reference class_softmax dim=-2)
        e = np.exp(scores - scores.max(axis=0, keepdims=True))
        attn = e / e.sum(axis=0, keepdims=True)
        proto = attn @ s_v[c]  # (T_q, out_dim)
        diff = q_v - proto
        dist = -(np.square(diff).sum() / len(tuples))
        logits.append(dist)
        diffs.append(diff)
    return np.asarray(logits), np.stack(diffs)


def discriminator_spec(params, diff):
    """Spec of reference model.py:183-204 on one (T, 128) diff tensor."""
    y = diff @ np.asarray(params["reduce"]["kernel"], np.float64) + np.asarray(params["reduce"]["bias"], np.float64)
    y = y.reshape(-1)
    y = np.maximum(0, y @ np.asarray(params["fc1"]["kernel"], np.float64) + np.asarray(params["fc1"]["bias"], np.float64))
    y = np.maximum(0, y @ np.asarray(params["fc2"]["kernel"], np.float64) + np.asarray(params["fc2"]["bias"], np.float64))
    y = y @ np.asarray(params["fc3"]["kernel"], np.float64) + np.asarray(params["fc3"]["bias"], np.float64)
    return 1.0 / (1.0 + np.exp(-y))


def skeleton_mlp_spec(params, x):
    """Spec of reference model.py:164-180 (ReLU on the output too)."""
    h = np.maximum(0, x @ np.asarray(params["fc1"]["kernel"], np.float64) + np.asarray(params["fc1"]["bias"], np.float64))
    return np.maximum(0, h @ np.asarray(params["fc2"]["kernel"], np.float64) + np.asarray(params["fc2"]["bias"], np.float64))
