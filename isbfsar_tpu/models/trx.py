"""TRX-OS: temporal cross-transformer one-shot recognizer + open-set head.

Ground-up Flax rebuild of the reference's TRXOS model family
(reference modules/ar/utils/model.py:12-328):

- sin/cos positional encoding scaled by 0.1 (model.py:12-28)
- TemporalCrossTransformer over all C(seq_len, 2) frame pairs: K/V linears
  (2*in_dim -> 128) + LayerNorm on K, per-class cross-attention between query
  tuples and support tuples, softmax over the *query-tuple* axis (the
  reference's class_softmax dim=-2, model.py:49,109), query-specific class
  prototype, and negative mean squared distance logits (model.py:59-148)
- MLP skeleton extractor 90 -> 180 -> 256 with ReLU on the output too
  (model.py:164-180)
- ResNet-50 RGB extractor + 2048 -> 256 projection (model.py:207-216,270-277)
- open-set Discriminator: Linear(128 -> seq_len) per tuple diff, flattened ->
  256 -> 64 -> 1 sigmoid (model.py:183-204)

TPU-first design differences (behavior-preserving):

- The support set is a fixed (way,)-padded buffer plus a validity mask
  instead of a Python-length list, so adding/removing actions never changes
  shapes and never retriggers XLA compilation. Invalid classes get -inf
  logits; a masked softmax over `way` classes is exactly the reference's
  softmax over the k live classes.
- The per-class Python loop (model.py:95-141) becomes one batched einsum
  over the `way` axis.
- RGB tensors are NHWC (XLA:TPU native), not NCHW.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from isbfsar_tpu.configs import ARConfig
from isbfsar_tpu.models.resnet import resnet50
from isbfsar_tpu.ops.tuples import frame_tuples

_HI = jax.lax.Precision.HIGHEST

NEG_INF = -1e30


def positional_encoding_table(max_len: int, d_model: int, scale: float = 0.1) -> np.ndarray:
    """(max_len, d_model) sin/cos table, scaled (reference model.py:17-23)."""
    position = np.arange(max_len)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, d_model, 2) * -(np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div) * scale
    pe[:, 1::2] = np.cos(position * div) * scale
    return pe


class SkeletonMLP(nn.Module):
    """90 -> 180 -> 256 with ReLU after both layers (reference model.py:164-180)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden, name="fc1", precision=_HI)(x))
        return nn.relu(nn.Dense(self.out, name="fc2", precision=_HI)(x))


class RGBExtractor(nn.Module):
    """ResNet-50 pooled features -> ReLU -> Dense(256) (reference model.py:207-216).

    ``remat`` rematerializes per residual block (see models/resnet.py) —
    the training-memory lever for the b*way*L-frame extraction batches."""

    dtype: Any = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = resnet50(dtype=self.dtype, remat=self.remat)(x, train=train)  # (n, 2048)
        return nn.Dense(256, name="post", precision=_HI)(nn.relu(feats))


class Discriminator(nn.Module):
    """Open-set head over the chosen class's tuple diffs (reference model.py:183-204)."""

    reduced: int  # `l` in the reference: == seq_len

    @nn.compact
    def __call__(self, diff):
        # diff: (b, n_tuples, 128)
        b = diff.shape[0]
        y = nn.Dense(self.reduced, name="reduce", precision=_HI)(diff)
        y = y.reshape(b, -1)
        y = nn.relu(nn.Dense(256, name="fc1", precision=_HI)(y))
        y = nn.relu(nn.Dense(64, name="fc2", precision=_HI)(y))
        y = nn.Dense(1, name="fc3", precision=_HI)(y)
        return nn.sigmoid(y)


class TemporalCrossTransformer(nn.Module):
    """Cross-attention between query and per-class support frame tuples."""

    seq_len: int
    in_dim: int
    out_dim: int = 128
    set_size: int = 2
    pe_scale: float = 0.1

    def setup(self):
        max_len = int(self.seq_len * 1.5)
        self.pe = jnp.asarray(positional_encoding_table(max_len, self.in_dim, self.pe_scale))
        self.tuples = jnp.asarray(frame_tuples(self.seq_len, self.set_size))
        self.k_linear = nn.Dense(self.out_dim, name="k_linear", precision=_HI)
        self.v_linear = nn.Dense(self.out_dim, name="v_linear", precision=_HI)
        self.norm_k = nn.LayerNorm(name="norm_k")

    def _tuplify(self, feats):
        """(..., L, D) -> (..., n_tuples, set_size * D) after PE."""
        feats = feats + self.pe[: feats.shape[-2]]
        gathered = jnp.take(feats, self.tuples, axis=-2)  # (..., T, set, D)
        return gathered.reshape(gathered.shape[:-2] + (self.set_size * feats.shape[-1],))

    def support_kv(self, support_features):
        """Precompute the support-side keys/values: (b, way, L, D) ->
        ((b, way, T, out), (b, way, T, out)). These depend only on the
        support set — the streaming pipeline computes them once per
        support-set edit instead of per frame (a deeper cache than the
        reference's feature cache, ar.py:56-74)."""
        s_tup = self._tuplify(support_features)
        return self.norm_k(self.k_linear(s_tup)), self.v_linear(s_tup)

    def match(self, s_k, s_v, support_mask, query_features):
        """Cross-attention match of one query clip against cached support K/V."""
        q_tup = self._tuplify(query_features[:, None])[:, 0]  # (b, T, 2D)
        q_k = self.norm_k(self.k_linear(q_tup))
        q_v = self.v_linear(q_tup)

        # (b, way, T_q, T_s): query-tuple x support-tuple similarities per class.
        scores = jnp.einsum("btd,bwsd->bwts", q_k, s_k, precision=_HI)
        scores = scores / jnp.sqrt(jnp.asarray(self.out_dim, scores.dtype))
        # Reference softmax is over the query-tuple axis (dim=-2, model.py:49,109).
        attn = jax.nn.softmax(scores, axis=-2)

        proto = jnp.einsum("bwts,bwsd->bwtd", attn, s_v, precision=_HI)
        diff = q_v[:, None] - proto  # (b, way, T, d)
        norm_sq = jnp.sum(jnp.square(diff), axis=(-2, -1))
        logits = -(norm_sq / self.tuples.shape[0])  # (b, way)
        logits = jnp.where(support_mask, logits, NEG_INF)
        # attention exposed for explainability (the reference's add_hook
        # score capture, model.py:56-57,110-111)
        return {"logits": logits, "diffs": diff, "prototypes": proto, "attention": attn}

    def __call__(self, support_features, support_mask, query_features):
        """support_features: (b, way, L, D); support_mask: (b, way) bool;
        query_features: (b, L, D). Returns dict(logits (b, way),
        diffs (b, way, T, out_dim), prototypes (b, way, T, out_dim)).
        """
        s_k, s_v = self.support_kv(support_features)
        return self.match(s_k, s_v, support_mask, query_features)


class TRXOS(nn.Module):
    """Full one-shot open-set recognizer (reference model.py:219-328)."""

    config: ARConfig

    def setup(self):
        cfg = self.config
        if cfg.input_type in ("skeleton", "hybrid"):
            self.sk_extractor = SkeletonMLP(cfg.n_joints * 3 * 2, 256)
        if cfg.input_type in ("rgb", "hybrid"):
            self.rgb_extractor = RGBExtractor(
                dtype=jnp.dtype(cfg.compute_dtype), remat=cfg.remat
            )
        self.transformer = TemporalCrossTransformer(
            seq_len=cfg.seq_len,
            in_dim=cfg.trans_linear_in_dim,
            out_dim=cfg.trans_linear_out_dim,
            set_size=cfg.temp_set[0],
            pe_scale=cfg.pe_scale_factor,
        )
        if cfg.model == "DISC":
            self.discriminator = Discriminator(reduced=cfg.seq_len)

    def extract_features(self, data: Dict[str, jnp.ndarray], train: bool = False) -> jnp.ndarray:
        """data values: 'sk' (..., L, 90); 'rgb' (..., L, H, W, 3) NHWC.

        Returns (..., L, trans_linear_in_dim). Feature order matches the
        reference concat: [rgb, sk] (model.py:296-304).
        """
        feats = []
        if "rgb" in data:
            rgb = data["rgb"]
            lead = rgb.shape[:-3]
            flat = rgb.reshape((-1,) + rgb.shape[-3:])
            f = self.rgb_extractor(flat, train=train)
            feats.append(f.reshape(lead + (256,)))
        if "sk" in data:
            feats.append(self.sk_extractor(data["sk"]))
        return jnp.concatenate(feats, axis=-1)

    def __call__(
        self,
        query_data: Dict[str, jnp.ndarray],
        support_mask: jnp.ndarray,
        support_data: Optional[Dict[str, jnp.ndarray]] = None,
        support_features: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        """query_data values shaped (b, L, ...); support_data (b, way, L, ...).

        Exactly one of support_data / support_features must be given; the
        caller caches features after the first pass (reference ar.py:56-74,
        model.py:307-317).
        """
        query_features = self.extract_features(query_data, train=train)  # (b, L, D)
        if support_features is None:
            support_features = self.extract_features(support_data, train=train)
        return self.match_with_features(query_features, support_mask, support_features)

    def match_with_features(self, query_features, support_mask, support_features):
        """The post-extraction half of ``__call__``: transformer match +
        open-set decision on pre-embedded query (b, L, D) and support
        (b, way, L, D) features. Split out so callers that must control the
        extractor applies themselves — the sequence-parallel trainer hoists
        support extraction onto a way-minor (b, L, way, ...) layout to keep the frame
        flatten shardable (train/trainer.py) — share one decision path with
        ``__call__``."""
        out = self.transformer(support_features, support_mask, query_features)
        logits = out["logits"]

        b = logits.shape[0]
        chosen = jnp.argmax(logits, axis=1)
        chosen_diff = out["diffs"][jnp.arange(b), chosen]  # (b, T, d)
        if self.config.model == "DISC":
            decision = self.discriminator(chosen_diff)
        else:  # "EXP": distance-derived confidence, exp of the best logit.
            decision = jnp.exp(jnp.max(logits, axis=1, keepdims=True))

        return {
            "logits": logits,
            "is_true": decision,
            "prototypes": out["prototypes"],
            "support_features": support_features,
            "attention": out["attention"],
        }

    # ------------------------------------------------- cached-KV fast path

    def support_kv(self, support_data=None, support_features=None, train: bool = False):
        """Embed the support set and project its transformer keys/values —
        the once-per-support-edit half of the streaming split."""
        if support_features is None:
            support_features = self.extract_features(support_data, train=train)
        s_k, s_v = self.transformer.support_kv(support_features)
        return {"s_k": s_k, "s_v": s_v, "features": support_features}

    def match_cached(self, query_data, support_mask, s_k, s_v):
        """Per-frame half: embed the query, match against cached K/V, decide.
        Identical math to __call__ with the same support set."""
        return self.match_features(
            self.extract_features(query_data), support_mask, s_k, s_v
        )

    def match_features(self, query_features, support_mask, s_k, s_v):
        """Match pre-extracted query features (b, L, D) against cached K/V.

        The streaming pipeline keeps a ring of per-frame features (each frame
        is embedded exactly once, when it enters the window) — extractors are
        per-frame pure functions, so this equals re-extracting the whole
        window every step (the reference's ar.py:49-51 does the latter)."""
        out = self.transformer.match(s_k, s_v, support_mask, query_features)
        logits = out["logits"]
        b = logits.shape[0]
        chosen = jnp.argmax(logits, axis=1)
        chosen_diff = out["diffs"][jnp.arange(b), chosen]
        if self.config.model == "DISC":
            decision = self.discriminator(chosen_diff)
        else:
            decision = jnp.exp(jnp.max(logits, axis=1, keepdims=True))
        return {"logits": logits, "is_true": decision, "attention": out["attention"]}

    def embed_frame(self, sk=None, rgb=None):
        """Per-frame feature for the streaming ring: (d,) for one frame.

        sk: (n_joints*3,) flat root-relative skeleton; rgb: (H, W, 3) NHWC
        whitened crop. Concat order matches extract_features ([rgb, sk])."""
        feats = []
        if rgb is not None:
            feats.append(self.rgb_extractor(rgb[None])[0])
        if sk is not None:
            feats.append(self.sk_extractor(sk))
        return jnp.concatenate(feats, axis=-1)
