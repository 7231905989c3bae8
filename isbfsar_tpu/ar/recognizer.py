"""Online one-shot open-set action recognizer.

Behavioral rebuild of the reference's ``ActionRecognizer`` (reference
modules/ar/ar.py:10-96): sliding window of the last ``seq_len`` frames,
runtime-mutable support set with per-class feature caching, zero-padding to
``way``, softmax scores per class + open-set decision + requires_focus flags.

TPU-first redesign of the mutable state: instead of an OrderedDict of
variable-length torch tensors (which would retrigger XLA compilation on
every add/remove), the support set lives in fixed-shape device buffers —
raw data (way, L, ...), cached features (way, L, D) and a validity mask
(way,). Adding/removing a class flips mask bits and rewrites one slot;
the two jit programs (embed-support, infer-cached) never recompile.

Guarantees preserved from the reference:
- empty input or empty support set -> ({}, 0, {})    (ar.py:34-38)
- results appear only once the window holds seq_len frames (ar.py:42-46)
- support features are computed once and cached; inference afterwards only
  embeds the query (ar.py:56-74)
- class scores are a softmax over the live classes only (masked softmax
  == softmax over k classes, ar.py:77-83)
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isbfsar_tpu.configs import ARConfig
from isbfsar_tpu.models.trx import TRXOS

MODALITY_SHAPES = {
    "sk": lambda cfg: (cfg.n_joints * 3,),
    "rgb": lambda cfg: (cfg.rgb_size, cfg.rgb_size, 3),
}


def _modalities(input_type: str) -> List[str]:
    return {"skeleton": ["sk"], "rgb": ["rgb"], "hybrid": ["rgb", "sk"]}[input_type]


class ActionRecognizer:
    def __init__(self, config: ARConfig, params=None, seed: int = 0):
        self.config = config
        self.model = TRXOS(config)
        self.seq_len = config.seq_len
        self.way = config.way
        self.modalities = _modalities(config.input_type)

        if params is None:
            params = self._init_params(seed)
        # commit to device once: host-numpy checkpoint trees re-upload on
        # EVERY jitted call otherwise (~seconds/call over a remote TPU link)
        self.params = jax.device_put(params)

        # Fixed-shape mutable state.
        self.support_data: Dict[str, np.ndarray] = {
            m: np.zeros((self.way, self.seq_len) + MODALITY_SHAPES[m](config), np.float32)
            for m in self.modalities
        }
        self.support_mask = np.zeros((self.way,), bool)
        self.support_features: Optional[jax.Array] = None  # (way, L, D) when cached
        self.class_order: List[Optional[str]] = [None] * self.way
        self.requires_focus: Dict[str, bool] = {}
        self.previous_frames: List[Dict[str, np.ndarray]] = []
        # bumped on every support-set mutation; consumers holding derived
        # caches (e.g. parallel.WayShardedMatcher) compare against it
        self.support_version: int = 0

        self._infer_cached = jax.jit(self._infer_cached_impl)
        self._infer_and_embed = jax.jit(self._infer_and_embed_impl)

    # ------------------------------------------------------------- internals

    def _init_params(self, seed: int):
        dummy_q = {
            m: jnp.zeros((1, self.seq_len) + MODALITY_SHAPES[m](self.config))
            for m in self.modalities
        }
        dummy_s = {
            m: jnp.zeros((1, self.way, self.seq_len) + MODALITY_SHAPES[m](self.config))
            for m in self.modalities
        }
        mask = jnp.ones((1, self.way), bool)

        @jax.jit  # single program: eager init is slow over a remote TPU link
        def init(key):
            return self.model.init(key, dummy_q, mask, support_data=dummy_s)

        return init(jax.random.key(seed))

    def _infer_cached_impl(self, params, query, features, mask):
        out = self.model.apply(params, query, mask[None], support_features=features[None])
        probs = jax.nn.softmax(out["logits"][0])
        return probs, out["is_true"][0, 0]

    def _infer_and_embed_impl(self, params, query, support, mask):
        out = self.model.apply(params, query, mask[None], support_data=support)
        probs = jax.nn.softmax(out["logits"][0])
        return probs, out["is_true"][0, 0], out["support_features"][0]

    def _live_classes(self) -> List[str]:
        return [c for c, v in zip(self.class_order, self.support_mask) if v and c is not None]

    # ------------------------------------------------------------ public API

    def inference(self, data: Optional[Dict[str, np.ndarray]]) -> Tuple[Dict[str, float], float, Dict[str, bool]]:
        """data: dict with 'sk' (90,) and/or 'rgb' (224, 224, 3) per frame."""
        if data is None or len(data) == 0:
            return {}, 0, {}
        if not self.support_mask.any():
            return {}, 0, {}

        missing = [m for m in self.modalities if m not in data]
        if missing:
            # validate BEFORE appending: a malformed frame left in the
            # window would poison the next seq_len stacks with KeyError
            raise ValueError(
                f"inference data missing modalities {missing} for "
                f"input_type={self.config.input_type!r} (got {sorted(data)})"
            )
        self.previous_frames.append({k: np.asarray(v, np.float32) for k, v in data.items()})
        if len(self.previous_frames) < self.seq_len:
            return {}, 0, {}
        if len(self.previous_frames) > self.seq_len:
            self.previous_frames = self.previous_frames[-self.seq_len:]

        query = {
            m: jnp.asarray(np.stack([f[m] for f in self.previous_frames])[None])
            for m in self.modalities
        }
        mask = jnp.asarray(self.support_mask)

        if self.support_features is None:
            support = {m: jnp.asarray(v[None]) for m, v in self.support_data.items()}
            probs, is_true, feats = self._infer_and_embed(self.params, query, support, mask)
            self.support_features = feats
        else:
            probs, is_true = self._infer_cached(self.params, query, self.support_features, mask)

        # one round-trip for both outputs (per-leaf fetches are slow on
        # remote-attached chips)
        probs, is_true = jax.device_get((probs, is_true))
        results = {
            name: float(probs[i])
            for i, name in enumerate(self.class_order)
            if self.support_mask[i] and name is not None
        }
        return results, float(is_true), dict(self.requires_focus)

    def train(self, inp: Dict) -> None:
        """Insert/overwrite a class in the support set (reference ar.py:94-96).

        inp: {'flag': name, 'data': {'poses': (L, 90) and/or 'imgs': (L, 224, 224, 3)},
              'requires_focus': bool}
        """
        name = inp["flag"]
        if name in self.class_order:
            slot = self.class_order.index(name)
        else:
            free = np.flatnonzero(~self.support_mask)
            if free.size == 0:
                raise ValueError(f"support set is full (way={self.way}); remove a class first")
            slot = int(free[0])

        key_map = {"poses": "sk", "imgs": "rgb"}
        for k, v in inp["data"].items():
            m = key_map.get(k, k)
            self.support_data[m][slot] = np.asarray(v, np.float32).reshape(
                self.support_data[m][slot].shape
            )
        self.support_mask[slot] = True
        self.class_order[slot] = name
        self.requires_focus[name] = bool(inp.get("requires_focus", False))
        self.support_features = None  # recompute + recache on next inference
        self.support_version += 1

    def remove(self, flag: str) -> bool:
        if flag not in self.class_order:
            return False
        slot = self.class_order.index(flag)
        self.support_mask[slot] = False
        self.class_order[slot] = None
        for m in self.modalities:
            self.support_data[m][slot] = 0.0
        self.requires_focus.pop(flag, None)
        self.support_features = None
        self.support_version += 1
        return True

    @property
    def n_classes(self) -> int:
        return int(self.support_mask.sum())

    # --------------------------------------------------------- persistence

    def save_support_set(self, directory: str) -> str:
        """Persist the mutable support set (reference main.py:321-327), pickle-free."""
        os.makedirs(directory, exist_ok=True)
        np.savez_compressed(
            os.path.join(directory, "support_set.npz"),
            mask=self.support_mask,
            **{f"data_{m}": v for m, v in self.support_data.items()},
        )
        meta = {
            "class_order": self.class_order,
            "requires_focus": self.requires_focus,
            "input_type": self.config.input_type,
        }
        with open(os.path.join(directory, "support_set.json"), "w") as f:
            json.dump(meta, f)
        return directory

    def load_support_set(self, directory: str) -> int:
        data = np.load(os.path.join(directory, "support_set.npz"))
        with open(os.path.join(directory, "support_set.json")) as f:
            meta = json.load(f)
        if meta.get("input_type") != self.config.input_type:
            raise ValueError(
                f"support set was saved for input_type="
                f"{meta.get('input_type')!r}, recognizer is configured for "
                f"{self.config.input_type!r}"
            )
        for m in self.modalities:
            want = self.support_data[m].shape
            got = data[f"data_{m}"].shape
            if want != got:
                raise ValueError(
                    f"support set shape mismatch for {m!r}: saved {got}, "
                    f"config expects {want} (way/seq_len/size changed?)"
                )
        self.support_mask = data["mask"]
        for m in self.modalities:
            self.support_data[m] = data[f"data_{m}"]
        self.class_order = meta["class_order"]
        self.requires_focus = meta["requires_focus"]
        self.support_features = None
        self.support_version += 1
        return self.n_classes
