"""Way-sharded support-set matching — scale the open-set match over a mesh.

The reference caps the support set at ``way`` = 5 because each class costs a
full temporal-cross-transformer attention pass against the query window
(reference modules/ar/utils/model.py per-class loop; ar.py:56-74). The TRX
match is embarrassingly parallel over classes: per-class K/V attention,
then a softmax over class logits and an elementwise open-set discriminator.
That makes the class axis the natural *expert-parallel-style* sharding
dimension for production support sets (hundreds of gestures): cached
support features live sharded ``P("dp")`` over the mesh, the query is
replicated, every device matches only its slice of classes, and GSPMD
inserts ONE all-gather of the (way,)-sized logit vector for the softmax —
bytes over ICI per frame ≈ 4·way, i.e. nothing.

Parity contract: identical numerics to the single-device cached match
(tests/test_parallel.py pins sharded == unsharded to float tolerance).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from isbfsar_tpu.ar.recognizer import ActionRecognizer
from isbfsar_tpu.parallel.mesh import make_mesh


class WayShardedMatcher:
    """Runs an ActionRecognizer's cached match with the support set sharded
    over the mesh's ``dp`` axis.

    Wraps (not replaces) the recognizer: the mutable support-set API
    (train/remove/save/load) stays host-side on the recognizer; this class
    owns the device placement of the cached features and the sharded jit
    program. ``way`` must be a multiple of the mesh size (pad the config's
    way — masked slots are free).
    """

    def __init__(self, ar: ActionRecognizer, mesh: Optional[Mesh] = None):
        self.ar = ar
        self.mesh = mesh if mesh is not None else make_mesh()
        n = self.mesh.devices.size
        assert ar.way % n == 0, (
            f"way ({ar.way}) must be a multiple of the mesh size ({n}); "
            f"pad ARConfig.way — masked slots cost nothing"
        )
        self._way_sharded = NamedSharding(self.mesh, P("dp"))
        self._replicated = NamedSharding(self.mesh, P())
        self._features: Optional[jax.Array] = None  # sharded (way, L, D)
        self._features_version: int = -1  # ar.support_version at last refresh

        self._match = jax.jit(
            ar._infer_cached_impl,
            in_shardings=(
                self._replicated,  # params
                self._replicated,  # query
                self._way_sharded,  # support features: class slices per device
                self._way_sharded,  # mask
            ),
            out_shardings=self._replicated,
        )
        self._embed = jax.jit(
            lambda params, support: ar.model.apply(
                params, support, method="extract_features"
            ),
            out_shardings=self._way_sharded,
        )

    # ---------------------------------------------------------------- state

    def refresh(self) -> None:
        """(Re)embed the recognizer's support data, sharded over classes.

        The embed itself also runs way-sharded (each device embeds its own
        class slice — support clips never need to be resident anywhere in
        full)."""
        support = {
            m: jax.device_put(v, self._way_sharded)  # (way, L, ...) class slices
            for m, v in self.ar.support_data.items()
        }
        self._features = self._embed(self.ar.params, support)  # (way, L, D)
        self._features_version = self.ar.support_version

    # ------------------------------------------------------------ inference

    def match_window(self, window: Dict[str, np.ndarray]) -> Tuple[Dict[str, float], float]:
        """Match a full (L, ...) query window against the sharded support.

        Returns ({class: prob}, open-set score) — the recognizer's
        inference contract, minus the host-side sliding-window bookkeeping
        (use ``ar.inference`` for the frame-by-frame API)."""
        if not self.ar.support_mask.any():
            return {}, 0.0
        if self._features is None or self._features_version != self.ar.support_version:
            self.refresh()  # support set edited since the last embed
        query = {m: jnp.asarray(np.asarray(v)[None]) for m, v in window.items()}
        mask = jax.device_put(np.asarray(self.ar.support_mask), self._way_sharded)
        probs, is_true = jax.device_get(
            self._match(self.ar.params, query, self._features, mask)
        )
        results = {
            name: float(probs[i])
            for i, name in enumerate(self.ar.class_order)
            if self.ar.support_mask[i] and name is not None
        }
        return results, float(is_true)
