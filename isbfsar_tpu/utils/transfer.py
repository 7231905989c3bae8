"""Host<->device transfer helpers (the relay-latency discipline).

On a remote-attached chip the device->host round-trip costs ~27 ms
(docs/PERF.md "Eager D2H prefetch"); every async-dispatch surface in this
framework starts the host copy of its pending results eagerly so a later
``device_get``/``np.asarray`` finds the bytes resident instead of paying
the RTT inline. ``FusedPipeline`` carries its own copy of this logic for
its packed vectors (pipeline.py ``_start_host_copy``); this helper covers
pytree-valued tokens (the module-path ``estimate_async`` results,
hpe/estimator.py:247 / focus/detector.py:173).
"""

from __future__ import annotations

import jax

_supported = True


def prefetch_host(tree) -> None:
    """Enqueue non-blocking device->host copies for every array leaf.

    Silently becomes a no-op on backends without
    ``jax.Array.copy_to_host_async`` (checked once per process).
    """
    global _supported
    if not _supported:
        return
    for leaf in jax.tree.leaves(tree):
        try:
            leaf.copy_to_host_async()
        except AttributeError:
            # non-array leaf (e.g. None placeholders) — skip it, keep going
            continue
        except Exception:
            _supported = False
            return
