"""Backend-init watchdog.

``jax.devices()`` through a wedged relay never returns — not a slow
compile, a dead socket (observed hours-long; docs/PERF.md relay cost
model). Unattended entry points (bench.py, tools/roofline.py) gate ONLY
the backend init on this so a wedge produces a diagnosable artifact
instead of an eternal hang; compiles (legitimately ~15 min cold) run
after it returns.
"""

from __future__ import annotations

from typing import Optional


def await_backend(timeout_s: float) -> Optional[str]:
    """Initialize the jax backend with a timeout.

    Returns ``None`` once ``jax.devices()`` has returned, or an
    error-cause string when init raised (bad platform config, refused
    connection — reported immediately with the real cause) or exceeded
    ``timeout_s`` (the wedge signature). ``timeout_s <= 0`` disables the
    gate. The probe thread is a daemon, so a stuck init never blocks
    process exit — but callers that print-and-quit on failure should use
    ``os._exit``: a plain ``sys.exit`` waits on the stuck runtime.
    """
    if timeout_s <= 0:
        return None
    import threading

    import jax

    done = threading.Event()
    failure = []

    def _init():
        try:
            jax.devices()
        except Exception as e:  # pragma: no cover - backend-specific
            failure.append(f"{type(e).__name__}: {e}")
        finally:
            done.set()

    threading.Thread(target=_init, daemon=True).start()
    if not done.wait(timeout_s):
        return (f"backend init exceeded {timeout_s:.0f}s — relay "
                f"unreachable/wedged, not a code failure "
                f"(docs/PERF.md relay cost model)")
    return failure[0] if failure else None
