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


def exec_retry_watchdog(what: str, deadline_s: float, quiet_s: float = 180.0,
                        max_retries: int = 2,
                        env_var: str = "ISBFSAR_WEDGE_RETRY",
                        say=None, on_exhausted=None,
                        _exec=None, _exit=None):
    """Mid-run wedge guard with self-retry: if the returned event is not
    set within ``deadline_s``, assume the relay wedged AFTER init (the
    round-5 signature: first compile/execute hangs in C land, where no
    thread can interrupt it), wait ``quiet_s`` for the relay to drain,
    then RE-EXEC this process image — ``os.execv`` clears the wedged
    client state while the caller's single invocation (e.g. the driver's
    one ``python bench.py``) keeps running. Retries are counted in
    ``os.environ[env_var]``; when exhausted, call ``on_exhausted()`` (e.g.
    emit the one-JSON-line error contract) and hard-exit(3).

    ``deadline_s <= 0`` disarms. ``_exec``/``_exit`` are injectable for
    tests (default ``os.execv`` / ``os._exit``)."""
    import os
    import sys
    import threading
    import time as _time

    done = threading.Event()
    if deadline_s <= 0:
        done.set()
        return done
    emit = say or (lambda m: print(m, file=sys.stderr, flush=True))

    def _watch():
        if done.wait(deadline_s):
            return
        tried = int(os.environ.get(env_var, "0"))
        if tried >= max_retries:
            emit(f"[watchdog] {what} still missing after {deadline_s:.0f}s "
                 f"and {tried} re-exec retries — giving up")
            if on_exhausted is not None:
                on_exhausted()
            (_exit or os._exit)(3)
            return
        emit(f"[watchdog] no {what} within {deadline_s:.0f}s — relay-wedge "
             f"signature; quiet {quiet_s:.0f}s then re-exec "
             f"(retry {tried + 1}/{max_retries})")
        _time.sleep(quiet_s)
        if done.is_set():  # late result while waiting: not a wedge
            return
        os.environ[env_var] = str(tried + 1)
        (_exec or os.execv)(sys.executable, [sys.executable] + sys.argv)

    threading.Thread(target=_watch, daemon=True).start()
    return done
