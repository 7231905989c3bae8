"""bench.py backend-init watchdog (the relay-wedge guard).

The shared TPU relay has been observed to wedge for hours with
``jax.devices()`` never returning (docs/PERF.md relay cost model). The
driver runs ``bench.py`` unattended at round end, so a wedge must produce
a diagnosable one-JSON-line artifact instead of an eternal hang. These
tests exercise both watchdog branches without a relay: the hang branch by
substituting a blocking ``jax.devices``, the healthy branch against the
real (CPU) backend.
"""

import json
import time

import jax

import bench


def test_watchdog_emits_error_line_on_init_hang(monkeypatch, capsys):
    monkeypatch.setattr(jax, "devices", lambda: time.sleep(60))
    calls = []
    bench._await_backend_or_die(0.3, _exit=calls.append)
    assert calls == [1]
    line = capsys.readouterr().out.strip()
    out = json.loads(line)
    # Driver contract: metric/value/unit/vs_baseline stay present.
    assert out["metric"] == "e2e_fps"
    assert out["value"] == 0.0
    assert out["unit"] == "fps"
    assert out["vs_baseline"] == 0.0
    assert "relay" in out["error"]


def test_watchdog_reports_fast_init_failure_immediately(monkeypatch, capsys):
    """An EXCEPTION from jax.devices() (bad platform config, refused
    connection) is a code/config failure, not a wedge: it must be reported
    with the real cause, immediately — not after sleeping out the timeout
    under a 'not a code failure' banner."""
    def boom():
        raise RuntimeError("Unable to initialize backend 'axon'")

    monkeypatch.setattr(jax, "devices", boom)
    calls = []
    t0 = time.perf_counter()
    bench._await_backend_or_die(30.0, _exit=calls.append)
    assert time.perf_counter() - t0 < 5.0  # did not sleep out the timeout
    assert calls == [1]
    out = json.loads(capsys.readouterr().out.strip())
    assert "RuntimeError" in out["error"] and "axon" in out["error"]
    assert "not a code failure" not in out["error"]


def test_watchdog_passes_through_on_healthy_backend(capsys):
    calls = []
    bench._await_backend_or_die(30.0, _exit=calls.append)
    assert calls == []
    assert capsys.readouterr().out == ""


def test_watchdog_disabled_at_zero(monkeypatch, capsys):
    # 0 disables: must return immediately without touching the backend.
    monkeypatch.setattr(jax, "devices", lambda: time.sleep(60))
    t0 = time.perf_counter()
    bench._await_backend_or_die(0.0, _exit=lambda code: None)
    assert time.perf_counter() - t0 < 0.2
    assert capsys.readouterr().out == ""


class TestExecRetryWatchdog:
    """Mid-run wedge guard (round-5: the relay wedged at the first
    compile/execute AFTER a clean init, four times in one day). The guard
    re-execs the process after a quiet period — injectable _exec/_exit
    let the tests pin the protocol without a real exec."""

    def _arm(self, monkeypatch, deadline, quiet, retries_env, execs, exits,
             exhausted, max_retries=2):
        from isbfsar_tpu.utils.watchdog import exec_retry_watchdog

        if retries_env is None:
            monkeypatch.delenv("ISBFSAR_WEDGE_RETRY", raising=False)
        else:
            monkeypatch.setenv("ISBFSAR_WEDGE_RETRY", retries_env)
        return exec_retry_watchdog(
            "first result", deadline, quiet_s=quiet, max_retries=max_retries,
            say=lambda m: None,
            on_exhausted=(lambda: exhausted.append(True)),
            _exec=lambda *a: execs.append(a), _exit=exits.append,
        )

    def test_reexecs_on_wedge_with_retry_count(self, monkeypatch):
        import os
        import sys

        execs, exits, exhausted = [], [], []
        self._arm(monkeypatch, 0.2, 0.01, None, execs, exits, exhausted)
        time.sleep(1.0)
        assert len(execs) == 1
        exe, argv = execs[0]
        assert exe == sys.executable and argv[0] == sys.executable
        assert os.environ["ISBFSAR_WEDGE_RETRY"] == "1"
        assert not exits and not exhausted

    def test_disarmed_by_result(self, monkeypatch):
        execs, exits, exhausted = [], [], []
        done = self._arm(monkeypatch, 0.3, 0.01, None, execs, exits, exhausted)
        done.set()
        time.sleep(0.8)
        assert not execs and not exits and not exhausted

    def test_late_result_during_quiet_cancels_reexec(self, monkeypatch):
        execs, exits, exhausted = [], [], []
        done = self._arm(monkeypatch, 0.2, 1.0, None, execs, exits, exhausted)
        time.sleep(0.5)  # watchdog fired, now inside the quiet sleep
        done.set()
        time.sleep(1.2)
        assert not execs and not exits

    def test_exhausted_emits_contract_and_exits3(self, monkeypatch):
        execs, exits, exhausted = [], [], []
        self._arm(monkeypatch, 0.2, 0.01, "2", execs, exits, exhausted)
        time.sleep(1.0)
        assert not execs
        assert exhausted == [True]
        assert exits == [3]

    def test_deadline_zero_disarms(self, monkeypatch):
        execs, exits, exhausted = [], [], []
        done = self._arm(monkeypatch, 0.0, 0.01, None, execs, exits, exhausted)
        assert done.is_set()
        time.sleep(0.3)
        assert not execs and not exits
