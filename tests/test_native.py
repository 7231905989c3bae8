"""Native shared-memory queue tests: build, contract, cross-process use."""

import multiprocessing as mp
import time

import numpy as np
import pytest

from isbfsar_tpu.runtime.native import (
    ShmBytesQueue,
    ShmFrameQueue,
    ShmQueueTimeout,
    build_library,
)


class TestBuild:
    def test_compiles(self):
        assert build_library().endswith("libshmq.so")


class TestBytesQueue:
    def test_fifo_roundtrip(self):
        q = ShmBytesQueue("/isbfsar_test_fifo", slot_size=64, capacity=4)
        try:
            for i in range(4):
                q.put(f"item{i}".encode())
            assert q.qsize() == 4
            for i in range(4):
                assert q.get(64) == f"item{i}".encode()
        finally:
            q.close()

    def test_capacity_blocking_timeout(self):
        q = ShmBytesQueue("/isbfsar_test_cap", slot_size=16, capacity=1)
        try:
            q.put(b"one")
            with pytest.raises(ShmQueueTimeout):
                q.put(b"two", timeout_ms=50)
            assert q.get(16) == b"one"
            with pytest.raises(ShmQueueTimeout):
                q.get(16, timeout_ms=50)
        finally:
            q.close()


def _producer(n_frames: int, shape):
    from isbfsar_tpu.runtime.native import ShmFrameQueue

    q = ShmFrameQueue("/isbfsar_test_frames", shape, capacity=1, create=False)
    for i in range(n_frames):
        frame = np.full(shape, i, np.uint8)
        q.put(frame, msg=f"m{i}")
    q.close()


class TestFrameQueue:
    def test_frame_roundtrip(self):
        shape = (48, 64, 3)
        q = ShmFrameQueue("/isbfsar_test_rt", shape, capacity=2)
        try:
            frame = np.random.default_rng(0).integers(0, 255, shape).astype(np.uint8)
            q.put(frame, msg="add wave -focus", extra={"seq": 7})
            out = q.get()
            np.testing.assert_array_equal(out["rgb"], frame)
            assert out["msg"] == "add wave -focus"
            assert out["seq"] == 7
        finally:
            q.close()

    def test_message_only(self):
        q = ShmFrameQueue("/isbfsar_test_msg", (8, 8, 3), capacity=1)
        try:
            q.put(None, msg="quit")
            out = q.get()
            assert out["msg"] == "quit" and "rgb" not in out
        finally:
            q.close()

    def test_cross_process_backpressure(self):
        shape = (32, 32, 3)
        q = ShmFrameQueue("/isbfsar_test_frames", shape, capacity=1)
        try:
            proc = mp.get_context("spawn").Process(target=_producer, args=(5, shape))
            proc.start()
            got = []
            for _ in range(5):
                out = q.get(timeout_ms=30_000)
                got.append((int(out["rgb"][0, 0, 0]), out["msg"]))
            proc.join(timeout=30)
            assert proc.exitcode == 0
            assert got == [(i, f"m{i}") for i in range(5)]  # FIFO across processes
            assert q.qsize() == 0
        finally:
            q.close()

    def test_throughput_vs_tcp_hub(self):
        """The native ring must beat the TCP manager queue (the reference's
        transport, manager.py:6-15) on 640x480x3 frame roundtrips."""
        shape = (480, 640, 3)
        frame = np.zeros(shape, np.uint8)
        n = 30

        q = ShmFrameQueue("/isbfsar_test_bench", shape, capacity=1)
        try:
            t0 = time.perf_counter()
            for _ in range(n):
                q.put(frame)
                q.get()
            native_dt = time.perf_counter() - t0
        finally:
            q.close()

        from isbfsar_tpu.runtime.ipc import QueueClient, QueueHub

        hub = QueueHub(("127.0.0.1", 0)).start_background()
        addr = hub._server.address
        tq = QueueClient(addr[0], addr[1]).get_queue("bench")
        t0 = time.perf_counter()
        for _ in range(n):
            tq.put({"rgb": frame, "msg": ""})
            tq.get()
        tcp_dt = time.perf_counter() - t0

        # the native path should win by a wide margin; 2x is a loose floor
        assert native_dt * 2 < tcp_dt, (native_dt, tcp_dt)
