"""Tests for CLI split protocol, profiling utils, and checkpoint migration."""

import time

import numpy as np

from isbfsar_tpu.train.train_cli import NTU_TEST_IDS, load_ntu_class_names, ntu_splits
from isbfsar_tpu.utils.checkpoint import rename_params
from isbfsar_tpu.utils.profiling import FpsCounter, Stopwatch, device_memory_stats


class TestNTUSplit:
    def test_class_names_parse(self):
        mapping = load_ntu_class_names()
        assert len(mapping) == 120
        assert mapping["A1"] == "drink_water"

    def test_test_ids_match_reference(self):
        # reference train.py:33-35: A1, A7, ..., A115 (20 classes)
        assert len(NTU_TEST_IDS) == 20
        assert NTU_TEST_IDS[0] == "A1" and NTU_TEST_IDS[-1] == "A115"

    def test_splits_disjoint(self):
        mapping = load_ntu_class_names()
        all_classes = sorted(mapping.values())
        train, val, test = ntu_splits(all_classes)
        assert len(test) == 20
        assert not set(train) & set(val)
        assert not (set(train) | set(val)) & set(test)
        assert len(train) + len(val) + len(test) == 120
        # 80/20 split of the remaining 100
        assert len(train) == 80 and len(val) == 20


class TestProfiling:
    def test_fps_counter(self):
        c = FpsCounter(window=3)
        assert c.tick() == 0.0  # first tick has no interval
        time.sleep(0.01)
        fps = c.tick()
        assert 0 < fps < 1000

    def test_stopwatch(self):
        sw = Stopwatch()
        with sw.span("x"):
            time.sleep(0.005)
        with sw.span("x"):
            time.sleep(0.005)
        s = sw.summary()
        assert s["x"]["count"] == 2
        assert s["x"]["mean_ms"] >= 4.0

    def test_device_memory_stats_shape(self):
        stats = device_memory_stats()
        assert isinstance(stats, dict)  # may be empty on CPU


class TestRenameParams:
    def test_rename(self):
        tree = {"old_name": {"fc1": {"kernel": np.ones(2)}}, "keep": {"b": np.zeros(1)}}
        out = rename_params(tree, {"old_name": "new_name"})
        assert "new_name" in out and "old_name" not in out
        np.testing.assert_array_equal(out["new_name"]["fc1"]["kernel"], np.ones(2))
        assert "keep" in out


class TestProfilerTrace:
    def test_trace_writes_files(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from isbfsar_tpu.utils.profiling import trace

        with trace(str(tmp_path)):
            jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones((64, 64))))
        import os

        produced = [
            os.path.join(dp, f) for dp, _, fs in os.walk(tmp_path) for f in fs
        ]
        assert produced, "jax.profiler trace produced no files"
