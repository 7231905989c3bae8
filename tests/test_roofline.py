"""tools/roofline.py: the audit math and the cost-analysis plumbing.

The TPU receipt itself (docs/ROOFLINE_r4.json) is produced on the chip;
these tests pin the machinery on CPU — the executable cost analysis is
read correctly, the two speed-of-light bounds bracket correctly (io-bytes
floor <= cost-model-bytes upper), the floor classification picks the
binding resource, and a donating program can be timed through `timed_fn`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tools")

import roofline


class TestAudit:
    def test_matmul_row_fields(self):
        n = 256
        f = jax.jit(lambda a, b: a @ b)
        a = jnp.ones((n, n), jnp.float32)
        row = roofline.audit("mm", f, (a, a), n_blocks=2, block=3,
                             peak_tflops=100.0, peak_gbs=100.0)
        # 2*n^3 FLOPs within cost-model slack; cost-model bytes >= the 3
        # operands; io bytes == exactly the 3 operands (2 in + 1 out)
        assert row["gflops"] == pytest.approx(2 * n**3 / 1e9, rel=0.2)
        assert row["cost_model_mbytes"] >= 3 * n * n * 4 / 1e6 * 0.9
        assert row["io_mbytes"] == pytest.approx(3 * n * n * 4 / 1e6, rel=1e-3)
        assert row["per_frame_ms"] > 0
        assert row["floor_bound"] in ("compute", "bandwidth")
        assert 0 < row["pct_of_roofline"] <= 110.0  # floor can't beat measured
        # the two bounds bracket: floor uses io bytes, upper cost-model bytes
        assert row["sol_floor_ms"] <= row["sol_upper_ms"] + 1e-9
        flops = row["gflops"] * 1e9
        expect_floor = max(flops / 100e12, row["io_mbytes"] * 1e6 / 100e9) * 1e3
        assert row["sol_floor_ms"] == pytest.approx(expect_floor, rel=2e-2)
        assert row["mfu_pct"] == pytest.approx(
            100.0 * flops / (row["per_frame_ms"] / 1e3) / 100e12, rel=2e-2)

    def test_floor_bound_classification(self):
        """flops term >= io-bytes term -> compute floor, else bandwidth."""
        n = 512
        f = jax.jit(lambda a, b: a @ b)
        a = jnp.ones((n, n), jnp.float32)
        # 1 TFLOP/s vs 1000 GB/s: the matmul's FLOPs term dominates
        row = roofline.audit("mm", f, (a, a), n_blocks=1, block=2,
                             peak_tflops=1.0, peak_gbs=1000.0)
        assert row["floor_bound"] == "compute"
        # 10000 TFLOP/s vs 1 GB/s: the io-bytes term dominates
        row = roofline.audit("mm", f, (a, a), n_blocks=1, block=2,
                             peak_tflops=10000.0, peak_gbs=1.0)
        assert row["floor_bound"] == "bandwidth"

    def test_fused_beyond_cost_model_flag(self):
        """A fusion chain whose cost-model bytes far exceed real traffic
        must trip the flag when the measured time beats the upper bound —
        the exact signature the first on-chip run exposed (656% of the old
        'roof'). A tiny peak-GB/s makes the cost-model SoL astronomically
        slow, so any real execution beats it."""
        f = jax.jit(lambda x: jnp.tanh(x * 2.0 + 1.0) * x - jnp.exp(x))
        x = jnp.ones((256, 256), jnp.float32)
        row = roofline.audit("fuse", f, (x,), n_blocks=1, block=2,
                             peak_tflops=1e6, peak_gbs=1e-3)
        assert row["fused_beyond_cost_model"] is True

    def test_donating_program_via_timed_fn(self):
        """The shipped fused programs donate their state buffer; audit must
        time them through a threading wrapper without re-donation errors."""
        f = jax.jit(lambda x: x + 1.0, donate_argnums=(0,))
        held = {"x": jnp.zeros((128,), jnp.float32)}

        def run():
            held["x"] = f(held["x"])
            return held["x"]

        row = roofline.audit("donate", f, (jnp.zeros((128,), jnp.float32),),
                             n_blocks=2, block=4, peak_tflops=1.0,
                             peak_gbs=1.0, timed_fn=run)
        assert row["per_frame_ms"] > 0
        assert float(held["x"][0]) >= 8  # the wrapper really threaded state

    def test_cost_of_handles_list_and_dict(self):
        assert roofline.cost_of(_Fake({"flops": 5.0, "bytes accessed": 7.0})) \
            == {"flops": 5.0, "bytes": 7.0}
        assert roofline.cost_of(_Fake([{"flops": 5.0}])) == {
            "flops": 5.0, "bytes": 0.0}
        assert roofline.cost_of(_Fake([])) == {"flops": 0.0, "bytes": 0.0}

    def test_tree_nbytes(self):
        tree = {"a": np.zeros((4, 4), np.float32), "b": jnp.zeros(8, jnp.uint8),
                "c": 3}
        assert roofline._tree_nbytes(tree) == 4 * 4 * 4 + 8


class _Fake:
    def __init__(self, ca):
        self._ca = ca

    def cost_analysis(self):
        return self._ca
