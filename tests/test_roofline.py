"""tools/roofline.py: the audit math and the cost-analysis plumbing.

The TPU receipt itself (docs/ROOFLINE_r3.json) is produced on the chip;
these tests pin the machinery on CPU — the executable cost analysis is
read correctly, the roofline classification picks the binding resource,
and a donating program can be timed through `timed_fn`.
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
        # 2*n^3 FLOPs within cost-model slack; bytes >= the 3 operands
        assert row["gflops"] == pytest.approx(2 * n**3 / 1e9, rel=0.2)
        assert row["mbytes"] >= 3 * n * n * 4 / 1e6 * 0.9
        assert row["per_frame_ms"] > 0
        assert row["bound"] in ("compute", "bandwidth")
        assert 0 < row["pct_of_roofline"]
        # speed-of-light time = binding roofline term
        flops, bytes_ = row["gflops"] * 1e9, row["mbytes"] * 1e6
        expect = max(flops / 100e12, bytes_ / 100e9) * 1e3
        # both sides carry reporting-precision rounding
        assert row["speed_of_light_ms"] == pytest.approx(expect, rel=2e-2)

    def test_bound_classification(self):
        """intensity >= machine balance -> compute-bound, else bandwidth."""
        n = 512
        f = jax.jit(lambda a, b: a @ b)
        a = jnp.ones((n, n), jnp.float32)
        # balance = 1 FLOP/byte: a 512 matmul (AI ~ 85) is compute-bound
        row = roofline.audit("mm", f, (a, a), n_blocks=1, block=2,
                             peak_tflops=1.0, peak_gbs=1000.0)
        assert row["bound"] == "compute"
        # balance = 10000 FLOPs/byte: everything is bandwidth-bound
        row = roofline.audit("mm", f, (a, a), n_blocks=1, block=2,
                             peak_tflops=10000.0, peak_gbs=1.0)
        assert row["bound"] == "bandwidth"

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


class _Fake:
    def __init__(self, ca):
        self._ca = ca

    def cost_analysis(self):
        return self._ca
