"""Multi-host (DCN) dp-parity dry run — the executed backing for
docs/SCALING.md's "only dataset loading crosses DCN" topology claim.

The launcher spawns REAL ``jax.distributed`` worker processes (CPU
platform, localhost coordinator standing in for DCN), so this test is
independent of the suite's own 8-virtual-device backend. Marked slow:
each worker compiles the trainer twice.
"""

import pytest

from isbfsar_tpu.parallel.multihost import multihost_dp_parity


@pytest.mark.slow
def test_multihost_dp_step_matches_single_device():
    report = multihost_dp_parity(num_processes=2, local_devices=2)
    assert report["num_processes"] == 2
    assert report["global_devices"] == 4
    # the certified batch genuinely spanned both controller processes
    assert report["batch_processes_spanned"] == 2
    assert report["local_shards"] == 2
    # worker already asserts these bounds; pin them here for the record
    assert report["max_param_diff"] <= 2e-6
    assert report["max_metric_diff"] <= 2e-6
