"""tools/bench_train.py: the training-throughput bench's contract.

The TPU receipt is produced on the chip; these pin the machinery on CPU —
batch construction matches the dataloader contract, and the CLI emits one
parseable JSON row with a real rate.
"""

import json
import os
import subprocess
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestBatch:
    def test_episodic_batch_contract(self):
        """The shared synthetic-batch helper (train/synthetic.py — single
        source of truth for parity certificates AND the bench) matches the
        dataloader's batch contract."""
        from isbfsar_tpu.configs import ARConfig
        from isbfsar_tpu.train.synthetic import episodic_batch

        cfg = ARConfig.for_input("hybrid")
        b = episodic_batch(cfg, 4, rgb_size=32, modality="hybrid")
        way, L = cfg.way, cfg.seq_len
        assert b["support_set"]["rgb"].shape == (4, way, L, 32, 32, 3)
        assert b["support_set"]["sk"].shape == (4, way, L, 90)
        assert b["target_set"]["rgb"].shape == (4, L, 32, 32, 3)
        assert b["support_classes"].shape == (4, way)
        assert b["known"].dtype == bool


class TestCLI:
    def test_emits_one_json_row(self, tmp_path):
        """One subprocess run on the virtual CPU mesh: a parseable row with
        a positive rate and the mesh/devices facts filled in."""
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        out = subprocess.run(
            [sys.executable, "tools/bench_train.py", "--platform", "cpu",
             "--warmup", "1", "--blocks", "1", "--block", "2",
             "--json", str(tmp_path / "row.json")],
            capture_output=True, text=True, timeout=600, env=env,
            cwd=_REPO,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        row = json.loads(out.stdout.strip().splitlines()[-1])
        assert row["metric"] == "train_steps_per_s"
        assert row["value"] > 0
        assert row["devices"] == 8
        assert row["mesh"] == "dp8"
        assert row["backend"] == "cpu"
        saved = json.loads((tmp_path / "row.json").read_text())
        assert saved == row
