"""tools/import_weights.py — the files -> params -> FSOS wiring (VERDICT r2
item 4). Real checkpoints cannot be downloaded here; these tests drive the
CLI end-to-end with FAKE upstream files whose layer orders come from the
same vendored specs that certify the importers
(tests/fixtures_upstream.py), so the command is proven runnable the day the
real files exist — and skips cleanly when they do not.
"""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.fixtures_upstream import (
    tianxiaomo_yolov4_state_dict_spec,
    trxos_state_dict_spec,
)
from tools.import_weights import load_imported, main


def _materialize_torch(spec):
    return {k: torch.tensor(np.full(shape, float(i + 1), np.float32))
            for i, (k, shape) in enumerate(spec)}


@pytest.fixture(scope="module")
def fake_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("upstream")
    trxos = root / "DISC.pth"
    torch.save(_materialize_torch(trxos_state_dict_spec("skeleton")), trxos)
    yolo = root / "yolov4.pth"
    torch.save(_materialize_torch(tianxiaomo_yolov4_state_dict_spec()), yolo)
    return {"root": root, "trxos": str(trxos), "yolo": str(yolo)}


class TestImportWeightsCLI:
    def test_skips_cleanly_when_files_absent(self, tmp_path, capsys):
        rc = main(["--out", str(tmp_path / "w"),
                   "--trxos", str(tmp_path / "missing.pth"),
                   "--yolo", str(tmp_path / "missing2.pth")])
        assert rc == 0
        out = capsys.readouterr().out
        assert out.count("SKIP") == 2
        assert not os.path.exists(tmp_path / "w" / "trxos.msgpack")

    def test_trxos_import_roundtrip(self, fake_files, tmp_path):
        out_dir = str(tmp_path / "w")
        rc = main(["--out", out_dir, "--trxos", fake_files["trxos"],
                   "--input-type", "skeleton"])
        assert rc == 0
        tree = load_imported(out_dir, "trxos.msgpack")
        assert "params" in tree
        # the fill pattern survived the mapping (fc1 weight was entry 0 ->
        # filled with 1.0, transposed to flax (in, out))
        fc1 = tree["params"]["sk_extractor"]["fc1"]["kernel"]
        assert fc1.shape == (90, 180) and float(fc1.flat[0]) == 1.0

    def test_yolo_import_roundtrip(self, fake_files, tmp_path):
        out_dir = str(tmp_path / "w")
        rc = main(["--out", out_dir, "--yolo", fake_files["yolo"]])
        assert rc == 0
        tree = load_imported(out_dir, "hpe.msgpack")
        yolo = tree["yolo"]
        assert "params" in yolo and "batch_stats" in yolo
        # every leaf overwritten (the zeros-template + strict-import
        # invariant certified in test_upstream_import.py)
        import jax

        assert all(float(np.abs(x).max()) > 0 for x in jax.tree.leaves(yolo))

    def test_fsos_protocol_runs_on_imported_params(self, fake_files, tmp_path):
        """--fsos-data: the single documented command that would reproduce
        the published 0.67 +- 0.06 the day real weights exist (here: fake
        weights + synthetic data — the protocol must RUN and print a
        score, not match the number)."""
        from isbfsar_tpu.train.synthetic import generate_dataset

        data = str(tmp_path / "data")
        generate_dataset(data, n_classes=7, clips_per_class=2, n_frames=16)
        out_dir = str(tmp_path / "w")
        rc = main(["--out", out_dir, "--trxos", fake_files["trxos"],
                   "--fsos-data", data, "--repeats", "1", "--k", "5"])
        assert rc == 0

    def test_fsos_without_trxos_errors(self, tmp_path):
        rc = main(["--out", str(tmp_path / "w"), "--fsos-data", str(tmp_path)])
        assert rc == 1
