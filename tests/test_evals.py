"""Tests for eval harnesses, explainability, and streaming utilities."""

import dataclasses
import socket
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isbfsar_tpu.configs import ARConfig
from isbfsar_tpu.models.trx import TRXOS
from isbfsar_tpu.train.evals import (
    discriminator_confusion,
    episodic_test,
    plot_confusion,
    plot_fsos,
)
from isbfsar_tpu.train.explain import explain_episode, grad_cam, top_attention_pairs
from isbfsar_tpu.train.synthetic import generate_dataset

CFG = ARConfig.for_input("skeleton")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_eval"))
    names = generate_dataset(root, n_classes=7, clips_per_class=2, n_frames=16)
    return root, names


@pytest.fixture(scope="module")
def params():
    model = TRXOS(CFG)
    q = {"sk": jnp.zeros((1, CFG.seq_len, 90))}
    s = {"sk": jnp.zeros((1, CFG.way, CFG.seq_len, 90))}
    return model.init(jax.random.key(0), q, jnp.ones((1, CFG.way), bool), support_data=s)


class TestQualitativeRenderer:
    def test_episode_grid_artifact(self, dataset, params, tmp_path):
        """A5 completion (reference create_qualitative_draw.py): one grid
        PNG per episode — support rows + query (pred-vs-true title) +
        unknown row — rendered headless."""
        from isbfsar_tpu.train.qualitative import qualitative_episodes

        root, names = dataset
        records = qualitative_episodes(
            CFG, params, root, str(tmp_path / "qual"), n_episodes=2, seed=3
        )
        assert len(records) == 2
        for rec in records:
            import os

            assert os.path.exists(rec["path"])
            assert os.path.getsize(rec["path"]) > 20_000  # real pixels
            assert rec["pred"] in names and rec["true"] in names
            assert rec["probs"].shape == (CFG.way,)
            np.testing.assert_allclose(rec["probs"].sum(), 1.0, rtol=1e-4)
            assert 0.0 <= rec["is_true"] <= 1.0
            assert 0.0 <= rec["is_true_unknown"] <= 1.0


class TestEvalHarnesses:
    def test_episodic_test(self, dataset, params):
        root, _ = dataset
        cfg = dataclasses.replace(CFG, n_task=8)
        metrics = episodic_test(cfg, params, root, n_task=8, batch_size=4)
        for key in ("fs_accuracy", "os_accuracy", "os_f1"):
            assert 0.0 <= metrics[key] <= 1.0

    def test_confusion_matrix(self, dataset, params, tmp_path):
        root, names = dataset
        classes = names[:3]
        matrix = discriminator_confusion(
            CFG, params, root, root, classes=classes, max_queries_per_class=1
        )
        assert matrix.shape == (3, 3)
        assert np.isfinite(matrix).all()
        assert (matrix >= 0).all() and (matrix <= 1).all()
        plot_confusion(matrix, classes, str(tmp_path / "cm.png"))
        assert (tmp_path / "cm.png").exists()

    def test_plot_fsos(self, tmp_path):
        plot_fsos(
            {"FSOS-ACC": [0.6, 0.7], "FS-ACC": [0.8], "OS-ACC": [0.7]},
            str(tmp_path / "fsos.png"),
        )
        assert (tmp_path / "fsos.png").exists()


class TestExplain:
    def test_attention_pairs(self, rng):
        att = rng.uniform(0, 1, (CFG.way, 120, 120)).astype(np.float32)
        pairs = top_attention_pairs(att, CFG.seq_len, class_idx=2, k=3)
        assert len(pairs) == 3
        assert pairs[0]["score"] >= pairs[1]["score"] >= pairs[2]["score"]
        for p in pairs:
            assert len(p["query_frames"]) == 2 and len(p["support_frames"]) == 2
            assert all(0 <= f < CFG.seq_len for f in p["query_frames"])

    def test_explain_episode(self, params, rng):
        support = {"sk": jnp.asarray(rng.normal(size=(1, CFG.way, CFG.seq_len, 90)), jnp.float32)}
        query = {"sk": jnp.asarray(rng.normal(size=(1, CFG.seq_len, 90)), jnp.float32)}
        info = explain_episode(CFG, params, support, query)
        assert 0 <= info["chosen_class"] < CFG.way
        assert len(info["top_attention_pairs"]) == 5
        assert info["logits"].shape == (CFG.way,)

    def test_grad_cam(self, rng):
        from isbfsar_tpu.models.resnet import Bottleneck, ResNet

        model = ResNet(
            stage_sizes=(1, 1, 1, 1), block=Bottleneck, num_classes=4,
            dtype=jnp.float32, enable_cam=True,
        )
        x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
        variables = model.init(jax.random.key(0), x)
        assert "perturbations" in variables

        # monkeypatch the stage sizes used inside grad_cam via direct call
        import isbfsar_tpu.train.explain as ex

        def tiny_grad_cam(variables, images, class_idx):
            m = ResNet(stage_sizes=(1, 1, 1, 1), block=Bottleneck, num_classes=4,
                       dtype=jnp.float32, enable_cam=True)
            pert0 = jax.tree.map(jnp.zeros_like, variables["perturbations"])

            def score(pert):
                out, state = m.apply({**variables, "perturbations": pert}, images,
                                     mutable=["intermediates"])
                return jnp.sum(out[:, class_idx]), state["intermediates"]["stage4"][0]

            (_, acts), grads = jax.value_and_grad(score, has_aux=True)(pert0)
            g = grads["stage4"]
            w = jnp.mean(g, axis=(1, 2), keepdims=True)
            cam = jax.nn.relu(jnp.sum(w * acts, axis=-1))
            return np.asarray(cam / (jnp.max(cam, axis=(1, 2), keepdims=True) + 1e-8))

        cam = tiny_grad_cam(variables, x, 1)
        assert cam.shape == (2, 2, 2)  # 64 / 32
        assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6
        assert cam.max() > 0.0  # gradient actually flowed


class TestStreaming:
    def test_socket_roundtrip(self, rng):
        from isbfsar_tpu.runtime.stream import recv_frame, send_frame

        srv = socket.socket()
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        port = srv.getsockname()[1]

        frame = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
        received = []

        def server():
            conn, _ = srv.accept()
            received.append(recv_frame(conn))
            conn.close()

        t = threading.Thread(target=server)
        t.start()
        cli = socket.create_connection(("127.0.0.1", port))
        send_frame(cli, frame, quality=100)
        cli.close()
        t.join(timeout=10)
        srv.close()
        assert received and received[0].shape == frame.shape

    def test_record_source(self, tmp_path):
        from isbfsar_tpu.runtime.source import SyntheticSource
        from isbfsar_tpu.runtime.stream import record_source

        out = str(tmp_path / "clip.mp4")
        n = record_source(SyntheticSource(64, 48), out, fps=10, max_frames=5)
        assert n == 5
        import os

        assert os.path.getsize(out) > 0
