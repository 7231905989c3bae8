"""AR module tests: TRX forward parity vs numpy spec + recognizer behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isbfsar_tpu.configs import ARConfig
from isbfsar_tpu.ar.recognizer import ActionRecognizer
from isbfsar_tpu.models.trx import TRXOS, positional_encoding_table
from tests import reference_impls as spec

CFG = ARConfig.for_input("skeleton")  # seq_len 16, way 5, 30 joints


@pytest.fixture(scope="module")
def model_and_params():
    model = TRXOS(CFG)
    q = {"sk": jnp.zeros((1, CFG.seq_len, 90))}
    s = {"sk": jnp.zeros((1, CFG.way, CFG.seq_len, 90))}
    params = model.init(jax.random.key(0), q, jnp.ones((1, CFG.way), bool), support_data=s)
    return model, params


def _tree(params, *path):
    node = params["params"]
    for p in path:
        node = node[p]
    return node


class TestTRXParity:
    def test_positional_encoding_matches_spec(self):
        got = positional_encoding_table(24, 256)
        want = spec.pe_table_spec(24, 256)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_forward_matches_numpy_spec(self, model_and_params, rng):
        model, params = model_and_params
        sk_q = rng.normal(size=(1, CFG.seq_len, 90)).astype(np.float32)
        sk_s = rng.normal(size=(1, CFG.way, CFG.seq_len, 90)).astype(np.float32)
        mask = jnp.ones((1, CFG.way), bool)

        out = model.apply(params, {"sk": jnp.asarray(sk_q)}, mask, support_data={"sk": jnp.asarray(sk_s)})

        # numpy spec path
        mlp_p = _tree(params, "sk_extractor")
        q_feats = spec.skeleton_mlp_spec(mlp_p, sk_q[0])
        s_feats = spec.skeleton_mlp_spec(mlp_p, sk_s[0])
        logits_spec, diffs_spec = spec.trx_transformer_spec(
            _tree(params, "transformer"), s_feats, q_feats, list(range(CFG.way)), CFG.seq_len
        )
        np.testing.assert_allclose(np.asarray(out["logits"][0]), logits_spec, rtol=2e-4, atol=2e-3)

        chosen = int(np.argmax(logits_spec))
        decision_spec = spec.discriminator_spec(_tree(params, "discriminator"), diffs_spec[chosen])
        np.testing.assert_allclose(float(out["is_true"][0, 0]), decision_spec, atol=1e-4)

    def test_masked_padding_equals_live_subset(self, model_and_params, rng):
        """Scores with k=3 live classes must equal the spec computed on only
        those 3 classes — the masked softmax contract (reference ar.py:56-84)."""
        model, params = model_and_params
        sk_q = rng.normal(size=(1, CFG.seq_len, 90)).astype(np.float32)
        sk_s = rng.normal(size=(1, CFG.way, CFG.seq_len, 90)).astype(np.float32)
        sk_s[0, 3:] = 0.0  # padded slots
        mask = jnp.asarray([[True, True, True, False, False]])

        out = model.apply(params, {"sk": jnp.asarray(sk_q)}, mask, support_data={"sk": jnp.asarray(sk_s)})
        probs = np.asarray(jax.nn.softmax(out["logits"][0]))

        mlp_p = _tree(params, "sk_extractor")
        q_feats = spec.skeleton_mlp_spec(mlp_p, sk_q[0])
        s_feats = spec.skeleton_mlp_spec(mlp_p, sk_s[0])
        logits_spec, _ = spec.trx_transformer_spec(
            _tree(params, "transformer"), s_feats, q_feats, [0, 1, 2], CFG.seq_len
        )
        e = np.exp(logits_spec - logits_spec.max())
        probs_spec = e / e.sum()
        np.testing.assert_allclose(probs[:3], probs_spec, rtol=1e-4, atol=1e-5)
        assert probs[3:].max() < 1e-8  # padded classes get no mass

    def test_cached_features_path_identical(self, model_and_params, rng):
        model, params = model_and_params
        sk_q = jnp.asarray(rng.normal(size=(1, CFG.seq_len, 90)), jnp.float32)
        sk_s = jnp.asarray(rng.normal(size=(1, CFG.way, CFG.seq_len, 90)), jnp.float32)
        mask = jnp.ones((1, CFG.way), bool)

        full = model.apply(params, {"sk": sk_q}, mask, support_data={"sk": sk_s})
        cached = model.apply(
            params, {"sk": sk_q}, mask, support_features=full["support_features"]
        )
        np.testing.assert_allclose(
            np.asarray(full["logits"]), np.asarray(cached["logits"]), rtol=1e-6
        )


class TestRecognizer:
    def _frame(self, rng):
        return {"sk": rng.normal(size=90).astype(np.float32)}

    def _clip(self, rng):
        return rng.normal(size=(CFG.seq_len, 90)).astype(np.float32)

    def test_empty_contract(self, rng):
        ar = ActionRecognizer(CFG)
        assert ar.inference(None) == ({}, 0, {})
        assert ar.inference({}) == ({}, 0, {})
        # no support set -> empty results even with data
        assert ar.inference(self._frame(rng)) == ({}, 0, {})

    def test_window_warmup_and_inference(self, rng):
        ar = ActionRecognizer(CFG)
        ar.train({"flag": "wave", "data": {"poses": self._clip(rng)}, "requires_focus": True})
        ar.train({"flag": "jump", "data": {"poses": self._clip(rng)}, "requires_focus": False})

        for i in range(CFG.seq_len - 1):
            assert ar.inference(self._frame(rng)) == ({}, 0, {})
        results, os_score, focus = ar.inference(self._frame(rng))
        assert set(results) == {"wave", "jump"}
        assert abs(sum(results.values()) - 1.0) < 1e-5
        assert 0.0 <= os_score <= 1.0
        assert focus == {"wave": True, "jump": False}

    def test_cache_invalidation_and_consistency(self, rng):
        ar = ActionRecognizer(CFG)
        ar.train({"flag": "a", "data": {"poses": self._clip(rng)}, "requires_focus": False})
        frames = [self._frame(rng) for _ in range(CFG.seq_len)]
        for f in frames:
            r1 = ar.inference(f)
        assert ar.support_features is not None
        # Same window again via cached path must match a fresh uncached run.
        ar2 = ActionRecognizer(CFG, params=ar.params)
        ar2.train({"flag": "a", "data": {"poses": ar.support_data["sk"][0]}, "requires_focus": False})
        for f in frames:
            r2 = ar2.inference(f)
        assert r1[0].keys() == r2[0].keys()
        np.testing.assert_allclose(list(r1[0].values()), list(r2[0].values()), rtol=1e-5)

    def test_remove_and_full_set(self, rng):
        ar = ActionRecognizer(CFG)
        for i in range(CFG.way):
            ar.train({"flag": f"c{i}", "data": {"poses": self._clip(rng)}, "requires_focus": False})
        assert ar.n_classes == CFG.way
        with pytest.raises(ValueError):
            ar.train({"flag": "overflow", "data": {"poses": self._clip(rng)}, "requires_focus": False})
        assert ar.remove("c2")
        assert not ar.remove("c2")
        assert ar.n_classes == CFG.way - 1
        ar.train({"flag": "new", "data": {"poses": self._clip(rng)}, "requires_focus": False})
        assert ar.n_classes == CFG.way

    def test_save_load_roundtrip(self, rng, tmp_path):
        ar = ActionRecognizer(CFG)
        ar.train({"flag": "x", "data": {"poses": self._clip(rng)}, "requires_focus": True})
        ar.save_support_set(str(tmp_path))
        ar2 = ActionRecognizer(CFG, params=ar.params)
        assert ar2.load_support_set(str(tmp_path)) == 1
        np.testing.assert_array_equal(ar2.support_data["sk"], ar.support_data["sk"])
        assert ar2.requires_focus == {"x": True}
        assert ar2.class_order == ar.class_order


class TestSupportSetValidation:
    def test_load_rejects_input_type_mismatch(self, tmp_path):
        import dataclasses

        from isbfsar_tpu.configs import ARConfig

        rng = np.random.default_rng(0)
        ar = ActionRecognizer(ARConfig.for_input("skeleton"))
        ar.train({"flag": "a", "data": {"poses": rng.normal(size=(ar.config.seq_len, 90)).astype(np.float32)}, "requires_focus": False})
        ar.save_support_set(str(tmp_path))
        hybrid = ActionRecognizer(ARConfig.for_input("hybrid"))
        with pytest.raises(ValueError, match="input_type"):
            hybrid.load_support_set(str(tmp_path))

    def test_load_rejects_shape_mismatch(self, tmp_path):
        import dataclasses

        from isbfsar_tpu.configs import ARConfig

        rng = np.random.default_rng(0)
        ar = ActionRecognizer(ARConfig.for_input("skeleton"))
        ar.train({"flag": "a", "data": {"poses": rng.normal(size=(ar.config.seq_len, 90)).astype(np.float32)}, "requires_focus": False})
        ar.save_support_set(str(tmp_path))
        wide = ActionRecognizer(dataclasses.replace(ARConfig.for_input("skeleton"), way=8))
        with pytest.raises(ValueError, match="shape mismatch"):
            wide.load_support_set(str(tmp_path))

    def test_inference_rejects_missing_modality_before_append(self):
        from isbfsar_tpu.configs import ARConfig

        rng = np.random.default_rng(0)
        ar = ActionRecognizer(ARConfig.for_input("skeleton"))
        ar.train({"flag": "a", "data": {"poses": rng.normal(size=(ar.config.seq_len, 90)).astype(np.float32)}, "requires_focus": False})
        with pytest.raises(ValueError, match="missing modalities"):
            ar.inference({"wrong_key": np.zeros(90, np.float32)})
        # the malformed frame must NOT have entered the window
        assert len(ar.previous_frames) == 0
        for _ in range(ar.config.seq_len):
            ar.inference({"sk": rng.normal(size=90).astype(np.float32)})  # no crash
