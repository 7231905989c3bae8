"""Pretrained-weights bundle: manifest freshness, loading, lookup order.

The bundle (isbfsar_tpu/assets/pretrained/) is the repo's analog of the
reference's downloadable weight files (reference README.md:31-38): the
synthetic-supervision fits ship with the package so a fresh machine gets
TRAINED perception nets without the multi-minute fits. These tests pin the
consistency contract — a shipped file is addressed by the digest of the
LIVE trainer key, so stale weights can never shadow a retrain.
"""

import os

import pytest

from isbfsar_tpu import pretrained
from isbfsar_tpu.utils.cache import cached_params, params_cache_digest


class TestBundle:
    def test_manifest_fresh(self):
        """Every manifest entry's filename must equal the digest recomputed
        from the live trainer keys — trainer/budget changes without a
        bundle regeneration fail HERE, not silently at load time."""
        fresh = pretrained.verify()
        assert set(fresh) == {
            "pose-ci-motions", "pose-ci-diverse", "pose-diverse-256",
            "focus-ci", "pose-prod-256", "pose-prod-256-calib",
            "pose-ci-calib",
        }
        for digest in fresh.values():
            assert os.path.exists(
                os.path.join(pretrained.bundle_dir(), f"{digest}.msgpack")
            )

    def test_available_and_load(self):
        names = pretrained.available()
        assert set(names) == set(pretrained.verify())
        pose = pretrained.load("pose-ci-motions")
        assert "yolo" in pose and "params" in pose["yolo"]
        focus = pretrained.load("focus-ci")
        assert set(focus) == {"face_det", "lm_refiner", "gaze_net"}

    def test_load_unknown_name(self):
        with pytest.raises(KeyError, match="available"):
            pretrained.load("nope")

    def test_verify_flags_unbundled_spec(self, monkeypatch):
        """verify() must fail BOTH ways: a spec registered in _specs() but
        absent from the shipped manifest would ship weightless (cold
        machines refit for minutes) — it must be named, not skipped."""
        real_specs = pretrained._specs()

        def with_extra():
            specs = dict(real_specs)
            specs["pose-unbundled"] = pretrained.Spec(
                lambda: "posestack:not-in-any-bundle", "1",
                lambda: None, "registered but never bundled",
            )
            return specs

        monkeypatch.setattr(pretrained, "_specs", with_extra)
        with pytest.raises(AssertionError, match="pose-unbundled"):
            pretrained.verify()


class TestCacheLookupOrder:
    def test_bundle_hit_skips_training(self, tmp_path, monkeypatch):
        """cached_params must serve a bundled entry even with an EMPTY
        writable cache — the out-of-the-box-trained guarantee."""
        monkeypatch.setenv("ISBFSAR_PARAMS_CACHE", str(tmp_path))
        spec = pretrained._specs()["pose-ci-motions"]

        def bomb():
            raise RuntimeError("builder must not run: bundle should hit")

        params = cached_params(spec.key(), bomb, version=spec.version)
        assert "yolo" in params
        # served read-only from the bundle: nothing copied into the cache
        assert list(tmp_path.iterdir()) == []

    def test_moved_key_ignores_bundle(self, tmp_path, monkeypatch):
        """A key the bundle doesn't carry (e.g. after a budget change)
        must fall through to the builder despite bundled files existing."""
        monkeypatch.setenv("ISBFSAR_PARAMS_CACHE", str(tmp_path))
        with pytest.raises(RuntimeError, match="fell through"):
            cached_params(
                "posestack:some-new-budget-tuple",
                lambda: (_ for _ in ()).throw(RuntimeError("fell through")),
                version="1",
            )

    def test_digest_is_stable(self):
        """The digest function is the bundle's address space — pin it."""
        assert params_cache_digest("k", "1") == params_cache_digest("k", "1")
        assert params_cache_digest("k", "1") != params_cache_digest("k", "2")
        assert len(params_cache_digest("k", "1")) == 24
