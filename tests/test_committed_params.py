"""Every module wrapper must commit its params tree to the device at
construction.

Regression pin for the round-3 300x finding (docs/PERF.md "Committed
params"): a checkpoint restored from msgpack is a tree of HOST numpy
arrays, and passing a host tree to a jitted call re-uploads every array on
EVERY call — ~20-29 s per production `estimate()` through the remote-TPU
relay vs 0.06-0.10 s with `jax.device_put` at __init__. Invisible on CPU
(cheap transfers) and in the fused pipeline (which commits its own params),
so only this direct check keeps new wrappers honest.
"""

import jax
import numpy as np

from isbfsar_tpu.configs import (
    ARConfig,
    CameraIntrinsics,
    FocusConfig,
    HPEConfig,
    MutualGazeConfig,
)


def _all_leaves_on_device(tree) -> bool:
    leaves = jax.tree.leaves(tree)
    assert leaves, "params tree is empty"
    return all(isinstance(leaf, jax.Array) for leaf in leaves)


def _to_host(tree):
    """Simulate a restored checkpoint: plain numpy leaves."""
    return jax.tree.map(np.asarray, tree)


class TestCommittedParams:
    def test_estimator_commits_host_checkpoint(self):
        from isbfsar_tpu.hpe.estimator import HumanPoseEstimator
        from isbfsar_tpu.models.effnetv2 import V2_TINY

        cfg = HPEConfig(yolo_input_size=64, crop_size=64, yolo_thresh=0.0)
        kw = dict(backbone_stages=V2_TINY, frame_shape=(96, 128),
                  yolo_width=0.25)
        est = HumanPoseEstimator(cfg, CameraIntrinsics(), **kw)
        host = _to_host(est.params)

        est2 = HumanPoseEstimator(cfg, CameraIntrinsics(), params=host, **kw)
        assert _all_leaves_on_device(est2.params)

    def test_recognizer_commits_host_checkpoint(self):
        from isbfsar_tpu.ar.recognizer import ActionRecognizer

        cfg = ARConfig.for_input("skeleton")
        ar = ActionRecognizer(cfg)
        ar2 = ActionRecognizer(cfg, params=_to_host(ar.params))
        assert _all_leaves_on_device(ar2.params)

    def test_focus_detector_commits_host_checkpoint(self):
        from isbfsar_tpu.focus.detector import FocusDetector

        det = FocusDetector(FocusConfig(), CameraIntrinsics())
        det2 = FocusDetector(FocusConfig(), CameraIntrinsics(),
                             params=_to_host(det.params))
        assert _all_leaves_on_device(det2.params)

    def test_head_pose_commits_host_checkpoint(self):
        from isbfsar_tpu.focus.head_pose import HeadPoseDetector

        hp = HeadPoseDetector()
        hp2 = HeadPoseDetector(params=_to_host(hp.params))
        assert _all_leaves_on_device(hp2.params)

    def test_mutual_gaze_commits_host_checkpoint(self):
        from isbfsar_tpu.focus.mutual import HeadDetector, MutualGazeDetector

        cfg = MutualGazeConfig()
        hd = HeadDetector(cfg)
        assert _all_leaves_on_device(
            HeadDetector(cfg, params=_to_host(hd.params)).params
        )
        mg = MutualGazeDetector(cfg)
        assert _all_leaves_on_device(
            MutualGazeDetector(cfg, params=_to_host(mg.params)).params
        )
