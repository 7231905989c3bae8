from isbfsar_tpu.hpe.estimator import HumanPoseEstimator  # noqa: F401
