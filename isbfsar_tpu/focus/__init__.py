from isbfsar_tpu.focus.detector import Face, FocusDetector  # noqa: F401
from isbfsar_tpu.focus.head_pose import HeadPoseDetector  # noqa: F401
from isbfsar_tpu.focus.mutual import HeadDetector, MutualGazeDetector  # noqa: F401
