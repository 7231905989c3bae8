"""Flax model zoo: detection, pose, recognition, gaze."""

from isbfsar_tpu.models.detection import (  # noqa: F401
    BinaryGazeClassifier,
    EyeKeypointMLP,
    HeadDetectorNet,
)
from isbfsar_tpu.models.effnetv2 import (  # noqa: F401
    V2_L,
    V2_S,
    V2_TINY,
    EfficientNetV2,
    MetrabsHead,
)
from isbfsar_tpu.models.gaze import BlazeFaceLite, GazeNet, HopeNet  # noqa: F401
from isbfsar_tpu.models.resnet import ResNet, resnet18, resnet50  # noqa: F401
from isbfsar_tpu.models.trx import TRXOS, TemporalCrossTransformer  # noqa: F401
from isbfsar_tpu.models.yolov4 import YOLOv4  # noqa: F401
