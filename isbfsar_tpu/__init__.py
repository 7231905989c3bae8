"""isbfsar_tpu — TPU-native interactive one-shot open-set action recognition.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of steb6/ISBFSAR:
human pose estimation (YOLOv4 person detection + MetrABS-style absolute 3D
lifting), one-shot open-set skeleton action recognition (temporal
cross-transformer + discriminator against a runtime-mutable support set),
and gaze-based focus detection — as fused XLA programs on TPU.
"""

__version__ = "0.1.0"
