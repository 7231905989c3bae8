from isbfsar_tpu.ar.recognizer import ActionRecognizer  # noqa: F401
