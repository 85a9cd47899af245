"""Structured Streaming surface.

The reference has no true streaming — each POST /detect call is a
self-contained micro-batch over a temp file
(``api/detect_anomaly_sequence.py:186-192``). The idiomatic Spark lift is a
file-source streaming query whose every micro-batch runs the row-scope rule
pack via ``foreachBatch`` — giving exactly-once, resumable validation of a
continuously-landing sequence table.
"""

from log_anomaly_detector_spark.streaming.validate_stream import (  # noqa: F401
    validate_stream,
)
