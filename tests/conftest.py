from __future__ import annotations

import pytest

from log_anomaly_detector_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]")
    yield s
    s.stop()
