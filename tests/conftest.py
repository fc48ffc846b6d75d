import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from sliding_window_aggregators_spark.sources import get_spark

    s = get_spark(app="swag-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()


def approx_eq(a, b, rtol=1e-9):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= rtol * max(1.0, abs(a), abs(b))
    return a == b


def ref_stream(n: int) -> np.ndarray:
    """The reference's synthetic value stream 1 + (i % 101)
    (cpp/src/benchmark_core.h:115)."""
    return (1 + (np.arange(n) % 101)).astype(float)
