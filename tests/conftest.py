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


def hll_reference(values):
    """First-principles Python implementation of the repo's HLL spec
    (functions/monoids.py constants) — THE test oracle for every HLL
    form (batch query, kernel monoid, streaming state)."""
    import hashlib

    from sliding_window_aggregators_spark.functions.monoids import (
        HLL_ALPHA_M2_SCALED,
        HLL_M,
        HLL_P,
        HLL_RHO_CAP,
    )

    regs = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        b = h % HLL_M
        r = h >> HLL_P
        rho = HLL_RHO_CAP if r == 0 else ((r & -r).bit_length() - 1) + 1
        regs[b] = max(regs.get(b, 0), rho)
    s = sum(1 << (HLL_RHO_CAP - m) for m in regs.values())
    s += (HLL_M - len(regs)) * (1 << HLL_RHO_CAP)
    return round(HLL_ALPHA_M2_SCALED / float(s), 4)


def brute_streak(bits) -> int:
    """Longest consecutive run of truthy values — the MaxRun oracle
    (shared by the streaming / launch-artifact recomputes)."""
    best = cur = 0
    for b in bits:
        cur = cur + 1 if b else 0
        best = max(best, cur)
    return best


def brute_max_gap(ts) -> int:
    """Max adjacent difference of an ordered sequence, 0 below two
    elements — the MaxGap oracle."""
    import numpy as np

    ts = np.asarray(ts)
    return int(np.diff(ts).max()) if len(ts) > 1 else 0
