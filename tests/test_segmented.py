"""SegmentedSlidingKernel: multi-key single-pass sliding windows with
cross-batch carry, against a per-row brute oracle."""

import numpy as np
import pytest

from sliding_window_aggregators_spark.functions import get_monoid
from sliding_window_aggregators_spark.operators import SegmentedSlidingKernel

RNG = np.random.default_rng(42)
N = 4000
KEYS = np.sort(RNG.integers(0, 40, N))
CHUNK = (np.arange(N) // 700).astype(np.int64)
VALS = RNG.integers(1, 50, N).astype(float)
BATCHES = [13, 1, 700, 2200, 0, N]


def brute(m, w, seg_ids):
    out = []
    for i in range(N):
        s = i
        while s > 0 and seg_ids[s - 1] == seg_ids[i] and i - s < w - 1:
            s -= 1
        seg = VALS[s : i + 1]
        if m.name == "argmax":
            out.append(int(np.arange(s, i + 1)[np.argmax(seg)]))
        else:
            out.append(m.lower1(m.lift_reduce(seg)))
    return out


@pytest.mark.parametrize(
    "name", ["sum", "mean", "max", "relvar", "argmax", "mincount", "bloom", "geomean"]
)
@pytest.mark.parametrize("w", [1, 7, 100, 1000])
def test_segmented_multikey_vs_brute(name, w):
    m = get_monoid(name)
    data = VALS.astype(int) if name == "bloom" else VALS
    seg_ids = KEYS * 1000 + CHUNK
    exp = brute(m, w, seg_ids)
    k = SegmentedSlidingKernel(m, w)
    got, i = [], 0
    for sz in BATCHES:
        j = min(N, i + sz)
        p = (
            m.lift((np.arange(i, j), data[i:j]))
            if name == "argmax"
            else m.lift(data[i:j])
        )
        got.extend(m.lower(k.process((KEYS[i:j], CHUNK[i:j]), p)).tolist())
        i = j
    if name == "argmax":
        assert got == exp
    else:
        assert np.allclose(got, exp, rtol=1e-9, equal_nan=True)


def test_segmented_single_key_array_api():
    m = get_monoid("sum")
    k = SegmentedSlidingKernel(m, 5)
    out = m.lower(k.process(np.array([1, 1, 2]), m.lift(np.array([1.0, 2.0, 3.0]))))
    assert out.tolist() == [1.0, 3.0, 3.0]


def test_segmented_empty_batch():
    m = get_monoid("sum")
    k = SegmentedSlidingKernel(m, 5)
    from sliding_window_aggregators_spark.functions import p_len

    assert p_len(k.process(np.array([], dtype=np.int64), m.lift(np.array([])))) == 0
