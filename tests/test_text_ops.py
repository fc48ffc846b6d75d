"""Pure-Python oracles for the non-SQL-expressible text ops."""

import numpy as np
import pandas as pd

from sliding_window_aggregators_spark.plans.text_queries import (
    _FP_BASE,
    _FP_MASK,
    rolling_fingerprint,
)


def fingerprint_py(s: str) -> int:
    h = 0
    for b in s.encode("utf-8"):
        h = (h * int(_FP_BASE) + b) % int(_FP_MASK)
    return h


def test_rolling_fingerprint_matches_python_oracle():
    texts = pd.Series(
        ["", "a", "hello world", "the quick brown fox " * 20, None, "δοκιμή utf8"]
    )
    got = rolling_fingerprint(texts).tolist()
    exp = [fingerprint_py(t if t is not None else "") for t in texts.tolist()]
    assert got == exp


def test_rolling_fingerprint_distinguishes_permutations():
    a = rolling_fingerprint(pd.Series(["ab c", "ba c", "c ab"])).tolist()
    assert len(set(a)) == 3
