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


def test_star_rounds_converge_logarithmically_on_path_graph(spark):
    """A 257-node path with ascending ids is the adversarial case for
    min-label propagation (diameter 256 → 256 rounds); the alternating
    large-star/small-star schedule must collapse it to a star on node 0
    in O(log n) rounds (Kiveris et al., SoCC'14)."""
    from pyspark.sql import functions as F

    from sliding_window_aggregators_spark.plans.text_queries import (
        _large_star,
        _small_star,
    )

    n = 257
    e = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "a long, b long")
    rounds = 0
    for _ in range(12):  # ~log2(n) + slack; far below the 256 diameter
        rounds += 1
        # truncate lineage per round (each round references e 4×; an
        # uncut plan grows 4^rounds) — same discipline as the query
        e = _small_star(_large_star(e)).localCheckpoint()
        sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        lab = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("lbl"))
        )
        bad = (
            e.join(lab.select(F.col("u").alias("a"), F.col("lbl").alias("la")), "a")
            .join(lab.select(F.col("u").alias("b"), F.col("lbl").alias("lb")), "b")
            .where(F.col("la") != F.col("lb"))
            .count()
        )
        if bad == 0:
            break
    assert bad == 0, f"not converged after {rounds} rounds"
    labels = {r["u"]: r["lbl"] for r in lab.collect()}
    assert set(labels) == set(range(1, n)) or set(labels) == set(range(n))
    assert all(v == 0 for v in labels.values())
