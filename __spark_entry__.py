"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (sliding-window sum via the SWAG
kernel) on /root/testdata/sf0.001. ``queries()`` / ``oracle_sql()`` —
one entry per implemented operator from SURVEY.md §2, compared against
DuckDB at sf=0.01 by the driver.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sliding_window_aggregators_spark.plans import all_oracles, all_queries  # noqa: E402
from sliding_window_aggregators_spark.sources.session import _ship_package  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sliding-window sum (w=100) over events via the
    SubtractOnEvict kernel — the reference's headline FIFO benchmark shape
    (cpp/src/benchmark_core.h:96-121)."""
    _ship_package(spark)
    return all_queries()["kernel_sum_w100"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = all_queries()

    def wrap(fn):
        def inner(spark, sf_dir):
            _ship_package(spark)
            return fn(spark, sf_dir)

        return inner

    return {k: wrap(fn) for k, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    return all_oracles()
