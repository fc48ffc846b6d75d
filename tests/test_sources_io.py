"""Source/sink format coverage: the same windowed aggregate must produce
identical results whether the events table arrives as parquet, CSV or
JSON-lines (the reference's data_benchmark consumes CSV event datasets,
cpp/src/data_benchmark.cc:102-140)."""

import os

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sliding_window_aggregators_spark.sources import read_table, write_table

SF_DIR = os.environ.get("SWAG_TEST_SF_DIR", "/root/testdata/sf0.001")
EVENTS_SCHEMA = (
    "event_id bigint, user_id bigint, ts timestamp_ntz, event_type string, "
    "value double"
)


def _agg(df):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-9, 0)
    return (
        df.select(
            "user_id",
            "event_id",
            F.sum(F.round(F.col("value") * 100).cast("long")).over(w).alias("s"),
        )
        .orderBy("user_id", "event_id")
        .collect()
    )


def test_same_results_across_parquet_csv_json(spark, tmp_path):
    pq = read_table(spark, f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    csv_path = str(tmp_path / "events.csv")
    json_path = str(tmp_path / "events.json")
    write_table(pq, csv_path, fmt="csv", timestampNTZFormat="yyyy-MM-dd HH:mm:ss.SSSSSS")
    write_table(pq, json_path, fmt="json", timestampNTZFormat="yyyy-MM-dd HH:mm:ss.SSSSSS")

    base = _agg(pq)
    got_csv = _agg(
        read_table(
            spark,
            csv_path,
            fmt="csv",
            schema=EVENTS_SCHEMA,
            timestampNTZFormat="yyyy-MM-dd HH:mm:ss.SSSSSS",
        )
    )
    got_json = _agg(
        read_table(
            spark,
            json_path,
            fmt="json",
            schema=EVENTS_SCHEMA,
            timestampNTZFormat="yyyy-MM-dd HH:mm:ss.SSSSSS",
        )
    )
    assert got_csv == base
    assert got_json == base


def test_partitioned_parquet_roundtrip_prunes(spark, tmp_path):
    df = read_table(spark, f"{SF_DIR}/events.parquet")
    out = str(tmp_path / "by_type")
    write_table(df, out, fmt="parquet", partition_by=["event_type"])
    back = read_table(spark, out, fmt="parquet")
    sub = back.where(F.col("event_type") == "purchase")
    # partition pruning visible in the scan
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert sub.count() == df.where(F.col("event_type") == "purchase").count()


def test_bucketed_layout_scan_kernel_zero_shuffle(spark, tmp_path):
    """write_bucketed + sliding_rows_kernel_scan: identical results to the
    shuffling kernel route, with NO exchange in the physical plan."""
    from sliding_window_aggregators_spark.operators.batch import (
        sliding_rows_kernel_partitioned,
        sliding_rows_kernel_scan,
    )
    from sliding_window_aggregators_spark.sources import write_bucketed
    from sliding_window_aggregators_spark.operators.batch import with_cents

    df = with_cents(read_table(spark, f"{SF_DIR}/events.parquet"))
    out = str(tmp_path / "events_bucketed")
    write_bucketed(df, out, "user_id", ["ts", "event_id"], buckets=8)

    prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    prev_open = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1g")
    spark.conf.set("spark.sql.files.openCostInBytes", "1g")
    try:
        laid = read_table(spark, out)
        scan = sliding_rows_kernel_scan(
            laid, "user_id", ["ts", "event_id"], "cents", "sum", 10,
            out="s", id_cols=["user_id", "event_id"], int_values=True,
        )
        plan = scan._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        got = {
            (r["user_id"], r["event_id"]): r["s"] for r in scan.collect()
        }
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", prev_open)

    exp_df = sliding_rows_kernel_partitioned(
        df, "user_id", ["ts", "event_id"], "cents", "sum", 10,
        out="s", id_cols=["user_id", "event_id"], int_values=True,
    )
    exp = {(r["user_id"], r["event_id"]): r["s"] for r in exp_df.collect()}
    assert got == exp


def test_same_results_across_orc(spark, tmp_path):
    """ORC — Spark's other native columnar format — must agree with
    parquet, and its scan must get the same pushdown treatment."""
    pq = read_table(spark, f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    orc_path = str(tmp_path / "events.orc")
    write_table(pq, orc_path, fmt="orc")
    orc = read_table(spark, orc_path)  # format inferred from extension
    assert _agg(orc) == _agg(pq)
    plan = (
        orc.where(F.col("user_id") == 7)
        .select("event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]" in plan, plan


def test_compact_table_reduces_files_preserving_rows(spark, tmp_path):
    from sliding_window_aggregators_spark.sources.io import compact_table

    path = str(tmp_path / "frag")
    src = read_table(spark, f"{SF_DIR}/events.parquet")
    src.repartition(40).write.parquet(path)  # fragment: 40 small files
    before_rows = spark.read.parquet(path).count()
    files_before, files_after = compact_table(spark, path, target_rows_per_file=10**6)
    assert files_before >= 40
    assert files_after == 1
    after = spark.read.parquet(path)
    assert after.count() == before_rows
    assert after.agg(F.sum("event_id")).collect() == src.agg(F.sum("event_id")).collect()


def test_bucketed_layout_time_kernel_scan_zero_shuffle(spark, tmp_path):
    """write_bucketed + sliding_time_kernel_scan (the TIME-window sibling):
    multi-duration event-time folds off the bucketed scan — identical
    results to the shuffling TimeSegmentedKernel route, NO exchange."""
    from sliding_window_aggregators_spark.operators.batch import (
        sliding_time_kernel_partitioned,
        sliding_time_kernel_scan,
        with_cents,
    )
    from sliding_window_aggregators_spark.sources import write_bucketed

    durs = {"s10m": 600_000_000, "s1h": 3_600_000_000}
    df = with_cents(read_table(spark, f"{SF_DIR}/events.parquet"))
    out = str(tmp_path / "events_bucketed_t")
    write_bucketed(df, out, "user_id", ["ts", "event_id"], buckets=8)

    prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    prev_open = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1g")
    spark.conf.set("spark.sql.files.openCostInBytes", "1g")
    try:
        laid = read_table(spark, out)
        scan = sliding_time_kernel_scan(
            laid, "user_id", "ts", "cents", "sum", durs,
            id_cols=["user_id", "event_id"], int_values=True,
            out_cast="bigint",
        )
        plan = scan._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        got = {
            (r["user_id"], r["event_id"]): (r["s10m"], r["s1h"])
            for r in scan.collect()
        }
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", prev_open)

    exp_df = sliding_time_kernel_partitioned(
        df, "user_id", "ts", "cents", "sum", durs,
        id_cols=["user_id", "event_id"], tiebreak=["event_id"],
        int_values=True, out_cast="bigint",
    )
    exp = {
        (r["user_id"], r["event_id"]): (r["s10m"], r["s1h"])
        for r in exp_df.collect()
    }
    assert got == exp
