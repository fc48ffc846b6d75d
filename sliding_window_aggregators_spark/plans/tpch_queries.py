"""Relational analytics over the TPC-H-shaped tables — the engine's
multi-table surface: pushdown scan-aggregation, windowed per-key running
analytics on a second fact table, and a broadcast-join star query over
the dimension chain. (The SWAG/windowed core lives in events_queries;
these queries prove the same engine drives ordinary warehouse shapes.)

Determinism discipline (same as events_queries): money flows through
exact integer cents — ``round(x·100)`` — and discount/tax through exact
integer percent, so every sum is an int64 both engines agree on; each
double output is one final division or a rounded constant expression.

Scale notes per query; none contains a cross join, a collect, or a
Python UDF — everything is Catalyst + whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

_Q1_CUTOFF = "1998-09-01 00:00:00"


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Q1-shape pricing summary: filtered scan → 4-way aggregate
# ---------------------------------------------------------------------------


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: lineitem rows shipped before the cutoff, grouped by
    (returnflag, linestatus) — sums of quantity / base price / discounted
    price / charge, averages, row count. All sums are exact int64 (cents ×
    integer percent), so the doubles are bit-identical across engines.

    Scale shape: the filter and the 4-column projection reach the parquet
    scan (predicate pushdown + column pruning); one partial-aggregated
    shuffle on a 6-value grouping key. This is the plan shape that eats
    100 TB for breakfast — no joins, map-side combine does ~all the work."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("l_quantity").cast("long").alias("qty"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
            F.round(F.col("l_discount") * 100).cast("long").alias("disc_p"),
            F.round(F.col("l_tax") * 100).cast("long").alias("tax_p"),
        )
    )
    disc_c = F.col("price_c") * (100 - F.col("disc_p"))  # cents × percent
    charge_c = disc_c * (100 + F.col("tax_p"))  # cents × percent²
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty").alias("sum_qty"),
            F.sum("price_c").alias("sum_base_price_c"),
            F.sum(disc_c).alias("sum_disc_price_cp"),
            F.sum(charge_c).alias("sum_charge_cpp"),
            F.count(F.lit(1)).alias("count_order"),
            (F.sum("qty").cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum("price_c").cast("double") / F.count(F.lit(1))).alias("avg_price_c"),
        )
    )


ORACLE_PRICING_SUMMARY = f"""
with li as (
  select l_returnflag, l_linestatus,
         cast(l_quantity as bigint) as qty,
         cast(round(l_extendedprice * 100) as bigint) as price_c,
         cast(round(l_discount * 100) as bigint) as disc_p,
         cast(round(l_tax * 100) as bigint) as tax_p
  from lineitem
  where l_shipdate <= timestamp '{_Q1_CUTOFF}'
)
select l_returnflag, l_linestatus,
       cast(sum(qty) as bigint) as sum_qty,
       cast(sum(price_c) as bigint) as sum_base_price_c,
       cast(sum(price_c * (100 - disc_p)) as bigint) as sum_disc_price_cp,
       cast(sum(price_c * (100 - disc_p) * (100 + tax_p)) as bigint) as sum_charge_cpp,
       count(*) as count_order,
       cast(sum(qty) as double) / count(*) as avg_qty,
       cast(sum(price_c) as double) / count(*) as avg_price_c
from li group by l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# windowed analytics on orders: per-customer running totals
# ---------------------------------------------------------------------------


def q_customer_running_total(spark, sf_dir):
    """Per-customer order timeline: running total of order value and the
    order's sequence number — the SWAG ROWS-frame discipline applied to a
    warehouse fact table (unbounded-preceding frame = the monotone case of
    the sliding window; per the reference's recalc-vs-incremental framing
    this is the prefix-scan degenerate w=∞).

    Scale shape: one shuffle on o_custkey; the frame is computed by
    Spark's native running-window codegen (no kernel needed — the engine
    picks SQL-path vs kernel-path per monoid/window shape)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = _t(spark, sf_dir, "orders").withColumn(
        "total_c", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("order_seq"),
        F.sum("total_c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "running_total_c"
        ),
    )


ORACLE_CUSTOMER_RUNNING_TOTAL = """
select o_custkey, o_orderkey,
       row_number() over w as order_seq,
       cast(sum(cast(round(o_totalprice * 100) as bigint)) over w as bigint) as running_total_c
from orders
window w as (partition by o_custkey order by o_orderdate, o_orderkey
             rows between unbounded preceding and current row)
"""


# ---------------------------------------------------------------------------
# broadcast star join: revenue by region
# ---------------------------------------------------------------------------


def q_region_revenue(spark, sf_dir):
    """Revenue by region through the supplier→nation→region dimension
    chain (TPC-H Q5 shape without the customer leg): the fact table joins
    three explicitly BROADCAST dimensions, then one aggregation.

    Scale shape: supplier/nation/region are orders of magnitude smaller
    than lineitem at every SF (100 : 25 : 5 rows per 60k facts here; the
    ratio only improves at 100 TB) — broadcasting them means the fact
    table is scanned once with zero fact-side shuffles before the final
    6-row aggregate. A plan-shape test pins BroadcastHashJoin and the
    absence of SortMergeJoin."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (100 - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("rev_cp"),
    )
    sup = F.broadcast(_t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    nat = F.broadcast(_t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name"))
    reg = F.broadcast(_t(spark, sf_dir, "region").select("r_regionkey", "r_name"))
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum("rev_cp").alias("revenue_cp"),
            F.count(F.lit(1)).alias("n_lineitems"),
            F.countDistinct("n_name").alias("n_nations"),
        )
    )


ORACLE_REGION_REVENUE = """
select r_name,
       cast(sum(cast(round(l_extendedprice * 100) as bigint)
                * (100 - cast(round(l_discount * 100) as bigint))) as bigint) as revenue_cp,
       count(*) as n_lineitems,
       count(distinct n_name) as n_nations
from lineitem
join supplier on l_suppkey = s_suppkey
join nation on s_nationkey = n_nationkey
join region on n_regionkey = r_regionkey
group by r_name
"""


def q_weekly_retention(spark, sf_dir):
    """Cohort retention over the events stream: users grouped by their
    first-activity week (the cohort), counted distinct in every later
    activity week, with the retention share as exact ppm. The classic
    product-analytics matrix — two aggregations and one join, no
    self-join over events.

    Scale shape: first-activity is one groupBy(user) min — map-side
    combinable; activity pairs come from a distinct on (user, week) (the
    heavy shuffle, also map-side combined); cohort sizes broadcast-join
    onto the tiny (cohort, week) matrix."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    wk = F.date_trunc("week", F.col("ts"))
    first = (
        ev.groupBy("user_id")
        .agg(F.min(wk.alias("w")).alias("cohort_week"))
    )
    active = ev.select("user_id", wk.alias("week")).distinct()
    pairs = active.join(first, "user_id")
    cohort_sizes = first.groupBy("cohort_week").agg(
        F.countDistinct("user_id").alias("cohort_n")
    )
    grid = pairs.groupBy("cohort_week", "week").agg(
        F.countDistinct("user_id").alias("active_n")
    )
    return (
        grid.join(F.broadcast(cohort_sizes), "cohort_week")
        .select(
            "cohort_week",
            "week",
            "active_n",
            "cohort_n",
            F.expr("(active_n * cast(1000000 as bigint)) div cohort_n").alias(
                "retention_ppm"
            ),
        )
    )


ORACLE_WEEKLY_RETENTION = """
with first as (
  select user_id, min(date_trunc('week', ts)) as cohort_week
  from events group by user_id
),
active as (
  select distinct user_id, date_trunc('week', ts) as week from events
),
sizes as (
  select cohort_week, count(distinct user_id) as cohort_n
  from first group by cohort_week
),
grid as (
  select f.cohort_week, a.week, count(distinct a.user_id) as active_n
  from active a join first f using (user_id)
  group by 1, 2
)
select g.cohort_week, g.week, g.active_n, s.cohort_n,
       (g.active_n * 1000000::BIGINT) // s.cohort_n as retention_ppm
from grid g join sizes s using (cohort_week)
"""


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "weekly_retention": q_weekly_retention,
    "customer_running_total": q_customer_running_total,
    "region_revenue": q_region_revenue,
}

ORACLES = {
    "pricing_summary": ORACLE_PRICING_SUMMARY,
    "weekly_retention": ORACLE_WEEKLY_RETENTION,
    "customer_running_total": ORACLE_CUSTOMER_RUNNING_TOTAL,
    "region_revenue": ORACLE_REGION_REVENUE,
}
