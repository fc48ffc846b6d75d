"""Physical-plan shape assertions — the 100 TB-safety gates.

A query can be value-correct at test scale yet carry a plan that dies at
1000× (nested-loop cross joins, per-group Arrow bridges). These tests pin
the plan shapes the scale analysis relies on:

- the SimHash pair join and the embedding near-dup LSH are EQUI joins
  (pigeonhole banding / multi-table sign-LSH), never
  BroadcastNestedLoopJoin / CartesianProduct;
- the kernel_* driver queries run mapInPandas over partition-sorted data
  (SegmentedSlidingKernel), not one-Arrow-batch-per-group
  FlatMapGroupsInPandas.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SWAG_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    [
        "dedup_simhash_pairs",
        "embed_neardup_lsh",
        "tfidf_top_terms",
        "repetition_ratio",
        "hll_users_by_type",
    ],
)
def test_no_nested_loop_join(spark, name):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()[name](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


@pytest.mark.parametrize(
    "name",
    [
        "kernel_sum_w100",
        "kernel_bloom_w100",
        "kernel_sum_w16384",
        "csv_time_range_sum_1h",
        "shared_windows_3x",
    ],
)
def test_kernel_queries_use_partitioned_scan_path(spark, name):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()[name](spark, SF_DIR))
    assert "FlatMapGroupsInPandas" not in plan, plan
    assert "MapInPandas" in plan, plan


def test_auto_dispatcher_routes_are_plan_distinct(spark):
    """The public dispatcher pair: auto resolves sum to the native SQL
    Window route (Window frame, zero Python); path="kernel" pins the
    partition-sorted MapInPandas route. Both share one oracle in the
    driver registry — same values, different physical plans (the merged
    auto_sum_w100 driver slot equi-joins the two routes; here each route
    is pinned in isolation)."""
    from sliding_window_aggregators_spark.plans.events_queries import (
        q_auto_sum_kernel,
        q_auto_sum_sql,
    )

    sql_plan = _plan(q_auto_sum_sql(spark, SF_DIR))
    assert "Window" in sql_plan, sql_plan
    assert "MapInPandas" not in sql_plan, sql_plan
    assert "FlatMapGroupsInPandas" not in sql_plan, sql_plan

    k_plan = _plan(q_auto_sum_kernel(spark, SF_DIR))
    assert "MapInPandas" in k_plan, k_plan
    assert "FlatMapGroupsInPandas" not in k_plan, k_plan


@pytest.mark.parametrize("name", ["kernel_stats_w100", "kernel_sketch_w100"])
def test_fused_multi_monoid_queries_are_single_pass(spark, name):
    """The fused multi-monoid queries must be ONE shuffle + ONE Python
    stage — no per-monoid passes joined back together."""
    import __spark_entry__ as entry

    plan = _plan(entry.queries()[name](spark, SF_DIR))
    assert plan.count("MapInPandas") == 1, plan
    assert plan.count("Exchange") == 1, plan
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert j not in plan, plan


def test_bucketed_scan_query_has_no_exchange(spark):
    """bucketed_sum_w100 feeds the kernel straight off the bucketed,
    pre-sorted scan: any Exchange or Sort in its plan means the layout
    contract was not exploited."""
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["bucketed_sum_w100"](spark, SF_DIR))
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan, plan


def test_pii_scan_is_shuffle_free(spark):
    """pii_scan is a pure per-row projection — any Exchange in its plan
    would be a scale regression."""
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["pii_scan"](spark, SF_DIR))
    assert "Exchange" not in plan, plan
    # "*(1)" = whole-stage-codegen'd single stage; the scan must be pruned
    # to exactly the two columns the projection needs
    assert "*(1) Project" in plan, plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan, plan


def test_region_revenue_broadcasts_dimensions(spark):
    """The star query must broadcast the dimension chain: three
    BroadcastHashJoins, no SortMergeJoin, no shuffle of the fact side
    before the aggregate."""
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["region_revenue"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") == 3, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_pricing_summary_pushes_filter_and_prunes_columns(spark):
    """Q1 shape: the shipdate filter must reach the parquet scan and the
    scan must read only the 6 needed columns (of 11)."""
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["pricing_summary"](spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan
    assert "l_orderkey" not in plan.split("ReadSchema")[1], plan
