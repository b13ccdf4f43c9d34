"""Plan-quality gates: the properties that keep queries viable at
100 TB are asserted here as CI invariants, not eyeballed.

Each test pins one physical-plan property:
  * predicate pushdown reaches the parquet scan;
  * column pruning shrinks the read schema to what the query touches;
  * small dimensions broadcast (no shuffle for the join);
  * global top-k plans as TakeOrderedAndProject (never a full sort);
  * aggregations are partial+final (map-side combine before the
    exchange) and stay inside whole-stage codegen.
"""

import pytest

from jobx_spark import plans as P
from jobx_spark.queries import dedup, relational, temporal


@pytest.fixture(scope="module")
def sf(sf_dir):
    return sf_dir


def test_filter_and_projection_push_into_scan(spark, sf):
    plan = P.plan_str(relational.q02_filter_project(spark, sf))
    scan = P.scan_for(plan, "lineitem")
    assert scan is not None
    assert any("GreaterThan(l_quantity" in f for f in scan.pushed_filters), scan
    assert any("LessThan(l_discount" in f for f in scan.pushed_filters), scan
    # 3 projected columns + l_discount (filter-only); the other 7 pruned.
    assert sorted(scan.read_columns) == [
        "l_discount", "l_linenumber", "l_orderkey", "l_quantity",
    ], scan


def test_q01_scan_prunes_to_touched_columns(spark, sf):
    plan = P.plan_str(relational.q01_pricing_summary(spark, sf))
    scan = P.scan_for(plan, "lineitem")
    assert scan is not None
    assert "l_partkey" not in scan.read_columns
    assert "l_suppkey" not in scan.read_columns
    assert any("l_shipdate" in f for f in scan.pushed_filters), scan


def test_q01_partial_final_aggregation_and_codegen(spark, sf):
    df = relational.q01_pricing_summary(spark, sf)
    plan = P.plan_str(df)
    # partial (before Exchange) + final (after) HashAggregate
    assert P.count_nodes(plan, "HashAggregate") >= 2, P.node_names(plan)
    # the agg exchange + the orderBy range exchange, nothing else
    assert P.count_shuffles(plan) <= 2, P.node_names(plan)
    # codegen annotations only appear once AQE finalizes — execute first
    df.collect()
    final = P.plan_str(df)
    assert "isFinalPlan=true" in final
    assert P.codegen_stage_count(final) >= 1, final[:400]


def test_broadcast_join_for_small_dimensions(spark, sf):
    plan = P.plan_str(relational.q04_brand_revenue(spark, sf))
    assert P.has_node(plan, "BroadcastHashJoin"), P.node_names(plan)
    assert not P.has_node(plan, "SortMergeJoin"), P.node_names(plan)
    # join is shuffle-free: only the agg + sort exchanges remain
    assert P.count_shuffles(plan) <= 2, P.node_names(plan)


def test_q03_builds_broadcast_not_cartesian(spark, sf):
    plan = P.plan_str(relational.q03_shipping_priority(spark, sf))
    assert P.has_node(plan, "BroadcastHashJoin"), P.node_names(plan)
    assert not P.has_node(plan, "CartesianProduct"), P.node_names(plan)


def test_global_topk_is_take_ordered_not_full_sort(spark, sf):
    plan = P.plan_str(relational.q13_top_orders(spark, sf))
    assert P.has_node(plan, "TakeOrderedAndProject"), P.node_names(plan)
    # per-partition top-k merged on the driver: zero shuffles
    assert P.count_shuffles(plan) == 0, P.node_names(plan)


def test_band_join_broadcasts_the_band_table(spark, sf):
    plan = P.plan_str(temporal.q21_band_join(spark, sf))
    assert P.has_node(plan, "BroadcastNestedLoopJoin"), P.node_names(plan)


def test_semi_join_plans_as_semi(spark, sf):
    plan = P.plan_str(relational.q05_semi_join(spark, sf))
    assert "LeftSemi" in plan, plan[:500]


def test_exact_dedup_is_single_shuffle_aggregation(spark, sf):
    plan = P.plan_str(dedup.dedup_exact(spark, sf))
    assert P.count_nodes(plan, "HashAggregate") >= 2, P.node_names(plan)
    assert not P.has_node(plan, "SortMergeJoin"), P.node_names(plan)


def test_asof_join_is_one_shuffle_no_explosion(spark, sf):
    plan = P.plan_str(temporal.q20_asof_join(spark, sf))
    # union-and-carry-forward: no join node at all, one shuffle for the
    # user_id window + one for the final orderBy
    for join_node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                      "BroadcastNestedLoopJoin"):
        assert not P.has_node(plan, join_node), P.node_names(plan)
    assert P.count_shuffles(plan) <= 2, P.node_names(plan)
