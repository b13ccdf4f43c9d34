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


def test_substring_spans_is_one_agg_no_join(spark, sf):
    """Lee-et-al span census: explode + ONE hash-keyed aggregation —
    any join or extra exchange here would multiply at 100 TB."""
    from jobx_spark.queries import dedup as D

    plan = P.plan_str(D.dedup_substring_spans(spark, sf))
    scan = P.scan_for(plan, "documents")
    assert scan is not None
    assert sorted(scan.read_columns) == ["doc_id", "text"], scan
    for join_node in ("SortMergeJoin", "BroadcastHashJoin",
                      "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert not P.has_node(plan, join_node), P.node_names(plan)
    # agg exchange (+expand for count_distinct) + final sort, nothing
    # else; the gram_rows small-input spread (round-robin, fires only
    # when the scan has fewer splits than cores — never at production
    # scale) is excluded from the key-shuffle bound.
    assert P.count_data_shuffles(plan) <= 3, P.node_names(plan)


def test_quality_rules_is_pure_scan_shape(spark, sf):
    from jobx_spark.queries import pipeline as PL

    plan = P.plan_str(PL.pipe_quality_rules(spark, sf))
    scan = P.scan_for(plan, "documents")
    assert scan is not None
    assert sorted(scan.read_columns) == ["doc_id", "text"], scan
    # only the final orderBy exchanges
    assert P.count_shuffles(plan) <= 1, P.node_names(plan)


def test_mix_temperature_single_count_shuffle(spark, sf):
    from jobx_spark.queries import pipeline as PL

    plan = P.plan_str(PL.pipe_mix_temperature(spark, sf))
    scan = P.scan_for(plan, "documents")
    assert scan is not None
    assert scan.read_columns == ["source"], scan  # count needs only the key
    # the corpus scans ONCE: the denominator is a window over the
    # 20-row source table, not a second .agg() consumer
    assert plan.count("documents.parquet") == 1, plan[:900]
    # per-source count agg + the 20-row window exchange + final sort
    assert P.count_shuffles(plan) <= 3, P.node_names(plan)


def test_bm25_filters_before_shuffle_and_broadcasts_stats(spark, sf):
    from jobx_spark.queries import text as T

    plan = P.plan_str(T.text_bm25_topk(spark, sf))
    # df/query-terms/scalars all broadcast — the fact stream shuffles
    # only on (doc, term) after the scan-side vocabulary prefilter
    assert P.count_nodes(plan, "BroadcastExchange") >= 3, P.node_names(plan)
    assert not P.has_node(plan, "CartesianProduct"), P.node_names(plan)
    # the final plan reads the materialized doclen/tf intermediates;
    # documents itself was scanned during their (one-time) build
    assert plan.count("documents.parquet") <= 1, plan[:900]
    assert "bm25-doclen" in plan and "bm25-tf" in plan, plan[:900]
