"""Physical-plan quality gates — the 100 TB design point, asserted.

Every check here encodes a property that must survive a 1000× scale-up:
filters reach the parquet scan, projections prune columns, small dims
broadcast (no fact-side shuffle), top-k is TakeOrderedAndProject (no full
sort), aggregation is partial+final."""

import re

import pytest

import __spark_entry__ as entry

from conftest import SF_SMOKE


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_to_parquet(spark):
    p = plan_of(entry.q08_sql_filter_agg(spark, SF_SMOKE))
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual" in p


def test_column_pruning(spark):
    p = plan_of(entry.q02_customer_transforms(spark, SF_SMOKE))
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m, p
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"c_custkey", "c_name", "c_acctbal", "c_mktsegment"}


def test_view_join_broadcasts_dims(spark):
    p = plan_of(entry.q04_view_region_revenue(spark, SF_SMOKE))
    assert p.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in p


def test_topk_is_take_ordered(spark):
    p = plan_of(entry.q06_topk_orders(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in p


def test_agg_is_partial_final(spark):
    p = plan_of(entry.q01_pricing_summary(spark, SF_SMOKE))
    # two HashAggregate levels (partial map-side + final) around the shuffle
    assert p.count("HashAggregate") >= 2


def test_semi_join_for_foreign_key(spark):
    """validate_foreign_key compiles to a semi-join shape (broadcast on the
    small ref side), not a per-row subquery."""
    p = plan_of(entry.q07_fill_validate(spark, SF_SMOKE))
    assert "Join" in p  # rewritten to a join, any strategy
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def test_fuzzy_pairs_is_equi_join(spark):
    """Candidate generation must be a hash-partitionable equi-join on the
    length bucket — a plain length-band predicate plans as
    BroadcastNestedLoopJoin (O(N²) comparisons, dead at 10^8 rows)."""
    p = plan_of(entry.q42_fuzzy_match(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p
    assert ("SortMergeJoin" in p or "ShuffledHashJoin" in p
            or "BroadcastHashJoin" in p), p


def test_mad_scalable_has_no_python_stage(spark):
    """grouped_mad must stay JVM-side: two percentile aggregations and a
    key-colocated join — no grouped-map Python (whole-group
    materialization) anywhere in the plan."""
    p = plan_of(entry.q47_mad_scalable(spark, SF_SMOKE))
    assert "FlatMapGroupsInPandas" not in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p
    assert p.count("HashAggregate") + p.count("SortAggregate") >= 2


def test_ann_shuffles_only_candidates(spark):
    """Brute-force ANN: the corpus scan feeds mapInPandas; the only
    exchange afterwards carries candidate rows (partitions×queries×k), not
    the corpus."""
    df = entry.q24_ann_bruteforce(spark, SF_SMOKE)
    p = plan_of(df)
    assert "MapInPandas" in p
    # candidate exchange is hash-partitioned by query_id for the window
    assert "hashpartitioning(query_id" in p


def test_exists_subquery_decorrelates_to_semi_join(spark):
    p = plan_of(entry.q41_exists_subquery(spark, SF_SMOKE))
    assert "LeftSemi" in p or "SemiJoin" in p


def test_sequence_packing_no_global_window(spark):
    """The prefix sum must be the bucketed two-phase form — a global
    Window.orderBy funnels the corpus through ONE partition (the
    classic cumsum scale-killer)."""
    p = plan_of(entry.q50_sequence_packing(spark, SF_SMOKE))
    assert "SinglePartition" not in p, p
    assert "Window" in p  # per-bucket windows are fine
