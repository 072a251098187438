"""Round-7 fixes: distributed ungrouped gini rank, rank_features NULL
ECDF, collision-safe robust_zscore / iqr_outliers joins, persisted
double-action aggregations, stalest-first queries() rotation order.
"""

import re

import pytest

from pyspark.sql import functions as F


# the plan_audit.py empty-partition-window signature
_GLOBAL_WINDOW = re.compile(r"Window \[[^\n]*\], \[\], \[")


# ---------------------------------------------------------------------------
# gini_coefficient ungrouped: distributed rank (VERDICT r6 item 2)
# ---------------------------------------------------------------------------

class TestGiniDistributedRank:
    def test_ungrouped_matches_closed_form(self, spark):
        from pandas_ai_spark.functions.stats import gini_coefficient

        # values 1..n shuffled across partitions: closed-form
        # G = (n-1)/(3n) for the uniform 1..n sequence
        n = 1000
        df = (spark.range(1, n + 1).repartition(8)
              .select((F.col("id").cast("double")).alias("v")))
        g = gini_coefficient(df, "v").collect()[0]
        assert g.n == n
        assert abs(g.gini - (n - 1) / (3 * n)) < 1e-9

    def test_ungrouped_plan_has_no_global_window(self, spark):
        from pandas_ai_spark.functions.stats import _global_rank

        base = (spark.range(100).repartition(4)
                .select(F.col("id").cast("double").alias("__x")))
        ranked = _global_rank(base, [F.col("__x")])
        plan = ranked._jdf.queryExecution().executedPlan().toString()
        assert not _GLOBAL_WINDOW.search(plan)
        # and the rank itself is a correct global row_number
        rows = sorted((r["__x"], r["__i"]) for r in ranked.collect())
        assert [i for _, i in rows] == list(range(1, 101))

    def test_ungrouped_ties_and_tiebreak(self, spark):
        from pandas_ai_spark.functions.stats import gini_coefficient

        # ties straddling would-be bucket edges: equal values always
        # share a bucket, so the rank stays a permutation of 1..n
        df = spark.createDataFrame(
            [(float(v), i) for i, v in
             enumerate([5.0] * 40 + [1.0] * 30 + [9.0] * 30)],
            "v double, id int").repartition(8)
        g = gini_coefficient(df, "v", tiebreak="id").collect()[0]
        exact = gini_coefficient(df.coalesce(1), "v").collect()[0]
        assert g.n == 100 and abs(g.gini - exact.gini) < 1e-12


# ---------------------------------------------------------------------------
# rank_features: NULLs take no rank (ADVICE r6, medium)
# ---------------------------------------------------------------------------

class TestRankFeaturesNulls:
    def test_nulls_do_not_occupy_ranks(self, spark):
        from pandas_ai_spark.functions.stats import rank_features

        rows = [("g", None), ("g", None), ("g", 10.0), ("g", 20.0),
                ("g", 30.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = rank_features(df, "g", "v").collect()
        by_v = {r.v: r for r in out}
        # ECDF over OBSERVED values: min non-null is exactly 0 even
        # with NULLs present (the old full-group window gave it 2/4)
        assert by_v[10.0].pct_rank == 0.0
        assert abs(by_v[20.0].pct_rank - 0.5) < 1e-12
        assert by_v[30.0].pct_rank == 1.0
        # NULL rows pass through with NULL features
        nulls = [r for r in out if r.v is None]
        assert len(nulls) == 2
        assert all(r.pct_rank is None and r.zscore is None for r in nulls)

    def test_zscore_unaffected_by_nulls(self, spark):
        from pandas_ai_spark.functions.stats import rank_features

        with_nulls = spark.createDataFrame(
            [("g", None), ("g", 10.0), ("g", 20.0), ("g", 30.0)],
            "g string, v double")
        without = with_nulls.where(F.col("v").isNotNull())
        a = {r.v: r.zscore for r in
             rank_features(with_nulls, "g", "v").collect()
             if r.v is not None}
        b = {r.v: r.zscore for r in
             rank_features(without, "g", "v").collect()}
        assert a == b


# ---------------------------------------------------------------------------
# robust_zscore / iqr_outliers: caller columns named like internals
# (ADVICE r6)
# ---------------------------------------------------------------------------

class TestBoundsJoinCollisions:
    def test_robust_zscore_with_colliding_columns(self, spark):
        from pandas_ai_spark.functions.stats import robust_zscore

        df = spark.createDataFrame(
            [("g", 1.0, 99, -1.0, -2.0), ("g", 2.0, 99, -1.0, -2.0),
             ("g", 3.0, 99, -1.0, -2.0)],
            "g string, v double, n long, median double, mad double")
        out = robust_zscore(df, "g", "v").collect()
        assert len(out) == 3
        by_v = {r.v: r for r in out}
        # caller's n survives; median/mad are the computed bounds
        # (documented append/replace semantics, never join ambiguity)
        assert by_v[2.0].n == 99
        assert by_v[2.0].median == 2.0 and by_v[2.0].mad == 1.0
        assert abs(by_v[2.0].robust_z) < 1e-12

    def test_iqr_outliers_with_colliding_columns(self, spark):
        from pandas_ai_spark.functions.stats import iqr_outliers

        df = spark.createDataFrame(
            [("g", float(v), -1.0, -2.0, 0) for v in range(1, 11)],
            "g string, v double, q1 double, q3 double, n long")
        r = iqr_outliers(df, "g", "v").collect()[0]
        assert r.n == 10 and r.q1 > 0 and r.q3 > r.q1


# ---------------------------------------------------------------------------
# persisted double-action aggregations (ADVICE r6)
# ---------------------------------------------------------------------------

class TestPersistedDoubleActions:
    def test_key_skew_report_registers_one_persist(self, spark):
        from pandas_ai_spark.functions.cache import (
            cache_scope, release_operator_caches)
        from pandas_ai_spark.functions.skew import key_skew_report

        release_operator_caches()
        df = spark.createDataFrame(
            [(k,) for k in ["a"] * 50 + ["b"] * 10 + ["c"] * 1],
            "k string")
        with cache_scope() as bucket:
            r = key_skew_report(df, "k").collect()[0]
            assert len(bucket) == 1  # the counts table, pinned once
        assert r.n_rows == 61 and r.n_keys == 3
        assert abs(r.max_share - 50 / 61) < 1e-12

    def test_benford_registers_one_persist(self, spark):
        from pandas_ai_spark.functions.cache import cache_scope
        from pandas_ai_spark.functions.stats import benford_test

        df = spark.createDataFrame(
            [(float(v),) for v in (1, 12, 19, 23, 345, 9.5)], "v double")
        with cache_scope() as bucket:
            rows = benford_test(df, "v").collect()
            assert len(bucket) == 1
        assert sum(r.n for r in rows) == 6


# ---------------------------------------------------------------------------
# queries() iterates stalest-first (VERDICT r6 item 1)
# ---------------------------------------------------------------------------

class TestQueriesRotationOrder:
    def test_queries_leads_with_rotation(self):
        import __spark_entry__ as e

        names = list(e.queries().keys())
        assert names[:50] == e.rotation()
        # identical content to the numeric registry
        assert set(names) == set(e.queries_numeric())
        for n in names[:5]:
            assert e.queries()[n] is e.queries_numeric()[n]

    def test_order_is_stalest_first(self):
        import __spark_entry__ as e

        last = e._last_verified_rounds()
        names = list(e.queries().keys())
        stal = [last.get(n, 0) for n in names]
        assert stal == sorted(stal)
