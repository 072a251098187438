"""Round-9 operator tests: generalized sorted-neighborhood pairing
(linkage.neighborhood_pairs — the linear candidate generator that
replaced q172's within-block self-join) and the round-9 additions.
"""
import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# linkage.neighborhood_pairs (q172 candidate generation)
# ---------------------------------------------------------------------------

class TestNeighborhoodPairs:
    def _df(self, spark):
        return spark.createDataFrame(
            [(1, "alpha", "A", 10.0),
             (2, "beta", "A", 20.0),
             (3, "gamma", "A", 30.0),
             (4, "delta", "B", 40.0),
             (5, "epsilon", "B", 50.0)],
            "id: long, name: string, blk: string, bal: double")

    def test_pairs_linear_and_carried(self, spark):
        from pandas_ai_spark.functions.linkage import neighborhood_pairs

        out = neighborhood_pairs(
            self._df(spark), "id", order_cols=["name"],
            block_cols=["blk"], carry_cols=["name", "bal"],
            window=1).collect()
        got = {(r.a_id, r.b_id): r for r in out}
        # block A name order: alpha(1) < beta(2) < gamma(3)
        # block B name order: delta(4) < epsilon(5)
        assert set(got) == {(1, 2), (2, 3), (4, 5)}
        r = got[(1, 2)]
        assert (r.a_name, r.b_name) == ("alpha", "beta")
        assert (r.a_bal, r.b_bal) == (10.0, 20.0)

    def test_window_width_and_block_isolation(self, spark):
        from pandas_ai_spark.functions.linkage import neighborhood_pairs

        out = neighborhood_pairs(
            self._df(spark), "id", order_cols=["name"],
            block_cols=["blk"], window=2).collect()
        pairs = {(r.a_id, r.b_id) for r in out}
        # window=2 adds (1,3) inside block A; never crosses blocks
        assert pairs == {(1, 2), (1, 3), (2, 3), (4, 5)}
        # pair count bounded by rows x window, each pair emitted once
        assert len(out) == len(pairs)

    def test_linear_pair_count_bound(self, spark):
        from pandas_ai_spark.functions.linkage import neighborhood_pairs

        n, w = 60, 4
        df = spark.range(n).select(
            F.col("id"),
            F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"),
                                        4, "0")).alias("k"),
            (F.col("id") % 3).alias("blk"))
        cnt = neighborhood_pairs(
            df, "id", order_cols=["k"], block_cols=["blk"],
            window=w).count()
        # rows x window minus the tail rows with fewer neighbors:
        # each of the 3 blocks of 20 rows loses 1+2+3+4 = w(w+1)/2
        assert cnt == n * w - 3 * (w * (w + 1) // 2)
        # strictly below the quadratic block self-join count
        assert cnt < 3 * (20 * 19 // 2)

    def test_validation(self, spark):
        from pandas_ai_spark.functions.linkage import neighborhood_pairs

        df = self._df(spark)
        with pytest.raises(ValueError):
            neighborhood_pairs(df, "id", ["name"], ["blk"], window=0)
        with pytest.raises(ValueError):
            neighborhood_pairs(df, "id", ["name"], [], window=1)

    def test_no_global_single_partition_window(self, spark):
        from pandas_ai_spark.functions.linkage import neighborhood_pairs

        plan = neighborhood_pairs(
            self._df(spark), "id", order_cols=["name"],
            block_cols=["blk"], window=2)._jdf.queryExecution() \
            .executedPlan().toString()
        # the lead window must be hash-partitioned on the block key
        assert "hashpartitioning(blk" in plan

# ---------------------------------------------------------------------------
# r8-advice fixes: NULL-category LOO encoding, generic mmr id types,
# connected-components definitive convergence probe
# ---------------------------------------------------------------------------

class TestAdviceFixes:
    def test_loo_encodes_null_category_group(self, spark):
        from pandas_ai_spark.functions.classify import loo_target_encode

        df = spark.createDataFrame(
            [(None, 1), (None, 0), (None, 1), ("a", 1), ("b", 0)],
            "cat: string, y: int")
        got = {(r.cat, r.y): r.encoded for r in
               loo_target_encode(df, "cat", "y = 1").collect()}
        # NULL category has n=3, sum_y=2: LOO = (2 - y) / 2
        assert got[(None, 1)] == pytest.approx(0.5)
        assert got[(None, 0)] == pytest.approx(1.0)
        # singletons still NULL (nothing to average)
        assert got[("a", 1)] is None and got[("b", 0)] is None

    def test_mmr_rerank_string_ids(self, spark):
        from pandas_ai_spark.functions.similarity import mmr_rerank

        rows = [("q1", "docA", 0.9, [1.0, 0.0]),
                ("q1", "docB", 0.8, [1.0, 0.0]),   # dup of docA
                ("q1", "docC", 0.5, [0.0, 1.0])]
        cand = spark.createDataFrame(
            rows, "query_id: string, vec_id: string, "
                  "cosine: double, embedding: array<double>")
        out = {r.mmr_rank: r for r in mmr_rerank(cand, k=2).collect()}
        assert out[1].vec_id == "docA" and out[1].query_id == "q1"
        # diversity penalty must skip the duplicate and pick docC
        assert out[2].vec_id == "docC"

    def test_mmr_rerank_int32_ids(self, spark):
        from pandas_ai_spark.functions.similarity import mmr_rerank

        cand = spark.createDataFrame(
            [(1, 10, 0.9, [1.0, 0.0]), (1, 11, 0.4, [0.0, 1.0])],
            "query_id: int, vec_id: int, cosine: double, "
            "embedding: array<double>")
        out = mmr_rerank(cand, k=2)
        assert dict(out.dtypes)["vec_id"] == "int"
        assert {r.vec_id for r in out.collect()} == {10, 11}

    def test_cc_converges_with_definitive_probe(self, spark):
        from pandas_ai_spark.functions.graph import connected_components

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11)], "src: long, dst: long")
        stats = {}
        got = {r.node: r.component for r in
               connected_components(edges, stats=stats).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
        assert stats["rounds"] >= 1
