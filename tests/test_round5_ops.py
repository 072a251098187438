"""Round-5 additive operators: anomaly detection, snapshot diff,
weighted sampling, pair mining, scalable BPE encoding, integrity audit.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE, sorted_rows


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


# ---------------------------------------------------------------------------
# rolling z-score anomalies
# ---------------------------------------------------------------------------

class TestRollingZscore:
    def _run(self, spark, values, **kw):
        from pandas_ai_spark.functions.timeseries import \
            rolling_zscore_anomalies

        rows = [("a", _ts(i), i, float(v)) for i, v in enumerate(values)]
        df = spark.createDataFrame(
            rows, "k string, ts timestamp, rid long, value double")
        return rolling_zscore_anomalies(
            df, "value", "ts", by=("k",), order_tiebreak="rid", **kw)

    def test_flags_spike_after_warmup(self, spark):
        vals = [10.0, 10.1, 9.9, 10.0, 10.2, 9.8, 10.1, 50.0, 10.0]
        out = self._run(spark, vals, window=5, min_periods=3,
                        z_threshold=3.0).collect()
        assert [r.value for r in out] == [50.0]
        assert out[0].zscore > 3.0

    def test_warmup_rows_never_flag(self, spark):
        # huge jump on row 2 — but only 1 prior point, below min_periods
        out = self._run(spark, [1.0, 1000.0, 1.1, 1.0],
                        window=5, min_periods=3).collect()
        assert out == []

    def test_constant_series_no_alerts(self, spark):
        out = self._run(spark, [5.0] * 10 + [5.0],
                        window=5, min_periods=3).collect()
        assert out == []

    def test_spike_excluded_from_own_baseline(self, spark):
        # trailing window is strictly prior rows: the spike itself must
        # not inflate its own stddev and escape the flag
        vals = [10.0] * 6 + [10.5, 40.0]
        out = self._run(spark, vals, window=6, min_periods=3,
                        z_threshold=3.0).collect()
        assert 40.0 in {r.value for r in out}

    def test_per_key_isolation(self, spark):
        from pandas_ai_spark.functions.timeseries import \
            rolling_zscore_anomalies

        rows = (
            [("a", _ts(i), i, 10.0 + (i % 2) * 0.1) for i in range(8)]
            # key b lives at a different level — not anomalous within b
            + [("b", _ts(i), 100 + i, 500.0 + (i % 3)) for i in range(8)]
        )
        df = spark.createDataFrame(
            rows, "k string, ts timestamp, rid long, value double")
        out = rolling_zscore_anomalies(
            df, "value", "ts", by=("k",), order_tiebreak="rid",
            window=5, min_periods=3).collect()
        assert out == []


# ---------------------------------------------------------------------------
# snapshot diff
# ---------------------------------------------------------------------------

class TestSnapshotDiff:
    @pytest.fixture()
    def frames(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None),
             (4, "d", 40.0)],
            "id long, status string, amount double")
        new = spark.createDataFrame(
            [(1, "a", 10.0),        # unchanged
             (2, "B", 20.0),        # changed: status
             (3, "c", None),        # unchanged (NULL == NULL, null-safe)
             (5, "e", 50.0)],       # added; 4 removed
            "id long, status string, amount double")
        return old, new

    def test_classification(self, spark, frames):
        from pandas_ai_spark.functions.diff import snapshot_diff

        old, new = frames
        got = {r.id: (r.change_type, r.changed_cols)
               for r in snapshot_diff(old, new, ["id"]).collect()}
        assert got == {2: ("changed", "status"),
                       4: ("removed", ""),
                       5: ("added", "")}

    def test_include_unchanged_and_summary(self, spark, frames):
        from pandas_ai_spark.functions.diff import (diff_summary,
                                                    snapshot_diff)

        old, new = frames
        d = snapshot_diff(old, new, ["id"], include_unchanged=True)
        assert d.count() == 5
        s = {r.change_type: r.n_keys for r in diff_summary(d).collect()}
        assert s == {"added": 1, "removed": 1, "changed": 1,
                     "unchanged": 2}

    def test_multi_column_change_list_sorted(self, spark):
        from pandas_ai_spark.functions.diff import snapshot_diff

        old = spark.createDataFrame([(1, "x", 1.0)],
                                    "id long, b string, a double")
        new = spark.createDataFrame([(1, "y", 2.0)],
                                    "id long, b string, a double")
        row = snapshot_diff(old, new, ["id"]).collect()[0]
        assert row.changed_cols == "a,b"  # sorted, not input order

    def test_null_to_value_is_change(self, spark):
        from pandas_ai_spark.functions.diff import snapshot_diff

        old = spark.createDataFrame([(1, None)], "id long, v string")
        new = spark.createDataFrame([(1, "x")], "id long, v string")
        assert snapshot_diff(old, new, ["id"]).collect()[0] \
            .change_type == "changed"

    def test_errors(self, spark, frames):
        from pandas_ai_spark.functions.diff import snapshot_diff

        old, new = frames
        with pytest.raises(ValueError, match="at least one key"):
            snapshot_diff(old, new, [])
        with pytest.raises(ValueError, match="missing"):
            snapshot_diff(old, new, ["nope"])
        with pytest.raises(ValueError, match="missing"):
            snapshot_diff(old.drop("amount"), new, ["id"],
                          compare_cols=["amount"])


# ---------------------------------------------------------------------------
# weighted sampling (A-ES)
# ---------------------------------------------------------------------------

class TestWeightedSample:
    def test_deterministic_and_k_rows(self, spark):
        from pandas_ai_spark.functions.pipeline import weighted_sample

        df = spark.createDataFrame(
            [(i, float(1 + i % 7)) for i in range(300)],
            "doc_id long, w double")
        a = sorted(r.doc_id for r in
                   weighted_sample(df, "w", 40, "doc_id").collect())
        b = sorted(r.doc_id for r in
                   weighted_sample(df, "w", 40, "doc_id").collect())
        assert a == b and len(a) == 40

    def test_seed_rekeys_the_draw(self, spark):
        from pandas_ai_spark.functions.pipeline import weighted_sample

        df = spark.createDataFrame(
            [(i, 1.0) for i in range(300)], "doc_id long, w double")
        a = {r.doc_id for r in
             weighted_sample(df, "w", 40, "doc_id", seed="s1").collect()}
        b = {r.doc_id for r in
             weighted_sample(df, "w", 40, "doc_id", seed="s2").collect()}
        assert a != b

    def test_nonpositive_and_null_weights_excluded(self, spark):
        from pandas_ai_spark.functions.pipeline import weighted_sample

        df = spark.createDataFrame(
            [(1, 2.0), (2, 0.0), (3, -1.0), (4, None), (5, 3.0)],
            "doc_id long, w double")
        got = sorted(r.doc_id for r in
                     weighted_sample(df, "w", 10, "doc_id").collect())
        assert got == [1, 5]

    def test_weights_bias_inclusion(self, spark):
        from pandas_ai_spark.functions.pipeline import weighted_sample

        # 500 light docs (w=1) + 500 heavy docs (w=50): the heavy half
        # should dominate any reasonable sample
        df = spark.createDataFrame(
            [(i, 1.0) for i in range(500)]
            + [(1000 + i, 50.0) for i in range(500)],
            "doc_id long, w double")
        got = [r.doc_id for r in
               weighted_sample(df, "w", 100, "doc_id").collect()]
        heavy = sum(1 for i in got if i >= 1000)
        assert heavy > 80

    def test_k_validation(self, spark):
        from pandas_ai_spark.functions.pipeline import weighted_sample

        df = spark.createDataFrame([(1, 1.0)], "doc_id long, w double")
        with pytest.raises(ValueError, match="positive"):
            weighted_sample(df, "w", 0, "doc_id")


# ---------------------------------------------------------------------------
# frequent pairs
# ---------------------------------------------------------------------------

class TestFrequentPairs:
    def test_known_supports_and_lift(self, spark):
        from pandas_ai_spark.functions.mining import frequent_pairs

        baskets = [
            (1, "milk"), (1, "bread"),
            (2, "milk"), (2, "bread"),
            (3, "milk"), (3, "bread"), (3, "eggs"),
            (4, "milk"), (4, "eggs"),
            (5, "beer"),
        ]
        df = spark.createDataFrame(baskets, "b long, i string")
        out = {(r.item_a, r.item_b): r for r in
               frequent_pairs(df, "b", "i", min_support=2).collect()}
        mb = out[("bread", "milk")]
        assert mb.support == 3 and mb.support_a == 3 and mb.support_b == 4
        # lift = 3 * 5 / (3 * 4)
        assert mb.lift == pytest.approx(1.25)
        assert mb.confidence == pytest.approx(1.0)
        em = out[("eggs", "milk")]
        assert em.support == 2
        assert ("beer", "milk") not in out

    def test_duplicate_items_collapse(self, spark):
        from pandas_ai_spark.functions.mining import frequent_pairs

        # quantity noise: the same item twice in a basket counts once
        df = spark.createDataFrame(
            [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y")],
            "b long, i string")
        out = frequent_pairs(df, "b", "i", min_support=2).collect()
        assert len(out) == 1 and out[0].support == 2

    def test_basket_cap_bounds_pairs(self, spark):
        from pandas_ai_spark.functions.mining import frequent_pairs

        # one degenerate basket with 50 items, cap at 5 -> at most
        # C(5,2)=10 pairs survive from it
        df = spark.createDataFrame(
            [(1, f"i{j:02d}") for j in range(50)], "b long, i string")
        out = frequent_pairs(df, "b", "i", min_support=1,
                             max_items_per_basket=5).collect()
        assert len(out) == 10
        kept = {r.item_a for r in out} | {r.item_b for r in out}
        assert kept == {f"i{j:02d}" for j in range(5)}  # deterministic

    def test_min_support_validation(self, spark):
        from pandas_ai_spark.functions.mining import frequent_pairs

        df = spark.createDataFrame([(1, "x")], "b long, i string")
        with pytest.raises(ValueError, match="min_support"):
            frequent_pairs(df, "b", "i", min_support=0)


# ---------------------------------------------------------------------------
# scalable BPE encoding
# ---------------------------------------------------------------------------

class TestEncodeBpeScalable:
    def test_parity_with_per_doc_encoder(self, spark):
        from pandas_ai_spark.functions.bpe import (encode_bpe,
                                                   encode_bpe_scalable,
                                                   train_bpe)

        docs = (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
                .limit(120))
        merges = train_bpe(docs, num_merges=8, min_freq=2)
        assert merges
        a = sorted_rows(encode_bpe(docs, merges))
        b = sorted_rows(encode_bpe_scalable(docs, merges))
        assert a == b

    def test_empty_and_whitespace_docs_count_zero(self, spark):
        from pandas_ai_spark.functions.bpe import encode_bpe_scalable

        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "one word more")],
            "doc_id long, text string")
        got = {r.doc_id: r.n_bpe_tokens for r in
               encode_bpe_scalable(df, []).collect()}
        # no merges: chars + </w> per word
        assert got[1] == 0 and got[2] == 0
        assert got[3] == len("one") + len("word") + len("more") + 3


# ---------------------------------------------------------------------------
# integrity audit
# ---------------------------------------------------------------------------

class TestIntegrityAudit:
    def test_detects_crafted_violations(self, spark):
        from pandas_ai_spark.functions import audit as au

        parent = spark.createDataFrame([(1,), (2,)], "pk long")
        child = spark.createDataFrame(
            [(1, 1), (2, 2), (3, 99), (4, None)], "id long, fk long")
        dups = spark.createDataFrame(
            [(1,), (1,), (1,), (2,)], "k long")
        vals = spark.createDataFrame(
            [(1, 5.0), (2, -1.0), (3, None)], "id long, v double")
        report = {r.check: (r.kind, r.violations)
                  for r in au.integrity_audit([
                      au.foreign_key("fk", child, "fk", parent, "pk"),
                      au.unique("uq", dups, ["k"]),
                      au.not_null("nn", child, "fk"),
                      au.expression("rng", vals, "v >= 0"),
                  ]).collect()}
        # NULL fk is not an orphan (SQL FK semantics); 99 is
        assert report["fk"] == ("foreign_key", 1)
        # three 1s -> two surplus rows
        assert report["uq"] == ("unique", 2)
        assert report["nn"] == ("not_null", 1)
        # -1 fails, NULL fails (NOT coalesce(NULL, false))
        assert report["rng"] == ("expression", 2)

    def test_clean_tables_report_zero(self, spark):
        from pandas_ai_spark.functions import audit as au

        parent = spark.createDataFrame([(1,), (2,)], "pk long")
        child = spark.createDataFrame([(1, 1), (2, 2)], "id long, fk long")
        report = au.integrity_audit([
            au.foreign_key("fk", child, "fk", parent, "pk"),
            au.unique("uq", child, ["id"]),
        ]).collect()
        assert all(r.violations == 0 for r in report)

    def test_validation_errors(self, spark):
        from pandas_ai_spark.functions import audit as au

        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="at least one"):
            au.integrity_audit([])
        with pytest.raises(ValueError, match="unique"):
            au.integrity_audit([au.not_null("x", df, "id"),
                                au.not_null("x", df, "id")])


# ---------------------------------------------------------------------------
# EWMA
# ---------------------------------------------------------------------------

class TestEwma:
    def test_matches_reference_weighting(self, spark):
        from pandas_ai_spark.functions.timeseries import ewma

        vals = [10.0, 20.0, 30.0]
        df = spark.createDataFrame(
            [(1, _ts(i), i, v) for i, v in enumerate(vals)],
            "k long, ts timestamp, rid long, value double")
        out = {r.rid: r.ewma for r in
               ewma(df, "value", "ts", by=("k",), alpha=0.2, window=20,
                    order_tiebreak="rid").collect()}

        def ref(xs, a=0.2):
            ws = [(1 - a) ** (len(xs) - 1 - i) for i in range(len(xs))]
            return sum(w * x for w, x in zip(ws, xs)) / sum(ws)

        for i in range(3):
            assert out[i] == pytest.approx(ref(vals[:i + 1]))

    def test_window_truncation(self, spark):
        from pandas_ai_spark.functions.timeseries import ewma

        # window=2: only the last two observations matter
        df = spark.createDataFrame(
            [(1, _ts(0), 0, 1000.0), (1, _ts(1), 1, 10.0),
             (1, _ts(2), 2, 20.0)],
            "k long, ts timestamp, rid long, value double")
        out = {r.rid: r.ewma for r in
               ewma(df, "value", "ts", by=("k",), alpha=0.5,
                    window=2, order_tiebreak="rid").collect()}
        # weights 0.5, 1 over [10, 20] -> (5+20)/1.5
        assert out[2] == pytest.approx(25.0 / 1.5)

    def test_alpha_one_is_identity(self, spark):
        from pandas_ai_spark.functions.timeseries import ewma

        df = spark.createDataFrame(
            [(1, _ts(i), i, float(i * 7)) for i in range(4)],
            "k long, ts timestamp, rid long, value double")
        out = ewma(df, "value", "ts", by=("k",), alpha=1.0,
                   window=5, order_tiebreak="rid").collect()
        assert all(r.ewma == pytest.approx(r.value) for r in out)

    def test_validation(self, spark):
        from pandas_ai_spark.functions.timeseries import ewma

        df = spark.createDataFrame([(1, _ts(0), 1.0)],
                                   "k long, ts timestamp, value double")
        with pytest.raises(ValueError, match="alpha"):
            ewma(df, "value", "ts", by=("k",), alpha=0.0)
        with pytest.raises(ValueError, match="window"):
            ewma(df, "value", "ts", by=("k",), window=0)


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

def _pagerank_ref(edges, iterations, d=0.85):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        inbound = {v: 0.0 for v in nodes}
        for s, t in edges:
            inbound[t] += r[s] / deg[s]
        r = {v: (1 - d) / n + d * inbound[v] for v in nodes}
    return r


class TestPagerank:
    def test_matches_pure_python_power_iteration(self, spark):
        from pandas_ai_spark.functions.graph import pagerank

        edges = [(1, 2), (2, 1), (2, 3), (3, 1), (4, 3), (1, 3)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.rank for r in
               pagerank(df, iterations=4, damping=0.85).collect()}
        ref = _pagerank_ref(edges, 4)
        assert set(got) == set(ref)
        for v in ref:
            assert got[v] == pytest.approx(ref[v], rel=1e-12)

    def test_rank_mass_conserved_without_dangling(self, spark):
        from pandas_ai_spark.functions.graph import pagerank

        # symmetric graph: no dangling nodes, total mass stays 1
        edges = [(a, b) for a, b in
                 [(1, 2), (2, 3), (3, 4), (4, 1)]]
        edges += [(b, a) for a, b in list(edges)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = pagerank(df, iterations=5).collect()
        assert sum(r.rank for r in got) == pytest.approx(1.0)

    def test_hub_outranks_leaf(self, spark):
        from pandas_ai_spark.functions.graph import pagerank

        # everyone points at node 0
        edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.rank for r in
               pagerank(df, iterations=3).collect()}
        assert got[0] > max(v for k, v in got.items() if k != 0)

    def test_checkpointed_iterations_same_result(self, spark):
        from pandas_ai_spark.functions.graph import pagerank

        edges = [(1, 2), (2, 3), (3, 1)]
        df = spark.createDataFrame(edges, "src long, dst long")
        a = {r.node: r.rank for r in
             pagerank(df, iterations=4, checkpoint_every=2).collect()}
        b = _pagerank_ref(edges, 4)
        for v in b:
            assert a[v] == pytest.approx(b[v], rel=1e-12)

    def test_validation(self, spark):
        from pandas_ai_spark.functions.graph import pagerank

        df = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError, match="iterations"):
            pagerank(df, iterations=0)
        with pytest.raises(ValueError, match="damping"):
            pagerank(df, damping=1.0)

    def test_cooccurrence_edges_symmetric_and_capped(self, spark):
        from pandas_ai_spark.functions.graph import cooccurrence_edges

        df = spark.createDataFrame(
            [(1, "a"), (1, "b"), (1, "b"), (2, "a"), (2, "c")],
            "b long, i string")
        got = {(r.src, r.dst) for r in
               cooccurrence_edges(df, "b", "i").collect()}
        assert got == {("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")}
        capped = cooccurrence_edges(
            spark.createDataFrame([(1, f"i{j}") for j in range(20)],
                                  "b long, i string"),
            "b", "i", max_items_per_basket=4).collect()
        assert len(capped) == 4 * 3


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------

class TestProductQuantization:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")

    def test_codebook_shape_and_determinism(self, spark, emb):
        from pandas_ai_spark.functions.similarity import pq_train

        a = pq_train(emb, m=8, n_codes=16, seed=42)
        b = pq_train(emb, m=8, n_codes=16, seed=42)
        assert a.shape == (8, 16, 8)
        assert (a == b).all()

    def test_dim_must_divide(self, spark, emb):
        from pandas_ai_spark.functions.similarity import pq_train

        with pytest.raises(ValueError, match="not divisible"):
            pq_train(emb, m=7)

    def test_encode_codes_in_range(self, spark, emb):
        from pandas_ai_spark.functions.similarity import (pq_encode,
                                                          pq_train)

        books = pq_train(emb, m=8, n_codes=16)
        rows = pq_encode(emb, books).collect()
        assert len(rows) == emb.count()
        for r in rows:
            assert len(r.codes) == 8
            assert all(0 <= c < 16 for c in r.codes)

    def test_adc_recall_vs_exact(self, spark, emb):
        from pandas_ai_spark.functions.similarity import (ann_bruteforce,
                                                          pq_encode,
                                                          pq_search,
                                                          pq_train)
        from pyspark.sql import functions as F

        queries = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding")
        books = pq_train(emb, m=8, n_codes=16)
        codes = pq_encode(emb, books)
        approx = pq_search(codes, books, queries, k=10)
        exact = ann_bruteforce(emb, queries, k=10)
        got = {(r.query_id, r.vec_id) for r in approx.collect()}
        want = {(r.query_id, r.vec_id) for r in exact.collect()}
        # unclustered random vectors are PQ's worst case (measured ~0.24
        # @10 here): demand agreement well above chance (10/500 = 2%),
        # and that widening the ADC beam recovers the majority
        assert len(got & want) / len(want) >= 0.15
        wide = {(r.query_id, r.vec_id)
                for r in pq_search(codes, books, queries, k=50).collect()}
        assert len(wide & want) / len(want) >= 0.5

    def test_search_excludes_self_and_ranks(self, spark, emb):
        from pandas_ai_spark.functions.similarity import (pq_encode,
                                                          pq_search,
                                                          pq_train)
        from pyspark.sql import functions as F

        queries = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding")
        books = pq_train(emb, m=4, n_codes=8)
        out = pq_search(pq_encode(emb, books), books, queries,
                        k=5).collect()
        by_q = {}
        for r in out:
            assert r.vec_id != r.query_id
            by_q.setdefault(r.query_id, []).append(r)
        for q, rs in by_q.items():
            ranks = sorted(r.rank for r in rs)
            assert ranks == [1, 2, 3, 4, 5]
            scores = [r.score for r in sorted(rs, key=lambda x: x.rank)]
            assert scores == sorted(scores, reverse=True)


# ---------------------------------------------------------------------------
# correlation matrix + histogram
# ---------------------------------------------------------------------------

class TestCorrMatrix:
    def test_known_correlations(self, spark):
        from pandas_ai_spark.functions.stats import corr_matrix

        rows = [(float(i), float(2 * i), float(-i), 7.0 + (i % 2))
                for i in range(50)]
        df = spark.createDataFrame(rows, "a double, b double, c double, d double")
        got = {(r.col_a, r.col_b): r.corr
               for r in corr_matrix(df, ["a", "b", "c"]).collect()}
        assert got[("a", "b")] == pytest.approx(1.0)
        assert got[("a", "c")] == pytest.approx(-1.0)
        assert got[("b", "c")] == pytest.approx(-1.0)
        assert len(got) == 3

    def test_single_pass_plan(self, spark):
        from pandas_ai_spark.functions.stats import corr_matrix

        df = spark.createDataFrame(
            [(1.0, 2.0, 3.0)], "a double, b double, c double")
        plan = corr_matrix(df, ["a", "b", "c"])._jdf.queryExecution() \
            .executedPlan().toString()
        # one aggregate over one scan — no join, no union of scans
        assert "Join" not in plan and "Union" not in plan

    def test_validation(self, spark):
        from pandas_ai_spark.functions.stats import corr_matrix

        df = spark.createDataFrame([(1.0,)], "a double")
        with pytest.raises(ValueError, match="two columns"):
            corr_matrix(df, ["a"])


class TestValueHistogram:
    def test_counts_and_edges(self, spark):
        from pandas_ai_spark.functions.stats import value_histogram

        df = spark.createDataFrame(
            [("a", 0.5), ("a", 1.5), ("a", 1.6), ("a", 9.9),
             ("a", -3.0),   # clamps to bucket 0
             ("a", 42.0),   # clamps to last bucket
             ("a", None)],  # ignored
            "k string, v double")
        got = {r.bucket: (r.n, r.lo_edge, r.hi_edge)
               for r in value_histogram(df, "v", lo=0.0, hi=10.0,
                                        bins=10, by=["k"]).collect()}
        assert got[0] == (2, 0.0, 1.0)   # 0.5 and the clamped -3.0
        assert got[1] == (2, 1.0, 2.0)
        assert got[9] == (2, 9.0, 10.0)  # 9.9 and the clamped 42.0
        assert sum(n for n, _, _ in got.values()) == 6

    def test_validation(self, spark):
        from pandas_ai_spark.functions.stats import value_histogram

        df = spark.createDataFrame([("a", 1.0)], "k string, v double")
        with pytest.raises(ValueError, match="bins"):
            value_histogram(df, "v", 0.0, 1.0, bins=0)
        with pytest.raises(ValueError, match="hi"):
            value_histogram(df, "v", 1.0, 1.0)
