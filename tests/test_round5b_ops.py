"""Round-5 additive operators, batch 2: record linkage (fuzzy join +
sorted neighborhood), Markov transitions, triangle counting, mutual
information, PMI collocations, time-weighted average, A/B z-test.
"""

import datetime as dt
import math

from pyspark.sql import functions as F


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


# ---------------------------------------------------------------------------
# fuzzy_join (two-table record linkage)
# ---------------------------------------------------------------------------

class TestFuzzyJoin:
    def _run(self, spark, a_rows, b_rows, **kw):
        from pandas_ai_spark.functions.linkage import fuzzy_join

        a = spark.createDataFrame(a_rows, "id long, k string")
        b = spark.createDataFrame(b_rows, "id long, k string")
        return fuzzy_join(a, b, "id", "k", **kw)

    def test_links_within_distance(self, spark):
        out = self._run(
            spark,
            [(1, "widget assembly"), (2, "gadget")],
            [(10, "widget asembly"), (11, "totally different")],
            max_distance=2, block_chars=3).collect()
        assert [(r.a_id, r.b_id, r.distance) for r in out] == [(1, 10, 1)]

    def test_case_and_whitespace_normalized(self, spark):
        out = self._run(spark, [(1, "  Widget  ")], [(2, "widget")],
                        max_distance=0, block_chars=3).collect()
        assert len(out) == 1 and out[0].distance == 0

    def test_blocking_prefix_miss_documented(self, spark):
        # one edit inside the blocking prefix → candidate never forms
        out = self._run(spark, [(1, "xidget")], [(2, "widget")],
                        max_distance=2, block_chars=3).collect()
        assert out == []

    def test_length_band_prunes(self, spark):
        out = self._run(spark, [(1, "abc")], [(2, "abcdefgh")],
                        max_distance=2, block_chars=3).collect()
        assert out == []

    def test_short_keys_dropped(self, spark):
        out = self._run(spark, [(1, "ab")], [(2, "ab")],
                        max_distance=1, block_chars=3).collect()
        assert out == []


class TestSortedNeighborhood:
    def _run(self, spark, rows, **kw):
        from pandas_ai_spark.functions.linkage import \
            sorted_neighborhood_pairs

        df = spark.createDataFrame(rows, "id long, k string")
        return sorted_neighborhood_pairs(df, "id", "k", **kw)

    def test_adjacent_sorted_records_pair(self, spark):
        out = self._run(spark, [(1, "alpha"), (2, "alphb"), (3, "beta")],
                        window=1, block_chars=1).collect()
        pairs = sorted((r.a_id, r.b_id) for r in out)
        # alpha/alphb share block 'a' and are adjacent; beta is alone
        assert pairs == [(1, 2)]
        assert out[0].distance == 1

    def test_window_reaches_k_neighbors(self, spark):
        rows = [(i, f"a{i}") for i in range(4)]
        out = self._run(spark, rows, window=2, block_chars=1).collect()
        pairs = sorted((r.a_id, r.b_id) for r in out)
        assert pairs == [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]

    def test_blocks_isolate(self, spark):
        out = self._run(spark, [(1, "aaa"), (2, "zzz")],
                        window=3, block_chars=1).collect()
        assert out == []


# ---------------------------------------------------------------------------
# transition_matrix
# ---------------------------------------------------------------------------

class TestTransitionMatrix:
    def _df(self, spark, seqs):
        rows = []
        rid = 0
        for user, events in seqs.items():
            for i, e in enumerate(events):
                rows.append((rid, _ts(i), user, e))
                rid += 1
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string")

    def test_counts_and_row_stochastic(self, spark):
        from pandas_ai_spark.functions.events import transition_matrix

        df = self._df(spark, {1: ["a", "b", "a", "b"], 2: ["a", "c"]})
        out = {(r.from_event, r.to_event): (r.n, r.prob)
               for r in transition_matrix(df, tiebreak="event_id")
               .collect()}
        # user1: a→b, b→a, a→b; user2: a→c — 'a' row: 2/3 vs 1/3
        assert out[("a", "b")][0] == 2
        assert abs(out[("a", "b")][1] - 2 / 3) < 1e-12
        assert out[("a", "c")][0] == 1
        assert abs(out[("a", "c")][1] - 1 / 3) < 1e-12
        assert out[("b", "a")] == (1, 1.0)
        by_from = {}
        for (f_, _), (n, p) in out.items():
            by_from.setdefault(f_, 0.0)
            by_from[f_] += p
        assert all(abs(s - 1.0) < 1e-9 for s in by_from.values())

    def test_no_cross_user_transitions(self, spark):
        from pandas_ai_spark.functions.events import transition_matrix

        df = self._df(spark, {1: ["a"], 2: ["b"]})
        assert transition_matrix(df, tiebreak="event_id").count() == 0

    def test_tiebreak_fixes_equal_timestamps(self, spark):
        from pandas_ai_spark.functions.events import transition_matrix

        rows = [(2, _ts(0), 1, "late"), (1, _ts(0), 1, "early")]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string")
        out = transition_matrix(df, tiebreak="event_id").collect()
        assert [(r.from_event, r.to_event) for r in out] == \
            [("early", "late")]


# ---------------------------------------------------------------------------
# triangle_counts
# ---------------------------------------------------------------------------

class TestTriangleCounts:
    def _run(self, spark, edges):
        from pandas_ai_spark.functions.graph import triangle_counts

        df = spark.createDataFrame(edges, "src string, dst string")
        return {r.node: r.triangles
                for r in triangle_counts(df).collect()}

    def test_single_triangle(self, spark):
        out = self._run(spark, [("a", "b"), ("b", "c"), ("a", "c"),
                                ("c", "d")])
        assert out == {"a": 1, "b": 1, "c": 1}

    def test_duplicate_and_reversed_edges_canonicalized(self, spark):
        out = self._run(spark, [("a", "b"), ("b", "a"), ("a", "b"),
                                ("b", "c"), ("c", "a")])
        assert out == {"a": 1, "b": 1, "c": 1}

    def test_self_loops_ignored(self, spark):
        out = self._run(spark, [("a", "a"), ("a", "b"), ("b", "c"),
                                ("a", "c")])
        assert out == {"a": 1, "b": 1, "c": 1}

    def test_k4_counts(self, spark):
        # complete graph on 4 nodes: C(3,2)=3 triangles per node
        nodes = ["a", "b", "c", "d"]
        edges = [(u, v) for u in nodes for v in nodes if u < v]
        out = self._run(spark, edges)
        assert out == {n: 3 for n in nodes}

    def test_no_triangles(self, spark):
        assert self._run(spark, [("a", "b"), ("b", "c"), ("c", "d")]) \
            == {}


# ---------------------------------------------------------------------------
# mutual_information
# ---------------------------------------------------------------------------

class TestMutualInformation:
    def test_independent_columns_zero_pmi(self, spark):
        from pandas_ai_spark.functions.stats import mutual_information

        rows = [(x, y) for x in "ab" for y in "cd" for _ in range(5)]
        df = spark.createDataFrame(rows, "x string, y string")
        out = mutual_information(df, "x", "y").collect()
        assert len(out) == 4
        assert all(abs(r.pmi) < 1e-12 for r in out)
        assert abs(sum(r.contribution for r in out)) < 1e-12

    def test_perfect_dependence_mi_is_log_k(self, spark):
        from pandas_ai_spark.functions.stats import mutual_information

        rows = [(x, x.upper()) for x in "abcd" for _ in range(3)]
        df = spark.createDataFrame(rows, "x string, y string")
        out = mutual_information(df, "x", "y").collect()
        mi = sum(r.contribution for r in out)
        assert abs(mi - math.log(4)) < 1e-12
        assert all(abs(r.pmi - math.log(4)) < 1e-12 for r in out)

    def test_nulls_excluded(self, spark):
        from pandas_ai_spark.functions.stats import mutual_information

        df = spark.createDataFrame(
            [("a", "b"), ("a", None), (None, "b")], "x string, y string")
        out = mutual_information(df, "x", "y").collect()
        assert len(out) == 1 and out[0].n_xy == 1


# ---------------------------------------------------------------------------
# pmi_collocations
# ---------------------------------------------------------------------------

class TestPmiCollocations:
    def test_known_corpus(self, spark):
        from pandas_ai_spark.functions.text import pmi_collocations

        docs = spark.createDataFrame(
            [("new york city",)] * 3 + [("alpha beta",)] * 2,
            "text string")
        out = pmi_collocations(docs, min_count=2, top_k=10).collect()
        got = {(r.w1, r.w2): r for r in out}
        assert set(got) == {("new", "york"), ("york", "city"),
                            ("alpha", "beta")}
        t = 13  # total tokens: 3*3 + 2*2
        r = got[("new", "york")]
        assert r.n_pair == 3 and r.n_w1 == 3 and r.n_w2 == 3
        assert abs(r.pmi - math.log(3 * t / 9)) < 1e-12
        # rarer pair scores higher PMI
        assert got[("alpha", "beta")].pmi > got[("new", "york")].pmi

    def test_min_count_filters(self, spark):
        from pandas_ai_spark.functions.text import pmi_collocations

        docs = spark.createDataFrame(
            [("one off pair",), ("common pair here",),
             ("common pair again",)], "text string")
        out = pmi_collocations(docs, min_count=2, top_k=10).collect()
        assert {(r.w1, r.w2) for r in out} == {("common", "pair")}

    def test_non_alpha_split_and_case(self, spark):
        from pandas_ai_spark.functions.text import pmi_collocations

        docs = spark.createDataFrame(
            [("Foo-BAR! foo?bar 42 foo;bar",)], "text string")
        out = pmi_collocations(docs, min_count=3, top_k=5).collect()
        assert [(r.w1, r.w2, r.n_pair) for r in out] == [("foo", "bar", 3)]

    def test_empty_corpus(self, spark):
        from pandas_ai_spark.functions.text import pmi_collocations

        docs = spark.createDataFrame([("",), ("   ",)], "text string")
        assert pmi_collocations(docs, min_count=1, top_k=5).count() == 0


# ---------------------------------------------------------------------------
# time_weighted_avg
# ---------------------------------------------------------------------------

class TestTimeWeightedAvg:
    def _run(self, spark, rows):
        from pandas_ai_spark.functions.timeseries import time_weighted_avg

        df = spark.createDataFrame(
            rows, "k string, ts timestamp, rid long, value double")
        return time_weighted_avg(df, "value", "ts", by=("k",),
                                 tiebreak="rid")

    def test_step_interpolation(self, spark):
        # v=1 held 10s, v=3 held 30s, final obs carries no weight
        rows = [("a", _ts(0, 0), 1, 1.0), ("a", _ts(0, 10), 2, 3.0),
                ("a", _ts(0, 40), 3, 99.0)]
        out = self._run(spark, rows).collect()
        assert len(out) == 1
        r = out[0]
        assert abs(r.twa - (1 * 10 + 3 * 30) / 40) < 1e-12
        assert r.total_seconds == 40.0 and r.n_intervals == 2

    def test_burst_not_overweighted(self, spark):
        # rapid burst of 100s for 1s each, then one 0 held 1000s:
        # plain mean ≈ 50, TWA ≈ 0.9
        rows = [("a", _ts(0, i), i, 100.0) for i in range(10)]
        rows.append(("a", _ts(0, 10), 10, 0.0))
        rows.append(("a", _ts(0, 10) + dt.timedelta(seconds=1000),
                     11, 5.0))
        r = self._run(spark, rows).collect()[0]
        assert abs(r.twa - (100 * 10) / 1010) < 1e-9

    def test_single_observation_key_dropped(self, spark):
        rows = [("a", _ts(0), 1, 5.0), ("b", _ts(0), 2, 1.0),
                ("b", _ts(1), 3, 2.0)]
        out = {r.k: r for r in self._run(spark, rows).collect()}
        assert set(out) == {"b"}

    def test_keyless_raises(self, spark):
        from pandas_ai_spark.functions.timeseries import time_weighted_avg

        df = spark.createDataFrame([("a", _ts(0), 1, 1.0)],
                                   "k string, ts timestamp, rid long, "
                                   "value double")
        try:
            time_weighted_avg(df, "value", "ts", by=())
            assert False, "expected ValueError"
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# ab_test_proportions
# ---------------------------------------------------------------------------

class TestAbTest:
    def test_z_arithmetic(self, spark):
        from pandas_ai_spark.functions.stats import ab_test_proportions

        # unit i converts iff flag=1; arms fixed by md5 so recompute
        rows = [(i, 1 if i < 40 else 0) for i in range(100)]
        df = spark.createDataFrame(rows, "uid long, flag int")
        r = ab_test_proportions(df, "uid", F.col("flag") == 1,
                                seed="t").collect()[0]
        assert r.n_a + r.n_b == 100
        assert r.conv_a + r.conv_b == 40
        p_a, p_b = r.conv_a / r.n_a, r.conv_b / r.n_b
        pooled = (r.conv_a + r.conv_b) / 100
        se = math.sqrt(pooled * (1 - pooled) * (1 / r.n_a + 1 / r.n_b))
        assert abs(r.z - (p_a - p_b) / se) < 1e-9
        assert r.significant == (abs(r.z) >= 1.96)

    def test_deterministic_assignment(self, spark):
        from pandas_ai_spark.functions.stats import ab_test_proportions

        df = spark.createDataFrame([(i, 1) for i in range(50)],
                                   "uid long, flag int")
        a = ab_test_proportions(df, "uid", F.col("flag") == 1).collect()
        b = ab_test_proportions(df, "uid", F.col("flag") == 1).collect()
        assert a == b

    def test_unit_grain_multiple_events(self, spark):
        from pandas_ai_spark.functions.stats import ab_test_proportions

        # one unit, many events, one success → converts once
        df = spark.createDataFrame([(1, i % 7 == 0) for i in range(20)],
                                   "uid long, ok boolean")
        r = ab_test_proportions(df, "uid", F.col("ok")).collect()[0]
        assert r.conv_a + r.conv_b == 1 and r.n_a + r.n_b == 1

    def test_zero_conversion_no_nan(self, spark):
        from pandas_ai_spark.functions.stats import ab_test_proportions

        df = spark.createDataFrame([(i, 0) for i in range(10)],
                                   "uid long, flag int")
        r = ab_test_proportions(df, "uid", F.col("flag") == 1).collect()[0]
        assert r.z == 0.0 and not r.significant


# ---------------------------------------------------------------------------
# population_stability_index
# ---------------------------------------------------------------------------

class TestPsi:
    def _psi(self, spark, exp_vals, act_vals, **kw):
        from pandas_ai_spark.functions.stats import \
            population_stability_index

        e = spark.createDataFrame([(float(v),) for v in exp_vals],
                                  "v double")
        a = spark.createDataFrame([(float(v),) for v in act_vals],
                                  "v double")
        return population_stability_index(e, a, "v", 0.0, 100.0,
                                          bins=10, **kw)

    def test_identical_distribution_zero(self, spark):
        vals = [5, 15, 25, 35, 45] * 4
        out = self._psi(spark, vals, vals).collect()
        assert len(out) == 10  # spine keeps empty bins
        assert abs(sum(r.psi for r in out)) < 1e-9

    def test_shift_detected(self, spark):
        out = self._psi(spark, [5] * 50, [95] * 50).collect()
        total = sum(r.psi for r in out)
        assert total > 0.25  # "significant shift" rule of thumb
        assert all(math.isfinite(r.psi) for r in out)

    def test_empty_bin_floored_not_inf(self, spark):
        out = self._psi(spark, [5] * 10 + [95] * 10, [5] * 20).collect()
        by = {r.bucket: r for r in out}
        assert by[9].n_actual == 0
        assert math.isfinite(by[9].psi)
        assert by[9].pct_actual == 1e-6

    def test_empty_snapshot_raises(self, spark):
        try:
            self._psi(spark, [5.0], [])
            assert False, "expected ValueError"
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# bm25_search
# ---------------------------------------------------------------------------

class TestBm25:
    def _docs(self, spark):
        rows = [
            (1, "spark engine spark engine spark"),
            (2, "spark engine"),
            (3, "engine room"),
            (4, "totally unrelated words here"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_tf_and_idf_ranking(self, spark):
        from pandas_ai_spark.functions.search import bm25_search

        out = bm25_search(self._docs(spark), "spark", top_k=4).collect()
        ids = [r.id for r in out]
        assert ids[0] == 1 and set(ids) == {1, 2}  # only matching docs
        assert out[0].score > out[1].score

    def test_rare_term_outscores_common(self, spark):
        from pandas_ai_spark.functions.search import bm25_search

        # 'room' appears in 1 doc, 'engine' in 3 → doc 3 (has both the
        # rare and common term) tops a multi-term query
        out = bm25_search(self._docs(spark), "engine room",
                          top_k=4).collect()
        assert out[0].id == 3

    def test_corpus_stats_injection_matches(self, spark):
        from pandas_ai_spark.functions.search import (bm25_corpus_stats,
                                                      bm25_search)

        docs = self._docs(spark)
        st = bm25_corpus_stats(docs)
        a = bm25_search(docs, "spark engine", top_k=4).collect()
        b = bm25_search(docs, "spark engine", top_k=4,
                        corpus_stats=st).collect()
        assert a == b

    def test_empty_query_raises(self, spark):
        from pandas_ai_spark.functions.search import bm25_search

        try:
            bm25_search(self._docs(spark), "!!! ???")
            assert False, "expected ValueError"
        except ValueError:
            pass

    def test_manual_score_single_doc(self, spark):
        from pandas_ai_spark.functions.search import bm25_search

        docs = spark.createDataFrame(
            [(1, "a a b"), (2, "b c d")], "doc_id long, text string")
        r = {x.id: x.score
             for x in bm25_search(docs, "a", top_k=2).collect()}
        n, df_, tf, dl, avgdl, k1, b = 2, 1, 2, 3, 3.0, 1.2, 0.75
        idf = math.log(1 + (n - df_ + 0.5) / (df_ + 0.5))
        want = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        assert abs(r[1] - want) < 1e-12 and set(r) == {1}


# ---------------------------------------------------------------------------
# rfm_segments
# ---------------------------------------------------------------------------

class TestRfm:
    def test_scores_and_inverted_recency(self, spark):
        from pandas_ai_spark.functions.events import rfm_segments

        # 5 users, one order each on distinct days/amounts → each metric
        # has clean quintiles; user 5 is most recent + biggest spender
        rows = []
        for u in range(1, 6):
            rows.append((u, dt.datetime(2024, 1, u), float(u * 100)))
        df = spark.createDataFrame(rows, "cust long, ts timestamp, "
                                         "amt double")
        out = {r.user: r for r in rfm_segments(
            df, "cust", "ts", "amt", ref_date="2024-01-10").collect()}
        assert out[5].r == 5 and out[1].r == 1  # recency inverted
        assert out[5].m == 5 and out[1].m == 1
        assert all(out[u].f == out[1].f for u in out)  # equal frequency
        assert out[5].segment == f"5{out[5].f}5"

    def test_frequency_dimension(self, spark):
        from pandas_ai_spark.functions.events import rfm_segments

        rows = [(1, dt.datetime(2024, 1, 1), 10.0)]
        rows += [(2, dt.datetime(2024, 1, 1), 5.0)] * 10
        df = spark.createDataFrame(rows, "cust long, ts timestamp, "
                                         "amt double")
        out = {r.user: r for r in rfm_segments(
            df, "cust", "ts", "amt", ref_date="2024-02-01",
            n_bins=2).collect()}
        assert out[2].f > out[1].f
        assert out[2].m > out[1].m  # 10×5 > 1×10 total

    def test_bad_bins_raise(self, spark):
        from pandas_ai_spark.functions.events import rfm_segments

        df = spark.createDataFrame([(1, _ts(0), 1.0)],
                                   "cust long, ts timestamp, amt double")
        try:
            rfm_segments(df, "cust", "ts", "amt",
                         ref_date="2024-01-01", n_bins=1)
            assert False, "expected ValueError"
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# upsert_merge (SCD1 CDC merge)
# ---------------------------------------------------------------------------

class TestUpsertMerge:
    def _base(self, spark):
        return spark.createDataFrame(
            [(1, "a", 1), (2, "b", 1), (3, "c", 1)],
            "k long, v string, ver long")

    def test_update_insert_delete(self, spark):
        from pandas_ai_spark.functions.diff import upsert_merge

        ups = spark.createDataFrame(
            [(2, "B", 2, False), (3, "c", 2, True), (4, "d", 2, False)],
            "k long, v string, ver long, deleted boolean")
        out = sorted((r.k, r.v, r.ver) for r in upsert_merge(
            self._base(spark), ups, ["k"], "ver",
            delete_col="deleted").collect())
        assert out == [(1, "a", 1), (2, "B", 2), (4, "d", 2)]

    def test_stale_update_loses(self, spark):
        from pandas_ai_spark.functions.diff import upsert_merge

        ups = spark.createDataFrame([(1, "OLD", 0)],
                                    "k long, v string, ver long")
        out = upsert_merge(self._base(spark), ups, ["k"],
                           "ver").collect()
        assert sorted((r.k, r.v) for r in out) == \
            [(1, "a"), (2, "b"), (3, "c")]

    def test_version_tie_update_wins(self, spark):
        from pandas_ai_spark.functions.diff import upsert_merge

        ups = spark.createDataFrame([(1, "NEW", 1)],
                                    "k long, v string, ver long")
        out = {r.k: r.v for r in upsert_merge(
            self._base(spark), ups, ["k"], "ver").collect()}
        assert out[1] == "NEW"

    def test_idempotent_reapply(self, spark):
        from pandas_ai_spark.functions.diff import upsert_merge

        ups = spark.createDataFrame([(2, "B", 2)],
                                    "k long, v string, ver long")
        once = upsert_merge(self._base(spark), ups, ["k"], "ver")
        twice = upsert_merge(once, ups, ["k"], "ver")
        assert sorted(map(tuple, once.collect())) == \
            sorted(map(tuple, twice.collect()))

    def test_no_keys_raises(self, spark):
        from pandas_ai_spark.functions.diff import upsert_merge

        try:
            upsert_merge(self._base(spark), self._base(spark), [], "ver")
            assert False, "expected ValueError"
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# winsorize
# ---------------------------------------------------------------------------

class TestWinsorize:
    def test_clamps_tails_only(self, spark):
        from pandas_ai_spark.functions.stats import winsorize

        vals = list(range(1, 101))  # 1..100
        df = spark.createDataFrame([("g", float(v)) for v in vals],
                                   "g string, v double")
        out = winsorize(df, "v", by=["g"], p_lo=0.10,
                        p_hi=0.90).collect()
        w = sorted(r.v_winsorized for r in out)
        # exact interpolated p10/p90 of 1..100 = 10.9 / 90.1
        assert abs(min(w) - 10.9) < 1e-9 and abs(max(w) - 90.1) < 1e-9
        mid = [r for r in out if 11 <= r.v <= 90]
        assert all(r.v_winsorized == r.v for r in mid)

    def test_groups_independent(self, spark):
        from pandas_ai_spark.functions.stats import winsorize

        rows = [("a", float(v)) for v in range(10)] + \
               [("b", float(v * 1000)) for v in range(10)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = winsorize(df, "v", by=["g"], p_lo=0.0, p_hi=1.0).collect()
        assert all(r.v_winsorized == r.v for r in out)  # full range

    def test_ungrouped_scalar_path(self, spark):
        from pandas_ai_spark.functions.stats import winsorize

        df = spark.createDataFrame([(float(v),) for v in range(1, 11)],
                                   "v double")
        out = winsorize(df, "v", p_lo=0.05, p_hi=0.50).collect()
        assert max(r.v_winsorized for r in out) == 5.5  # p50 of 1..10

    def test_bad_fracs_raise(self, spark):
        from pandas_ai_spark.functions.stats import winsorize

        df = spark.createDataFrame([(1.0,)], "v double")
        try:
            winsorize(df, "v", p_lo=0.9, p_hi=0.1)
            assert False, "expected ValueError"
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# grouped_ols
# ---------------------------------------------------------------------------

class TestGroupedOls:
    def test_exact_line_recovered(self, spark):
        from pandas_ai_spark.functions.stats import grouped_ols

        rows = [("g", float(x), 3.0 * x + 7.0) for x in range(10)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        r = grouped_ols(df, ["g"], "x", "y").collect()[0]
        assert abs(r.slope - 3.0) < 1e-9
        assert abs(r.intercept - 7.0) < 1e-9
        assert abs(r.r2 - 1.0) < 1e-12 and r.n == 10

    def test_per_group_models(self, spark):
        from pandas_ai_spark.functions.stats import grouped_ols

        rows = [("up", float(x), 2.0 * x) for x in range(5)]
        rows += [("down", float(x), -2.0 * x) for x in range(5)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        out = {r.g: r.slope for r in
               grouped_ols(df, ["g"], "x", "y").collect()}
        assert abs(out["up"] - 2.0) < 1e-9
        assert abs(out["down"] + 2.0) < 1e-9

    def test_nulls_excluded_constant_x_null_slope(self, spark):
        from pandas_ai_spark.functions.stats import grouped_ols

        rows = [("g", 1.0, 1.0), ("g", 1.0, 2.0), ("g", None, 9.0)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        r = grouped_ols(df, ["g"], "x", "y").collect()[0]
        assert r.n == 2 and r.slope is None

    def test_no_groups_raise(self, spark):
        from pandas_ai_spark.functions.stats import grouped_ols

        df = spark.createDataFrame([("g", 1.0, 1.0)],
                                   "g string, x double, y double")
        try:
            grouped_ols(df, [], "x", "y")
            assert False, "expected ValueError"
        except ValueError:
            pass


class TestCooccurrenceOptions:
    def test_one_directional_with_support(self, spark):
        from pandas_ai_spark.functions.graph import cooccurrence_edges

        rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"),
                (3, "c")]
        df = spark.createDataFrame(rows, "b long, i string")
        out = {(r.src, r.dst) for r in cooccurrence_edges(
            df, "b", "i", min_support=2, symmetric=False).collect()}
        assert out == {("a", "b")}  # (a,c) support 1 dropped; one dir

    def test_symmetric_support_keeps_both_directions(self, spark):
        from pandas_ai_spark.functions.graph import cooccurrence_edges

        rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
        df = spark.createDataFrame(rows, "b long, i string")
        out = {(r.src, r.dst) for r in cooccurrence_edges(
            df, "b", "i", min_support=2).collect()}
        assert out == {("a", "b"), ("b", "a")}


# ---------------------------------------------------------------------------
# chi_square_independence
# ---------------------------------------------------------------------------

class TestChiSquare:
    def test_independent_near_zero(self, spark):
        from pandas_ai_spark.functions.stats import \
            chi_square_independence

        rows = [(x, y) for x in "ab" for y in "cd" for _ in range(10)]
        df = spark.createDataFrame(rows, "x string, y string")
        r = chi_square_independence(df, "x", "y").collect()[0]
        assert abs(r.chi2) < 1e-9 and r.dof == 1 and r.n == 40
        assert abs(r.cramers_v) < 1e-9

    def test_perfect_association(self, spark):
        from pandas_ai_spark.functions.stats import \
            chi_square_independence

        rows = [(x, x.upper()) for x in "abc" for _ in range(7)]
        df = spark.createDataFrame(rows, "x string, y string")
        r = chi_square_independence(df, "x", "y").collect()[0]
        # perfect 3x3 association: chi2 = n*(k-1) = 42 (zero cells
        # included via the sum(O^2/E) - N identity), V = 1
        assert abs(r.chi2 - 42) < 1e-9
        assert r.dof == 4 and abs(r.cramers_v - 1.0) < 1e-12

    def test_manual_2x2(self, spark):
        from pandas_ai_spark.functions.stats import \
            chi_square_independence

        # classic 2x2: [[10, 20], [20, 10]]
        rows = ([("a", "x")] * 10 + [("a", "y")] * 20
                + [("b", "x")] * 20 + [("b", "y")] * 10)
        df = spark.createDataFrame(rows, "x string, y string")
        r = chi_square_independence(df, "x", "y").collect()[0]
        assert abs(r.chi2 - 20 / 3) < 1e-9  # (|10-15|^2/15)*4 = 20/3
        assert abs(r.cramers_v - math.sqrt((20 / 3) / 60)) < 1e-12

    def test_empty_raises(self, spark):
        from pandas_ai_spark.functions.stats import \
            chi_square_independence

        df = spark.createDataFrame([], "x string, y string")
        try:
            chi_square_independence(df, "x", "y")
            assert False, "expected ValueError"
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# jsd_term_drift
# ---------------------------------------------------------------------------

class TestJsdDrift:
    def _run(self, spark, exp_texts, act_texts, **kw):
        from pandas_ai_spark.functions.text import jsd_term_drift

        e = spark.createDataFrame([(t,) for t in exp_texts],
                                  "text string")
        a = spark.createDataFrame([(t,) for t in act_texts],
                                  "text string")
        return jsd_term_drift(e, a, **kw)

    def test_identical_corpora_zero(self, spark):
        out = self._run(spark, ["alpha beta gamma"] * 3,
                        ["alpha beta gamma"] * 5).collect()
        assert all(abs(r.jsd_contribution) < 1e-12 for r in out)

    def test_disjoint_corpora_ln2(self, spark):
        out = self._run(spark, ["aaa bbb"], ["ccc ddd"]).collect()
        total = sum(r.jsd_contribution for r in out)
        assert abs(total - math.log(2)) < 1e-12  # JSD max
        # every term one-sided: contribution = 0.5 * p * ln(2)
        assert all(abs(r.jsd_contribution - 0.5 * 0.5 * math.log(2))
                   < 1e-12 for r in out)

    def test_drifting_term_tops(self, spark):
        out = self._run(spark, ["stable words here"] * 10,
                        ["stable words here"] * 10 + ["novel"] * 5)
        top = out.collect()[0]
        assert top.term == "novel" and top.n_expected == 0

    def test_empty_side_raises(self, spark):
        try:
            self._run(spark, ["abc"], ["   "]).collect()
            assert False, "expected ValueError"
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

class TestCountMin:
    def _grid_est(self, spark, tokens, **kw):
        from pandas_ai_spark.functions.sketch import (countmin_build,
                                                      countmin_estimate)

        df = spark.createDataFrame([(t,) for t in tokens], "w string")
        grid = countmin_build(df, "w", **kw)
        return grid, countmin_estimate(grid, df, "w", **kw)

    def test_never_undercounts(self, spark):
        import collections

        tokens = (["apple"] * 50 + ["banana"] * 20 + ["cherry"] * 5
                  + [f"rare{i}" for i in range(30)])
        truth = collections.Counter(tokens)
        _, est = self._grid_est(spark, tokens, depth=4, width=1024)
        got = {r.item: r.estimate for r in est.collect()}
        assert set(got) == set(truth)
        assert all(got[w] >= c for w, c in truth.items())
        # wide grid, tiny corpus: heavy hitters exact w.h.p.
        assert got["apple"] == 50

    def test_grid_bounded(self, spark):
        grid, _ = self._grid_est(spark, [f"t{i}" for i in range(500)],
                                 depth=3, width=16)
        rows = grid.collect()
        assert len(rows) <= 3 * 16
        assert {r.row for r in rows} == {0, 1, 2}
        assert all(0 <= r.bucket < 16 for r in rows)

    def test_grids_merge_additively(self, spark):
        from pandas_ai_spark.functions.sketch import (countmin_build,
                                                      countmin_estimate)
        import pyspark.sql.functions as F

        a = spark.createDataFrame([("x",)] * 3, "w string")
        b = spark.createDataFrame([("x",)] * 4 + [("y",)], "w string")
        merged = (countmin_build(a, "w").unionByName(
                      countmin_build(b, "w"))
                  .groupBy("row", "bucket").agg(F.sum("n").alias("n")))
        est = countmin_estimate(merged, a.unionByName(b), "w")
        got = {r.item: r.estimate for r in est.collect()}
        assert got["x"] == 7 and got["y"] >= 1

    def test_narrow_grid_overestimates_only(self, spark):
        import collections

        tokens = [f"t{i % 40}" for i in range(400)]
        truth = collections.Counter(tokens)
        _, est = self._grid_est(spark, tokens, depth=2, width=8)
        got = {r.item: r.estimate for r in est.collect()}
        # collisions guaranteed at width 8 — estimates still >= truth
        assert all(got[w] >= c for w, c in truth.items())
        assert any(got[w] > c for w, c in truth.items())


# ---------------------------------------------------------------------------
# seasonal_index
# ---------------------------------------------------------------------------

class TestSeasonalIndex:
    def test_known_weekly_pattern(self, spark):
        from pandas_ai_spark.functions.timeseries import seasonal_index

        # 2024-01-07 is a Sunday (dow 0). Sundays worth 20, others 10.
        rows = []
        for day in range(14):
            ts = dt.datetime(2024, 1, 7 + day, 12)
            v = 20.0 if ts.weekday() == 6 else 10.0  # python Sunday=6
            rows.append(("k", ts, v))
        df = spark.createDataFrame(rows, "k string, ts timestamp, "
                                         "value double")
        out = {r.dow: r for r in seasonal_index(
            df, "value", "ts", by=("k",)).collect()}
        assert set(out) == set(range(7))
        overall = (2 * 20 + 12 * 10) / 14
        assert abs(out[0].avg_value - 20.0) < 1e-12
        assert abs(out[0].seasonal_index - 20.0 / overall) < 1e-12
        assert abs(out[1].seasonal_index - 10.0 / overall) < 1e-12

    def test_flat_series_index_one(self, spark):
        from pandas_ai_spark.functions.timeseries import seasonal_index

        rows = [("k", dt.datetime(2024, 1, 1 + d), 5.0)
                for d in range(21)]
        df = spark.createDataFrame(rows, "k string, ts timestamp, "
                                         "value double")
        out = seasonal_index(df, "value", "ts", by=("k",)).collect()
        assert all(abs(r.seasonal_index - 1.0) < 1e-12 for r in out)

    def test_keys_independent(self, spark):
        from pandas_ai_spark.functions.timeseries import seasonal_index

        rows = [("a", dt.datetime(2024, 1, 1 + d), 1.0) for d in range(7)]
        rows += [("b", dt.datetime(2024, 1, 1 + d), 100.0)
                 for d in range(7)]
        df = spark.createDataFrame(rows, "k string, ts timestamp, "
                                         "value double")
        out = seasonal_index(df, "value", "ts", by=("k",)).collect()
        assert all(abs(r.seasonal_index - 1.0) < 1e-12 for r in out)


# ---------------------------------------------------------------------------
# windowed funnel
# ---------------------------------------------------------------------------

class TestWindowedFunnel:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string")

    def test_edge_window_enforced(self, spark):
        from pandas_ai_spark.functions.events import funnel

        rows = [
            (1, _ts(0), "a"), (1, _ts(5), "b"),     # within 10 min
            (2, _ts(0), "a"), (2, _ts(30), "b"),    # too late
        ]
        out = {r.user_id: r for r in funnel(
            self._ev(spark, rows), ["a", "b"],
            within_seconds=600).collect()}
        assert out[1].t2 is not None
        assert out[2].t2 is None  # entered, stalled by the window

    def test_window_per_edge_not_total(self, spark):
        from pandas_ai_spark.functions.events import funnel

        # each edge 8 min (within 10), total 16 (over 10): both pass —
        # the window binds consecutive stages, not end-to-end
        rows = [(1, _ts(0), "a"), (1, _ts(8), "b"), (1, _ts(16), "c")]
        r = funnel(self._ev(spark, rows), ["a", "b", "c"],
                   within_seconds=600).collect()[0]
        assert r.t2 is not None and r.t3 is not None

    def test_no_window_matches_unconstrained(self, spark):
        from pandas_ai_spark.functions.events import funnel

        rows = [(1, _ts(0), "a"), (1, _ts(59), "b")]
        df = self._ev(spark, rows)
        a = funnel(df, ["a", "b"]).collect()
        b = funnel(df, ["a", "b"], within_seconds=1e9).collect()
        assert a == b


# ---------------------------------------------------------------------------
# trigram substring search
# ---------------------------------------------------------------------------

class TestTrigramSearch:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(1, "the data pipeline runs"), (2, "DATA Pipeline!"),
             (3, "pipe line data"), (4, "nothing here"), (5, "xy")],
            "doc_id long, text string")

    def test_matches_contains_semantics(self, spark):
        from pandas_ai_spark.functions.search import substring_search

        out = sorted(r.id for r in substring_search(
            self._docs(spark), "data pipeline").collect())
        assert out == [1, 2]  # case-insensitive; 3 has grams, no match

    def test_gram_candidates_verified_exactly(self, spark):
        from pandas_ai_spark.functions.search import substring_search

        # doc contains every trigram of 'abcd' but not the substring
        docs = spark.createDataFrame(
            [(1, "abc xyz bcd"), (2, "abcd")], "doc_id long, text string")
        out = [r.id for r in substring_search(docs, "abcd").collect()]
        assert out == [2]

    def test_short_needle_fallback(self, spark):
        from pandas_ai_spark.functions.search import substring_search

        out = sorted(r.id for r in substring_search(
            self._docs(spark), "xy").collect())
        assert out == [5]


# ---------------------------------------------------------------------------
# ngram novelty
# ---------------------------------------------------------------------------

class TestNgramNovelty:
    def test_fully_seen_and_fully_novel(self, spark):
        from pandas_ai_spark.functions.text import ngram_novelty

        ref = spark.createDataFrame(
            [(100, "alpha beta gamma delta")], "doc_id long, text string")
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "epsilon zeta eta")],
            "doc_id long, text string")
        out = {r.id: r for r in ngram_novelty(docs, ref, n=3).collect()}
        assert out[1].novelty == 0.0 and out[1].n_grams == 1
        assert out[2].novelty == 1.0 and out[2].n_novel == 1

    def test_partial_overlap_fraction(self, spark):
        from pandas_ai_spark.functions.text import ngram_novelty

        ref = spark.createDataFrame([(9, "a b c d")],
                                    "doc_id long, text string")
        # doc grams: "a b c","b c d","c d x" — 2 of 3 seen
        docs = spark.createDataFrame([(1, "a b c d x")],
                                     "doc_id long, text string")
        r = ngram_novelty(docs, ref, n=3).collect()[0]
        assert r.n_grams == 3 and r.n_novel == 1
        assert abs(r.novelty - 1 / 3) < 1e-12

    def test_short_docs_omitted(self, spark):
        from pandas_ai_spark.functions.text import ngram_novelty

        ref = spark.createDataFrame([(9, "a b c")],
                                    "doc_id long, text string")
        docs = spark.createDataFrame([(1, "a b")],
                                     "doc_id long, text string")
        assert ngram_novelty(docs, ref, n=3).count() == 0


# ---------------------------------------------------------------------------
# PCA projection
# ---------------------------------------------------------------------------

class TestPcaProjection:
    def test_recovers_dominant_axis(self, spark):
        import numpy as np
        from pandas_ai_spark.functions.similarity import pca_project

        # points along the diagonal y=x with tiny orthogonal jitter:
        # pc1 must capture the diagonal (variance >> pc2's)
        rows = []
        for i in range(40):
            t = (i - 20) * 1.0
            jit = 0.01 * (1 if i % 2 else -1)
            rows.append((i, [t + jit, t - jit]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {r.id: (r.pc1, r.pc2) for r in
               pca_project(df, k=2, sample_rows=100).collect()}
        p1 = np.array([out[i][0] for i in range(40)])
        p2 = np.array([out[i][1] for i in range(40)])
        assert p1.var() > 100 * p2.var()
        # pc1 ordering follows the diagonal coordinate (up to sign,
        # fixed positive by the trainer's sign convention)
        assert all(p1[i] < p1[i + 1] for i in range(39)) or \
               all(p1[i] > p1[i + 1] for i in range(39))

    def test_trainer_deterministic_and_sign_fixed(self, spark):
        import numpy as np
        from pandas_ai_spark.functions.similarity import pca_train_numpy

        rng = np.random.default_rng(7)
        M = rng.normal(size=(200, 8))
        a = pca_train_numpy(M, 3)
        b = pca_train_numpy(M.copy(), 3)
        assert np.array_equal(a[1], b[1])
        # sign convention: each component's largest-|loading| positive
        for comp in a[1]:
            assert comp[int(np.argmax(np.abs(comp)))] > 0

    def test_projection_matches_numpy(self, spark):
        import numpy as np
        from pandas_ai_spark.functions.similarity import (pca_project,
                                                          pca_train_numpy)

        rng = np.random.default_rng(3)
        M = rng.normal(size=(50, 6))
        df = spark.createDataFrame(
            [(i, [float(x) for x in M[i]]) for i in range(50)],
            "vec_id long, embedding array<double>")
        out = {r.id: r.pc1 for r in
               pca_project(df, k=1, sample_rows=100).collect()}
        mu, comps, _ = pca_train_numpy(M, 1)
        want = (M - mu) @ comps[0]
        got = np.array([out[i] for i in range(50)])
        assert np.allclose(got, want, atol=1e-9)

    def test_empty_raises(self, spark):
        from pandas_ai_spark.functions.similarity import pca_project

        df = spark.createDataFrame([], "vec_id long, embedding array<double>")
        try:
            pca_project(df, k=2)
            assert False, "expected ValueError"
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# embedding audit
# ---------------------------------------------------------------------------

class TestEmbeddingAudit:
    def test_crafted_violations_counted(self, spark):
        from pandas_ai_spark.functions.similarity import embedding_audit

        rows = [([1.0, 0.0],), ([0.0, 0.0],), ([float("nan"), 1.0],),
                (None,), ([1.0, 1.0, 1.0],), ([100.0, 0.0],)]
        df = spark.createDataFrame(rows, "embedding array<double>")
        out = {r.check: r.violations for r in embedding_audit(
            df, expected_dim=2, norm_lo=0.5, norm_hi=2.0).collect()}
        assert out == {"null_vector": 1, "null_component": 0,
                       "dim_mismatch": 1, "nan_component": 1,
                       "zero_vector": 1, "norm_below": 0,
                       "norm_above": 1}

    def test_null_component_lands_in_exactly_one_bucket(self, spark):
        # [1.0, NULL] poisons exists(isnan)/the norm fold to NULL —
        # before the null_component check it was counted NOWHERE
        from pandas_ai_spark.functions.similarity import embedding_audit

        df = spark.createDataFrame([([1.0, None],), ([1.0, 0.0],)],
                                   "embedding array<double>")
        out = {r.check: r.violations for r in embedding_audit(
            df, norm_lo=0.5, norm_hi=2.0).collect()}
        assert out["null_component"] == 1
        assert out["nan_component"] == 0 and out["zero_vector"] == 0
        assert out["norm_below"] == 0 and out["norm_above"] == 0

    def test_clean_table_all_zero(self, spark):
        from pandas_ai_spark.functions.similarity import embedding_audit

        df = spark.createDataFrame([([1.0, 0.0],)] * 5,
                                   "embedding array<double>")
        out = embedding_audit(df, expected_dim=2, norm_lo=0.5,
                              norm_hi=2.0).collect()
        assert all(r.violations == 0 for r in out)


# ---------------------------------------------------------------------------
# perceptual hash + banded candidates
# ---------------------------------------------------------------------------

class TestPerceptualHash:
    def _hash(self, spark, blobs):
        from pandas_ai_spark.functions.multimodal import \
            perceptual_hash_bands

        df = spark.createDataFrame(
            [(i, bytearray(b)) for i, b in enumerate(blobs)],
            "doc_id long, media binary")
        return {r.doc_id: r.band for r in perceptual_hash_bands(
            df, "media", "doc_id", decoder="fake").collect()}

    def test_deterministic_and_banded(self, spark):
        blob = bytes(range(256)) * 2
        h = self._hash(spark, [blob, blob])
        assert h[0] == h[1] and len(h[0]) == 8
        assert all(0 <= b <= 255 for b in h[0])

    def test_different_content_differs(self, spark):
        a = bytes(range(256))
        b = bytes(reversed(range(256)))
        h = self._hash(spark, [a, b])
        assert h[0] != h[1]

    def test_candidates_pair_near_dups_only(self, spark):
        from pandas_ai_spark.functions.multimodal import (
            perceptual_hash_bands, phash_candidates)

        base = bytes(range(256)) * 2
        tweaked = bytes([min(255, x + 1) for x in range(256)]) * 2
        noise = bytes([(x * 97 + 13) % 256 for x in range(512)])
        df = spark.createDataFrame(
            [(0, bytearray(base)), (1, bytearray(tweaked)),
             (2, bytearray(noise))], "doc_id long, media binary")
        hashed = perceptual_hash_bands(df, "media", "doc_id",
                                       decoder="fake")
        pairs = {(r.id_a, r.id_b)
                 for r in phash_candidates(hashed).collect()}
        assert (0, 1) in pairs
        assert (0, 2) not in pairs and (1, 2) not in pairs

    def test_bands_must_divide(self, spark):
        from pandas_ai_spark.functions.multimodal import \
            perceptual_hash_bands

        df = spark.createDataFrame([(1, bytearray(b"x" * 300))],
                                   "doc_id long, media binary")
        try:
            perceptual_hash_bands(df, "media", "doc_id", grid=8,
                                  bands=7)
            assert False, "expected ValueError"
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# count-min join-size estimate
# ---------------------------------------------------------------------------

class TestJoinSizeEstimate:
    def test_exact_when_no_collisions(self, spark):
        from pandas_ai_spark.functions.sketch import (countmin_build,
                                                      countmin_join_size)

        a = spark.createDataFrame([(k,) for k in range(10)
                                   for _ in range(3)], "k long")
        b = spark.createDataFrame([(k,) for k in range(5)
                                   for _ in range(2)], "k long")
        ga = countmin_build(a, "k", depth=4, width=4096)
        gb = countmin_build(b, "k", depth=4, width=4096)
        est = countmin_join_size(ga, gb).collect()[0].estimate
        # true join size: keys 0..4 -> 3*2 each = 30
        assert est == 30

    def test_never_underestimates_under_collisions(self, spark):
        from pandas_ai_spark.functions.sketch import (countmin_build,
                                                      countmin_join_size)

        a = spark.createDataFrame([(k,) for k in range(200)], "k long")
        ga = countmin_build(a, "k", depth=2, width=8)
        est = countmin_join_size(ga, ga).collect()[0].estimate
        assert est >= 200  # true self-join size with unique keys


class TestTrigramIndexPath:
    def test_index_path_equals_direct_scan(self, spark):
        from pandas_ai_spark.functions.search import (build_trigram_index,
                                                      substring_search)

        docs = spark.createDataFrame(
            [(1, "the data pipeline runs"), (2, "DATA Pipeline!"),
             (3, "pipe line data"), (4, "nothing here")],
            "doc_id long, text string")
        idx = build_trigram_index(docs)
        direct = sorted(r.id for r in
                        substring_search(docs, "data pipeline").collect())
        via_idx = sorted(r.id for r in substring_search(
            docs, "data pipeline", index=idx).collect())
        assert direct == via_idx == [1, 2]

    def test_index_prunes_false_candidates(self, spark):
        from pandas_ai_spark.functions.search import (build_trigram_index,
                                                      substring_search)

        # has all trigrams of 'abcd' but not the substring
        docs = spark.createDataFrame(
            [(1, "abc xyz bcd"), (2, "abcd")], "doc_id long, text string")
        idx = build_trigram_index(docs)
        out = [r.id for r in substring_search(docs, "abcd",
                                              index=idx).collect()]
        assert out == [2]


class TestWelchTtest:
    def _run(self, spark, a_vals, b_vals):
        from pandas_ai_spark.functions.stats import welch_ttest

        rows = [("a", float(v)) for v in a_vals]
        rows += [("b", float(v)) for v in b_vals]
        rows += [("other", 999.0)]  # excluded arm
        df = spark.createDataFrame(rows, "g string, v double")
        return welch_ttest(df, "g", "v", "a", "b").collect()[0]

    def test_manual_statistic(self, spark):
        import statistics

        a = [1.0, 2.0, 3.0, 4.0, 5.0]
        b = [6.0, 7.0, 8.0, 9.0, 20.0]
        r = self._run(spark, a, b)
        sa = statistics.variance(a) / len(a)
        sb = statistics.variance(b) / len(b)
        t = (statistics.mean(a) - statistics.mean(b)) \
            / math.sqrt(sa + sb)
        dof = (sa + sb) ** 2 / (sa ** 2 / 4 + sb ** 2 / 4)
        assert r.n_a == 5 and r.n_b == 5
        assert abs(r.t - t) < 1e-9 and abs(r.dof - dof) < 1e-9
        assert r.significant == (abs(t) >= 1.96)

    def test_identical_groups_not_significant(self, spark):
        r = self._run(spark, [1, 2, 3, 4] * 5, [1, 2, 3, 4] * 5)
        assert abs(r.t) < 1e-12 and not r.significant

    def test_constant_groups_zero_t(self, spark):
        r = self._run(spark, [5.0] * 10, [5.0] * 10)
        assert r.t == 0.0 and not r.significant
