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
