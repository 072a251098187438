"""Round-6 fixes and additive operators: upsert_merge deterministic
tiebreak, rfm empty-input guard, perceptual-hash band-width guard,
auto exact→approx percentile switching at scale.
"""

import datetime as dt

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# upsert_merge: deterministic last-resort tiebreak (ADVICE r5)
# ---------------------------------------------------------------------------

class TestUpsertTiebreak:
    def test_duplicate_key_version_is_deterministic(self, spark):
        from pandas_ai_spark.functions.diff import upsert_merge

        base = spark.createDataFrame([(1, "old", 0)],
                                     "k long, v string, ver long")
        # two update rows share (key, version) — a malformed CDC batch;
        # the winner must be content-determined, not partition-order
        ups = spark.createDataFrame([(1, "a", 5), (1, "b", 5)],
                                    "k long, v string, ver long")
        winners = set()
        for n_parts in (1, 2, 7):
            out = upsert_merge(base, ups.repartition(n_parts),
                               ["k"], "ver").collect()
            assert len(out) == 1
            winners.add(out[0].v)
        assert len(winners) == 1  # same winner under every shuffle

    def test_explicit_tiebreak_column(self, spark):
        from pandas_ai_spark.functions.diff import upsert_merge

        base = spark.createDataFrame(
            [(1, "old", 0, 0)], "k long, v string, ver long, seq long")
        ups = spark.createDataFrame(
            [(1, "early", 5, 10), (1, "late", 5, 20)],
            "k long, v string, ver long, seq long")
        out = upsert_merge(base, ups, ["k"], "ver",
                           tiebreak_col="seq").collect()
        assert len(out) == 1 and out[0].v == "late"  # highest seq wins

    def test_bad_tiebreak_column_raises(self, spark):
        from pandas_ai_spark.functions.diff import upsert_merge

        base = spark.createDataFrame([(1, "a", 0)],
                                     "k long, v string, ver long")
        with pytest.raises(ValueError):
            upsert_merge(base, base, ["k"], "ver",
                         tiebreak_col="nope")


# ---------------------------------------------------------------------------
# rfm_segments: clear error on empty input (ADVICE r5)
# ---------------------------------------------------------------------------

class TestRfmEmptyInput:
    def test_empty_input_raises_value_error(self, spark):
        from pandas_ai_spark.functions.events import rfm_segments

        df = spark.createDataFrame(
            [], "cust long, ts timestamp, amt double")
        with pytest.raises(ValueError, match="non-empty"):
            rfm_segments(df, "cust", "ts", "amt",
                         ref_date="2024-01-01")


# ---------------------------------------------------------------------------
# perceptual_hash_bands: band width must fit array<int> (ADVICE r5)
# ---------------------------------------------------------------------------

class TestPhashBandWidth:
    def test_over_31_bits_per_band_raises(self, spark):
        from pandas_ai_spark.functions.multimodal import \
            perceptual_hash_bands

        df = spark.createDataFrame([(1, bytearray(b"x" * 300))],
                                   "doc_id long, media binary")
        # grid=16, bands=8 → 32 bits per band: would overflow int32
        with pytest.raises(ValueError, match="31-bit"):
            perceptual_hash_bands(df, "media", "doc_id",
                                  decoder="fake", grid=16, bands=8)

    def test_16_grid_with_enough_bands_ok(self, spark):
        from pandas_ai_spark.functions.multimodal import \
            perceptual_hash_bands

        df = spark.createDataFrame([(1, bytearray(bytes(range(256))))],
                                   "doc_id long, media binary")
        out = perceptual_hash_bands(df, "media", "doc_id",
                                    decoder="fake", grid=16,
                                    bands=16).collect()
        assert len(out) == 1 and len(out[0].band) == 16
        assert all(0 <= b < (1 << 16) for b in out[0].band)

# ---------------------------------------------------------------------------
# auto exact→approx percentile switching (VERDICT r5 item 2)
# ---------------------------------------------------------------------------

class TestAutoApprox:
    def _plan(self, df):
        return df._jdf.queryExecution().optimizedPlan().toString()

    def test_small_parquet_input_stays_exact(self, spark):
        from pandas_ai_spark.functions.stats import winsorize

        df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        out = winsorize(df, "o_totalprice", by=["o_orderstatus"])
        assert "approx" not in self._plan(out).lower()

    def test_big_input_auto_engages_approx(self, spark, monkeypatch):
        from pandas_ai_spark.functions import stats

        monkeypatch.setattr(stats, "EXACT_STATE_MAX_BYTES", 1)
        df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        out = stats.winsorize(df, "o_totalprice", by=["o_orderstatus"])
        assert "percentile_approx" in self._plan(out)
        # exact and approx agree on this data (few distincts per group);
        # the switch must not change the output shape
        assert {"p_lo_bound", "p_hi_bound",
                "o_totalprice_winsorized"} <= set(out.columns)

    def test_profile_auto_swaps_distinct_for_hll(self, spark,
                                                 monkeypatch):
        from pandas_ai_spark.functions import stats

        df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        exact = stats.profile_exact(df, ["o_orderkey"])
        assert "approx_count_distinct" not in self._plan(exact)
        monkeypatch.setattr(stats, "EXACT_STATE_MAX_BYTES", 1)
        approx = stats.profile_exact(df, ["o_orderkey"])
        assert "approx_count_distinct" in self._plan(approx)

    def test_explicit_flag_beats_auto(self, spark, monkeypatch):
        from pandas_ai_spark.functions import stats

        monkeypatch.setattr(stats, "EXACT_STATE_MAX_BYTES", 1)
        df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        out = stats.winsorize(df, "o_totalprice", approx=False)
        assert "approx" not in self._plan(out).lower()

    def test_unknown_size_plan_stays_exact(self, spark, monkeypatch):
        from pandas_ai_spark.functions import stats

        monkeypatch.setattr(stats, "EXACT_STATE_MAX_BYTES", 1)
        # local relations carry Catalyst's unknown-size sentinel:
        # auto must keep the exact path (oracle fidelity), not guess
        df = spark.createDataFrame([("a", 1.0)] * 10, "g string, v double")
        out = stats.grouped_median(df, "g", "v")
        assert "approx" not in self._plan(out).lower()

    def test_rfm_auto_approx_engages(self, spark, monkeypatch):
        import datetime as dt
        from pandas_ai_spark.functions import stats
        from pandas_ai_spark.functions.events import rfm_segments

        monkeypatch.setattr(stats, "EXACT_STATE_MAX_BYTES", 1)
        df = (spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
              .select("o_custkey", "o_orderdate", "o_totalprice"))
        out = rfm_segments(df, "o_custkey", "o_orderdate",
                           "o_totalprice", ref_date="2001-12-31")
        # sanity: scoring still works end-to-end on the sketch edges
        rows = out.limit(5).collect()
        assert all(1 <= r.r <= 5 and 1 <= r.m <= 5 for r in rows)

# ---------------------------------------------------------------------------
# driver-rotation contract (VERDICT r5 item 1)
# ---------------------------------------------------------------------------

class TestRotation:
    def test_rotation_prefers_stalest_and_preserves_registry_order(self):
        import __spark_entry__ as e

        rot = e.rotation()
        names = list(e.queries().keys())
        assert len(rot) == 50 and len(set(rot)) == 50
        assert set(rot) <= set(names)
        last = e._last_verified_rounds()
        # stalest-first: every selected query is at least as stale as
        # every excluded one
        worst_in = max(last.get(q, 0) for q in rot)
        best_out = min((last.get(q, 0) for q in names
                        if q not in rot), default=worst_in)
        assert worst_in <= best_out
        # registry order preserved within equal staleness
        by_stale = {}
        for q in rot:
            by_stale.setdefault(last.get(q, 0), []).append(q)
        idx = {n: i for i, n in enumerate(names)}
        for grp in by_stale.values():
            assert grp == sorted(grp, key=idx.__getitem__)
        assert e.ROTATION == rot

    def test_rotation_cap(self):
        import __spark_entry__ as e

        assert len(e.rotation(7)) == 7

# ---------------------------------------------------------------------------
# persisted novelty vocabulary (VERDICT r5 item 3)
# ---------------------------------------------------------------------------

class TestNoveltyVocabState:
    def test_vocab_reuse_byte_identical_and_no_state_exchange(
            self, spark, tmp_path):
        from pandas_ai_spark.functions.state_store import (
            load_novelty_vocab, save_novelty_vocab)
        from pandas_ai_spark.functions.text import (build_novelty_vocab,
                                                    ngram_novelty)

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")
        ref = docs.where(F.col("doc_id") % 2 == 1)
        batch = docs.where(F.col("doc_id") % 2 == 0)
        save_novelty_vocab(build_novelty_vocab(ref, n=3),
                           "t_nov_state", str(tmp_path / "nv"),
                           num_buckets=4)
        try:
            vocab = load_novelty_vocab(spark, "t_nov_state")
            one_shot = sorted(map(tuple, ngram_novelty(
                batch, ref, n=3).collect()))
            reused = sorted(map(tuple, ngram_novelty(
                batch, n=3, vocab=vocab).collect()))
            assert reused == one_shot and len(reused) > 0

            # the join must read the bucketed vocabulary without
            # re-shuffling it: exactly one Exchange (the batch side)
            prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            try:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                               "-1")
                plan = (ngram_novelty(batch, n=3, vocab=vocab)
                        ._jdf.queryExecution().executedPlan().toString())
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                               prev)
            # one Exchange for the doc-gram side + one for the final
            # groupBy(id); none under the vocabulary scan
            assert plan.count("Exchange hashpartitioning") == 2, plan
        finally:
            spark.sql("DROP TABLE IF EXISTS t_nov_state_vocab")

    def test_needs_exactly_one_reference_form(self, spark):
        from pandas_ai_spark.functions.text import ngram_novelty

        docs = spark.createDataFrame([(1, "a b c d")],
                                     "doc_id long, text string")
        with pytest.raises(ValueError):
            ngram_novelty(docs, n=3)
        with pytest.raises(ValueError):
            ngram_novelty(docs, docs, n=3,
                          vocab=docs.selectExpr("doc_id as gram"))

# ---------------------------------------------------------------------------
# cache_scope bounds the graded pipeline composition (VERDICT r5 item 6)
# ---------------------------------------------------------------------------

class TestCacheScopePipeline:
    def test_no_operator_cache_outlives_the_scope(self, spark):
        from pandas_ai_spark.functions.cache import _LEDGER, cache_scope
        from pandas_ai_spark.functions.pipeline import clean_corpus

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")
        sc = spark.sparkContext
        before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
        ledger_before = len(_LEDGER)
        with cache_scope():
            # near-dup stage persists its banded signature table; the
            # scope must own it. Materialize INSIDE the scope.
            clean, _ = clean_corpus(docs, near_dup_threshold=0.7,
                                    compute_stats=False,
                                    bounded_cache=False)
            n = clean.count()
        assert n > 0
        after = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
        # no persisted block outlives the scope, and nothing leaked
        # into the global ledger
        assert after <= before, after - before
        assert len(_LEDGER) == ledger_before

    def test_bounded_default_releases_internals(self, spark):
        from pandas_ai_spark.functions.pipeline import clean_corpus

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")
        sc = spark.sparkContext
        before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
        clean, stats = clean_corpus(docs, near_dup_threshold=0.7,
                                    compute_stats=True)
        after = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
        # bounded path: internal signature persists are released; the
        # only new blocks are the checkpointed RESULT (caller-owned)
        new = after - before
        assert len(new) <= 2, new
        assert clean.count() == stats.final_docs
