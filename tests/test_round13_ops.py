"""Round-13 guards: signed-zero normalization (VERDICT r12 item 1).

The r12 driver failed q212 on value-hash alone: DuckDB's ``round(x, 9)``
preserves IEEE ``-0.0`` while Spark's ``F.round`` (BigDecimal HALF_UP)
normalizes it to ``+0.0``, and the driver hashes pandas frames where the
two zeros differ bitwise.  The fix is mechanical on the oracle side
(``__spark_entry__._fold_negzero_rounds`` rewrites every two-arg
``round`` as ``(round(...) + 0.0)``); this module pins the Spark side:
no registry query may emit ``-0.0`` in any float output column.
"""

import math
import sys

import pytest

sys.path.insert(0, ".")

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _negzero_cols(rows) -> set:
    bad = set()
    for r in rows:
        for c, v in r.asDict().items():
            if isinstance(v, float) and v == 0.0 \
                    and math.copysign(1.0, v) < 0:
                bad.add(c)
    return bad


def test_no_entry_query_emits_negative_zero(spark):
    """Registry-wide: every queries() entry, run at sf0.001, has no
    -0.0 in any output cell (the driver-hash-visible signed-zero class;
    tools/oracle_check.py's canonical() now distinguishes the two zeros
    so the sf0.01 sweep guards the other scale)."""
    from pandas_ai_spark.functions.cache import release_operator_caches

    offenders = {}
    for name, fn in entry.queries_numeric().items():
        rows = fn(spark, SF_DIR).collect()
        release_operator_caches()
        bad = _negzero_cols(rows)
        if bad:
            offenders[name] = sorted(bad)
    assert not offenders, (
        f"entry queries emit -0.0 (driver hash mismatch): {offenders}"
    )


class TestRankDispatchNoEstimate:
    """VERDICT r12 item 7: absent-Catalyst-estimate inputs
    (createDataFrame, RDD-sourced plans) no longer silently default to
    the single-partition window form — the dispatch counts rows once
    and decides on a width×rows stand-in estimate."""

    def _wrap(self, stats, monkeypatch, calls):
        orig = stats.mann_whitney_u_distributed

        def w(*a, **k):
            calls.append("distributed")
            return orig(*a, **k)

        monkeypatch.setattr(stats, "mann_whitney_u_distributed", w)

    def test_no_estimate_source_routes_distributed_over_threshold(
            self, spark, monkeypatch):
        from pandas_ai_spark.functions import stats

        df = spark.createDataFrame(
            [(float(i), "view" if i % 2 else "click")
             for i in range(40)], ["value", "grp"])
        assert stats._plan_size(df) is None  # the shape under test
        monkeypatch.setattr(stats, "RANK_WINDOW_MAX_BYTES", 1)
        calls: list = []
        self._wrap(stats, monkeypatch, calls)
        out = stats.mann_whitney_u(
            df, "value", "grp", "view", "click").collect()
        assert calls == ["distributed"]
        assert len(out) == 1

    def test_no_estimate_small_input_keeps_window_form(
            self, spark, monkeypatch):
        from pandas_ai_spark.functions import stats

        df = spark.createDataFrame(
            [(float(i), "view" if i % 2 else "click")
             for i in range(40)], ["value", "grp"])
        calls: list = []
        self._wrap(stats, monkeypatch, calls)
        # default 1 GiB threshold: 40 counted rows stay on the window
        out = stats.mann_whitney_u(
            df, "value", "grp", "view", "click").collect()
        assert calls == []
        assert len(out) == 1


class TestExactStateThresholdConfig:
    """ADVICE r12: the exact→approx crossover is session-tunable via
    spark.pandas_ai.exactStateMaxBytes (per-call approx= still wins)."""

    def test_session_config_overrides_module_constant(
            self, spark, monkeypatch):
        from pandas_ai_spark.functions import stats

        df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        size = stats._plan_size(df)
        assert size and size > 0
        # module constant forced below the input -> approx engages
        monkeypatch.setattr(stats, "EXACT_STATE_MAX_BYTES", 1)
        stats._warned_auto.discard("big")
        assert stats._resolve_approx(df, None) is True
        # session config raises the threshold back -> exact again
        spark.conf.set("spark.pandas_ai.exactStateMaxBytes",
                       str(1 << 40))
        try:
            assert stats._resolve_approx(df, None) is False
            # explicit per-call flag always wins
            assert stats._resolve_approx(df, True) is True
        finally:
            spark.conf.unset("spark.pandas_ai.exactStateMaxBytes")

    def test_explicit_false_wins_over_tiny_threshold(
            self, spark, monkeypatch):
        from pandas_ai_spark.functions import stats

        df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        monkeypatch.setattr(stats, "EXACT_STATE_MAX_BYTES", 1)
        assert stats._resolve_approx(df, False) is False


class TestAdviceR12Fixes:
    def test_ordinal_association_null_group_key(self, spark):
        """ADVICE r12: a NULL by-key group must carry real C/D counts
        and statistics, not c_pairs=0 / NULL gamma from the name-based
        left join silently dropping the match."""
        from pandas_ai_spark.functions.stats import ordinal_association

        rows = ([(None, 1, 1), (None, 2, 2), (None, 3, 3)]
                + [("g", 1, 3), ("g", 2, 2), ("g", 3, 1)])
        df = spark.createDataFrame(rows, "grp string, x int, y int")
        out = {r["grp"]: r for r in
               ordinal_association(df, "x", "y", by=["grp"]).collect()}
        assert out[None]["c_pairs"] == 3 and out[None]["d_pairs"] == 0
        assert out[None]["gamma"] == pytest.approx(1.0)
        assert out["g"]["gamma"] == pytest.approx(-1.0)

    def test_kendall_tau_b_null_group_key(self, spark):
        from pandas_ai_spark.functions.stats import kendall_tau_b

        rows = [(None, 1, 1), (None, 2, 2), (None, 3, 3)]
        df = spark.createDataFrame(rows, "grp string, x int, y int")
        out = kendall_tau_b(df, "x", "y", by=["grp"]).collect()
        assert len(out) == 1
        assert out[0]["tau_b"] == pytest.approx(1.0)

    def test_wilcoxon_rounds_fractional_inputs(self, spark):
        """ADVICE r12: fractional inputs are HALF-UP rounded, not
        truncated toward zero (1.6-0.4 must behave as 2-0, not 1-0)."""
        from pandas_ai_spark.functions.stats import wilcoxon_signed_rank

        frac = spark.createDataFrame(
            [(1.6, 0.4), (2.6, 1.4), (3.6, 0.4), (0.4, 2.6), (5.6, 1.4)],
            "a double, b double")
        ints = spark.createDataFrame(
            [(2, 0), (3, 1), (4, 0), (0, 3), (6, 1)],
            "a int, b int")
        got = wilcoxon_signed_rank(frac, "a", "b").collect()[0]
        want = wilcoxon_signed_rank(ints, "a", "b").collect()[0]
        assert got["n"] == want["n"]
        assert got["z"] == pytest.approx(want["z"])

    def test_kcore_converged_on_last_budgeted_round(self, spark):
        """ADVICE r12: a peel that reaches its fixpoint exactly on the
        final budgeted round must still report converged=True (one
        extra zero-delta detection round, an algebraic no-op)."""
        from pandas_ai_spark.functions.graph import kcore

        # triangle + one pendant edge: round 1 deletes the pendant,
        # the triangle is the stable 2-core — budget exactly 1 round
        edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
                 ("a", "c"), ("c", "a"), ("c", "d"), ("d", "c")]
        df = spark.createDataFrame(edges, ["src", "dst"])
        out, converged = kcore(df, 2, rounds=1, return_convergence=True)
        assert converged is True
        assert {r["node"] for r in out.collect()} == {"a", "b", "c"}

    def test_semantic_dedup_sample_honored_verbatim(
            self, spark, monkeypatch):
        """ADVICE r12: an explicit sample is not silently floor-raised
        to 16*n_clusters — the k-means trainer sees at most the
        requested number of vectors."""
        from pandas_ai_spark.functions import similarity as sim

        seen = {}
        orig = sim._kmeans_centroids

        def rec(M, n_centroids, *a, **k):
            seen["rows"] = M.shape[0]
            return orig(M, n_centroids, *a, **k)

        monkeypatch.setattr(sim, "_kmeans_centroids", rec)
        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet")
        sim.semantic_dedup_pairs(
            emb, threshold=0.99, n_clusters=4, sample=8).collect()
        assert seen["rows"] <= 8
        # the default remains floor-adjusted (>=16 per centroid)
        seen.clear()
        sim.semantic_dedup_pairs(
            emb, threshold=0.99, n_clusters=4).collect()
        assert seen["rows"] >= min(
            64, emb.count())  # 16*4, capped by corpus size


def test_oracle_check_canonical_distinguishes_signed_zero():
    sys.path.insert(0, "tools")
    from oracle_check import canonical

    a = canonical([(0.0, "x")], ["v", "k"])
    b = canonical([(-0.0, "x")], ["v", "k"])
    assert a != b, "sweep comparator is blind to signed zero again"
    # and rounding still folds sub-9dp jitter onto equal values
    assert canonical([(1.0000000001, "x")], ["v", "k"]) == \
        canonical([(1.0000000004, "x")], ["v", "k"])
