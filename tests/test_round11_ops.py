"""Round-11 tests: auto-dispatch of the rank-window family
(mann_whitney_u / bh_fdr / auc / spearman_corr) between the cheap
window form and the distributed groups×buckets rank path
(VERDICT r10 item 2), plus this round's additions.
"""
import pytest

from pyspark.sql import functions as F

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events(spark):
    # parquet-backed so Catalyst has a REAL size estimate (the
    # dispatch input); ~6k rows at sf0.001
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet")


def _flagged(module, name, calls):
    """Wrap module.<name> to record invocations (dispatch detector)."""
    orig = getattr(module, name)

    def wrapper(*a, **k):
        calls.append(name)
        return orig(*a, **k)

    return orig, wrapper


# ---------------------------------------------------------------------------
# dispatch: default stays on the window form at test scale
# ---------------------------------------------------------------------------

class TestRankPathDispatchWindowDirection:
    def test_small_input_never_routes_distributed(self, spark, events,
                                                  monkeypatch):
        from pandas_ai_spark.functions import classify, stats

        calls: list = []
        for mod, name in ((stats, "mann_whitney_u_distributed"),
                          (stats, "bh_fdr_distributed"),
                          (stats, "spearman_corr_distributed")):
            _, w = _flagged(mod, name, calls)
            monkeypatch.setattr(mod, name, w)

        stats.mann_whitney_u(events, "value", "event_type",
                             "view", "click").collect()
        stats.spearman_corr(events, "value", "user_id").collect()
        hyp = events.groupBy("event_type").agg(
            (F.rand(7)).alias("p"))  # tiny post-agg hypothesis grain
        stats.bh_fdr(hyp, "p", tiebreak_cols=["event_type"]).collect()
        classify.auc(events, "value", "event_type = 'click'").collect()
        assert calls == []  # sf0.001 is far below RANK_WINDOW_MAX_BYTES

    def test_explicit_false_wins_over_low_threshold(self, spark, events,
                                                    monkeypatch):
        from pandas_ai_spark.functions import stats

        monkeypatch.setattr(stats, "RANK_WINDOW_MAX_BYTES", 1)
        calls: list = []
        _, w = _flagged(stats, "mann_whitney_u_distributed", calls)
        monkeypatch.setattr(stats, "mann_whitney_u_distributed", w)
        stats.mann_whitney_u(events, "value", "event_type",
                             "view", "click",
                             distributed=False).collect()
        assert calls == []


# ---------------------------------------------------------------------------
# dispatch: lowered threshold routes to the distributed path — and the
# outputs are identical either way (the q182/q183/q184/q180 contract)
# ---------------------------------------------------------------------------

class TestRankPathDispatchDistributedDirection:
    def test_mann_whitney_routes_and_matches(self, spark, events,
                                             monkeypatch):
        from pandas_ai_spark.functions import stats

        window = stats.mann_whitney_u(
            events, "value", "event_type", "view", "click",
            distributed=False).collect()
        monkeypatch.setattr(stats, "RANK_WINDOW_MAX_BYTES", 1)
        calls: list = []
        _, w = _flagged(stats, "mann_whitney_u_distributed", calls)
        monkeypatch.setattr(stats, "mann_whitney_u_distributed", w)
        routed = stats.mann_whitney_u(
            events, "value", "event_type", "view", "click").collect()
        assert calls == ["mann_whitney_u_distributed"]
        assert [tuple(r) for r in routed] == [tuple(r) for r in window]

    def test_grouped_mann_whitney_routes_by_per_group_share(
            self, spark, events, monkeypatch):
        # few groups (user_id % 3) -> per-group share stays over a
        # 1-byte threshold -> distributed; the group-count HLL pass
        # runs only because size > threshold
        from pandas_ai_spark.functions import stats

        grouped = events.withColumn("grp", F.pmod("user_id", F.lit(3)))
        monkeypatch.setattr(stats, "RANK_WINDOW_MAX_BYTES", 1)
        calls: list = []
        _, w = _flagged(stats, "mann_whitney_u_distributed", calls)
        monkeypatch.setattr(stats, "mann_whitney_u_distributed", w)
        out = stats.mann_whitney_u(
            grouped, "value", "event_type", "view", "click",
            by=["grp"]).collect()
        assert calls == ["mann_whitney_u_distributed"]
        assert len(out) > 0

    def test_spearman_routes_and_matches(self, spark, events,
                                         monkeypatch):
        from pandas_ai_spark.functions import stats

        window = stats.spearman_corr(
            events, "value", "user_id", distributed=False).collect()
        monkeypatch.setattr(stats, "RANK_WINDOW_MAX_BYTES", 1)
        calls: list = []
        _, w = _flagged(stats, "spearman_corr_distributed", calls)
        monkeypatch.setattr(stats, "spearman_corr_distributed", w)
        routed = stats.spearman_corr(events, "value",
                                     "user_id").collect()
        assert calls == ["spearman_corr_distributed"]
        assert [tuple(r) for r in routed] == [tuple(r) for r in window]

    def test_bh_fdr_routes_and_matches(self, spark, events,
                                       monkeypatch):
        from pandas_ai_spark.functions import stats

        hyp = events.groupBy(
            "event_type",
            F.pmod("user_id", F.lit(10)).alias("seg")).agg(
            ((F.xxhash64(F.min("event_id")) % 1000 + 1000) % 1000
             / 1000.0).alias("p"))
        window = sorted(
            tuple(r) for r in stats.bh_fdr(
                hyp, "p", tiebreak_cols=["event_type", "seg"],
                distributed=False).collect())
        monkeypatch.setattr(stats, "RANK_WINDOW_MAX_BYTES", 1)
        calls: list = []
        _, w = _flagged(stats, "bh_fdr_distributed", calls)
        monkeypatch.setattr(stats, "bh_fdr_distributed", w)
        routed = sorted(
            tuple(r) for r in stats.bh_fdr(
                hyp, "p",
                tiebreak_cols=["event_type", "seg"]).collect())
        assert calls == ["bh_fdr_distributed"]
        assert routed == window

    def test_auc_inherits_dispatch(self, spark, events, monkeypatch):
        from pandas_ai_spark.functions import classify, stats

        window = classify.auc(events, "value", "event_type = 'click'",
                              distributed=False).collect()
        monkeypatch.setattr(stats, "RANK_WINDOW_MAX_BYTES", 1)
        calls: list = []
        _, w = _flagged(stats, "mann_whitney_u_distributed", calls)
        monkeypatch.setattr(stats, "mann_whitney_u_distributed", w)
        routed = classify.auc(events, "value",
                              "event_type = 'click'").collect()
        assert calls == ["mann_whitney_u_distributed"]
        assert [tuple(r) for r in routed] == [tuple(r) for r in window]
