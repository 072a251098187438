"""Event-stream analytics: cohort retention and ordered funnels.

Product-analytics queries over an append-only events table — the
workload the reference's users point conversational SQL at, expressed
here as first-class operators with fixed scale shapes.

Scale notes (100 TB event streams):
- Everything is keyed on the user: cohort assignment, period activity,
  and every funnel stage shuffle on ``user_id`` — consecutive stages
  reuse the same hash partitioning, so the fact table never re-shuffles
  on a different key.
- No windows over the whole stream and no per-user state held in
  Python: each stage is a plain filtered aggregation + co-partitioned
  join, which AQE handles like any skewed equi-join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT_DAYS = {"day": 1, "week": 7}


def cohort_retention(df: DataFrame, ts_col: str = "ts",
                     user_col: str = "user_id",
                     unit: str = "week") -> DataFrame:
    """Retention matrix ``(cohort, offset) → users``: each user's cohort
    is their first-activity period (``date_trunc(unit)``); ``offset``
    counts periods between cohort and each period the user was active
    in; ``users`` is the distinct active-user count. offset 0 is the
    cohort size by construction.

    Two user-keyed aggregations and one user-keyed join — the join and
    the second agg reuse the first shuffle's partitioning.
    """
    if unit not in _UNIT_DAYS:
        raise ValueError(f"unit must be one of {sorted(_UNIT_DAYS)}")
    cohorts = df.groupBy(user_col).agg(
        F.date_trunc(unit, F.min(ts_col)).alias("cohort"))
    activity = df.select(
        F.col(user_col), F.date_trunc(unit, F.col(ts_col)).alias("__p")
    ).distinct()
    per = _UNIT_DAYS[unit]
    offset = (F.datediff(F.col("__p"), F.col("cohort")) / per).cast("int")
    return (
        activity.join(cohorts, user_col)
        .groupBy("cohort", offset.alias("offset"))
        .agg(F.countDistinct(user_col).alias("users"))
    )


def funnel(df: DataFrame, steps: Sequence[str],
           type_col: str = "event_type", ts_col: str = "ts",
           user_col: str = "user_id",
           within_seconds: float | None = None) -> DataFrame:
    """Ordered funnel: per user, ``t1`` = first occurrence of
    ``steps[0]``; ``tK`` = first occurrence of ``steps[K-1]`` STRICTLY
    AFTER ``t(K-1)``. Returns one row per user who entered the funnel,
    with NULL stage times where they stalled — conversion counts are a
    ``count(tK)`` away.

    ``within_seconds`` adds the conversion-window form every product
    funnel eventually needs ("purchased within 72 h of the click"):
    stage K only counts when it lands within that many seconds of
    stage K−1. Note the window is per-EDGE (each consecutive stage
    pair), and stage times stay first-qualifying — greedy, the
    standard product-analytics semantics (not the global-optimum
    alignment, which is quadratic).

    k−1 passes over the (stage-filtered) events, each a user-keyed join
    + min-aggregation co-partitioned with the previous stage; no
    per-user event lists are ever materialized, so a bot user with 10⁹
    events costs one skewed-join key, not an executor OOM.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    out = (df.where(F.col(type_col) == steps[0])
             .groupBy(user_col).agg(F.min(ts_col).alias("t1")))
    for i, step in enumerate(steps[1:], start=2):
        ev = df.where(F.col(type_col) == step).select(user_col, ts_col)
        cond = F.col(ts_col) > F.col("__prev")
        if within_seconds is not None:
            cond = cond & (
                F.col(ts_col).cast("timestamp").cast("double")
                - F.col("__prev").cast("timestamp").cast("double")
                <= float(within_seconds))
        ti = (
            ev.join(out.select(F.col(user_col),
                               F.col(f"t{i - 1}").alias("__prev")),
                    user_col)
            .where(cond)
            .groupBy(user_col).agg(F.min(ts_col).alias(f"t{i}"))
        )
        out = out.join(ti, user_col, "left")
    return out


def transition_matrix(df: DataFrame, ts_col: str = "ts",
                      user_col: str = "user_id",
                      type_col: str = "event_type",
                      tiebreak: str | None = None) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: ``(from_event, to_event, n, prob)`` where ``prob`` is
    the row-stochastic share ``n / Σ_to n``.

    Shape: one ``lead`` window partitioned by the user (never a global
    sort — each user's sequence sorts inside its own partition), then
    one (from, to)-keyed count and a from-keyed window sum for the
    normalizer. Two shuffles total, both on low-cardinality keys after
    the count; the raw event table shuffles exactly once (on the user).

    ``tiebreak`` orders simultaneous events deterministically (pass the
    event id); without it, equal timestamps make the sequence — and
    therefore the matrix — nondeterministic under retries.
    """
    from pyspark.sql.window import Window

    order = [F.col(ts_col)]
    if tiebreak:
        order.append(F.col(tiebreak))
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (df.select(user_col,
                       F.col(type_col).alias("from_event"),
                       F.lead(type_col).over(w).alias("to_event"))
               .where(F.col("to_event").isNotNull()))
    counts = pairs.groupBy("from_event", "to_event") \
                  .agg(F.count("*").alias("n"))
    norm = Window.partitionBy("from_event")
    return counts.withColumn(
        "prob", F.col("n") / F.sum("n").over(norm))


def rfm_segments(df: DataFrame, user_col: str, ts_col: str,
                 amount_col: str, ref_date: str,
                 n_bins: int = 5,
                 approx: bool | None = None) -> DataFrame:
    """RFM customer segmentation: per user, recency (days from last
    activity to ``ref_date``), frequency (activity count), monetary
    (total amount, rounded to cents), each scored 1–``n_bins`` against
    the population's exact interpolated quantile edges; ``segment`` is
    the concatenated ``rfm`` digit string. Higher score = better
    (recency is inverted: most-recent quintile scores ``n_bins``).

    Shape: ONE user-keyed aggregation builds the (tiny, one row per
    user) RFM table; ONE aggregation over it computes all three edge
    arrays (``percentile`` with a fraction array — single pass);
    edges come back as 3·(n_bins−1) driver scalars and the scoring is
    a row-local CASE chain. ``ref_date`` is an explicit literal —
    never now() — so backfills reproduce. percentile's continuous
    interpolation matches DuckDB ``quantile_cont`` exactly, which is
    what makes the quantile edges engine-portable. The default
    ``approx=None`` auto-swaps the edge computation to
    ``percentile_approx`` above ``stats.EXACT_STATE_MAX_BYTES`` of
    Catalyst-estimated input (exact-percentile state grows with
    distinct per-user values); ``approx=False`` forces exact.
    """
    from pandas_ai_spark.functions.stats import _pct, _resolve_approx

    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    approx = _resolve_approx(df, approx)
    fracs = [i / n_bins for i in range(1, n_bins)]

    def _edges(col):
        return _pct(col, fracs, approx)
    rfm = df.groupBy(F.col(user_col).alias("user")).agg(
        F.datediff(F.lit(ref_date).cast("date"),
                   F.max(F.col(ts_col).cast("date"))).alias("recency"),
        F.count("*").alias("frequency"),
        F.round(F.sum(amount_col), 2).alias("monetary"))
    edges_row = rfm.agg(
        _edges(F.col("recency").cast("double")).alias("r"),
        _edges(F.col("frequency").cast("double")).alias("f"),
        _edges(F.col("monetary").cast("double")).alias("m"),
    ).collect()[0]
    if edges_row["r"] is None:
        # percentile over zero rows is NULL — surface a clear error
        # instead of an opaque TypeError in the scoring loop below
        raise ValueError("rfm_segments needs a non-empty input")

    def _score(col, edges):
        s = F.lit(1)
        for e in edges:
            s = s + F.when(F.col(col).cast("double") > F.lit(float(e)),
                           1).otherwise(0)
        return s

    r_raw = _score("recency", edges_row["r"])
    return rfm.select(
        "user", "recency", "frequency", "monetary",
        # invert recency: the least-stale quintile is the best score
        (F.lit(n_bins + 1) - r_raw).alias("r"),
        _score("frequency", edges_row["f"]).alias("f"),
        _score("monetary", edges_row["m"]).alias("m"),
    ).withColumn("segment", F.concat_ws("", "r", "f", "m"))


def interevent_gaps(df: DataFrame, user_col: str, ts_col: str,
                    type_col: str, id_col: str,
                    approx: bool | None = None) -> DataFrame:
    """Inter-event time distribution per event type:
    ``(event_type, n_gaps, mean_gap_s, median_gap_s, p90_gap_s)``
    over the gaps between each user's CONSECUTIVE events of that type
    — the arrival-process profile (engagement cadence, polling
    detection, session-gap calibration for q16-style sessionization).

    Shape: one ``lag`` window partitioned by (user, type) — never a
    global window — ordered by (ts, id) so exact-tie order is pinned;
    then ONE type-keyed aggregation. The percentiles ride the same
    auto exact→approx switch as the stats family. Epoch-microsecond
    arithmetic matches the DuckDB oracle exactly.
    """
    from pyspark.sql.window import Window

    from pandas_ai_spark.functions.stats import _pct, _resolve_approx

    resolved = _resolve_approx(df, approx)
    w = (Window.partitionBy(user_col, type_col)
               .orderBy(F.col(ts_col), F.col(id_col)))
    ep = F.unix_micros(F.col(ts_col))
    gaps = (df.withColumn("__gap",
                          (ep - F.lag(ep).over(w)) / 1_000_000.0)
              .where(F.col("__gap").isNotNull()))
    return (gaps.groupBy(F.col(type_col).alias("event_type"))
            .agg(F.count("*").alias("n_gaps"),
                 F.avg("__gap").alias("mean_gap_s"),
                 _pct(F.col("__gap"), 0.5, resolved)
                 .alias("median_gap_s"),
                 _pct(F.col("__gap"), 0.9, resolved)
                 .alias("p90_gap_s")))


def audience_overlap(df: DataFrame, group_col: str, user_col: str
                     ) -> DataFrame:
    """Pairwise audience overlap between segments (event types,
    campaigns, cohorts): ``(group_a, group_b, n_a, n_b, n_both,
    jaccard)`` for every unordered pair of groups sharing at least one
    user — which segments reach the same people.

    Shape: the q78 basket pattern with USERS as baskets and GROUPS as
    items — distinct (group, user) in one shuffle, per-user sorted
    group array on the same key, ROW-LOCAL unordered-pair expansion
    (each co-membership emitted once, never a user-keyed self-join
    whose hot users explode quadratically — the array slice bounds it
    at |groups per user|², and |groups| is small by construction),
    one pair-keyed count, broadcast size lookups. Intersection-only
    output: pairs with zero shared users are absent (their Jaccard
    is 0).
    """
    per = (df.select(F.col(group_col).alias("__g"),
                     F.col(user_col).alias("__u"))
             .where(F.col("__g").isNotNull() & F.col("__u").isNotNull())
             .distinct())
    sizes = per.groupBy("__g").agg(F.count("*").alias("__n"))
    baskets = per.groupBy("__u").agg(
        F.array_sort(F.collect_set("__g")).alias("__gs"))
    pair_structs = F.flatten(F.transform(
        F.col("__gs"),
        lambda x, i: F.transform(
            F.slice(F.col("__gs"), i + 2,
                    F.greatest(F.size("__gs") - i - 1, F.lit(0))),
            lambda y: F.struct(x.alias("a"), y.alias("b")))))
    inter = (baskets.select(F.explode(pair_structs).alias("__p"))
             .groupBy(F.col("__p.a").alias("group_a"),
                      F.col("__p.b").alias("group_b"))
             .agg(F.count("*").alias("n_both")))
    out = (inter
           .join(F.broadcast(sizes.withColumnRenamed("__g", "group_a")
                             .withColumnRenamed("__n", "n_a")),
                 "group_a")
           .join(F.broadcast(sizes.withColumnRenamed("__g", "group_b")
                             .withColumnRenamed("__n", "n_b")),
                 "group_b"))
    return out.select(
        "group_a", "group_b", "n_a", "n_b", "n_both",
        (F.col("n_both").cast("double")
         / (F.col("n_a") + F.col("n_b") - F.col("n_both")))
        .alias("jaccard"))


def rolling_active_users(df: DataFrame, ts_col: str = "ts",
                         user_col: str = "user_id",
                         window_days: int = 7,
                         approx: bool | None = None) -> DataFrame:
    """Trailing-window active-user counts (DAU/WAU/MAU):
    ``(day, active_users)`` where a user active on day *d* counts
    toward report days ``d … d+window_days−1`` — the standard rolling
    engagement metric, WITHOUT a per-day re-scan of the trailing
    window.

    Shape: ONE distinct pass collapses events to (day, user) — the
    only full-data shuffle; each distinct row then explodes to its
    ``window_days`` report days ROW-LOCALLY (an int-sequence
    transform, cost |active-days| × window, not |events|) and one
    day-keyed distinct count finishes. ``approx`` rides the stats
    family's auto switch: at 100 TB the exact per-day
    ``countDistinct`` state is user-cardinality per day — the honest
    scale path is ``approx=True`` (HLL partials merge map-side and
    the state is bytes per day, the metric-store norm); exact is kept
    for oracle-scale inputs. Report days past the data's last active
    day are trimmed (their trailing window is not yet complete).
    """
    from pandas_ai_spark.functions.cache import operator_persist
    from pandas_ai_spark.functions.stats import _resolve_approx

    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    resolved = _resolve_approx(df, approx)
    # persisted: the max_d scalar collect below and the returned plan
    # both consume it — without the persist the full-data distinct
    # shuffle (the one expensive pass) would run twice. Lifetime is
    # scope-managed (functions/cache.py).
    per = operator_persist(
        df.select(F.col(ts_col).cast("date").alias("__d"),
                  F.col(user_col).alias("__u"))
          .where(F.col("__d").isNotNull() & F.col("__u").isNotNull())
          .distinct())
    max_d = per.agg(F.max("__d")).collect()[0][0]
    if max_d is None:
        raise ValueError("rolling_active_users needs a non-empty input")
    exploded = per.select(
        F.explode(F.sequence(F.lit(0), F.lit(int(window_days) - 1)))
         .alias("__o"), "__d", "__u"
    ).select(F.date_add("__d", F.col("__o")).alias("day"), "__u") \
     .where(F.col("day") <= F.lit(max_d))
    counter = (F.approx_count_distinct if resolved else F.countDistinct)
    return (exploded.groupBy("day")
            .agg(counter(F.col("__u")).alias("active_users"))
            .orderBy("day"))


def session_stats(df: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  gap_minutes: float = 30.0,
                  approx: bool | None = None) -> DataFrame:
    """Corpus-level session profile from raw events: ONE row with
    ``(n_sessions, n_bounce, bounce_rate, avg_events, median
    /p90_duration_s)`` where sessions split on gaps >
    ``gap_minutes`` within a user (the q16 rule) and a bounce is a
    single-event session.

    Shape: the boundary flag and its running sum (the session id) ride
    ONE user-partitioned sort window; the per-session and global
    aggregations reuse that partitioning prefix — the raw events
    shuffle exactly once. Durations are epoch-microsecond arithmetic
    (engine-portable); the duration percentiles ride the stats
    family's auto exact→approx switch (state bounded by distinct
    durations).
    """
    from pyspark.sql.window import Window

    from pandas_ai_spark.functions.stats import _pct, _resolve_approx

    resolved = _resolve_approx(df, approx)
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col),
                                             F.col(id_col))
    ep = F.unix_micros(F.col(ts_col))
    gap_us = float(gap_minutes) * 60 * 1_000_000
    new_s = F.when(
        F.lag(ep).over(w).isNull()
        | ((ep - F.lag(ep).over(w)) > gap_us), 1).otherwise(0)
    sid = F.sum(new_s.cast("int")).over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    per = (df.select(F.col(user_col).alias("__u"), ep.alias("__ep"),
                     sid.alias("__sid"))
             .groupBy("__u", "__sid")
             .agg(F.count("*").alias("__n"),
                  ((F.max("__ep") - F.min("__ep")) / 1_000_000.0)
                  .alias("__dur")))
    return per.agg(
        F.count("*").alias("n_sessions"),
        F.sum((F.col("__n") == 1).cast("int")).alias("n_bounce"),
        F.avg(F.col("__n").cast("double")).alias("avg_events"),
        _pct(F.col("__dur"), 0.5, resolved).alias("median_duration_s"),
        _pct(F.col("__dur"), 0.9, resolved).alias("p90_duration_s"),
    ).withColumn("bounce_rate",
                 F.col("n_bounce") / F.col("n_sessions"))
