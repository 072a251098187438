"""Time-series operators: as-of join and interval range join.

Spark has no built-in ASOF JOIN (DuckDB/kdb/pandas merge_asof do); the
idiomatic distributed form is the union-sort-carry pattern:

1. tag left/right rows and UNION them into one frame;
2. one window per key ordered by (ts, side): ``last(right_value,
   ignorenulls=True)`` carries the most recent right row forward onto
   each left row;
3. filter back to left rows.

Cost: ONE shuffle on the key (the window partition) — no range join, no
per-key loop, no broadcast requirement on either side; skewed keys behave
like any window (AQE handles them). This is the shape that holds when
both sides are 100 TB event streams.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: Optional[str] = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` within the same ``by`` keys (backward as-of).

    ``tolerance``: optional max staleness as an INTERVAL string
    (e.g. ``"30 minutes"``) — older right rows are treated as no-match.
    Right's columns (except keys) come back suffixed; left rows with no
    match keep nulls (left-join semantics, pandas ``merge_asof`` shape).
    """
    by = list(by)
    lcols = [c for c in left.columns]
    rcols = [c for c in right.columns if c not in by]

    lhs = left.select(
        *[F.col(c) for c in by],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
    )
    rhs = right.select(
        *[F.col(c) for c in by],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(c) for c in rcols]).alias("__r"),
    )
    lhs = lhs.withColumn("__r", F.lit(None).cast(rhs.schema["__r"].dataType))
    rhs = rhs.withColumn("__l", F.lit(None).cast(lhs.schema["__l"].dataType))

    unioned = lhs.select(*by, "__ts", "__is_left", "__l", "__r").unionByName(
        rhs.select(*by, "__ts", "__is_left", "__l", "__r"))

    # right rows sort before left rows at the same timestamp so an exact
    # tie matches (<= semantics)
    w = (Window.partitionBy(*by)
         .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    ).withColumn(
        "__match_ts", F.last(
            F.when(F.col("__is_left") == 0, F.col("__ts")),
            ignorenulls=True).over(w)
    )
    out = carried.where(F.col("__is_left") == 1)
    if tolerance:
        out = out.withColumn(
            "__match",
            F.when(F.col("__match_ts")
                   >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}"),
                   F.col("__match")))
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in rcols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = -3600.0,
    upper_seconds: float = 0.0,
    suffix: str = "_right",
) -> DataFrame:
    """All (left, right) pairs with the same ``by`` keys and
    ``right_ts − left_ts ∈ [lower_seconds, upper_seconds]`` — the
    interval/range join (attribution windows, sensor alignment,
    event-context joins). Spark has no native range join; a raw
    ``r.ts BETWEEN l.ts − x AND l.ts`` predicate has no equality
    component, so Catalyst plans a BroadcastNestedLoopJoin — O(N·M)
    comparisons at any scale.

    This is the bucketed EQUI-join form: with bucket width
    ``w = upper − lower``, each right row lands in its home bucket
    ``floor(ts/w)`` and each left row explodes to the two consecutive
    buckets ``b = floor((ts+lower)/w)`` and ``b+1``, which provably
    cover the length-``w`` match interval ``[ts+lower, ts+upper]``.
    Joining on ``(by…, bucket)`` therefore hits every qualifying pair
    exactly once (the right side keeps a single home bucket), and the
    exact window predicate — integer microsecond arithmetic, no
    floats — filters the ≤2× candidate surplus after the hash join.
    Cost: one shuffle per side on ``(by…, bucket)``; left row count
    ×2; skew handled like any equi-join (AQE / salting).
    """
    by = list(by)
    span = float(upper_seconds) - float(lower_seconds)
    if span <= 0:
        raise ValueError("upper_seconds must exceed lower_seconds")

    rename = {c: c + suffix for c in right.columns
              if c not in by and c in left.columns}
    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    r_ts = rename.get(right_ts, right_ts)

    # double cast goes via TIMESTAMP: TIMESTAMP_NTZ inputs (pandas/pyarrow
    # parquet default) don't cast to DOUBLE directly, and under the pinned
    # UTC session tz the re-tag preserves the wall clock.
    l_sec = F.col(left_ts).cast("timestamp").cast("double")
    r_sec = F.col(r_ts).cast("timestamp").cast("double")
    lb = F.floor((l_sec + F.lit(float(lower_seconds))) / F.lit(span))
    l = left.withColumn("__b", F.explode(F.array(lb, lb + 1)))
    r = r.withColumn("__b", F.floor(r_sec / F.lit(span)))

    delta_us = (F.unix_micros(F.col(r_ts).cast("timestamp"))
                - F.unix_micros(F.col(left_ts).cast("timestamp")))
    out = l.join(r, [*by, "__b"]).where(
        (delta_us >= F.lit(int(round(lower_seconds * 1_000_000))))
        & (delta_us <= F.lit(int(round(upper_seconds * 1_000_000))))
    )
    return out.drop("__b")


def resample_ffill(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    by: Sequence[str] = ("user_id",),
    step: str = "1 hour",
    trunc_unit: str = "hour",
) -> DataFrame:
    """Regularize an irregular time series: per ``by`` key, emit one row
    per ``step`` on the truncated [min(ts), max(ts)] span, carrying the
    most recent observed ``value_col`` forward (grid points before the
    first observation stay NULL).

    Same union-sort-carry shape as :func:`asof_join` — no grid↔series
    join at all: the per-key grid (``sequence`` + ``explode``, pure JVM)
    unions with the observations, ONE window per key ordered by
    ``(ts, side)`` forward-fills via ``last(ignorenulls)``, and the
    filter keeps grid rows. Observations sort BEFORE their grid point
    at equal timestamps, so an on-grid observation lands on its own
    grid row. Cost: one bounds agg + one window, both shuffling only on
    the key — the shape that holds when the series is 100 TB of sensor
    data (grid volume is span/step per key, independent of observation
    count).

    Callers with several observations per (key, ts) should pre-aggregate
    first (the fill is otherwise order-ambiguous between equal
    timestamps).
    """
    by = list(by)
    vtype = df.schema[value_col].dataType
    bounds = df.groupBy(*by).agg(
        F.date_trunc(trunc_unit, F.min(ts_col)).alias("__lo"),
        F.date_trunc(trunc_unit, F.max(ts_col)).alias("__hi"))
    grid = (
        bounds.select(
            *by,
            F.explode(F.sequence(
                "__lo", "__hi", F.expr(f"interval {step}"))).alias(ts_col))
        .withColumn(value_col, F.lit(None).cast(vtype))
        .withColumn("__side", F.lit(1)))
    obs = df.select(*by, ts_col, value_col).withColumn("__side", F.lit(0))
    w = (Window.partitionBy(*by)
         .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        obs.unionByName(grid)
        .withColumn("__fv", F.last(value_col, ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
        .select(*by, ts_col, F.col("__fv").alias(value_col))
    )


def scd2_snapshot(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    attr_cols: Sequence[str] = ("value",),
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change
    log: collapse consecutive records whose ``attr_cols`` are unchanged,
    then emit one row per attribute VERSION with ``valid_from`` /
    ``valid_to`` (next version's start, NULL while current) and
    ``is_current``.

    Cost: ONE shuffle on the key — change detection (lag over a struct
    of the attributes) and interval assignment (lead) are two window
    passes over the same partitioning; the filter between them removes
    no-op updates without re-exchanging. Requires ``ts_col`` unique per
    key (pre-aggregate ties first — an ambiguous ordering would make
    version boundaries nondeterministic).
    """
    key_cols, attr_cols = list(key_cols), list(attr_cols)
    reserved = {"valid_from", "valid_to", "is_current", "__prev"}
    clash = reserved & set(key_cols) | reserved & set(attr_cols) \
        | (reserved & {ts_col})
    if clash:
        raise ValueError(
            f"scd2_snapshot output reserves column names {sorted(reserved)}; "
            f"rename input column(s) {sorted(clash)} first")
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    changed = (
        df.select(*key_cols, ts_col, *attr_cols)
        .withColumn("__prev", F.lag(attrs).over(w))
        .where(F.col("__prev").isNull() | (attrs != F.col("__prev")))
        .drop("__prev")
    )
    valid_to = F.lead(ts_col).over(w)
    return (
        changed
        .withColumn("valid_to", valid_to)
        .withColumnRenamed(ts_col, "valid_from")
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    by: Sequence[str] = ("event_type",),
    order_tiebreak: Optional[str] = None,
    window: int = 20,
    min_periods: int = 5,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Flag points whose value deviates more than ``z_threshold`` sample
    standard deviations from the trailing-``window`` mean of their own
    series — the streaming-friendly outlier detector (sensor spikes,
    metric regressions, fraud velocity checks).

    The baseline window is the ``window`` rows strictly BEFORE the
    current row (``rowsBetween(-window, -1)``), so a spike never
    suppresses itself by inflating its own baseline; rows with fewer
    than ``min_periods`` prior points or zero variance are never
    flagged (warm-up and constant series produce no alerts).

    Cost: ONE shuffle on the ``by`` key (the window partition); the
    trailing mean/stddev/count all ride the same window frame, and the
    flag filter is a row-local predicate on top — the shape that holds
    when each series is billions of points (a window over a key, never
    over the whole stream). ``order_tiebreak`` (default: none) makes
    the ordering total when timestamps can collide — required for
    deterministic results on tied data.
    """
    by = list(by)
    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = (Window.partitionBy(*by).orderBy(*order)
         .rowsBetween(-int(window), -1))
    mean = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    n = F.count(value_col).over(w)
    z = (F.col(value_col) - mean) / sd
    return (
        df.withColumn("__n", n)
          .withColumn("__sd", sd)
          .withColumn("zscore", z)
          .where((F.col("__n") >= int(min_periods))
                 & (F.col("__sd") > 0)
                 & (F.abs(F.col("zscore")) > float(z_threshold)))
          .drop("__n", "__sd")
    )


def ewma(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    by: Sequence[str] = ("user_id",),
    alpha: float = 0.2,
    window: int = 20,
    order_tiebreak: Optional[str] = None,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average per series, truncated to
    the last ``window`` observations (pandas ``ewm(adjust=True)``
    weighting): ``ewma_i = Σⱼ (1−α)^j · x_{i−j} / Σⱼ (1−α)^j`` for
    ``j = 0 … min(i, window−1)``.

    The truncation is what makes this exact AND distributed: the
    infinite-history recurrence is a sequential scan, but the last-K
    form is a plain ROWS window — ``collect_list`` over the frame (K
    values, frame-ordered), one indexed ``transform`` for the weights,
    one fold for the numerator, and the closed-form geometric sum
    ``(1−(1−α)^L)/α`` for the denominator. All JVM expressions inside
    one window pass: ONE shuffle on the series key, O(K) work per row,
    no Python, no sequential dependency. With ``(1−α)^window`` ≈ 1e-2
    at the defaults, truncation error is below display precision.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    if window < 1:
        raise ValueError("window must be >= 1")
    by = list(by)
    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = (Window.partitionBy(*by).orderBy(*order)
         .rowsBetween(-(int(window) - 1), 0))
    arr = F.collect_list(F.col(value_col).cast("double")).over(w)
    decay = 1.0 - alpha
    # arr is frame-ordered (oldest first); element i of L gets weight
    # (1-a)^(L-1-i) so the current row weighs 1
    weighted = F.transform(
        arr, lambda x, i: x * F.pow(F.lit(decay), F.size(arr) - 1 - i))
    num = F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x)
    # geometric closed form; valid for the whole (0, 1] range (α = 1
    # gives (1 − 0^L)/1 = 1: only the current row weighs in)
    den = (F.lit(1.0) - F.pow(F.lit(decay), F.size(arr))) / F.lit(alpha)
    return df.withColumn(out_col, num / den)


def time_weighted_avg(df: DataFrame, value_col: str, ts_col: str,
                      by: tuple = (), tiebreak: str | None = None
                      ) -> DataFrame:
    """Per-key time-weighted average under a step (zero-order-hold)
    interpolation: each observation's value is weighted by the seconds
    until the next observation of the same key; the final observation
    (no successor) carries no weight. Returns
    ``(*by, twa, total_seconds, n_intervals)``.

    This is the telemetry-correct mean for irregularly sampled series
    (a plain AVG over-weights bursts of rapid samples). One ``lead``
    window partitioned by the key + one grouped aggregation — a single
    shuffle on the key, no global sort, no Python.
    """
    from pyspark.sql.window import Window

    if not by:
        raise ValueError("time_weighted_avg requires at least one key "
                         "column (a keyless series would need a global "
                         "single-partition sort)")
    order = [F.col(ts_col)]
    if tiebreak:
        order.append(F.col(tiebreak))
    w = Window.partitionBy(*by).orderBy(*order)
    dt = (F.lead(ts_col).over(w).cast("timestamp").cast("double")
          - F.col(ts_col).cast("timestamp").cast("double"))
    stepped = df.withColumn("__dt", dt).where(F.col("__dt").isNotNull())
    return (stepped.groupBy(*by).agg(
        (F.sum(F.col(value_col) * F.col("__dt"))
         / F.sum("__dt")).alias("twa"),
        F.sum("__dt").alias("total_seconds"),
        F.count("*").alias("n_intervals")))


def seasonal_index(df: DataFrame, value_col: str, ts_col: str,
                   by: tuple = ()) -> DataFrame:
    """Day-of-week seasonal index per series: for each
    ``(*by, dow)``, the mean value and its ratio to the series' overall
    mean — the quick seasonality profile behind staffing/traffic
    dashboards and the de-seasonalization step of forecast pipelines.
    ``dow`` is 0 = Sunday … 6 = Saturday (DuckDB ``dayofweek``
    convention; Spark's ``dayofweek() − 1``).

    Shape: ONE (key, dow) aggregation over the raw table (its only
    shuffle — sums and counts, O(1) state per cell), then the overall
    series mean is recovered from the 7-row-per-key agg table itself
    (window sums over the tiny agg, never a second scan), and the
    index is a row-local ratio.
    """
    from pyspark.sql.window import Window

    keys = list(by)
    dow = (F.dayofweek(F.col(ts_col)) - 1).alias("dow")
    cell = (df.where(F.col(value_col).isNotNull())
              .groupBy(*keys, dow)
              .agg(F.sum(value_col).alias("__s"),
                   F.count(value_col).alias("n")))
    w = Window.partitionBy(*keys) if keys else Window.partitionBy()
    overall = F.sum("__s").over(w) / F.sum("n").over(w)
    return cell.select(
        *keys, "dow", "n",
        (F.col("__s") / F.col("n")).alias("avg_value"),
        ((F.col("__s") / F.col("n")) / overall).alias("seasonal_index"))


def acf(df: DataFrame, value_col: str, order_col: str,
        lags: int = 7, by: Optional[Sequence[str]] = None
        ) -> DataFrame:
    """Sample autocorrelation function over an INTEGER-valued series:
    per (group,) lag k in 1..``lags``,

        r_k = sum_{t>k} (x_t - m)(x_{t-k} - m) / sum_t (x_t - m)^2

    with the series ordered by ``order_col`` (lag = k ROWS back; gaps
    in the time axis are the caller's densify decision). The seasonal
    / memory diagnostic a forecasting pipeline runs before choosing
    model order.

    Determinism: the covariance is expanded algebraically into exact
    integer sums — ``c_k = sum x_t*x_{t-k}``, the two partial sums,
    n, S, Q — all bigint and order-independent; every float (mean,
    numerator, denominator, r_k) is derived row-local from those
    integers, so results are bit-identical across engines. This is
    why the operator requires an integer series (counts — the usual
    ACF input in an analytics pipeline); cast upstream if needed.

    Scale shape: ONE window sort per group computes ALL ``lags`` lag
    columns (a single shuffle on the group key); one
    map-side-combined aggregation collapses each group to a single
    row of integer sums; the per-lag table is unpivoted from that row
    with ``stack`` — row-local, no further shuffle. Constant series
    (zero variance) yield NULL r_k, matching the 0/0 convention.
    """
    if lags < 1:
        raise ValueError("lags must be >= 1")
    by = list(by or [])
    w = (Window.partitionBy(*[F.col(c) for c in by])
         .orderBy(F.col(order_col))
         if by else Window.orderBy(F.col(order_col)))
    x = F.col(value_col).cast("bigint")
    cols = [x.alias("__x")]
    for k in range(1, lags + 1):
        cols.append(F.lag(x, k).over(w).alias(f"__l{k}"))
    base = df.select(*[F.col(c) for c in by], *cols)
    aggs = [
        F.count("*").cast("bigint").alias("__n"),
        F.sum("__x").cast("bigint").alias("__s"),
        F.sum(F.col("__x") * F.col("__x")).cast("bigint")
         .alias("__q"),
    ]
    for k in range(1, lags + 1):
        lk = F.col(f"__l{k}")
        aggs += [
            F.sum(F.col("__x") * lk).cast("bigint").alias(f"__c{k}"),
            F.sum(F.when(lk.isNotNull(), F.col("__x"))).cast("bigint")
             .alias(f"__shi{k}"),
            F.sum(lk).cast("bigint").alias(f"__slo{k}"),
        ]
    row = base.groupBy(*[F.col(c) for c in by]).agg(*aggs) \
        if by else base.agg(*aggs)
    m = F.col("__n").cast("double")
    mean = F.col("__s").cast("double") / m
    den = (F.col("__q").cast("double")
           - F.col("__s").cast("double") * mean)
    parts = []
    for k in range(1, lags + 1):
        num = (F.col(f"__c{k}").cast("double")
               - mean * F.col(f"__shi{k}").cast("double")
               - mean * F.col(f"__slo{k}").cast("double")
               + (F.col("__n") - F.lit(k)).cast("double")
               * mean * mean)
        parts += [F.lit(k), F.when(den > 0, num / den)]
    stacked = row.select(
        *[F.col(c) for c in by],
        F.col("__n").alias("n"),
        F.stack(F.lit(lags), *parts).alias("lag", "acf"))
    return stacked


def cusum_changepoint(df: DataFrame, value_col: str, order_col: str,
                      by: Optional[Sequence[str]] = None
                      ) -> DataFrame:
    """CUSUM changepoint estimate over an INTEGER-valued series: the
    cumulative deviation ``C_t = S_t - t * mean`` peaks (in absolute
    value) at the most likely single shift point (Page's classical
    estimator; Pettitt's location form). Per group one row
    ``(n, cp_order, max_abs_cusum, cusum_z)`` — ``cp_order`` is the
    ``order_col`` value at the peak (earliest on ties), ``cusum_z``
    the peak normalized by ``sd * sqrt(n)`` (> ~1.36 suggests a real
    shift at the 5% Kolmogorov bound).

    Determinism: running sum ``S_t`` and rank ``t`` are exact
    integers from one ordered window; mean and sd derive row-local
    from the exact (n, S, Q) integer triple, so every ``C_t`` is a
    bit-identical double; ties break on the order key.

    Scale shape: ONE sort shuffle per group (the running-sum window),
    the (n, S, Q) totals folded back via a broadcast join, then a
    map-side-combined ``max_by`` aggregation — no driver collect, no
    second sort.
    """
    by = list(by or [])
    from pyspark.sql.functions import broadcast

    from .fold import fold_scalars

    x = F.col(value_col).cast("bigint")
    w = (Window.partitionBy(*[F.col(c) for c in by])
         .orderBy(F.col(order_col))
         if by else Window.orderBy(F.col(order_col)))
    base = df.select(
        *[F.col(c) for c in by], F.col(order_col),
        F.sum(x).over(w).cast("bigint").alias("__st"),
        F.row_number().over(w).cast("bigint").alias("__t"),
        x.alias("__x"))
    tot_aggs = [
        F.count("*").cast("bigint").alias("__n"),
        F.sum("__x").cast("bigint").alias("__s"),
        F.sum(F.col("__x") * F.col("__x")).cast("bigint")
         .alias("__q")]
    if by:
        totals = base.groupBy(*[F.col(c) for c in by]).agg(*tot_aggs)
        joined = base.join(broadcast(totals), by)
    else:
        joined = fold_scalars(base, base.agg(*tot_aggs))
    n = F.col("__n").cast("double")
    mean = F.col("__s").cast("double") / n
    c_t = F.abs(F.col("__st").cast("double")
                - F.col("__t").cast("double") * mean)
    var = (F.col("__q").cast("double")
           - F.col("__s").cast("double") * mean) / n
    scored = joined.select(
        *[F.col(c) for c in by], F.col(order_col),
        c_t.alias("__c"), F.col("__n"),
        F.sqrt(var).alias("__sd"))
    pick = [F.max("__c").alias("max_abs_cusum"),
            F.min_by(F.col(order_col), F.struct(
                (-F.col("__c")).alias("c"),
                F.col(order_col).alias("o"))).alias("cp_order"),
            F.first("__n").alias("__n"),
            F.first("__sd").alias("__sd")]
    out = (scored.groupBy(*[F.col(c) for c in by]).agg(*pick)
           if by else scored.agg(*pick))
    z = F.when(
        F.col("__sd") > 0,
        F.col("max_abs_cusum")
        / (F.col("__sd") * F.sqrt(F.col("__n").cast("double"))))
    return out.select(
        *[F.col(c) for c in by],
        F.col("__n").alias("n"),
        F.col("cp_order"),
        F.col("max_abs_cusum"),
        z.alias("cusum_z"))


def ma_decompose(df: DataFrame, value_col: str, order_col: str,
                 period: int = 7, by: Optional[Sequence[str]] = None
                 ) -> DataFrame:
    """Classical additive moving-average decomposition
    (x = trend + seasonal + residual) of an INTEGER-valued series —
    the diagnostic split a forecasting pipeline runs before model
    choice (trend: centered ``period``-point moving average, full
    windows only; seasonal: the mean detrended value per cycle
    position, centered to sum to zero; residual: the remainder).
    ``period`` must be odd (7 for daily-with-weekly-cycle data); the
    cycle position is row-position based (``(row_number-1) % period``
    — gaps are the caller's densify decision, as in :func:`acf`).
    Returns the input grain plus ``(position, trend, seasonal,
    residual)``; trend/residual are NULL on the edge rows without a
    full window.

    Determinism: the trend is an exact integer window sum divided by
    ``period`` row-local; the only float accumulations are the
    per-position and global seasonal means (bounded by ``period``
    terms per group), standard round-9 territory.

    Scale shape: ONE ordered window per group serves the centered
    sum, its row count, and the cycle position; the seasonal means
    are a map-side-combined aggregation of the (group, position)
    grain joined back broadcast (bounded by groups x period); the
    global centering mean folds in the same join. No data pass
    happens twice.
    """
    if period < 3 or period % 2 == 0:
        raise ValueError("period must be an odd integer >= 3")
    by = list(by or [])
    half = period // 2
    x = F.col(value_col).cast("bigint")
    w0 = (Window.partitionBy(*[F.col(c) for c in by])
          .orderBy(F.col(order_col)) if by
          else Window.orderBy(F.col(order_col)))
    wc = w0.rowsBetween(-half, half)
    base = df.select(
        *[F.col(c) for c in by], F.col(order_col), x.alias("__x"),
        ((F.row_number().over(w0) - 1) % period).alias("position"),
        F.sum(x).over(wc).cast("bigint").alias("__wsum"),
        F.count("*").over(wc).cast("int").alias("__wn"))
    trend = F.when(F.col("__wn") == period,
                   F.col("__wsum").cast("double")
                   / F.lit(float(period)))
    base = base.withColumn("__trend", trend).withColumn(
        "__det", F.col("__x").cast("double") - F.col("__trend"))
    seas = base.where(F.col("__det").isNotNull()).groupBy(
        *[F.col(c) for c in by], F.col("position")).agg(
        F.avg("__det").alias("__s_raw"))
    wp = (Window.partitionBy(*[F.col(c) for c in by]) if by
          else Window.partitionBy())
    seas = seas.withColumn(
        "__s", F.col("__s_raw") - F.avg("__s_raw").over(wp))
    from pyspark.sql.functions import broadcast

    out = base.join(broadcast(seas.select(
        *[F.col(c) for c in by], "position", "__s")),
        [*by, "position"], "left")
    return out.select(
        *[F.col(c) for c in by], F.col(order_col),
        F.col("__x").alias(value_col), "position",
        F.col("__trend").alias("trend"),
        F.col("__s").alias("seasonal"),
        (F.col("__x").cast("double") - F.col("__trend")
         - F.col("__s")).alias("residual"))


def ljung_box(df: DataFrame, value_col: str, order_col: str,
              lags: int = 7, by: Optional[Sequence[str]] = None
              ) -> DataFrame:
    """Ljung-Box portmanteau test on :func:`acf`'s output —
    ``Q = n(n+2) Σ_{k=1..m} r_k² / (n−k)``, asymptotically chi-square
    with m df: is the series white noise, or is there autocorrelation
    at ANY lag up to ``lags``? The residual-diagnostic a forecasting
    pipeline runs after fitting (one number instead of eyeballing m
    acf bars). Per group: ``(n, lags, q_lb)``.

    Determinism: each r_k is bit-identical across engines (acf's
    exact-integer expansion); the m-term float fold is order-pinned
    by lag (``aggregate(sort_array)``, the q191 device); groups where
    acf is undefined (zero variance / n <= lag) emit NULL q_lb.

    Scale shape: acf's one window sort + one aggregation, then a
    bounded m-row-per-group fold — nothing new shuffles.
    """
    by = list(by or [])
    st = acf(df, value_col, order_col, lags=lags, by=by)
    term = (F.col("acf") * F.col("acf")
            / (F.col("n") - F.col("lag")).cast("double"))
    stk = st.select(
        *[F.col(c) for c in by], F.col("n"),
        F.col("acf").isNotNull().alias("__def"),
        F.struct(F.col("lag").alias("lag"),
                 F.coalesce(term, F.lit(0.0)).alias("term"))
         .alias("__s"))
    aggs = [
        F.max("n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("lags"),
        F.min("__def").alias("__all_def"),
        F.aggregate(F.sort_array(F.collect_list("__s")), F.lit(0.0),
                    lambda acc, x: acc + x["term"]).alias("__S"),
    ]
    g = (stk.groupBy(*[F.col(c) for c in by]).agg(*aggs)
         if by else stk.agg(*aggs))
    nd = F.col("n").cast("double")
    q_lb = F.when(F.col("__all_def"),
                  nd * (nd + 2.0) * F.col("__S"))
    return g.select(*[F.col(c) for c in by], "n", "lags",
                    q_lb.alias("q_lb"))
