"""Survival analysis: Kaplan-Meier estimator over user/entity lifetimes.

The retention counterpart to the cohort table (`events.cohort_retention`
gives per-cohort period retention; KM gives the censoring-correct
survival curve over continuous durations — the standard
churn/time-to-event estimator).

Reference parity: the reference has no survival operator; this module is
part of the training/analytics-pipeline surface (SURVEY §2.14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _risk_table(df: DataFrame, duration_col: str, event_col: str,
                op: str) -> DataFrame:
    """Shared duration-grain risk table: ``(t, n_events, n_censored,
    n_risk)`` — one duration-keyed map-side-combined aggregation plus
    the cumulative risk-set window over the post-aggregation spine.
    Validation (emptiness, negative durations, NULL/uncastable event
    flags — which would silently inflate the risk set, since ``sum``
    skips NULLs that ``count`` includes) and the subject total share
    ONE scalar-only aggregation job."""
    d = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("int")
    base = df.where(d.isNotNull()).select(d.alias("t"), e.alias("__e"))
    chk = base.agg(F.count("*").alias("n"), F.min("t").alias("mn"),
                   F.sum(F.col("__e").isNull().cast("int"))
                    .alias("bad")).collect()[0]
    total = chk["n"]
    if total == 0:
        raise ValueError(f"{op} needs a non-empty input")
    if chk["mn"] < 0:
        raise ValueError(f"{op} durations must be non-negative")
    if chk["bad"]:
        raise ValueError(
            f"{op}: {chk['bad']} rows have NULL/uncastable "
            f"{event_col!r} — drop or impute them explicitly")
    grain = base.groupBy("t").agg(
        F.sum("__e").alias("n_events"),
        F.sum(1 - F.col("__e")).alias("n_censored"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    n_risk = (F.lit(total)
              - F.coalesce(F.sum(F.col("n_events")
                                 + F.col("n_censored")).over(w),
                           F.lit(0)))
    return grain.withColumn("n_risk", n_risk)


def kaplan_meier(df: DataFrame, duration_col: str, event_col: str
                 ) -> DataFrame:
    """Kaplan-Meier product-limit survival estimate.

    Input: one row per subject with ``duration_col`` (time observed,
    any non-negative numeric) and ``event_col`` (1/true = the event
    occurred at that time, 0/false = right-censored there). Output: one
    row per DISTINCT duration with
    ``(t, n_risk, n_events, n_censored, survival)`` where ``survival``
    is ``Π_{t_i ≤ t} (1 − d_i / n_i)`` — the standard estimator
    (Kaplan & Meier 1958), matching lifelines/scikit-survival on exact
    ties (events at ``t`` leave the risk set computed BEFORE censoring
    at ``t`` is removed; both event and censored subjects at ``t``
    count in ``n_risk`` at ``t``).

    Scale shape: ONE duration-keyed aggregation collapses N subjects to
    the duration grain (d_i, c_i per distinct t — map-side combined);
    the risk set is ``total − cumsum(prior d+c)`` and the product-limit
    is ``exp(cumsum(log(1 − d/n)))``, both over the duration-grain
    table. That cumulative window is deliberately global
    (plan-audit ALLOW): its input is the post-aggregation table whose
    cardinality is DISTINCT DURATIONS (days/buckets — thousands at
    most), not subjects, so one task sees only the reduced spine even
    at 100 TB of events. Validation (emptiness, negative durations,
    NULL/uncastable event flags — which would silently inflate the
    risk set, since ``sum`` skips NULLs that ``count`` includes) and
    the subject total share ONE scalar-only aggregation job.
    Zero-duration rows are valid (events at t=0 reduce survival).
    """
    with_risk = _risk_table(df, duration_col, event_col,
                            "kaplan_meier")
    wi = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    # product-limit as exp(Σ log) — cumulative sums add in the same
    # t order in every engine, so the float result is cross-engine
    # reproducible. A factor of exactly 0 (everyone at risk dies)
    # must zero every later point explicitly: Spark's log(0) is NULL
    # (silently skipped by sum), so it is guarded on both engines by
    # a cumulative zero-seen flag instead
    factor = F.lit(1.0) - F.col("n_events") / F.col("n_risk")
    zero_seen = F.max((factor <= 0).cast("int")).over(wi)
    step = F.when(factor > 0, F.log(factor)).otherwise(F.lit(0.0))
    surv = (F.when(zero_seen == 1, F.lit(0.0))
             .otherwise(F.exp(F.sum(step).over(wi))))
    return with_risk.select(
        "t", "n_risk", "n_events", "n_censored",
        surv.alias("survival")).orderBy("t")


def nelson_aalen(df: DataFrame, duration_col: str, event_col: str
                 ) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimate — the companion to
    :func:`kaplan_meier` (same input contract): one row per distinct
    duration with ``(t, n_risk, n_events, n_censored, cum_hazard,
    hazard_var, survival_fh)`` where

    - ``cum_hazard  = sum_{t_i <= t} d_i / n_i`` (Nelson 1972,
      Aalen 1978),
    - ``hazard_var  = sum d_i / n_i^2`` (the simple Aalen variance),
    - ``survival_fh = exp(-H(t))`` — the Fleming-Harrington survival
      form, slightly above KM in small risk sets and preferred when
      reporting hazards.

    Scale shape: identical to KM — the shared duration-grain risk
    table (one map-side-combined aggregation; the cumulative window
    runs over the post-aggregation DISTINCT-DURATIONS spine, the
    documented plan-audit ALLOW) plus two cumulative sums over that
    spine. Cumulative float sums add in the same t order in every
    engine, so results are cross-engine reproducible.
    """
    with_risk = _risk_table(df, duration_col, event_col,
                            "nelson_aalen")
    wi = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    step = F.col("n_events") / F.col("n_risk")
    vstep = (F.col("n_events")
             / (F.col("n_risk") * F.col("n_risk")))
    h = F.sum(step).over(wi)
    return with_risk.select(
        "t", "n_risk", "n_events", "n_censored",
        h.alias("cum_hazard"),
        F.sum(vstep).over(wi).alias("hazard_var"),
        F.exp(-h).alias("survival_fh")).orderBy("t")
