"""Declarative data-quality audit: referential integrity, uniqueness,
null-rate, and expression constraints as one report.

A 100 TB lakehouse load is graded before it ships: do fact-table
foreign keys resolve, are declared keys unique, do invariants hold?
Each check here is a single aggregation or anti-join — the shapes that
stay linear at any scale:

- foreign key     → LEFT ANTI join child→parent on the key (broadcast
  when the parent is a dimension, sort-merge when it isn't — Catalyst
  and AQE pick); violations = orphan row count;
- unique          → one groupBy(key) counting groups with n > 1;
- not-null / expr → one filtered count, rides the scan (predicate
  pushdown applies).

The report is a UNION of per-check single-row aggregates — each check
is an independent job stage, nothing is collected except the final
(check, violations) rows.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Check:
    """One named audit rule; ``run`` returns a 1-row
    ``(check, kind, violations)`` frame."""
    name: str
    kind: str

    def run(self) -> DataFrame:  # pragma: no cover - abstract
        raise NotImplementedError


@dataclass
class ForeignKey(Check):
    child: DataFrame = None
    child_col: str = ""
    parent: DataFrame = None
    parent_col: str = ""

    def run(self) -> DataFrame:
        orphans = self.child.where(F.col(self.child_col).isNotNull()) \
            .join(self.parent.select(
                      F.col(self.parent_col).alias(self.child_col)),
                  self.child_col, "left_anti")
        return orphans.agg(
            F.lit(self.name).alias("check"),
            F.lit(self.kind).alias("kind"),
            F.count("*").alias("violations"))


@dataclass
class Unique(Check):
    df: DataFrame = None
    cols: Sequence[str] = ()

    def run(self) -> DataFrame:
        dups = (self.df.groupBy(*self.cols)
                .agg(F.count("*").alias("__n"))
                .where(F.col("__n") > 1))
        return dups.agg(
            F.lit(self.name).alias("check"),
            F.lit(self.kind).alias("kind"),
            F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
             .cast("long").alias("violations"))


@dataclass
class Expression(Check):
    """Counts rows where ``expr`` (a SQL boolean) is NOT satisfied —
    covers not-null (``col IS NOT NULL``), ranges, and cross-column
    invariants."""
    df: DataFrame = None
    expr: str = ""

    def run(self) -> DataFrame:
        bad = self.df.where(~F.coalesce(F.expr(self.expr), F.lit(False)))
        return bad.agg(
            F.lit(self.name).alias("check"),
            F.lit(self.kind).alias("kind"),
            F.count("*").alias("violations"))


def foreign_key(name: str, child: DataFrame, child_col: str,
                parent: DataFrame, parent_col: str) -> Check:
    return ForeignKey(name, "foreign_key", child, child_col,
                      parent, parent_col)


def unique(name: str, df: DataFrame, cols: Sequence[str]) -> Check:
    return Unique(name, "unique", df, list(cols))


def expression(name: str, df: DataFrame, expr: str) -> Check:
    return Expression(name, "expression", df, expr)


def not_null(name: str, df: DataFrame, col: str) -> Check:
    return Expression(name, "not_null", df, f"{col} IS NOT NULL")


def integrity_audit(checks: Sequence[Check],
                    spark: Optional[SparkSession] = None) -> DataFrame:
    """Run every check and union the single-row results into one
    ``(check, kind, violations)`` report, in the caller's check order
    plus a stable name sort key for deterministic output."""
    if not checks:
        raise ValueError("integrity_audit needs at least one check")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError("check names must be unique")
    out = checks[0].run()
    for c in checks[1:]:
        out = out.unionByName(c.run())
    return out


def k_anonymity(df: DataFrame, qi_cols: Sequence[str],
                k: int = 5) -> DataFrame:
    """k-anonymity audit over a quasi-identifier column set: one
    summary row ``(n_rows, n_classes, min_class_size, n_small_classes,
    n_rows_at_risk, pct_at_risk)`` where an equivalence class is a
    distinct ``qi_cols`` combination and "at risk" means its class
    has fewer than ``k`` members (Sweeney's re-identification bound —
    the privacy gate a training pipeline runs before releasing
    tabular data).

    Scale shape: ONE hash aggregation on the quasi-identifier key
    (partial/final — map-side combine makes the shuffle the distinct
    class count, not the row count) followed by a scalar rollup of
    the tiny class table. NULLs form their own class, matching SQL
    GROUP BY semantics.
    """
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    if k < 2:
        raise ValueError("k must be >= 2")
    classes = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count("*").alias("__n"))
    small = F.col("__n") < k
    return classes.agg(
        F.sum("__n").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_classes"),
        F.min("__n").cast("bigint").alias("min_class_size"),
        F.sum(small.cast("bigint")).alias("n_small_classes"),
        F.sum(F.when(small, F.col("__n")).otherwise(F.lit(0)))
         .cast("bigint").alias("n_rows_at_risk"),
    ).withColumn(
        "pct_at_risk",
        F.col("n_rows_at_risk") / F.col("n_rows"))


def t_closeness(df: DataFrame, qi_cols: Sequence[str],
                sensitive_col: str, t: float = 0.2) -> DataFrame:
    """t-closeness audit — the third privacy gate after
    :func:`k_anonymity` and :func:`l_diversity`: a diverse class can
    still leak when its sensitive-value DISTRIBUTION differs sharply
    from the corpus-wide one (Li et al.'s skewness attack), so this
    measures, per quasi-identifier equivalence class, the total
    variation distance between the class's sensitive distribution and
    the global distribution (TVD = the Earth Mover's Distance under
    the uniform ground metric — the categorical-attribute form of the
    original paper). One summary row ``(n_rows, n_classes, max_tvd,
    n_far_classes, n_rows_at_risk, pct_at_risk)`` where "far" means
    TVD > ``t``.

    Determinism: the per-class distance is accumulated as the EXACT
    integer ``sum |n_cell*N - n_g*N_class|`` (order-independent bigint
    sum; every float is derived row-local from that one integer), so
    the result is bit-identical to any SQL engine running the same
    arithmetic — no float-summation-order drift.

    Scale shape: the (qi, sensitive) cell counts are ONE map-side
    combined aggregation (shuffle bounded by distinct cells); the
    global sensitive distribution is a rollup of that same cell table
    (no second scan) and is broadcast back onto the cells as a
    null-safe equi HASH join. Sensitive values ABSENT from a class
    are never materialized: algebraically each missing cell
    contributes exactly ``n_g * N_class`` to the integer distance
    sum, so ``sum_abs = sum_present(|n_cell*N - n_g*N_class|
    - n_g*N_class) + N*N_class`` — the class x sensitive-value
    expansion (and its nested-loop join) drops out entirely.
    """
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    if not (0.0 < t < 1.0):
        raise ValueError("t must be in (0, 1)")
    from pyspark.sql.functions import broadcast

    from .fold import fold_scalars

    qi = [F.col(c) for c in qi_cols]
    cells = df.groupBy(*qi, F.col(sensitive_col)).agg(
        F.count("*").alias("__n_cell"))
    classes = cells.groupBy(*qi).agg(
        F.sum("__n_cell").cast("bigint").alias("__n_class"))
    gdist = cells.groupBy(F.col(sensitive_col).alias("__s")).agg(
        F.sum("__n_cell").cast("bigint").alias("__n_g"))
    gdist = fold_scalars(
        gdist, gdist.agg(F.sum("__n_g").cast("bigint")
                         .alias("__n_total")))
    # both joins null-safe: NULL qi values form their own class, a
    # NULL sensitive value is its own cell — each must still match.
    # cells->classes is co-partitioned on the qi key (the groupBy
    # outputs); cells->gdist is a broadcast hash join.
    ccond = F.lit(True)
    for c in qi_cols:
        ccond = ccond & F.col(c).eqNullSafe(F.col(f"__c_{c}"))
    joined = (cells
              .join(classes.select(
                        *[F.col(c).alias(f"__c_{c}")
                          for c in qi_cols], "__n_class"),
                    ccond)
              .join(broadcast(gdist),
                    F.col(sensitive_col).eqNullSafe(F.col("__s")))
              .drop("__s", *[f"__c_{c}" for c in qi_cols]))
    # sum over PRESENT cells of (|n_cell*N - n_g*N_class|
    # - n_g*N_class); the absent-cell mass N*N_class is added back
    # below — exact integer algebra, no expansion join
    term = (F.abs(F.col("__n_cell").cast("bigint")
                  * F.col("__n_total")
                  - F.col("__n_g") * F.col("__n_class"))
            - F.col("__n_g") * F.col("__n_class"))
    per_class = joined.groupBy(*qi).agg(
        F.first("__n_class").alias("__n_class"),
        F.first("__n_total").alias("__n_total"),
        F.sum(term).cast("bigint").alias("__sum_present"))
    per_class = per_class.withColumn(
        "__sum_abs",
        (F.col("__sum_present")
         + F.col("__n_total") * F.col("__n_class")).cast("bigint"))
    tvd = (F.col("__sum_abs").cast("double")
           / (2.0 * F.col("__n_class").cast("double")
              * F.col("__n_total").cast("double")))
    far = tvd > F.lit(float(t))
    return per_class.agg(
        F.sum("__n_class").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_classes"),
        F.max(tvd).alias("max_tvd"),
        F.sum(far.cast("bigint")).alias("n_far_classes"),
        F.sum(F.when(far, F.col("__n_class")).otherwise(F.lit(0)))
         .cast("bigint").alias("n_rows_at_risk"),
    ).withColumn("pct_at_risk",
                 F.col("n_rows_at_risk") / F.col("n_rows"))


def l_diversity(df: DataFrame, qi_cols: Sequence[str],
                sensitive_col: str, l: int = 2) -> DataFrame:
    """l-diversity audit — the companion gate to :func:`k_anonymity`:
    a k-anonymous class is still disclosive when every member shares
    the same SENSITIVE value (Machanavajjhala et al.'s homogeneity
    attack), so this measures, per quasi-identifier equivalence
    class, how many distinct sensitive values it contains. One
    summary row ``(n_rows, n_classes, min_diversity, n_low_classes,
    n_rows_at_risk, pct_at_risk, min_entropy)`` where "low" means
    fewer than ``l`` distinct sensitive values and ``min_entropy`` is
    the worst class's sensitive-value Shannon entropy in nats
    (entropy l-diversity requires >= ln(l)).

    Scale shape: TWO chained hash aggregations, both map-side
    combined — (qi, sensitive) cell counts (shuffle bounded by the
    distinct cell count, not rows), then a qi-keyed rollup computing
    class size, distinct-sensitive count, and entropy from the cell
    counts alone via ``H = ln(N) - sum(n*ln n)/N`` — no window, no
    second scan of the data. NULL sensitive values form their own
    cell, matching GROUP BY semantics.
    """
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    if l < 2:
        raise ValueError("l must be >= 2")
    cells = df.groupBy(
        *[F.col(c) for c in qi_cols], F.col(sensitive_col)).agg(
        F.count("*").alias("__n"))
    n = F.col("__n").cast("double")
    classes = cells.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.sum("__n").alias("__rows"),
        F.count("*").alias("__div"),
        (F.sum(n * F.log(n))).alias("__nlogn"))
    rows = F.col("__rows").cast("double")
    entropy = F.log(rows) - F.col("__nlogn") / rows
    low = F.col("__div") < l
    return classes.agg(
        F.sum("__rows").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_classes"),
        F.min("__div").cast("bigint").alias("min_diversity"),
        F.sum(low.cast("bigint")).alias("n_low_classes"),
        F.sum(F.when(low, F.col("__rows")).otherwise(F.lit(0)))
         .cast("bigint").alias("n_rows_at_risk"),
        F.min(entropy).alias("min_entropy"),
    ).withColumn("pct_at_risk",
                 F.col("n_rows_at_risk") / F.col("n_rows"))


def dp_release(df: DataFrame, group_cols: Sequence[str],
               epsilon: float = 1.0,
               value_col: Optional[str] = None,
               clip: float = 0.0,
               seed: str = "dp",
               release_id: Optional[str] = None) -> DataFrame:
    """Differentially-private release of per-group statistics via the
    Laplace mechanism (Dwork et al., TCC'06) — the RELEASE step that
    follows this module's privacy AUDITS (:func:`k_anonymity` /
    :func:`l_diversity` / :func:`t_closeness` gate whether to
    release; this adds the calibrated noise when you do). Per group:
    ``n_noisy`` = count + Laplace(1/ε_c) and, when ``value_col`` is
    given, ``sum_noisy`` = the per-row ``[-clip, clip]``-clipped sum
    + Laplace(Δ/ε_s); the budget splits evenly across the
    released statistics (sequential composition), so each release is
    ε-DP overall. ``clip`` bounds per-row contribution and must be
    positive when ``value_col`` is set. Because each clipped value is
    quantized to integer cents with half-up rounding BEFORE summing,
    a row can contribute up to ``round(clip·100)/100 ≥ clip`` — so
    the noise scale is calibrated to the post-rounding L1
    sensitivity ``Δ = max(1, floor(clip·100 + 0.5)) / 100`` (equal to
    ``clip`` whenever clip is a whole number of cents), not to the
    nominal ``clip``.

    Determinism (the bootstrap_ci uniform device): the Laplace draw
    is the inverse CDF ``-b·sign(u-½)·ln(1-2|u-½|)`` of an exact
    md5-derived 32-bit uniform ``u = (h+½)/2³²`` keyed on
    ``(seed, group, statistic)`` — engine-portable and never exactly
    ½, so the log argument is always positive. The clipped sum
    accumulates in integer cents (exact bigint, order-independent);
    only the final noise add is float. Seeded noise is for
    REPRODUCIBILITY of a given release; publishing the seed alongside
    the output voids the DP guarantee, exactly like publishing the
    noise itself. The same caveat applies to REPEATED releases: two
    releases over changed data under the same ``(seed, release_id)``
    reuse identical noise draws, so their difference reveals the
    exact count/sum delta noise-free — pass a fresh ``release_id``
    (folded into the hash key) or a fresh ``seed`` for every release
    of evolving data.

    Scale shape: ONE map-side-combined aggregation on the group key
    (shuffle bounded by group count); noise is a row-local expression
    over the bounded group table. No collect, no second pass.
    """
    group_cols = list(group_cols)
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if epsilon <= 0:
        raise ValueError("epsilon must be > 0")
    if value_col is not None and clip <= 0:
        raise ValueError("clip must be > 0 when value_col is set")
    n_stats = 2 if value_col is not None else 1
    eps_each = float(epsilon) / n_stats
    key = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))
               for c in group_cols])
    seed_key = seed if release_id is None else f"{seed}#{release_id}"

    def laplace(tag: str, b: float):
        h = F.md5(F.concat_ws(":", F.lit(seed_key), key, F.lit(tag)))
        u = ((F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
              .cast("double") + F.lit(0.5)) / F.lit(4294967296.0))
        c = u - F.lit(0.5)
        return (F.lit(-float(b)) * F.signum(c)
                * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(c)))

    aggs = [F.count("*").cast("bigint").alias("__n")]
    if value_col is not None:
        v = F.col(value_col).cast("double")
        clipped = F.least(F.greatest(v, F.lit(-float(clip))),
                          F.lit(float(clip)))
        # integer-cents accumulation: exact, order-independent
        aggs.append(F.sum(F.round(clipped * 100).cast("bigint"))
                    .alias("__s100"))
    g = df.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)
    out = g.withColumn(
        "n_noisy", F.col("__n").cast("double")
        + laplace("count", 1.0 / eps_each))
    if value_col is not None:
        # post-rounding L1 sensitivity: half-up cent quantization lets
        # a row contribute up to this, not the nominal clip
        sens = max(1, math.floor(float(clip) * 100 + 0.5)) / 100.0
        out = out.withColumn(
            "sum_noisy", F.col("__s100").cast("double") / F.lit(100.0)
            + laplace("sum", sens / eps_each))
    return out.drop("__n", "__s100") if value_col is not None \
        else out.drop("__n")
