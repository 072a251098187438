"""Scale-safe grouped robust statistics (median / MAD / IQR).

The grouped-map form (``groupBy().applyInPandas`` with numpy medians,
q44) materializes each whole group in one Python worker — correct, but a
hot key with 10¹⁰ rows OOMs the executor, and every row crosses the
Arrow boundary. The forms here stay JVM-side and never hold a group in
memory:

- pass 1: ``percentile(value, 0.5)`` per group (Catalyst's exact
  percentile aggregates a value→count map, bounded by *distinct* values
  per group, not rows);
- join the per-group median back on the grouping key — the join and the
  second aggregation reuse the same hash partitioning, so the fact table
  shuffles at most twice end-to-end;
- pass 2: ``percentile(abs(value − med), 0.5)``.

``approx=True`` swaps in ``percentile_approx`` (GK sketch, strictly
bounded memory regardless of distinct-value count) for the truly
adversarial case of billions of distinct values inside one group.

Reference parity: the reference exposes no robust-stats operator at all
(closest is the ``scale``/``normalize`` transformations,
sql_transformation_manager.py); this module is part of the
training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pct(col, p: float, approx: bool):
    if approx:
        return F.percentile_approx(col, p, 10_000)
    return F.percentile(col, F.lit(p))


def grouped_median(df: DataFrame, group_col: str, value_col: str,
                   approx: bool = False) -> DataFrame:
    """Per-group exact (interpolated) median: ``(group, median, n)``."""
    return df.groupBy(group_col).agg(
        _pct(F.col(value_col), 0.5, approx).alias("median"),
        F.count(value_col).alias("n"),
    )


def grouped_mad(df: DataFrame, group_col: str, value_col: str,
                approx: bool = False) -> DataFrame:
    """Per-group median + median-absolute-deviation:
    ``(group, median, mad, n)``.

    Matches DuckDB ``mad()`` / numpy ``median(|x − median(x)|)``
    semantics (continuous interpolation on both passes).
    """
    med = df.groupBy(group_col).agg(
        _pct(F.col(value_col), 0.5, approx).alias("__med"),
        F.count(value_col).alias("__n"),
    ).withColumnRenamed(group_col, "__g")
    # null-safe equality: a NULL group key appears in grouped_median /
    # grouped_iqr output, so it must survive this join too (plain `=`
    # would silently drop it). Still an equi-join — same shuffle shape.
    return (
        df.join(med, F.col(group_col).eqNullSafe(F.col("__g")))
        .drop("__g")
        .groupBy(group_col)
        .agg(
            F.min("__med").alias("median"),  # constant per group
            _pct(F.abs(F.col(value_col) - F.col("__med")), 0.5,
                 approx).alias("mad"),
            F.min("__n").alias("n"),
        )
    )


def grouped_iqr(df: DataFrame, group_col: str, value_col: str,
                approx: bool = False) -> DataFrame:
    """Per-group interquartile range: ``(group, q1, q3, iqr, n)`` —
    single aggregation pass (both quartiles share one percentile
    buffer)."""
    out = df.groupBy(group_col).agg(
        _pct(F.col(value_col), 0.25, approx).alias("q1"),
        _pct(F.col(value_col), 0.75, approx).alias("q3"),
        F.count(value_col).alias("n"),
    )
    return out.withColumn("iqr", F.col("q3") - F.col("q1")) \
              .select(group_col, "q1", "q3", "iqr", "n")


def profile_exact(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact per-column table profile: one row per requested column with
    ``(column, n, nulls, n_distinct, min_s, max_s)`` — the deterministic
    complement to the sketch profile (q55): exact counts/distincts for
    datasets where the extra shuffle volume is affordable, sketches for
    100 TB. min/max are computed in the column's native type and cast to
    string AFTER aggregation (casting first would compare numerics
    lexicographically).

    ONE aggregation pass: Catalyst expands the multi-column distinct
    counts into a single Expand + partial/final agg (no joins, no
    per-column jobs); the single result row is unpivoted driver-free
    with ``stack``. Internal aliases are index-based and labels are
    ``lit`` Columns, so arbitrary column names (quotes, backticks)
    never reach a SQL string; ``nulls`` is total−non-null so an empty
    input profiles as 0, not NULL (``sum`` over zero rows is NULL).
    """
    if not cols:
        raise ValueError("profile_exact needs at least one column")
    if len(set(cols)) != len(cols):
        raise ValueError("profile_exact cols contains duplicates")
    aggs = []
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"__p{i}_n"),
            (F.count(F.lit(1)) - F.count(col)).alias(f"__p{i}_nulls"),
            F.countDistinct(col).alias(f"__p{i}_distinct"),
            F.min(col).cast("string").alias(f"__p{i}_min"),
            F.max(col).cast("string").alias(f"__p{i}_max"),
        ]
    row = df.agg(*aggs)
    parts: list = []
    for i, c in enumerate(cols):
        parts += [F.lit(c), F.col(f"__p{i}_n"), F.col(f"__p{i}_nulls"),
                  F.col(f"__p{i}_distinct"), F.col(f"__p{i}_min"),
                  F.col(f"__p{i}_max")]
    return (row.select(F.stack(F.lit(len(cols)), *parts))
            .toDF("column", "n", "nulls", "n_distinct", "min_s", "max_s"))


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations of ``cols`` in ONE aggregation
    pass: all C(n,2) ``corr`` aggregates evaluate over a single scan
    (each keeps O(1) co-moment state — no per-pair re-scan, no pivot),
    then a ``stack`` unpivot shapes the result as
    ``(col_a, col_b, corr)`` with ``col_a < col_b``.

    The profiling companion to :func:`profile_exact`: at 100 TB the
    whole matrix costs exactly one partial-agg'd pass regardless of how
    many column pairs are requested.
    """
    if len(cols) < 2:
        raise ValueError("corr_matrix needs at least two columns")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    aggs = [F.corr(F.col(a).cast("double"),
                   F.col(b).cast("double")).alias(f"__c{i}")
            for i, (a, b) in enumerate(pairs)]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{a}', '{b}', __c{i}" for i, (a, b) in enumerate(pairs))
    return wide.selectExpr(
        f"stack({len(pairs)}, {stack}) AS (col_a, col_b, corr)")


def value_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 20,
    by: list[str] | None = None,
) -> DataFrame:
    """Fixed-range histogram: bucket ``value_col`` into ``bins`` equal
    intervals over ``[lo, hi)`` (below-range clamps to bucket 0,
    ``>= hi`` to the last bucket), count per (``by``…, bucket), and
    attach the bucket edges.

    Fixed literal edges — not data-dependent min/max — keep this a pure
    single-pass projection + partial-agg'd count (no extra bounds pass)
    and make the result reproducible across engines and dataset
    versions (the property dataset-drift monitoring needs). Output:
    ``by…, bucket, lo_edge, hi_edge, n``.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if not hi > lo:
        raise ValueError("hi must exceed lo")
    width = (float(hi) - float(lo)) / bins
    raw = F.floor((F.col(value_col).cast("double") - F.lit(float(lo)))
                  / F.lit(width)).cast("int")
    bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))
    keys = list(by or [])
    out = (df.where(F.col(value_col).isNotNull())
             .groupBy(*keys, bucket.alias("bucket"))
             .agg(F.count("*").alias("n")))
    return out.select(
        *keys, "bucket",
        (F.lit(float(lo)) + F.col("bucket") * F.lit(width))
        .alias("lo_edge"),
        (F.lit(float(lo)) + (F.col("bucket") + 1) * F.lit(width))
        .alias("hi_edge"),
        "n")
