"""Snapshot diff: what changed between two versions of a table.

Every dataset pipeline that re-materializes a table (nightly loads,
dataset releases, CDC backfills) needs the delta: which keys were
added, which disappeared, and which rows changed in place — both to
audit the load and to feed incremental consumers (the batch complement
of :func:`~pandas_ai_spark.functions.timeseries.scd2_snapshot`, which
builds history from a change LOG; this builds the change log from two
SNAPSHOTS).

Plan shape: one full-outer equi-join on the key — a single co-hashed
shuffle per side, no windows, no collects. Column comparison is a
null-safe equality per compared column evaluated row-local after the
join; the per-row list of changed columns is assembled with
``concat_ws`` over CASE-marked names, so the whole classification stays
inside whole-stage codegen. At 100 TB a snapshot diff is exactly one
sort-merge join — AQE handles skewed keys like any other join.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: change_type values, in output-enum order
ADDED, REMOVED, CHANGED, UNCHANGED = (
    "added", "removed", "changed", "unchanged")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every key across two snapshots of the same table.

    Returns one row per key present in either snapshot:
    ``keys…, change_type ∈ {added, removed, changed[, unchanged]},
    changed_cols`` (comma-joined sorted names of compared columns whose
    values differ; empty string unless ``changed``). ``added`` = key
    only in ``new``; ``removed`` = only in ``old``; comparison is
    null-safe (NULL == NULL is *not* a change).

    ``compare_cols`` defaults to every non-key column present in BOTH
    snapshots; ``include_unchanged=False`` (the default) drops
    unchanged keys so the output is the delta, not the union.
    """
    keys = list(keys)
    if not keys:
        raise ValueError("snapshot_diff needs at least one key column")
    for k in keys:
        if k not in old.columns or k not in new.columns:
            raise ValueError(f"key column {k!r} missing from a snapshot")
    if compare_cols is None:
        compare_cols = [c for c in new.columns
                        if c not in keys and c in old.columns]
    compare_cols = sorted(compare_cols)
    for c in compare_cols:
        if c not in old.columns or c not in new.columns:
            raise ValueError(f"compare column {c!r} missing from a snapshot")

    o = old.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(1).alias("__in_old"),
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols])
    n = new.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(1).alias("__in_new"),
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols])
    j = o.join(n, keys, "full_outer")

    diffs = [
        F.when(~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c))
        for c in compare_cols]
    changed_cols = F.concat_ws(",", *diffs) if diffs else F.lit("")
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit(ADDED))
         .when(F.col("__in_new").isNull(), F.lit(REMOVED))
         .when(changed_cols != "", F.lit(CHANGED))
         .otherwise(F.lit(UNCHANGED)))
    out = j.select(
        *keys,
        change_type.alias("change_type"),
        F.when(change_type == CHANGED, changed_cols)
         .otherwise(F.lit("")).alias("changed_cols"))
    if not include_unchanged:
        out = out.where(F.col("change_type") != UNCHANGED)
    return out


def diff_summary(diff: DataFrame) -> DataFrame:
    """Roll a :func:`snapshot_diff` output up to
    ``(change_type, n_keys)`` — one partial-agg'd count."""
    return diff.groupBy("change_type").agg(F.count("*").alias("n_keys"))
