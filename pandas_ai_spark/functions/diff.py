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


def _hashable_type(dt) -> bool:
    """True when ``xxhash64`` accepts the type: MapType is rejected by
    Spark's hash expressions anywhere in the tree (top level, array
    element, struct field)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _hashable_type(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_hashable_type(f.dataType) for f in dt.fields)
    return True


def upsert_merge(base: DataFrame, updates: DataFrame,
                 key_cols: Sequence[str], version_col: str,
                 delete_col: Optional[str] = None,
                 tiebreak_col: Optional[str] = None) -> DataFrame:
    """SCD type-1 merge (the batch equivalent of lakehouse
    ``MERGE INTO``): apply ``updates`` onto ``base``, keeping per key
    the row with the highest ``version_col`` — ties resolved in favor
    of the update side — and dropping keys whose winning update row has
    ``delete_col`` true (CDC delete markers).

    Shape: union + ONE key-partitioned row_number window (a window over
    the key, never a global sort) + rank-1 filter. At 100 TB this is a
    single hash shuffle on the merge key, exactly what the storage-layer
    MERGE would do, minus the transaction log. Output columns = base
    schema (plus nothing): the marker column is dropped after filtering.

    The deterministic (version, side) ordering makes re-runs and
    backfills idempotent — re-applying the same update batch is a
    no-op, the property CDC consumers rely on. Two UPDATE rows sharing
    both key and version (a malformed CDC batch — lakehouse MERGE INTO
    raises on it) are resolved by a last-resort tiebreak so the winner
    is stable across retries and shuffle orders: ``tiebreak_col`` when
    given (highest wins), else ``xxhash64`` of the payload's hashable
    columns (map-typed columns are excluded — Spark's hash expressions
    reject MapType) — content-determined, never
    partition-order-determined.
    """
    from pyspark.sql.window import Window

    keys = list(key_cols)
    if not keys:
        raise ValueError("upsert_merge needs at least one key column")
    cols = base.columns
    if delete_col and delete_col not in updates.columns:
        raise ValueError(f"updates has no delete column {delete_col!r}")
    if tiebreak_col and tiebreak_col not in cols:
        raise ValueError(
            f"tiebreak column {tiebreak_col!r} not in the base schema")
    b = base.select(*cols, F.lit(0).alias("__src"),
                    F.lit(False).alias("__del"))
    u = updates.select(
        *cols, F.lit(1).alias("__src"),
        (F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
         if delete_col else F.lit(False)).alias("__del"))
    if tiebreak_col:
        last_resort = [F.col(tiebreak_col).desc()]
    else:
        # xxhash64 rejects MapType (anywhere in the column's type), so
        # the content hash covers only hashable columns — a map-typed
        # CDC payload must not break every previously-working call
        hashable = [c for c in cols
                    if _hashable_type(base.schema[c].dataType)]
        last_resort = ([F.xxhash64(*[F.col(c) for c in hashable])
                        .desc()] if hashable else [])
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col("__src").desc(),
        *last_resort)
    return (b.unionByName(u)
             .withColumn("__rk", F.row_number().over(w))
             .where((F.col("__rk") == 1) & ~F.col("__del"))
             .select(*cols))
