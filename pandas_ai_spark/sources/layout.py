"""Data-layout writers — the storage-side half of scan performance.

At 100 TB the fastest predicate is the one that never reads a file:
- ``write_partitioned``: hive-style directory partitioning → partition
  pruning (directories skipped by Catalyst before any IO);
- ``write_range_sorted``: range-repartition + sort-within-files on a key
  → tight per-file min/max parquet statistics, so point/range predicates
  skip whole files (row-group pruning), the poor-man's Z-order for a
  single sort key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str,
                      partition_cols: Sequence[str],
                      fmt: str = "parquet",
                      mode: str = "overwrite") -> None:
    """Hive-style partitioned layout. Keep partition cardinality sane
    (≤ ~10k directories); high-cardinality keys belong in
    ``write_range_sorted`` instead."""
    (df.write.mode(mode).format(fmt)
       .partitionBy(*partition_cols).save(path))


def write_range_sorted(df: DataFrame, path: str, sort_col: str,
                       num_files: int = 8, fmt: str = "parquet",
                       mode: str = "overwrite") -> None:
    """Range-partition by ``sort_col`` into ``num_files`` files, sorted
    within each — per-file min/max ranges are disjoint, so a filter on
    the key reads ~1/num_files of the data."""
    (df.repartitionByRange(num_files, F.col(sort_col))
       .sortWithinPartitions(sort_col)
       .write.mode(mode).format(fmt).save(path))


def write_bucketed(df: DataFrame, table: str,
                   bucket_col: str | Sequence[str],
                   num_buckets: int = 32, sort_col: str | None = None,
                   path: str | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed table layout (``bucketBy`` — requires ``saveAsTable``):
    rows are hash-distributed into ``num_buckets`` files per partition
    by ``bucket_col`` AT WRITE TIME, so a later join or aggregation on
    that key needs NO shuffle — both sides arrive pre-partitioned and
    the planner drops the Exchange entirely (asserted in
    tests/test_functions.py). This is THE repeated-join optimization at
    100 TB: pay the shuffle once when writing, never per query.
    ``sort_col`` additionally sorts within buckets (sort-merge join
    without the sort).

    For composite join keys pass ALL of them as ``bucket_col`` (list):
    the planner only keeps the bucketed scan when the bucket column set
    matches the join's clustering keys."""
    cols = ([bucket_col] if isinstance(bucket_col, str)
            else list(bucket_col))
    w = (df.write.mode(mode).format("parquet")
         .bucketBy(num_buckets, cols[0], *cols[1:]))
    if sort_col:
        w = w.sortBy(sort_col)
    if path:
        # external table: files live at ``path``, only metadata in the
        # catalog (warehouse.dir is a static conf — not settable here)
        w = w.option("path", path)
    w.saveAsTable(table)


def zorder_value(col_a, col_b, bits: int = 16):
    """Morton (Z-order) interleaving of two pre-bucketed int columns
    (each in [0, 2^bits)): bit i of each input lands at bits 2i / 2i+1
    of the output, so sorting by the result clusters rows that are
    close in BOTH dimensions. Pure JVM shift/or expression tree."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(col_a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(col_b, i).bitwiseAND(F.lit(1))
        z = (z.bitwiseOR(F.shiftleft(bit_a, 2 * i))
              .bitwiseOR(F.shiftleft(bit_b, 2 * i + 1)))
    return z


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   num_files: int = 8, bits: int = 16,
                   fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Two-dimensional data clustering (poor-man's Z-order, no Delta
    needed): each key is width-bucketed to ``bits`` bits over its
    observed min/max (one tiny agg for the bounds), the two bucket ids
    are Morton-interleaved, and the data is range-partitioned + sorted
    by the z-value. Each output file then covers a compact REGION of
    the (a, b) plane — per-file min/max parquet stats stay tight on
    BOTH columns, so predicates on either one prune files, where a
    plain sort by ``a`` leaves ``b``'s per-file span at ~100% (measured
    in tests/test_functions.py)."""
    lo_a, hi_a, lo_b, hi_b = df.select(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    span = (1 << bits) - 1

    def bucket(c, lo, hi):
        width = float(hi - lo) or 1.0
        return F.least(
            F.lit(span),
            ((F.col(c) - F.lit(lo)) / F.lit(width) * span).cast("long"))

    z = zorder_value(bucket(col_a, lo_a, hi_a),
                     bucket(col_b, lo_b, hi_b), bits)
    (df.withColumn("__z", z)
       .repartitionByRange(num_files, F.col("__z"))
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode(mode).format(fmt).save(path))
