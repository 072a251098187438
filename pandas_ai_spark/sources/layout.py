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
