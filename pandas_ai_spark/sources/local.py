"""Local file sources (csv, parquet).

Reference parity: pandasai/query_builders/local_query_builder.py:13-27
(READ_CSV / READ_PARQUET pushed into DuckDB SQL). Spark's native readers
give the same pushdown plus distributed, splittable scans — a 100 TB
parquet dataset reads as ~800k independent 128 MB tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_csv(spark: SparkSession, path: str) -> DataFrame:
    # header+inferSchema matches pandas.read_csv defaults the reference
    # relies on (pandasai/__init__.py:294-297). For production-scale CSV,
    # callers should supply .schema() — inference is a full extra pass.
    return spark.read.option("header", True).option("inferSchema", True).csv(path)


def load_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
