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


def load_jsonl(spark: SparkSession, path: str,
               schema: str | None = None) -> DataFrame:
    """JSON-lines scan — the de-facto interchange format for training
    corpora (one JSON doc per line; splittable, so a 100 TB corpus
    scans as independent line-range tasks). Schema inference reads a
    sample pass; production callers pass an explicit ``schema`` DDL
    string to skip it and to pin types across shards."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite",
                compression: str | None = None) -> None:
    """JSON-lines sink; pass ``compression='gzip'/'zstd'`` for
    wire-friendly shards."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
