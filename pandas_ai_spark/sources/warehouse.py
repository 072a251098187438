"""Cloud-warehouse sources: bigquery, snowflake, databricks.

Reference parity: extensions/ee/connectors/* loader functions resolved by
name (pandasai/data_loader/sql_loader.py:65-76). Spark has first-party
connectors for all three; their jars are not present in this environment,
so construction is attempted and a clear error raised if the format is
unavailable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import Source

_FORMATS = {
    "bigquery": "bigquery",
    "snowflake": "snowflake",
    "databricks": "databricks",
}


def load_warehouse(spark: SparkSession, source: Source) -> DataFrame:
    fmt = _FORMATS[source.type]
    conn = source.connection or {}
    reader = spark.read.format(fmt)
    for k, v in conn.items():
        reader = reader.option(k, str(v))
    if source.table:
        opt = "table" if fmt != "bigquery" else "table"
        reader = reader.option(opt, source.table)
    try:
        return reader.load()
    except Exception as exc:  # connector jar absent in this environment
        raise NotImplementedError(
            f"{source.type} connector requires the spark-{fmt} jar on the "
            f"classpath (spark-submit --packages)."
        ) from exc
