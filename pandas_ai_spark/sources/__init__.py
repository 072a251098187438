"""Source loaders: local files, JDBC databases, cloud warehouses.

Reference parity: pandasai/data_loader/{local_loader,sql_loader}.py and
extensions/connectors/sql/pandasai_sql/__init__.py. The reference reads
whole tables into pandas eagerly; here every loader returns a *lazy* Spark
DataFrame, so filters/projections written later in the plan push down into
the scan (parquet row groups, JDBC WHERE clauses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import Source
from .local import load_csv, load_parquet
from .jdbc import JDBC_URL_BUILDERS, load_jdbc

__all__ = ["load_source", "load_csv", "load_parquet", "load_jdbc"]


def load_source(spark: SparkSession, source: Source) -> DataFrame:
    """Dispatch a semantic-layer Source to the right Spark reader."""
    if source.type == "csv":
        return load_csv(spark, source.path)
    if source.type == "parquet":
        return load_parquet(spark, source.path)
    if source.type == "data":
        # Reference semantics: `type: data` pulls a hosted dataset from the
        # PandaBI platform API (reference: pandasai/helpers/session.py:58-104
        # — authenticated HTTP pull against app.pandabi.ai). That is a
        # proprietary SaaS endpoint with no Spark-side analog, so fail fast
        # rather than silently misrouting to a database reader.
        raise NotImplementedError(
            "source type 'data' is the PandaBI platform pull "
            "(app.pandabi.ai API); this engine has no PandaBI client. "
            "Export the dataset to parquet/csv or serve it over JDBC and "
            "declare that source type instead.")
    if source.type in JDBC_URL_BUILDERS:
        return load_jdbc(spark, source)
    if source.type == "yahoo_finance":
        from .yfinance import load_yahoo_finance
        return load_yahoo_finance(spark, source)
    if source.type in ("bigquery", "snowflake", "databricks"):
        from .warehouse import load_warehouse
        return load_warehouse(spark, source)
    raise ValueError(f"Unsupported source type: {source.type}")
