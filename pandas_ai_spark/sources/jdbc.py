"""JDBC sources: mysql, postgres, cockroachdb, sqlserver, oracle.

Reference parity: extensions/connectors/sql/pandasai_sql/__init__.py:9-81
(pymysql/psycopg2/pymssql cursor → pandas). Spark's JDBC source instead
streams the table through the executors and supports:
- query pushdown (``.option("query", sql)`` runs server-side),
- partitioned parallel reads (``partitionColumn/lowerBound/upperBound/
  numPartitions``) so a big table arrives as N concurrent range scans
  instead of one driver-side cursor.

JDBC driver jars are not bundled in this environment; the URL/plan
construction is real and unit-tested, the actual fetch needs the driver on
the classpath (standard spark-submit ``--jars``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import Source


def _mysql(c: dict) -> str:
    return f"jdbc:mysql://{c.get('host', 'localhost')}:{c.get('port', 3306)}/{c.get('database', '')}"


def _postgres(c: dict) -> str:
    return f"jdbc:postgresql://{c.get('host', 'localhost')}:{c.get('port', 5432)}/{c.get('database', '')}"


def _cockroachdb(c: dict) -> str:
    # Cockroach speaks the postgres wire protocol (reference uses psycopg2
    # for it too, pandasai_sql/__init__.py:47-63).
    return f"jdbc:postgresql://{c.get('host', 'localhost')}:{c.get('port', 26257)}/{c.get('database', '')}"


def _sqlserver(c: dict) -> str:
    return (
        f"jdbc:sqlserver://{c.get('host', 'localhost')}:{c.get('port', 1433)};"
        f"databaseName={c.get('database', '')}"
    )


def _oracle(c: dict) -> str:
    return f"jdbc:oracle:thin:@{c.get('host', 'localhost')}:{c.get('port', 1521)}/{c.get('database', '')}"


def _generic(c: dict) -> str:
    # raw-URL passthrough for any JDBC database (embedded Derby/H2/...,
    # or a dialect without a dedicated builder)
    return c["url"]


JDBC_URL_BUILDERS = {
    "mysql": _mysql,
    "postgres": _postgres,
    "cockroachdb": _cockroachdb,
    "sqlserver": _sqlserver,
    "oracle": _oracle,
    "jdbc": _generic,
}


def jdbc_options(source: Source) -> dict[str, str]:
    """Pure option-map construction (unit-testable without a JVM)."""
    conn = source.connection or {}
    opts = {
        "url": JDBC_URL_BUILDERS[source.type](conn),
        "user": str(conn.get("user", "")),
        "password": str(conn.get("password", "")),
    }
    if source.table:
        opts["dbtable"] = source.table
    # partitioned parallel read when the caller tells us how to split
    for opt in ("partitionColumn", "lowerBound", "upperBound", "numPartitions",
                "fetchsize", "query", "driver"):
        if opt in conn:
            opts[opt] = str(conn[opt])
    return opts


def build_jdbc_reader(spark: SparkSession, source: Source):
    reader = spark.read.format("jdbc")
    for k, v in jdbc_options(source).items():
        reader = reader.option(k, v)
    return reader


def load_jdbc(spark: SparkSession, source: Source) -> DataFrame:
    return build_jdbc_reader(spark, source).load()
