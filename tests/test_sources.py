"""Source-layer tests: JDBC URL/plan construction (driver jars absent —
the fetch itself needs --jars, reference parity is the loader contract),
local csv, source-type validation."""

import pytest

from pandas_ai_spark.schema import Source
from pandas_ai_spark.sources.jdbc import JDBC_URL_BUILDERS, build_jdbc_reader

from conftest import SF_SMOKE


@pytest.mark.parametrize("stype,expect", [
    ("mysql", "jdbc:mysql://db.example:3307/sales"),
    ("postgres", "jdbc:postgresql://db.example:5433/sales"),
    ("cockroachdb", "jdbc:postgresql://db.example:26257/sales"),
    ("sqlserver", "jdbc:sqlserver://db.example:1434;databaseName=sales"),
    ("oracle", "jdbc:oracle:thin:@db.example:1522/sales"),
])
def test_jdbc_urls(stype, expect):
    port = int(expect.rsplit(":", 1)[-1].split("/")[0].split(";")[0])
    url = JDBC_URL_BUILDERS[stype](
        {"host": "db.example", "port": port, "database": "sales"})
    assert url == expect


def test_jdbc_reader_options(spark):
    from pandas_ai_spark.sources.jdbc import jdbc_options

    src = Source(type="postgres", table="orders", connection={
        "host": "h", "port": 5432, "database": "d", "user": "u",
        "password": "p", "partitionColumn": "id", "lowerBound": 0,
        "upperBound": 1000, "numPartitions": 8,
    })
    opts = jdbc_options(src)
    assert opts["dbtable"] == "orders"
    assert opts["numPartitions"] == "8"
    assert opts["partitionColumn"] == "id"
    assert opts["url"].startswith("jdbc:postgresql://h:5432/d")
    # the reader accepts the full option map without error
    build_jdbc_reader(spark, src)


def test_warehouse_raises_without_connector(spark):
    from pandas_ai_spark.sources.warehouse import load_warehouse

    src = Source(type="bigquery", table="t", connection={"project": "p"})
    with pytest.raises(Exception):
        load_warehouse(spark, src)


def test_local_csv_roundtrip(spark, tmp_path):
    import pandas_ai_spark as pai

    src = spark.read.parquet(f"{SF_SMOKE}/region.parquet")
    csv_path = str(tmp_path / "region_csv")
    src.write.option("header", True).mode("overwrite").csv(csv_path)
    df = pai.read_csv(csv_path)
    assert df.rows_count == src.count()
    assert df.name.startswith("region")


def test_source_type_validation():
    with pytest.raises(ValueError):
        Source(type="mongodb", path="x")
