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


def test_yfinance_loader_mocked_fetch(spark, monkeypatch):
    """yahoo_finance source with a mocked yfinance module: ticker/period
    flow from the Source, the pandas history frame round-trips into a
    Spark DataFrame."""
    import sys
    import types

    import pandas as pd

    calls = {}

    class _Ticker:
        def __init__(self, symbol):
            calls["symbol"] = symbol

        def history(self, period):
            calls["period"] = period
            return pd.DataFrame({
                "Date": pd.to_datetime(["2026-01-02", "2026-01-03"]),
                "Open": [101.0, 102.5],
                "Close": [102.0, 103.0],
                "Volume": [1_000, 1_200],
            }).set_index("Date")

    fake = types.ModuleType("yfinance")
    fake.Ticker = _Ticker
    monkeypatch.setitem(sys.modules, "yfinance", fake)

    from pandas_ai_spark.sources.yfinance import load_yahoo_finance

    src = Source(type="yahoo_finance", table="AAPL",
                 connection={"period": "5d"})
    df = load_yahoo_finance(spark, src)
    assert calls == {"symbol": "AAPL", "period": "5d"}
    rows = df.orderBy("Date").collect()
    assert len(rows) == 2
    assert rows[0]["Close"] == 102.0 and rows[1]["Volume"] == 1200
    assert "Date" in df.columns  # reset_index surfaced the date


def test_data_source_fails_fast():
    """`type: data` is the reference's PandaBI platform pull
    (pandasai/helpers/session.py:58-104) — a proprietary SaaS API. It must
    fail at schema validation with a message naming the dependency, and
    must never silently build a postgres JDBC URL (round-2/3 defect)."""
    with pytest.raises(ValueError, match="PandaBI"):
        Source(type="data", table="t", connection={"host": "h"})
    assert "data" not in JDBC_URL_BUILDERS


# -- live JDBC round-trip (embedded Derby — ships in Spark's jars) ---------

def test_jdbc_live_roundtrip_derby(spark, tmp_path):
    """End-to-end JDBC read against a real database: create an embedded
    Derby table through the JVM, then pull it back through
    ``load_jdbc`` with the generic raw-URL source type — proving the
    reader option plumbing against a live driver, not just option maps."""
    from pandas_ai_spark.sources.jdbc import load_jdbc

    db = str(tmp_path / "derbydb")
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(
        f"jdbc:derby:{db};create=true")
    st = conn.createStatement()
    st.execute("CREATE TABLE t_orders (id INT, status VARCHAR(10),"
               " total DOUBLE)")
    for i, (s, v) in enumerate([("O", 10.5), ("F", 20.0), ("P", 7.25)]):
        st.execute(f"INSERT INTO t_orders VALUES ({i}, '{s}', {v})")
    st.close()
    conn.close()

    src = Source(type="jdbc", table="t_orders", connection={
        "url": f"jdbc:derby:{db}",
        "driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver",
    })
    out = load_jdbc(spark, src)
    rows = {r.ID: (r.STATUS, r.TOTAL) for r in out.collect()}
    assert rows == {0: ("O", 10.5), 1: ("F", 20.0), 2: ("P", 7.25)}


def test_jdbc_live_query_pushdown_derby(spark, tmp_path):
    """`query` option runs server-side (Spark wraps it as a subquery)."""
    from pandas_ai_spark.sources.jdbc import load_jdbc

    db = str(tmp_path / "derbydb2")
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(
        f"jdbc:derby:{db};create=true")
    st = conn.createStatement()
    st.execute("CREATE TABLE ev (id INT, v DOUBLE)")
    for i in range(20):
        st.execute(f"INSERT INTO ev VALUES ({i}, {i * 1.5})")
    st.close()
    conn.close()

    src = Source(type="jdbc", connection={
        "url": f"jdbc:derby:{db}",
        "driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver",
        "query": "SELECT id, v FROM ev WHERE id < 5",
    })
    out = load_jdbc(spark, src)
    assert out.count() == 5


# -- excel fallback reader -------------------------------------------------

def _write_minimal_xlsx(path, rows, sheet="Sheet1"):
    """Hand-rolled .xlsx (zip of XML) for testing the fallback parser
    without openpyxl. Strings go through the shared-string pool, like
    real producers."""
    import zipfile

    strings: list[str] = []

    def cell(r, c, v):
        ref = f"{chr(65 + c)}{r + 1}"
        if isinstance(v, str):
            if v not in strings:
                strings.append(v)
            return (f'<c r="{ref}" t="s"><v>{strings.index(v)}</v></c>')
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if v is None:
            return f'<c r="{ref}"/>'
        return f'<c r="{ref}"><v>{v}</v></c>'

    body = "".join(
        f'<row r="{ri + 1}">'
        + "".join(cell(ri, ci, v) for ci, v in enumerate(row))
        + "</row>"
        for ri, row in enumerate(rows))
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/package/2006/relationships"
    dns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml",
                   f'<Types xmlns="http://schemas.openxmlformats.org/'
                   f'package/2006/content-types"/>')
        z.writestr("xl/workbook.xml",
                   f'<workbook xmlns="{ns}" xmlns:r="{dns}">'
                   f'<sheets><sheet name="{sheet}" sheetId="1" '
                   f'r:id="rId1"/></sheets></workbook>')
        z.writestr("xl/_rels/workbook.xml.rels",
                   f'<Relationships xmlns="{rns}">'
                   f'<Relationship Id="rId1" Type="x" '
                   f'Target="worksheets/sheet1.xml"/></Relationships>')
        z.writestr("xl/sharedStrings.xml",
                   f'<sst xmlns="{ns}">'
                   + "".join(f"<si><t>{s}</t></si>" for s in strings)
                   + "</sst>")
        z.writestr("xl/worksheets/sheet1.xml",
                   f'<worksheet xmlns="{ns}"><sheetData>{body}'
                   f'</sheetData></worksheet>')


def test_read_xlsx_fallback_parser(tmp_path):
    from pandas_ai_spark.sources.excel import list_sheets, read_xlsx

    p = str(tmp_path / "t.xlsx")
    _write_minimal_xlsx(p, [
        ["name", "qty", "price", "ok"],
        ["apple", 3, 1.5, True],
        ["pear", 7, 0.75, False],
        ["kiwi", None, 2.0, True],
    ])
    assert list_sheets(p) == ["Sheet1"]
    pdf = read_xlsx(p)
    assert list(pdf.columns) == ["name", "qty", "price", "ok"]
    assert pdf["qty"].tolist()[:2] == [3, 7]
    assert pdf["price"].tolist() == [1.5, 0.75, 2.0]
    assert pdf["ok"].tolist() == [True, False, True]
    import pandas as pd
    assert pd.isna(pdf["qty"].tolist()[2])


def test_read_excel_end_to_end(spark, tmp_path):
    """pai.read_excel lands in a Spark-backed DataFrame through the
    fallback parser (openpyxl absent in this environment)."""
    import pandas_ai_spark as pai

    p = str(tmp_path / "orders.xlsx")
    _write_minimal_xlsx(p, [
        ["id", "status"], [1, "O"], [2, "F"],
    ])
    df = pai.read_excel(p)
    rows = sorted((r["id"], r["status"]) for r in df.df.collect())
    assert rows == [(1, "O"), (2, "F")]


def test_jsonl_roundtrip(spark, tmp_path):
    """read_jsonl/write_jsonl round-trip: schema preserved with an
    explicit DDL, values intact, and the pai-level reader wraps it with
    a derived semantic schema."""
    import json

    import pandas_ai_spark as pai
    from pandas_ai_spark.sources.local import load_jsonl, write_jsonl

    src = tmp_path / "docs.jsonl"
    rows = [{"doc_id": i, "text": f"doc number {i}", "score": i / 10}
            for i in range(20)]
    src.write_text("\n".join(json.dumps(r) for r in rows))

    df = load_jsonl(spark, str(src),
                    "doc_id LONG, text STRING, score DOUBLE")
    assert df.count() == 20
    assert dict(df.dtypes) == {"doc_id": "bigint", "text": "string",
                               "score": "double"}

    out = tmp_path / "out"
    write_jsonl(df.where(df.doc_id < 5), str(out))
    back = load_jsonl(spark, str(out))
    assert back.count() == 5

    wrapped = pai.read_jsonl(str(src))
    assert wrapped.rows_count == 20 and "text" in wrapped.columns
