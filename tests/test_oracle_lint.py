"""Lint every rendered DuckDB oracle for driver-hash dtype hazards.

Round-7 driver verification failed q92/q107/q109 on value-hash only:
their oracles emitted uncast integer ``sum(...)`` columns, which DuckDB
types HUGEINT and pandas renders float64 while Spark emits int64.  The
fix is ``CAST(... AS BIGINT)``; this lint keeps the class from
recurring by binding (not executing) each oracle and asserting no
output column is HUGEINT.  DECIMAL is fine: DuckDB's ``.df()`` renders
it float64, matching Spark's double (q85/q94 are driver-green with
DECIMAL bucket edges).
"""

import sys

import duckdb
import pytest

sys.path.insert(0, ".")

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

BANNED = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in entry.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def output_types(con, sql):
    rel = con.sql(sql)  # lazy bind: resolves output schema, runs nothing
    return {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}


def test_lint_catches_uncast_sum(con):
    types = output_types(con, "SELECT sum(r) AS s FROM range(3) t(r)")
    assert types["s"] == "HUGEINT"  # the hazard the lint exists to catch


def test_no_oracle_emits_hugeint_or_decimal(con):
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        types = output_types(con, sql)
        bad = {c: t for c, t in types.items()
               if any(t.startswith(b) for b in BANNED)}
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emit pandas-float64-rendered integer/decimal columns "
        "(driver hash will mismatch Spark's int64): "
        f"{offenders} — CAST them to BIGINT/DOUBLE"
    )
