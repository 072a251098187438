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


# --- signed zero (r12 q212: DuckDB round() preserves -0.0, Spark's
# F.round normalizes it, and the driver hashes the bit patterns) ------


def test_fold_negzero_rounds_rewriter():
    f = entry._fold_negzero_rounds
    assert f("round(s.slope, 9) AS slope") == \
        "(round(s.slope, 9) + 0.0) AS slope"
    # single-arg integer quantizers are untouched
    assert f("CAST(round(x * 100) AS BIGINT)") == \
        "CAST(round(x * 100) AS BIGINT)"
    # nested rounds rewritten at every level
    assert f("round(round(a,2)/b, 9)") == \
        "(round((round(a,2) + 0.0)/b, 9) + 0.0)"
    assert f("ROUND(sum(v), 2) AS t") == "(ROUND(sum(v), 2) + 0.0) AS t"
    # identifier suffix and quoted literals are not calls
    assert f("background(x)") == "background(x)"
    assert f("strftime(ts, 'round(')") == "strftime(ts, 'round(')"


def test_no_oracle_emits_negative_zero(con):
    """Execute every oracle at sf0.001 and assert no float output cell
    is IEEE -0.0 — the q212 class the value-hash comparator sees but
    naive == comparison does not."""
    import math

    offenders = {}
    for name, sql in entry.oracle_sql().items():
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        bad = set()
        for row in res.fetchall():
            for c, v in zip(cols, row):
                if (isinstance(v, float) and v == 0.0
                        and math.copysign(1.0, v) < 0):
                    bad.add(c)
        if bad:
            offenders[name] = sorted(bad)
    assert not offenders, (
        f"oracles emit -0.0 (driver hash mismatch vs Spark): {offenders}"
    )
