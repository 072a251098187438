"""Guarded ``execute_sql_query`` — the open SQL surface.

Reference parity: pandasai/agent/base.py:137-169 (execute_sql_query),
pandasai/core/code_generation/code_cleaning.py:42-73 (table allowlist),
pandasai/helpers/sql_parser.py:75-93 (CTE-aware table extraction).

The reference substitutes table names with backing-table SQL expressions
and runs DuckDB; here every conversation table is registered once as a
Spark temp view and the query runs through ``spark.sql`` — Catalyst
resolves the views, so the "substitution" step disappears and the full
Spark SQL surface (all join types, windows, CTEs, set ops, lateral views)
is available, a superset of the reference's DuckDB dialect.

Table extraction uses Spark's own SQL parser (``parsePlan``) rather than
regex: UnresolvedRelation nodes in the parsed-but-unanalyzed plan are
exactly the external tables the query reads; CTE aliases resolve
internally and are excluded.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .sanitizer import MaliciousQueryError, is_sql_query_safe

_UNRESOLVED_RELATION_RE = re.compile(r"'UnresolvedRelation \[([^\]]+)\]")
_CTE_RE = re.compile(r"CTE \[([^\]]+)\]")


def extract_table_names(spark: SparkSession, sql: str) -> set[str]:
    """Names of external tables the query reads (CTE-aware)."""
    parser = spark._jsparkSession.sessionState().sqlParser()
    try:
        plan = parser.parsePlan(sql)
    except Exception as exc:
        raise MaliciousQueryError(f"Query failed to parse: {exc}") from exc
    tree = plan.treeString()
    tables = {
        m.group(1).split(",")[0].strip().strip("`").lower()
        for m in _UNRESOLVED_RELATION_RE.finditer(tree)
    }
    ctes: set[str] = set()
    for m in _CTE_RE.finditer(tree):
        ctes.update(n.strip().strip("`").lower() for n in m.group(1).split(","))
    return tables - ctes


class SQLExecutor:
    """Registers conversation tables as temp views and runs guarded SQL."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._allowed: set[str] = set()

    def register(self, name: str, df: DataFrame) -> None:
        """Temp-view registration (replaces DuckDBConnectionManager.register,
        duck_db_connection_manager.py:18-21)."""
        df.createOrReplaceTempView(name)
        self._allowed.add(name.lower())

    @property
    def allowed_tables(self) -> set[str]:
        return set(self._allowed)

    def execute(self, sql: str) -> DataFrame:
        if not is_sql_query_safe(sql):
            raise MaliciousQueryError(
                "The SQL query is not safe: only single SELECT statements "
                "are allowed."
            )
        referenced = extract_table_names(self.spark, sql)
        unknown = referenced - self._allowed
        if unknown:
            raise MaliciousQueryError(
                f"Query references unauthorized table(s): {sorted(unknown)}. "
                f"Allowed: {sorted(self._allowed)}"
            )
        return self.spark.sql(sql)
