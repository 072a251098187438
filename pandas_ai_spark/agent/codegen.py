"""Generated-code validation and cleaning (AST passes).

Reference parity:
- pandasai/core/code_generation/code_validation.py:41-67 — the code must
  call ``execute_sql_query`` (else ExecuteSQLQueryNotUsed);
- pandasai/core/code_generation/code_cleaning.py:42-73 — every SQL string
  literal reaching execute_sql_query is checked against the table
  allowlist (unknown table → MaliciousQueryError);
- code_cleaning.py:138-182 — strip re-definitions of execute_sql_query,
  rewrite constant ``*.png`` paths into the charts directory, drop
  ``plt.show()`` calls.
"""

from __future__ import annotations

import ast
import os
import uuid

from ..constants import DEFAULT_CHART_DIRECTORY
from ..sql.sanitizer import MaliciousQueryError


class ExecuteSQLQueryNotUsed(Exception):
    """Generated code never calls execute_sql_query
    (reference: pandasai/exceptions.py)."""


class CodeExecutionError(Exception):
    """Generated code raised at exec time."""


def validate_code(code: str) -> ast.Module:
    """Parse + require an execute_sql_query call
    (code_validation.py:41-67)."""
    tree = ast.parse(code)
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Name)
                and node.func.id == "execute_sql_query"):
            return tree
    raise ExecuteSQLQueryNotUsed(
        "The code must execute SQL queries through the "
        "execute_sql_query(sql) method.")


def extract_sql_literals(tree: ast.Module) -> list[str]:
    """Constant SQL strings passed to execute_sql_query — checked against
    the allowlist before execution (code_cleaning.py:62-73). Dynamic SQL is
    still gated at run time by SQLExecutor."""
    out = []
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Name)
                and node.func.id == "execute_sql_query"):
            for arg in node.args:
                if isinstance(arg, ast.Constant) and isinstance(arg.value, str):
                    out.append(arg.value)
    return out


class _Cleaner(ast.NodeTransformer):
    def __init__(self):
        self.chart_path: str | None = None

    def visit_FunctionDef(self, node: ast.FunctionDef):
        # generated code must not shadow the provided entry point
        if node.name == "execute_sql_query":
            return None
        return self.generic_visit(node)

    def visit_Constant(self, node: ast.Constant):
        if isinstance(node.value, str) and node.value.endswith(".png"):
            if self.chart_path is None:
                self.chart_path = os.path.join(
                    DEFAULT_CHART_DIRECTORY,
                    f"temp_chart_{uuid.uuid4().hex[:12]}.png")
            return ast.copy_location(ast.Constant(self.chart_path), node)
        return node

    def visit_Expr(self, node: ast.Expr):
        # drop bare plt.show() statements (code_cleaning.py:171-182)
        v = node.value
        if (isinstance(v, ast.Call) and isinstance(v.func, ast.Attribute)
                and v.func.attr == "show"
                and isinstance(v.func.value, ast.Name)
                and v.func.value.id == "plt"):
            return None
        return self.generic_visit(node)


def clean_code(code: str, allowed_tables: set[str],
               extract_table_names=None, spark=None) -> tuple[str, str | None]:
    """Validate, allowlist-check embedded SQL, and rewrite. Returns
    (cleaned_source, chart_path_or_None)."""
    tree = validate_code(code)
    if extract_table_names is not None and spark is not None:
        for sql in extract_sql_literals(tree):
            unknown = extract_table_names(spark, sql) - allowed_tables
            if unknown:
                raise MaliciousQueryError(
                    f"Query references unauthorized table(s): "
                    f"{sorted(unknown)}. Allowed: {sorted(allowed_tables)}")
    cleaner = _Cleaner()
    new_tree = ast.fix_missing_locations(cleaner.visit(tree))
    return ast.unparse(new_tree), cleaner.chart_path
