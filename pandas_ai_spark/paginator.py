"""Dataset pagination with typed search, filters, and stable ordering.

Reference parity: pandasai/query_builders/paginator.py:75-204 —
page ≥ 1, page_size ≤ 100, per-column typed search predicates OR-ed
(string ILIKE %s%, numeric/bool equality, datetime equality, uuid
cast-to-text equality, :117-163), JSON filters ``{col: [vals]}`` → IN
lists AND-ed (:165-184), ``sort_by``/``sort_order``, LIMIT/OFFSET.

Spark note: LIMIT/OFFSET over an unordered distributed result is
nondeterministic, so when no sort is requested the paginator orders by
every column (a canonical total order) before applying the page window —
stable pages at any scale, at the cost of one sort of the filtered rows.
"""

from __future__ import annotations

from functools import reduce
from operator import and_, or_
from typing import Any, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_PAGE_SIZE = 100  # paginator.py page_size clamp


def _search_predicate(df: DataFrame, query: str) -> Optional[Column]:
    """OR over all columns, typed per column (paginator.py:117-163)."""
    conds: list[Column] = []
    for field in df.schema.fields:
        c = F.col(field.name)
        t = field.dataType.simpleString()
        if t == "string":
            conds.append(F.lower(c).contains(query.lower()))
        elif t in ("int", "bigint", "smallint", "tinyint", "double",
                   "float") or t.startswith("decimal"):
            try:
                num = float(query)
            except ValueError:
                continue
            conds.append(c == F.lit(num))
        elif t == "boolean":
            if query.lower() in ("true", "false"):
                conds.append(c == F.lit(query.lower() == "true"))
        elif t in ("timestamp", "date", "timestamp_ntz"):
            conds.append(c.cast("string").startswith(query))
        else:  # uuid-ish / binary / complex: text equality on the cast
            conds.append(c.cast("string") == F.lit(query))
    return reduce(or_, conds) if conds else None


def paginate(
    df: DataFrame,
    page: int = 1,
    page_size: int = 20,
    search: Optional[str] = None,
    filters: Optional[dict[str, list[Any]]] = None,
    sort_by: Optional[str] = None,
    sort_order: str = "asc",
) -> DataFrame:
    """One page of rows with deterministic ordering."""
    if page < 1:
        raise ValueError("page must be >= 1")
    page_size = min(max(int(page_size), 1), MAX_PAGE_SIZE)

    if search:
        pred = _search_predicate(df, search)
        if pred is not None:
            df = df.where(pred)
    for col, vals in (filters or {}).items():
        if col not in df.columns:
            raise ValueError(f"Unknown filter column: {col}")
        df = df.where(F.col(col).isin(list(vals)))

    if sort_by:
        if sort_by not in df.columns:
            raise ValueError(f"Unknown sort column: {sort_by}")
        order = [F.col(sort_by).desc_nulls_last()
                 if sort_order.lower() == "desc"
                 else F.col(sort_by).asc_nulls_last()]
        # tie-break on the remaining columns for full determinism
        order += [F.col(c).asc_nulls_last() for c in df.columns
                  if c != sort_by]
    else:
        order = [F.col(c).asc_nulls_last() for c in df.columns]

    start = (page - 1) * page_size
    return (
        df.orderBy(*order)
          .limit(start + page_size)   # TakeOrdered keeps only what's needed
          .offset(start)
    )
