"""Semantic-layer schema → Spark DataFrame plan compiler.

Replaces the reference's SQL-text query builders (reference:
pandasai/query_builders/base_query_builder.py:25-42 and
view_query_builder.py:96-148) with a compiler that emits a *declarative
DataFrame plan* and lets Catalyst do the rest: predicate pushdown, column
pruning, join selection (broadcast vs sort-merge), partial aggregation and
AQE re-planning are all free once the plan is expressed with DataFrame ops.

Build order mirrors the reference contract:
    source → transformations (schema order) → projection/expressions →
    group_by → distinct → order_by → limit
with `head(n)` = same plan + limit(n) (no implicit order, matching
base_query_builder.py:44-59) and `count()` = df.count().

Scale notes:
- Everything stays lazy; nothing materializes until an action.
- View joins rely on Catalyst/AQE for broadcast choice; dimension tables
  below spark.sql.autoBroadcastJoinThreshold skip the shuffle entirely.
- Whole-column normalize/standardize are two-pass (scan + fold literals),
  never a global Window (which would serialize 100 TB through one task).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import (
    Column as SchemaColumn,
    SemanticLayerSchema,
    is_aggregate_expression,
)
from .transformations import apply_transformation


class ResolverContext:
    """Table-name → DataFrame resolution for foreign keys and view deps."""

    def __init__(self, spark: SparkSession,
                 resolve: Optional[Callable[[str], DataFrame]] = None):
        self.spark = spark
        self._resolve = resolve

    def resolve_table(self, name: str) -> DataFrame:
        if self._resolve is not None:
            return self._resolve(name)
        return self.spark.table(name)


def parse_order_by(item: str) -> Column:
    """Parse a raw order-by string like ``"created_at DESC"``.

    The reference passes these through verbatim to SQL
    (base_query_builder.py:36-37). NULL placement pinned to NULLS LAST,
    DuckDB's default, so limit-after-sort results agree across engines.
    """
    parts = item.strip().split()
    desc = False
    base = parts
    if parts and parts[-1].upper() in ("ASC", "DESC"):
        desc = parts[-1].upper() == "DESC"
        base = parts[:-1]
    col = F.expr(" ".join(base))
    return col.desc_nulls_last() if desc else col.asc_nulls_last()


class SchemaCompiler:
    """Compile a :class:`SemanticLayerSchema` into a DataFrame plan."""

    def __init__(self, spark: SparkSession, ctx: Optional[ResolverContext] = None):
        self.spark = spark
        self.ctx = ctx or ResolverContext(spark)

    # -- public ------------------------------------------------------------

    def compile(self, schema: SemanticLayerSchema,
                source_df: Optional[DataFrame] = None) -> DataFrame:
        if schema.view:
            df = self._build_view_input(schema)
        else:
            df = source_df if source_df is not None else self._load_source(schema)
        return self._apply_query(df, schema)

    def head(self, schema: SemanticLayerSchema, n: int = 5,
             source_df: Optional[DataFrame] = None) -> DataFrame:
        # same query, LIMIT n, no implicit order (base_query_builder.py:44-59)
        return self.compile(schema, source_df).limit(n)

    def count(self, schema: SemanticLayerSchema,
              source_df: Optional[DataFrame] = None) -> int:
        return self.compile(schema, source_df).count()

    # -- source ------------------------------------------------------------

    def _load_source(self, schema: SemanticLayerSchema) -> DataFrame:
        from ..sources import load_source
        if schema.source is None:
            raise ValueError(f"Dataset '{schema.name}' has no source")
        return load_source(self.spark, schema.source)

    # -- view composition ----------------------------------------------------

    def _build_view_input(self, schema: SemanticLayerSchema) -> DataFrame:
        """Compose view dependencies into one wide DataFrame.

        Mirrors view_query_builder.py:100-148: the first dataset named in
        ``relations`` is the base; every other dataset is joined exactly
        once, INNER, with all its equality conditions AND-ed. Columns are
        re-aliased ``table.column → table_column`` up front so downstream
        transforms/group-bys see unambiguous flat names.

        Unlike the reference we do NOT require all dependencies to share a
        source (its cross-source guard at semantic_layer_schema.py:206-226)
        — Spark joins across sources natively.
        """
        relations = schema.relations or []
        dep_order: list[str] = []

        def note(table: str):
            if table not in dep_order:
                dep_order.append(table)

        for rel in relations:
            note(rel.from_.split(".")[0])
            note(rel.to.split(".")[0])
        for col in schema.columns or []:
            if col.expression is None and "." in col.name:
                note(col.name.split(".")[0])

        def prefixed(table: str) -> DataFrame:
            df = self.ctx.resolve_table(table)
            # toDF is ONE py4j round trip; the per-column
            # F.col().alias() select was ~2 round trips per column
            # (~0.16 s per wide table at plan-build time)
            return df.toDF(*[f"{table}_{c}" for c in df.columns])

        if not dep_order:
            raise ValueError("View declares no tables")
        base_table = dep_order[0]
        joined = prefixed(base_table)
        seen = {base_table}

        # group join conditions by target table (view_query_builder.py:118-127)
        remaining = list(relations)
        while remaining:
            progressed = False
            next_remaining = []
            # pick the next table for which one side of every relation is seen
            by_target: dict[str, list] = {}
            for rel in remaining:
                ft, tt = rel.from_.split(".")[0], rel.to.split(".")[0]
                if ft in seen and tt not in seen:
                    by_target.setdefault(tt, []).append(rel)
                elif tt in seen and ft not in seen:
                    by_target.setdefault(ft, []).append(rel)
                elif ft in seen and tt in seen:
                    continue  # already joined (extra AND handled below)
                else:
                    next_remaining.append(rel)
            for target, rels in by_target.items():
                conds = []
                for rel in rels:
                    fa = rel.from_.replace(".", "_")
                    ta = rel.to.replace(".", "_")
                    conds.append(F.col(fa) == F.col(ta))
                cond = conds[0]
                for c in conds[1:]:
                    cond = cond & c
                joined = joined.join(prefixed(target), cond, "inner")
                seen.add(target)
                progressed = True
            remaining = next_remaining
            if not progressed and remaining:
                raise ValueError(
                    "View relations do not form a connected join graph"
                )
        # tables referenced only by columns (single-table views)
        for table in dep_order:
            if table not in seen:
                if len(dep_order) == 1:
                    joined = prefixed(table)
                    seen.add(table)
                else:
                    raise ValueError(f"Table '{table}' has no relation path")
        return joined

    # -- query application ---------------------------------------------------

    def _apply_query(self, df: DataFrame, schema: SemanticLayerSchema) -> DataFrame:
        flat = _flatten_names if schema.view else (lambda s: s)

        # 1. transformations in declared order; a bare remove_duplicates
        #    (no column/columns) means whole-query DISTINCT at the end
        #    (base_query_builder.py:93-103).
        whole_query_distinct = False
        for t in schema.transformations or []:
            if t.type == "remove_duplicates" and not t.params.column and not t.params.columns:
                whole_query_distinct = True
                continue
            column = flat(t.params.column) if t.params.column else None
            params = t.params
            if schema.view and params.columns:
                params = params.model_copy(
                    update={"columns": [flat(c) for c in params.columns]}
                )
            df = apply_transformation(df, t.type, column, params, self.ctx)

        # 2. projection + group-by
        if schema.columns:
            df = self._project(df, schema, flat)

        # 3. distinct / order / limit
        if whole_query_distinct:
            df = df.distinct()
        if schema.order_by:
            df = df.orderBy(*[parse_order_by(flat(s)) for s in schema.order_by])
        if schema.limit:
            df = df.limit(schema.limit)
        return df

    def _project(self, df: DataFrame, schema: SemanticLayerSchema,
                 flat: Callable[[str], str]) -> DataFrame:
        cols = schema.columns or []
        out_names: list[str] = []
        exprs: dict[str, Column] = {}       # keyed by output name
        by_input: dict[str, str] = {}       # declared input name -> output name
        agg_names: set[str] = set()
        for c in cols:
            name = flat(c.name)
            out_name = c.alias or name
            out_names.append(out_name)
            by_input[name] = out_name
            if c.expression:
                expr = F.expr(flat(c.expression) if schema.view else c.expression)
                if is_aggregate_expression(c.expression):
                    agg_names.add(out_name)
            else:
                expr = F.col(name)
            exprs[out_name] = expr.alias(out_name)

        if schema.group_by:
            group_exprs = []
            group_out: set[str] = set()
            for g in schema.group_by:
                g = flat(g)
                out = by_input.get(g, g)       # alias-aware group key
                group_exprs.append(exprs.get(out, F.col(g).alias(out)))
                group_out.add(out)
            aggs = [exprs[n] for n in out_names
                    if n in agg_names and n not in group_out]
            grouped = df.groupBy(*group_exprs).agg(*aggs) if aggs else (
                df.select(*group_exprs).distinct()
            )
            return grouped.select(*out_names)
        return df.select(*[exprs[n] for n in out_names])


def _flatten_names(s: str) -> str:
    """``table.column`` → ``table_column`` inside names and expressions
    (view alias rule, view_query_builder.py:29-32,50-59)."""
    import re
    return re.sub(r"\b([a-zA-Z_][a-zA-Z0-9_]*)\.([a-zA-Z_][a-zA-Z0-9_]*)\b",
                  r"\1_\2", s)
