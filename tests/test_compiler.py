"""SchemaCompiler plan tests against the DuckDB oracle at sf0.001 —
the integration-test layer (reference: tests/integration_tests/)."""

import pytest
from pyspark.sql import functions as F

from pandas_ai_spark.plans.compiler import (
    ResolverContext,
    SchemaCompiler,
    parse_order_by,
)
from pandas_ai_spark.schema import SemanticLayerSchema

from conftest import SF_SMOKE, sorted_rows


@pytest.fixture(scope="module")
def compiler(spark):
    ctx = ResolverContext(
        spark,
        lambda n: spark.read.parquet(f"{SF_SMOKE}/{n}.parquet"))
    return SchemaCompiler(spark, ctx)


def compile_dict(compiler, spark, d, base=None):
    schema = SemanticLayerSchema.model_validate(d)
    src = spark.read.parquet(f"{SF_SMOKE}/{base}.parquet") if base else None
    return compiler.compile(schema, source_df=src)


def test_projection_and_expression(compiler, spark, duck):
    df = compile_dict(compiler, spark, {
        "name": "t",
        "columns": [
            {"name": "o_orderkey"},
            {"name": "price_tax", "expression": "round(o_totalprice * 1.1, 2)"},
        ],
    }, base="orders")
    expected = duck.execute(
        "SELECT o_orderkey, round(o_totalprice * 1.1, 2) AS price_tax "
        "FROM orders").fetchall()
    assert sorted_rows(df) == sorted_rows(expected)


def test_group_by_agg(compiler, spark, duck):
    df = compile_dict(compiler, spark, {
        "name": "t",
        "columns": [
            {"name": "o_orderstatus"},
            {"name": "n", "expression": "count(*)"},
            {"name": "total", "expression": "round(sum(o_totalprice), 2)"},
        ],
        "group_by": ["o_orderstatus"],
    }, base="orders")
    expected = duck.execute(
        "SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice),2) "
        "AS total FROM orders GROUP BY 1").fetchall()
    assert sorted_rows(df) == sorted_rows(expected)


def test_order_by_limit(compiler, spark, duck):
    df = compile_dict(compiler, spark, {
        "name": "t",
        "columns": [{"name": "o_orderkey"}, {"name": "o_totalprice"}],
        "order_by": ["o_totalprice DESC", "o_orderkey"],
        "limit": 7,
    }, base="orders")
    expected = duck.execute(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 7").fetchall()
    assert [tuple(r) for r in df.collect()] == expected


def test_distinct(compiler, spark, duck):
    df = compile_dict(compiler, spark, {
        "name": "t",
        "transformations": [{"type": "remove_duplicates"}],
        "columns": [{"name": "o_orderstatus"}],
    }, base="orders")
    expected = duck.execute(
        "SELECT DISTINCT o_orderstatus FROM orders").fetchall()
    assert sorted_rows(df) == sorted_rows(expected)


def test_head_has_limit_no_order(compiler, spark):
    schema = SemanticLayerSchema.model_validate({
        "name": "t", "columns": [{"name": "o_orderkey"}]})
    src = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    assert compiler.head(schema, 5, source_df=src).count() == 5


def test_view_join_group(compiler, spark, duck):
    df = compile_dict(compiler, spark, {
        "name": "v",
        "view": True,
        "columns": [
            {"name": "nation.n_name"},
            {"name": "n_cust", "expression": "count(*)"},
        ],
        "relations": [
            {"from": "customer.c_nationkey", "to": "nation.n_nationkey"},
        ],
        "group_by": ["nation.n_name"],
    })
    expected = duck.execute(
        "SELECT n_name AS nation_n_name, count(*) AS n_cust FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY 1").fetchall()
    assert sorted_rows(df) == sorted_rows(expected)


def test_view_plain_columns_aliased(compiler, spark):
    df = compile_dict(compiler, spark, {
        "name": "v",
        "view": True,
        "columns": [
            {"name": "customer.c_custkey"},
            {"name": "nation.n_name"},
        ],
        "relations": [
            {"from": "customer.c_nationkey", "to": "nation.n_nationkey"},
        ],
    })
    assert df.columns == ["customer_c_custkey", "nation_n_name"]


def test_view_disconnected_join_graph_rejected(compiler, spark):
    with pytest.raises(ValueError, match="connected"):
        compile_dict(compiler, spark, {
            "name": "v",
            "view": True,
            "columns": [{"name": "customer.c_custkey"}],
            "relations": [
                {"from": "customer.c_nationkey", "to": "nation.n_nationkey"},
                {"from": "part.p_partkey", "to": "supplier.s_suppkey"},
            ],
        })


def test_parse_order_by():
    c = parse_order_by("x DESC")
    assert "DESC NULLS LAST" in str(c)
    c = parse_order_by("x")
    assert "ASC NULLS LAST" in str(c)


def test_broadcastable_view_join_plan(compiler, spark):
    """Dimension tables under the broadcast threshold must broadcast —
    the 100 TB design point: no shuffle of the fact side for small dims."""
    df = compile_dict(compiler, spark, {
        "name": "v",
        "view": True,
        "columns": [
            {"name": "nation.n_name"},
            {"name": "n", "expression": "count(*)"},
        ],
        "relations": [
            {"from": "customer.c_nationkey", "to": "nation.n_nationkey"},
        ],
        "group_by": ["nation.n_name"],
    })
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
