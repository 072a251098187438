"""Schema validation tests — mirrors the reference's pydantic acceptance/
rejection suites (tests/unit_tests/data_loader/test_semantic_layer_schema.py
and test_transformation_schema.py)."""

import pytest

from conftest import SF_SMOKE

from pandas_ai_spark.schema import (
    Column,
    SemanticLayerSchema,
    Source,
    Transformation,
    is_aggregate_expression,
)


def test_valid_minimal_schema():
    s = SemanticLayerSchema(
        name="sales", source=Source(type="parquet", path="data.parquet"))
    assert s.name == "sales"


def test_bad_name_rejected():
    with pytest.raises(ValueError):
        SemanticLayerSchema(
            name="Bad-Name",
            source=Source(type="parquet", path="p"))


def test_bad_column_type_rejected():
    with pytest.raises(ValueError):
        Column(name="x", type="tensor")


def test_extended_types_accepted():
    assert Column(name="e", type="array_float").type == "array_float"


def test_bad_transformation_rejected():
    with pytest.raises(ValueError):
        Transformation(type="explode_everything")


def test_local_source_needs_path():
    with pytest.raises(ValueError):
        Source(type="csv")


def test_group_by_rules():
    # non-aggregated column missing from group_by → error
    with pytest.raises(ValueError, match="must appear in group_by"):
        SemanticLayerSchema(
            name="t",
            source=Source(type="parquet", path="p"),
            columns=[
                Column(name="a"),
                Column(name="total", expression="sum(x)"),
            ],
            group_by=["b"],
        )
    # aggregated column inside group_by → error
    with pytest.raises(ValueError, match="must not appear"):
        SemanticLayerSchema(
            name="t",
            source=Source(type="parquet", path="p"),
            columns=[Column(name="total", expression="sum(x)")],
            group_by=["total"],
        )


def test_view_requires_table_column_names():
    with pytest.raises(ValueError, match="table.column"):
        SemanticLayerSchema(
            name="v", view=True, columns=[Column(name="plain")])


def test_view_multi_table_needs_relations():
    with pytest.raises(ValueError, match="requires relations"):
        SemanticLayerSchema(
            name="v", view=True,
            columns=[Column(name="a.x"), Column(name="b.y")])


def test_yaml_roundtrip():
    s = SemanticLayerSchema(
        name="sales",
        source=Source(type="parquet", path="data.parquet"),
        columns=[Column(name="a", type="integer")],
        group_by=None,
    )
    assert SemanticLayerSchema.from_yaml(s.to_yaml()) == s


def test_is_aggregate_expression():
    assert is_aggregate_expression("sum(x)")
    assert is_aggregate_expression("round(AVG(price), 2)")
    assert not is_aggregate_expression("x + 1")
    assert not is_aggregate_expression(None)
    assert not is_aggregate_expression("summary_col + 1")


def test_create_with_destination_and_materialize(spark, tmp_path, monkeypatch):
    """destination sink (semantic_layer_schema.py:257-267 parity):
    create declares it, materialize() executes the query and writes it."""
    import pandas_ai_spark as pai

    monkeypatch.setenv("PANDAS_AI_SPARK_DATA", str(tmp_path))
    src = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    df = pai.DataFrame(src, schema=pai.DataFrame.get_default_schema(src, "orders"))
    pai.create("acme/orders-agg", df=df,
               columns=[{"name": "o_orderstatus"},
                        {"name": "n", "expression": "count(*)"}],
               group_by=["o_orderstatus"],
               destination={"type": "local", "format": "parquet",
                            "path": "out.parquet"})
    out = pai.materialize("acme/orders-agg")
    assert out.endswith("out.parquet")
    back = spark.read.parquet(out)
    assert back.count() == 3
    assert set(back.columns) == {"o_orderstatus", "n"}


def test_materialize_without_destination_raises(spark, tmp_path, monkeypatch):
    import pandas_ai_spark as pai

    monkeypatch.setenv("PANDAS_AI_SPARK_DATA", str(tmp_path))
    src = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    df = pai.DataFrame(src, schema=pai.DataFrame.get_default_schema(src, "orders"))
    pai.create("acme/no-dest", df=df)
    with pytest.raises(ValueError, match="destination"):
        pai.materialize("acme/no-dest")
