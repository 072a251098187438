"""Dataset persistence: ``create`` / ``load`` over the on-disk layout
``<root>/<org>/<name>/{schema.yaml,data.parquet}``.

Reference parity: pandasai/__init__.py:46-206 (create) and :259-291 (load)
with the loader factory at pandasai/data_loader/loader.py:38-69. Identical
directory layout and YAML contract, so reference datasets load unchanged;
execution is a lazy Spark plan instead of eager DuckDB→pandas.
"""

from __future__ import annotations

import os
import re
from typing import Optional

from pyspark.sql import SparkSession

from .dataframe import DataFrame
from .plans.compiler import ResolverContext, SchemaCompiler
from .schema import (
    Column,
    Destination,
    Relation,
    SemanticLayerSchema,
    Source,
    Transformation,
)

_PATH_RE = re.compile(r"^[a-z0-9\-]+/[a-z0-9\-_]+$")


def datasets_root() -> str:
    return os.environ.get("PANDAS_AI_SPARK_DATA", os.path.join(os.getcwd(), "datasets"))


def validate_dataset_path(path: str) -> tuple[str, str]:
    """``org/dataset`` lowercase-with-dashes (helpers/path.py semantics)."""
    if not _PATH_RE.match(path):
        raise ValueError(
            f"Dataset path must be 'org-name/dataset-name' (lowercase, "
            f"dashes): {path!r}"
        )
    org, name = path.split("/")
    return org, name


class DatasetResolver:
    """Resolve a bare dataset name to its compiled DataFrame — used by view
    compilation and validate_foreign_key (view_loader.py:43-71 parity)."""

    def __init__(self, spark: SparkSession, org: str):
        self.spark = spark
        self.org = org

    def __call__(self, name: str):
        return load(f"{self.org}/{name}", spark=self.spark).df


def _dataset_dir(path: str) -> str:
    org, name = validate_dataset_path(path)
    return os.path.join(datasets_root(), org, name)


def create(
    path: str,
    df: Optional[DataFrame] = None,
    description: Optional[str] = None,
    columns: Optional[list[dict]] = None,
    source: Optional[dict] = None,
    relations: Optional[list[dict]] = None,
    view: bool = False,
    group_by: Optional[list[str]] = None,
    transformations: Optional[list[dict]] = None,
    order_by: Optional[list[str]] = None,
    limit: Optional[int] = None,
    destination: Optional[dict] = None,
    spark: Optional[SparkSession] = None,
) -> DataFrame:
    """Persist a dataset definition (+ data for materialized frames) and
    return the loaded result (pandasai/__init__.py:46-206 contract)."""
    org, name = validate_dataset_path(path)
    # path segments allow dashes (org-name/dataset-name); the schema name
    # contract is lowercase_underscore (reference: path.py vs
    # semantic_layer_schema.py:310-314) — translate at the seam.
    name = name.replace("-", "_")
    dirpath = _dataset_dir(path)
    schema_file = os.path.join(dirpath, "schema.yaml")
    if os.path.exists(schema_file):
        raise ValueError(f"Dataset already exists at path: {path}")
    os.makedirs(dirpath, exist_ok=True)

    parsed_columns = [Column(**c) for c in columns] if columns else None
    parsed_transforms = (
        [Transformation(**t) for t in transformations] if transformations else None
    )
    parsed_relations = [Relation(**r) for r in relations] if relations else None
    parsed_dest = Destination(**destination) if destination else None

    if df is not None:
        data_path = os.path.join(dirpath, "data.parquet")
        df.df.write.mode("overwrite").parquet(data_path)
        schema = SemanticLayerSchema(
            name=name,
            description=description,
            source=Source(type="parquet", path="data.parquet"),
            columns=parsed_columns or df.schema.columns,
            transformations=parsed_transforms,
            group_by=group_by,
            order_by=order_by,
            limit=limit,
            destination=parsed_dest,
        )
    elif view:
        schema = SemanticLayerSchema(
            name=name,
            description=description,
            view=True,
            columns=parsed_columns,
            relations=parsed_relations,
            transformations=parsed_transforms,
            group_by=group_by,
            order_by=order_by,
            limit=limit,
            destination=parsed_dest,
        )
    elif source is not None:
        schema = SemanticLayerSchema(
            name=name,
            description=description,
            source=Source(**source),
            columns=parsed_columns,
            transformations=parsed_transforms,
            group_by=group_by,
            order_by=order_by,
            limit=limit,
            destination=parsed_dest,
        )
    else:
        raise ValueError("create() requires one of df=, view=True, or source=")

    with open(schema_file, "w") as f:
        f.write(schema.to_yaml())
    return load(path, spark=spark)


def materialize(path: str, spark: Optional[SparkSession] = None) -> str:
    """Execute a dataset's query and write the result to its declared
    ``destination`` (schema.yaml ``destination: {type, format, path}`` —
    reference: semantic_layer_schema.py:257-267; the sink side of the
    update_frequency refresh contract).

    Returns the output path. Relative destination paths resolve against
    the dataset directory. Format csv|parquet; mode overwrite (a refresh
    replaces the previous materialization).
    """
    df = load(path, spark=spark)
    dest = df.schema.destination
    if dest is None:
        raise ValueError(f"Dataset {path!r} declares no destination")
    out = dest.path
    if not os.path.isabs(out):
        out = os.path.join(_dataset_dir(path), out)
    writer = df.df.write.mode("overwrite")
    if dest.format == "csv":
        writer.option("header", True).csv(out)
    else:
        writer.parquet(out)
    return out


def load(path: str, spark: Optional[SparkSession] = None) -> DataFrame:
    """Load a dataset: read schema.yaml, compile, wrap
    (pandasai/__init__.py:259-291 contract)."""
    from .session import get_session

    spark = spark or get_session()
    org, _ = validate_dataset_path(path)
    dirpath = _dataset_dir(path)
    schema_file = os.path.join(dirpath, "schema.yaml")
    if not os.path.exists(schema_file):
        raise FileNotFoundError(f"Dataset not found: {path} ({schema_file})")
    with open(schema_file) as f:
        schema = SemanticLayerSchema.from_yaml(f.read())

    # local relative paths resolve against the dataset directory
    if schema.source is not None and schema.source.is_local():
        src_path = schema.source.path
        if src_path and not os.path.isabs(src_path):
            schema = schema.model_copy(deep=True)
            schema.source.path = os.path.join(dirpath, src_path)

    ctx = ResolverContext(spark, DatasetResolver(spark, org))
    compiled = SchemaCompiler(spark, ctx).compile(schema)
    return DataFrame(compiled, schema=schema, path=path)
