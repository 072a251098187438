"""Semantic-layer schema — pydantic models.

Same metadata contract as the reference's semantic layer (reference:
pandasai/data_loader/semantic_layer_schema.py:46-401): a dataset is a YAML
document naming a source, declared columns (optionally computed via a SQL
expression + alias), transformations, group_by, order_by, limit, and — for
views — relations (join edges) over dependency datasets. The schema is pure
metadata and engine-agnostic; compilation to a Spark plan happens in
``pandas_ai_spark.plans``.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import yaml
from pydantic import BaseModel, Field, field_validator, model_validator

from .constants import (
    EXTENDED_COLUMN_TYPES,
    LOCAL_SOURCE_TYPES,
    REMOTE_SOURCE_TYPES,
    VALID_COLUMN_TYPES,
    VALID_TRANSFORMATION_TYPES,
)

_AGG_RE = re.compile(
    r"\b(sum|avg|mean|min|max|count|count_distinct|approx_count_distinct|"
    r"stddev|stddev_pop|stddev_samp|variance|var_pop|var_samp|median|mode|"
    r"first|last|collect_list|collect_set|percentile|percentile_approx|"
    r"corr|covar_pop|covar_samp|skewness|kurtosis|any_value)\s*\(",
    re.IGNORECASE,
)

_VIEW_COLUMN_RE = re.compile(r"^[a-zA-Z0-9_]+\.[a-zA-Z0-9_]+$")
_DATASET_NAME_RE = re.compile(r"^[a-z0-9_]+$")


def is_aggregate_expression(expression: str | None) -> bool:
    """True when the SQL expression contains an aggregate function call.

    The reference answers this with a sqlglot parse (semantic_layer_schema
    .py:316-331); we match the canonical aggregate names textually, which
    covers every function the five-type semantic layer can emit.
    """
    return bool(expression and _AGG_RE.search(expression))


class Column(BaseModel):
    name: str
    type: Optional[str] = None
    description: Optional[str] = None
    expression: Optional[str] = None
    alias: Optional[str] = None

    @field_validator("type")
    @classmethod
    def _valid_type(cls, v: Optional[str]) -> Optional[str]:
        if v is not None and v not in VALID_COLUMN_TYPES + EXTENDED_COLUMN_TYPES:
            raise ValueError(f"Invalid column type: {v}")
        return v

    @field_validator("expression")
    @classmethod
    def _valid_expression(cls, v: Optional[str]) -> Optional[str]:
        if v is None:
            return v
        # Cheap structural guard; full validation happens when the plan
        # compiler runs F.expr() (Spark's parser) on it.
        if ";" in v or "--" in v or "/*" in v:
            raise ValueError(f"Invalid expression: {v}")
        return v


class Relation(BaseModel):
    name: Optional[str] = None
    description: Optional[str] = None
    from_: str = Field(alias="from")
    to: str

    model_config = {"populate_by_name": True}


class TransformationParams(BaseModel):
    column: Optional[str] = None
    value: Optional[Any] = None
    mapping: Optional[dict] = None
    format: Optional[str] = None
    decimals: Optional[int] = None
    factor: Optional[float] = None
    to_tz: Optional[str] = None
    from_tz: Optional[str] = None
    errors: Optional[str] = None
    old_value: Optional[Any] = None
    new_value: Optional[Any] = None
    new_name: Optional[str] = None
    pattern: Optional[str] = None
    length: Optional[int] = None
    add_ellipsis: Optional[bool] = True
    width: Optional[int] = None
    side: Optional[str] = "left"
    pad_char: Optional[str] = " "
    lower: Optional[float] = None
    upper: Optional[float] = None
    bins: Optional[list] = None
    labels: Optional[list] = None
    drop_first: Optional[bool] = True
    drop_invalid: Optional[bool] = False
    start_date: Optional[str] = None
    end_date: Optional[str] = None
    country_code: Optional[str] = "+1"
    columns: Optional[list] = None
    keep: Optional[str] = "first"
    ref_table: Optional[str] = None
    ref_column: Optional[str] = None
    drop_negative: Optional[bool] = False

    model_config = {"extra": "allow"}


class Transformation(BaseModel):
    type: str
    params: Optional[TransformationParams] = None

    @field_validator("type")
    @classmethod
    def _valid_type(cls, v: str) -> str:
        if v not in VALID_TRANSFORMATION_TYPES:
            raise ValueError(f"Unsupported transformation type: {v}")
        return v

    @model_validator(mode="after")
    def _default_params(self) -> "Transformation":
        if self.params is None:
            self.params = TransformationParams()
        return self


class Source(BaseModel):
    type: str
    path: Optional[str] = None
    connection: Optional[dict] = None
    table: Optional[str] = None
    view: Optional[bool] = False

    @field_validator("type")
    @classmethod
    def _valid_type(cls, v: str) -> str:
        if v not in LOCAL_SOURCE_TYPES + REMOTE_SOURCE_TYPES:
            raise ValueError(f"Unsupported source type: {v}")
        return v

    @model_validator(mode="after")
    def _check_fields(self) -> "Source":
        if self.type in LOCAL_SOURCE_TYPES and not self.path:
            raise ValueError(f"Local source '{self.type}' requires a path")
        if self.type == "data":
            # Reference `type: data` is the PandaBI platform pull
            # (pandasai/helpers/session.py:58-104) — proprietary SaaS with
            # no Spark analog. Fail at schema validation, never misroute.
            raise ValueError(
                "source type 'data' requires the PandaBI platform API "
                "(app.pandabi.ai), which this engine does not implement; "
                "export the dataset to parquet/csv or a JDBC database and "
                "declare that source type instead")
        return self

    def is_local(self) -> bool:
        return self.type in LOCAL_SOURCE_TYPES


class Destination(BaseModel):
    type: str = "local"
    format: str = "parquet"
    path: str

    @field_validator("format")
    @classmethod
    def _valid_format(cls, v: str) -> str:
        if v not in ("csv", "parquet"):
            raise ValueError(f"Unsupported destination format: {v}")
        return v


class SemanticLayerSchema(BaseModel):
    name: str
    source: Optional[Source] = None
    view: Optional[bool] = False
    description: Optional[str] = None
    columns: Optional[list[Column]] = None
    relations: Optional[list[Relation]] = None
    order_by: Optional[list[str]] = None
    limit: Optional[int] = None
    transformations: Optional[list[Transformation]] = None
    destination: Optional[Destination] = None
    update_frequency: Optional[str] = None
    group_by: Optional[list[str]] = None

    @field_validator("name")
    @classmethod
    def _valid_name(cls, v: str) -> str:
        if not _DATASET_NAME_RE.match(v):
            raise ValueError(
                "Dataset name must be lowercase letters, digits, underscores"
            )
        return v

    @model_validator(mode="after")
    def _check_group_by(self) -> "SemanticLayerSchema":
        """SQL group-by semantics, stricter than pandas (reference:
        semantic_layer_schema.py:316-331): with group_by present, every
        non-aggregated declared column must appear in group_by and no
        aggregated column may."""
        if not self.group_by or not self.columns:
            return self
        group = set(self.group_by)
        for col in self.columns:
            name = col.name
            if is_aggregate_expression(col.expression):
                if name in group:
                    raise ValueError(
                        f"Aggregated column '{name}' must not appear in group_by"
                    )
            elif name not in group:
                raise ValueError(
                    f"Non-aggregated column '{name}' must appear in group_by"
                )
        return self

    @model_validator(mode="after")
    def _check_view(self) -> "SemanticLayerSchema":
        """View column/relation format rules (reference:
        semantic_layer_schema.py:333-394)."""
        if not self.view:
            return self
        if self.source is not None:
            raise ValueError("A view cannot declare a source")
        for col in self.columns or []:
            # plain view columns must be table.column; computed columns
            # (expression present) may use a bare output name
            if col.expression is None and not _VIEW_COLUMN_RE.match(col.name):
                raise ValueError(
                    f"View column '{col.name}' must be 'table.column'"
                )
        for rel in self.relations or []:
            for side in (rel.from_, rel.to):
                if not _VIEW_COLUMN_RE.match(side):
                    raise ValueError(
                        f"Relation endpoint '{side}' must be 'table.column'"
                    )
        tables = {
            c.name.split(".")[0]
            for c in self.columns or []
            if c.expression is None
        }
        if len(tables) > 1 and not self.relations:
            raise ValueError("A multi-table view requires relations")
        return self

    def to_yaml(self) -> str:
        return yaml.dump(
            self.model_dump(exclude_none=True, by_alias=True), sort_keys=False
        )

    @classmethod
    def from_yaml(cls, text: str) -> "SemanticLayerSchema":
        return cls.model_validate(yaml.safe_load(text))


def is_schema_source_same(a: SemanticLayerSchema, b: SemanticLayerSchema) -> bool:
    """Reference gates cross-source joins (semantic_layer_schema.py:206-226);
    Spark joins across sources natively, so callers only warn on mismatch."""
    if a.source is None or b.source is None:
        return False
    return a.source.type == b.source.type and (
        a.source.connection == b.source.connection
    )
