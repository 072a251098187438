"""Thin wrapper around pyspark.sql.DataFrame carrying semantic metadata.

Reference parity: pandasai/dataframe/base.py:31-74 (pandas subclass with
``schema``/``path``) and virtual_dataframe.py:14-52. Spark DataFrames are
lazy by construction, so the reference's eager-DataFrame / VirtualDataFrame
split collapses into this one class: ``head``/``rows_count`` just trigger
small actions on the lazy plan (head is cached, matching
virtual_dataframe.py:37-40).
"""

from __future__ import annotations

import hashlib
import re
from typing import Optional

from pyspark.sql import DataFrame as SparkDataFrame

from .constants import VALID_COLUMN_TYPES
from .schema import Column, SemanticLayerSchema, Source

_SPARK_TO_PUBLIC = {
    "string": "string",
    "varchar": "string",
    "char": "string",
    "int": "integer",
    "bigint": "integer",
    "smallint": "integer",
    "tinyint": "integer",
    "long": "integer",
    "float": "float",
    "double": "float",
    "decimal": "float",
    "timestamp": "datetime",
    "timestamp_ntz": "datetime",
    "date": "datetime",
    "boolean": "boolean",
}


def public_type_for(spark_type: str) -> Optional[str]:
    """Spark type name → one of the five public types (None when unmapped,
    matching get_column_type at dataframe/base.py:157-173)."""
    base = re.sub(r"\(.*\)", "", spark_type).lower()
    return _SPARK_TO_PUBLIC.get(base)


class DataFrame:
    """Spark DataFrame + semantic schema + chat entry point."""

    def __init__(self, df: SparkDataFrame,
                 schema: Optional[SemanticLayerSchema] = None,
                 path: Optional[str] = None):
        self.df = df
        self.schema = schema or self.get_default_schema(df)
        self.path = path
        self._head_cache: Optional[SparkDataFrame] = None
        self._head_cache_n = 0

    # -- reference API surface ------------------------------------------------

    @property
    def name(self) -> str:
        return self.schema.name

    @property
    def columns(self) -> list[str]:
        return self.df.columns

    def head(self, n: int = 5):
        """First n rows as pandas (prompt serialization uses this). Cached,
        matching VirtualDataFrame._head memoization."""
        if self._head_cache is None or n > self._head_cache_n:
            if self._head_cache is not None:
                self._head_cache.unpersist()
            self._head_cache_n = max(n, 5)
            self._head_cache = self.df.limit(self._head_cache_n).cache()
        return self._head_cache.limit(n).toPandas()

    @property
    def rows_count(self) -> int:
        return self.df.count()

    @property
    def columns_count(self) -> int:
        return len(self.df.columns)

    def to_pandas(self):
        return self.df.toPandas()

    def chat(self, query: str, **kwargs):
        from .agent import Agent
        return Agent([self], **kwargs).chat(query)

    def follow_up(self, query: str):
        from .agent import Agent
        return Agent([self]).follow_up(query)

    # -- schema inference ------------------------------------------------------

    @staticmethod
    def get_default_schema(df: SparkDataFrame,
                           name: Optional[str] = None) -> SemanticLayerSchema:
        """Synthesize a schema for an ad-hoc DataFrame: parquet source named
        ``table_<md5-of-column-names>`` (dataframe/base.py:175-193)."""
        if name is None:
            digest = hashlib.md5(
                ",".join(df.columns).encode()).hexdigest()[:8]
            name = f"table_{digest}"
        cols = []
        for field in df.schema.fields:
            ptype = public_type_for(field.dataType.simpleString())
            cols.append(Column(
                name=field.name,
                type=ptype if ptype in VALID_COLUMN_TYPES else None,
            ))
        return SemanticLayerSchema(
            name=name,
            source=Source(type="parquet", path="data.parquet"),
            columns=cols,
        )

    # passthrough to the underlying Spark DataFrame for everything else
    def __getattr__(self, item):
        return getattr(self.df, item)

    def __repr__(self) -> str:
        return f"<pandas_ai_spark.DataFrame name={self.name} cols={self.columns}>"
