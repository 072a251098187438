"""pandas_ai_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the pandas-ai semantic layer.

Public API mirrors the reference package surface (reference:
pandasai/__init__.py): ``read_csv`` / ``read_excel`` / ``create`` /
``load`` / ``chat`` / ``follow_up``, plus Spark-first additions
(``read_parquet``, the pipeline operators under
:mod:`pandas_ai_spark.functions`).
"""

from __future__ import annotations

from typing import Optional

from .config import (APIKeyManager, Config, ConfigManager,
                     DefaultFileManager, FileManager, load_dotenv)
from .dataframe import DataFrame
from .datasets import create, load, materialize
from .paginator import paginate
from .sandbox import RestrictedSandbox, Sandbox, SubprocessSandbox
from .docker_sandbox import DockerSandbox
from .schema import SemanticLayerSchema
from .session import get_session, stop_session
from .sql import MaliciousQueryError, SQLExecutor, sanitize_relation_name
from .vectorstore import LocalVectorStore, VectorStore
from .chromadb_store import ChromaDBStore
from .legacy import SmartDataframe, SmartDatalake
from .lancedb_store import LanceDBStore
from .milvus_store import MilvusStore
from .pinecone_store import PineconeStore
from .qdrant_store import QdrantStore

__version__ = "0.1.0"

# module-level singletons, reference pandasai/__init__.py:212-214 parity:
# pai.config.set({...}) / pai.api_key.set("...")
config = ConfigManager()
api_key = APIKeyManager()

_current_agent = None


def read_csv(filepath: str) -> DataFrame:
    """pandasai/__init__.py:294-297 parity — lazy Spark scan instead of an
    eager pandas read; table name derived from the filename."""
    from .sources.local import load_csv

    spark = get_session()
    df = load_csv(spark, filepath)
    schema = DataFrame.get_default_schema(df, sanitize_relation_name(filepath))
    return DataFrame(df, schema=schema, path=filepath)


def read_parquet(filepath: str) -> DataFrame:
    from .sources.local import load_parquet

    spark = get_session()
    df = load_parquet(spark, filepath)
    schema = DataFrame.get_default_schema(df, sanitize_relation_name(filepath))
    return DataFrame(df, schema=schema, path=filepath)


def read_jsonl(filepath: str, schema: str | None = None) -> DataFrame:
    """JSON-lines corpus scan (no reference analog — jsonl is the
    standard training-data interchange format). Lazy, splittable; pass
    a DDL ``schema`` to skip inference."""
    from .sources.local import load_jsonl

    spark = get_session()
    df = load_jsonl(spark, filepath, schema)
    schema_obj = DataFrame.get_default_schema(
        df, sanitize_relation_name(filepath))
    return DataFrame(df, schema=schema_obj, path=filepath)


def read_excel(filepath: str, sheet_name=0):
    """pandasai/__init__.py:300-318 parity. Excel is a driver-side format;
    read via pandas/openpyxl when available, else the bundled stdlib
    xlsx parser (sources/excel.py — zip-of-XML, covers values/shared
    strings/inline strings; formulas read their cached values)."""
    try:
        import pandas as pd
        pdf = pd.read_excel(filepath, sheet_name=sheet_name)
    except ImportError:
        from .sources.excel import list_sheets, read_xlsx
        if sheet_name is None:
            pdf = {n: read_xlsx(filepath, n) for n in list_sheets(filepath)}
        else:
            pdf = read_xlsx(filepath, sheet_name)
    spark = get_session()
    if isinstance(pdf, dict):
        return {
            str(k): DataFrame(
                spark.createDataFrame(v),
                schema=None, path=filepath,
            )
            for k, v in pdf.items()
        }
    return DataFrame(spark.createDataFrame(pdf), schema=None, path=filepath)


def chat(query: str, *dfs: DataFrame, **kwargs):
    """Start a new conversation over dfs (pandasai/__init__.py:209-243)."""
    global _current_agent
    from .agent import Agent

    if not dfs:
        raise ValueError("At least one DataFrame is required")
    _current_agent = Agent(list(dfs), **kwargs)
    return _current_agent.chat(query)


def follow_up(query: str):
    global _current_agent
    if _current_agent is None:
        raise RuntimeError("No existing conversation — call chat() first")
    return _current_agent.follow_up(query)


__all__ = [
    "DataFrame",
    "SemanticLayerSchema",
    "SQLExecutor",
    "MaliciousQueryError",
    "paginate",
    "Sandbox",
    "RestrictedSandbox",
    "SubprocessSandbox",
    "DockerSandbox",
    "VectorStore",
    "LocalVectorStore",
    "ChromaDBStore",
    "LanceDBStore",
    "MilvusStore",
    "PineconeStore",
    "QdrantStore",
    "SmartDataframe",
    "SmartDatalake",
    "create",
    "materialize",
    "load",
    "read_csv",
    "read_parquet",
    "read_jsonl",
    "read_excel",
    "chat",
    "follow_up",
    "get_session",
    "stop_session",
    "sanitize_relation_name",
]
