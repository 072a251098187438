"""v2-compat legacy shims: SmartDataframe / SmartDatalake.

Reference parity: pandasai/smart_dataframe/__init__.py:16-160 and
pandasai/smart_datalake/__init__.py:13-110 — deprecated wrapper classes
around :class:`~.agent.Agent` kept so v2 notebooks keep running
("SmartDataframe will soon be deprecated. Please use df.chat()
instead."). Construction emits the same banner-style DeprecationWarning;
``chat``/``follow_up`` delegate to one underlying Agent; the last_*
inspection properties pass through.

Input flexibility matches the reference's ``load_df``: a
:class:`~.dataframe.DataFrame`, a Spark DataFrame, or a pandas
DataFrame (converted through the active SparkSession) — anything else
raises the reference's ValueError.
"""

from __future__ import annotations

import warnings
from typing import List, Optional

from .agent import Agent
from .dataframe import DataFrame

_DEPRECATION_TMPL = (
    "\n" + "*" * 80 + "\n"
    "DEPRECATION WARNING:\n"
    "{cls} will soon be deprecated. Please use df.chat() instead.\n"
    + "*" * 80 + "\n"
)


def _warn_deprecated(cls_name: str) -> None:
    warnings.warn(_DEPRECATION_TMPL.format(cls=cls_name),
                  DeprecationWarning, stacklevel=3)


def _load_df(df, name: Optional[str] = None,
             description: Optional[str] = None) -> DataFrame:
    """Reference smart_dataframe load_df: wrap-or-reject."""
    if isinstance(df, DataFrame):
        return df
    try:
        import pandas as pd
        is_pandas = isinstance(df, pd.DataFrame)
    except ImportError:  # pragma: no cover
        is_pandas = False
    if is_pandas:
        from .session import get_session
        sdf = get_session().createDataFrame(df)
        schema = DataFrame.get_default_schema(sdf, name)
        if description:
            schema.description = description
        return DataFrame(sdf, schema=schema)
    if hasattr(df, "sparkSession"):  # native Spark DataFrame
        schema = DataFrame.get_default_schema(df, name)
        if description:
            schema.description = description
        return DataFrame(df, schema=schema)
    raise ValueError(
        "Invalid input data. We cannot convert it to a dataframe.")


class SmartDataframe:
    """Deprecated v2 wrapper for one table (use ``df.chat()``)."""

    def __init__(self, df, name: Optional[str] = None,
                 description: Optional[str] = None, llm=None,
                 **agent_kwargs):
        _warn_deprecated("SmartDataframe")
        self._original_import = df
        self.dataframe = _load_df(df, name, description)
        self._table_name = name
        self._table_description = description
        self._agent = Agent([self.dataframe], llm=llm, **agent_kwargs)

    def chat(self, query: str, output_type: Optional[str] = None):
        return self._agent.chat(query, output_type)

    def follow_up(self, query: str, output_type: Optional[str] = None):
        return self._agent.follow_up(query, output_type)

    def original_import(self):
        return self._original_import

    @property
    def last_code_generated(self) -> Optional[str]:
        return self._agent.last_code_generated

    @property
    def last_code_executed(self) -> Optional[str]:
        return self._agent.last_code_executed

    @property
    def rows_count(self) -> int:
        return self.dataframe.rows_count

    @property
    def columns_count(self) -> int:
        return len(self.dataframe.columns)


class SmartDatalake:
    """Deprecated v2 wrapper for several tables (use ``pai.chat()``)."""

    def __init__(self, dfs: List, llm=None, **agent_kwargs):
        _warn_deprecated("SmartDatalake")
        self.dfs = [_load_df(df) for df in dfs]
        self._agent = Agent(self.dfs, llm=llm, **agent_kwargs)

    def chat(self, query: str, output_type: Optional[str] = None):
        return self._agent.chat(query, output_type)

    def follow_up(self, query: str, output_type: Optional[str] = None):
        return self._agent.follow_up(query, output_type)

    def clear_memory(self) -> None:
        self._agent.start_new_conversation()

    @property
    def last_code_generated(self) -> Optional[str]:
        return self._agent.last_code_generated

    @property
    def last_code_executed(self) -> Optional[str]:
        return self._agent.last_code_executed
