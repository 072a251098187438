"""The Agent — chat / follow_up over conversation dataframes.

Reference parity: pandasai/agent/base.py:92-216 — new-conversation vs
follow-up, code generation with retries, execution with retries (each
failure re-prompts with the traceback), and the ``execute_sql_query``
closure handed to generated code. Spark deltas: tables are temp views
resolved by Catalyst (no table-expression substitution step), and
``execute_sql_query`` returns pandas via Arrow ``toPandas()`` so
LLM-generated pandas/matplotlib post-processing keeps working.
"""

from __future__ import annotations

import traceback
from typing import Any, Optional

from ..session import get_session
from ..sql import SQLExecutor
from .codegen import CodeExecutionError, clean_code
from .llm import LLM
from .memory import Memory
from .prompts import build_chat_prompt, build_correction_prompt
from .response import BaseResponse, ErrorResponse, ResponseParser
from .skills import skills_registry


class Agent:
    def __init__(self, dfs: list, llm: Optional[LLM] = None,
                 memory_size: int = 10, max_retries: int | None = None,
                 description: str | None = None, vectorstore=None,
                 sandbox=None):
        from ..config import ConfigManager
        from ..dataframe import DataFrame  # local import to avoid cycle

        # explicit kwargs win; otherwise the global ConfigManager
        # defaults flow in (reference: pai.config.set({...}) feeds
        # AgentState.config — config.py:23-46)
        gconf = ConfigManager.get()
        self.dfs = [
            df if isinstance(df, DataFrame) else DataFrame(df) for df in dfs
        ]
        self.llm = llm if llm is not None else gconf.llm
        self.vectorstore = vectorstore
        self.sandbox = sandbox
        self.max_retries = (max_retries if max_retries is not None
                            else gconf.max_retries)  # config.py:13 default
        self.memory = Memory(memory_size, agent_description=description)
        self.spark = get_session()
        self._executor = SQLExecutor(self.spark)
        for df in self.dfs:
            self._executor.register(df.name, df.df)
        self._parser = ResponseParser()
        self.last_code_generated: str | None = None
        self.last_code_executed: str | None = None

    # -- public API (agent/base.py:92-109) ---------------------------------

    def chat(self, query: str, output_type: str | None = None) -> BaseResponse:
        self.start_new_conversation()
        return self._process_query(query, output_type)

    def follow_up(self, query: str, output_type: str | None = None) -> BaseResponse:
        return self._process_query(query, output_type)

    def start_new_conversation(self) -> None:
        self.memory.clear()

    def train(self, queries: Optional[list[str]] = None,
              codes: Optional[list[str]] = None,
              docs: Optional[list[str]] = None) -> None:
        """Store Q→code pairs / docs for prompt-time retrieval
        (agent/base.py:218-249)."""
        from ..vectorstore import LocalVectorStore

        if self.vectorstore is None:
            self.vectorstore = LocalVectorStore()
        if queries and codes:
            if len(queries) != len(codes):
                raise ValueError("queries and codes must have equal length")
            self.vectorstore.add_question_answer(queries, codes)
        elif queries or codes:
            raise ValueError("Both queries and codes are required to train")
        if docs:
            self.vectorstore.add_docs(docs)

    # -- the one built-in "function" exposed to generated code -------------

    def execute_sql_query(self, sql: str):
        """Guarded spark.sql returning pandas (agent/base.py:137-169)."""
        return self._executor.execute(sql).toPandas()

    # -- internals ----------------------------------------------------------

    def _process_query(self, query: str, output_type: str | None) -> BaseResponse:
        if self.llm is None:
            raise ValueError(
                "No LLM configured — pass llm= to Agent/chat (use FakeLLM "
                "for deterministic tests, OpenAICompatibleLLM for a real "
                "endpoint)")
        self.memory.add(query, is_user=True)
        try:
            code = self._generate_code_with_retries(query, output_type)
            result = self._execute_with_retries(code, output_type)
            response = self._parser.parse(result, self.last_code_executed)
            self.memory.add(str(response.value)[:1000], is_user=False)
            return response
        except Exception as exc:  # agent/base.py:293-294,310-315
            return ErrorResponse(
                value=f"{type(exc).__name__}: {exc}",
                last_code_executed=self.last_code_generated,
                error=str(exc),
            )

    def _base_prompt(self, output_type: str | None) -> str:
        training = ""
        if self.vectorstore is not None:
            from ..vectorstore import render_training_section

            q = self.memory.get_last_message()
            training = render_training_section(
                self.vectorstore.get_relevant_question_answers(q),
                self.vectorstore.get_relevant_docs(q))
        return build_chat_prompt(
            self.dfs, self.memory,
            skills_section=skills_registry.prompt_section(),
            training_section=training,
            output_type=output_type)

    def _generate_code_with_retries(self, query: str,
                                    output_type: str | None) -> str:
        from ..sql.executor import extract_table_names

        prompt = self._base_prompt(output_type)
        last_error: Exception | None = None
        for attempt in range(self.max_retries + 1):
            raw = self.llm.generate_code(prompt)
            self.last_code_generated = raw
            try:
                cleaned, _chart = clean_code(
                    raw, self._executor.allowed_tables,
                    extract_table_names=extract_table_names,
                    spark=self.spark)
                return cleaned
            except Exception as exc:
                last_error = exc
                prompt = build_correction_prompt(
                    self._base_prompt(output_type), raw, str(exc))
        raise last_error  # exhausted retries

    def _execute_with_retries(self, code: str,
                              output_type: str | None) -> dict[str, Any]:
        last_error: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                result = self._execute_code(code)
                if (output_type and isinstance(result, dict)
                        and result.get("type") != output_type):
                    # wrong output type → corrective re-prompt
                    # (CorrectOutputTypeErrorPrompt, core/prompts/__init__.py)
                    raise CodeExecutionError(
                        f'Expected result type "{output_type}", '
                        f'got "{result.get("type")}"')
                return result
            except Exception as exc:
                last_error = exc
                prompt = build_correction_prompt(
                    self._base_prompt(output_type), code,
                    traceback.format_exc(limit=3))
                raw = self.llm.generate_code(prompt)
                self.last_code_generated = raw
                from ..sql.executor import extract_table_names
                try:
                    code, _ = clean_code(
                        raw, self._executor.allowed_tables,
                        extract_table_names=extract_table_names,
                        spark=self.spark)
                except Exception as clean_exc:
                    last_error = clean_exc
        raise CodeExecutionError(str(last_error)) from last_error

    def _execute_code(self, code: str) -> dict[str, Any]:
        """exec() with the reference environment: pd / np / plt(+Agg) /
        execute_sql_query / skills (core/code_execution/environment.py:22-34,
        code_executor.py:27-46)."""
        import numpy as np
        import pandas as pd

        env: dict[str, Any] = {
            "pd": pd,
            "np": np,
            "execute_sql_query": self.execute_sql_query,
            **skills_registry.exec_env(),
        }
        try:  # matplotlib is optional in this environment
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            env["plt"] = plt
        except ImportError:
            pass
        if "exports/charts" in code:  # chart paths rewritten by clean_code
            import os

            from ..constants import DEFAULT_CHART_DIRECTORY

            os.makedirs(DEFAULT_CHART_DIRECTORY, exist_ok=True)
        if self.sandbox is not None:
            result = self.sandbox.execute(code, env)
            self.last_code_executed = code
            return result
        exec(code, env)  # noqa: S102 — sandboxing is the Sandbox's job
        self.last_code_executed = code
        if "result" not in env:
            raise CodeExecutionError(
                "Generated code did not set a `result` variable")
        return env["result"]
