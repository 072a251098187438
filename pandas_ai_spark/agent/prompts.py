"""Prompt construction for code generation.

Reference parity: pandasai/core/prompts/base.py:14-76 +
templates/generate_python_code_with_sql.tmpl and
pandasai/helpers/dataframe_serializer.py:11-60 — tables serialized as a
``<table dialect=… table_name=…>`` block with a head(5) CSV, cells
truncated to 200 chars; the prompt mandates doing aggregation / sorting /
joins / group-by through ``execute_sql_query`` and the
``result = {"type": …, "value": …}`` output contract. Our dialect is
``spark`` so generated SQL targets Spark SQL directly.
"""

from __future__ import annotations

MAX_CELL_CHARS = 200  # dataframe_serializer.py:9


def serialize_dataframe(df, dialect: str = "spark") -> str:
    """One <table> block per conversation dataframe
    (dataframe_serializer.py:11-60)."""
    head = df.head(5)
    truncated = head.astype(str).map(
        lambda v: v if len(v) <= MAX_CELL_CHARS else v[:MAX_CELL_CHARS] + "…")
    desc = getattr(df.schema, "description", None) or ""
    desc_attr = f' description="{desc}"' if desc else ""
    return (
        f'<table dialect="{dialect}" table_name="{df.name}"{desc_attr} '
        f'dimensions="{df.rows_count}x{df.columns_count}">\n'
        f"{truncated.to_csv(index=False).rstrip()}\n"
        f"</table>"
    )


_INSTRUCTIONS = """\
Write Python code to answer the user's question.

Rules:
- You MUST use the function execute_sql_query(sql: str) -> pd.DataFrame to
  query the tables above. Do aggregation, sorting, joins and group by
  through the SQL query (Spark SQL dialect), not in pandas.
- Only SELECT statements are allowed; only the tables listed above exist.
- At the end, assign the answer to a variable named `result`, a dict:
  result = {"type": t, "value": v} where t is one of
  "string" | "number" | "dataframe" | "plot"
  (for "plot", v is the saved chart image path).
Return only a Python code block."""


def build_chat_prompt(dfs, memory, skills_section: str = "",
                      training_section: str = "",
                      output_type: str | None = None) -> str:
    tables = "\n\n".join(serialize_dataframe(df) for df in dfs)
    parts = [tables, ""]
    if skills_section:
        parts += [skills_section, ""]
    if training_section:
        parts += [training_section, ""]
    convo = memory.get_conversation()
    if convo:
        parts += ["Conversation so far:", convo, ""]
    parts += [_INSTRUCTIONS]
    if output_type:
        parts.append(
            f'The user requested the result type to be "{output_type}".')
    parts += ["", f"### QUERY\n {memory.get_last_message()}"]
    return "\n".join(parts)


def build_correction_prompt(base_prompt: str, code: str, error: str) -> str:
    """Error-correction re-prompt (core/prompts/__init__.py:27-43 —
    CorrectExecuteSQLQueryUsageErrorPrompt semantics)."""
    return (
        f"{base_prompt}\n\n"
        f"The previous code failed:\n```python\n{code}\n```\n"
        f"Error:\n{error}\n\n"
        f"Fix the code. Return only a Python code block."
    )
