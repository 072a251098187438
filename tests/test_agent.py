"""Agent-loop tests with FakeLLM — mirrors the reference's deterministic
agent coverage (tests/unit_tests/agent/test_agent.py, test_agent_chat.py):
response types, retries, memory, malicious-SQL rejection, skills."""

import pytest

import pandas_ai_spark as pai
from pandas_ai_spark.agent import (
    Agent,
    ChartResponse,
    DataFrameResponse,
    ErrorResponse,
    FakeLLM,
    Memory,
    NumberResponse,
    ResponseParser,
    StringResponse,
    skill,
    skills_registry,
)
from pandas_ai_spark.agent.codegen import (
    ExecuteSQLQueryNotUsed,
    clean_code,
    validate_code,
)
from pandas_ai_spark.agent.response import InvalidOutputValueMismatch

from conftest import SF_SMOKE


@pytest.fixture()
def orders(spark):
    sdf = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    return pai.DataFrame(sdf, schema=pai.DataFrame.get_default_schema(sdf, "orders"))


CODE_NUMBER = '''
df = execute_sql_query("SELECT count(*) AS n FROM orders")
result = {"type": "number", "value": int(df["n"][0])}
'''

CODE_DF = '''
df = execute_sql_query(
    "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus")
result = {"type": "dataframe", "value": df}
'''


def wrap(code: str) -> str:
    return f"```python\n{code}\n```"


def test_chat_number_response(orders):
    agent = Agent([orders], llm=FakeLLM(wrap(CODE_NUMBER)))
    resp = agent.chat("how many orders?")
    assert isinstance(resp, NumberResponse)
    assert resp.value == 1500


def test_chat_dataframe_response(orders):
    agent = Agent([orders], llm=FakeLLM(wrap(CODE_DF)))
    resp = agent.chat("orders by status")
    assert isinstance(resp, DataFrameResponse)
    assert set(resp.to_pandas().columns) == {"o_orderstatus", "n"}


def test_agent_retries_then_succeeds(orders):
    """First generation fails the execute_sql_query-usage gate; the retry
    prompt must produce a second call that succeeds (agent/base.py:171-195)."""
    llm = FakeLLM([wrap('result = {"type": "string", "value": "no sql"}'),
                   wrap(CODE_NUMBER)])
    agent = Agent([orders], llm=llm)
    resp = agent.chat("count")
    assert isinstance(resp, NumberResponse)
    assert llm.call_count == 2


def test_agent_malicious_sql_rejected(orders):
    code = '''
df = execute_sql_query("SELECT * FROM secret_table")
result = {"type": "dataframe", "value": df}
'''
    agent = Agent([orders], llm=FakeLLM(wrap(code)), max_retries=0)
    resp = agent.chat("dump secrets")
    assert isinstance(resp, ErrorResponse)
    assert "unauthorized" in resp.value


def test_agent_exec_error_retries(orders):
    llm = FakeLLM([wrap('execute_sql_query("SELECT 1")\nraise ValueError("boom")\nresult={}'),
                   wrap(CODE_NUMBER)])
    agent = Agent([orders], llm=llm)
    resp = agent.chat("count")
    assert isinstance(resp, NumberResponse)


def test_follow_up_keeps_memory(orders):
    llm = FakeLLM(wrap(CODE_NUMBER))
    agent = Agent([orders], llm=llm)
    agent.chat("how many orders?")
    agent.follow_up("and again?")
    assert "how many orders?" in llm.last_prompt
    assert agent.memory.count == 4  # 2 user + 2 assistant


def test_chat_clears_memory(orders):
    agent = Agent([orders], llm=FakeLLM(wrap(CODE_NUMBER)))
    agent.chat("q1")
    agent.chat("q2")
    assert agent.memory.count == 2  # fresh conversation


def test_prompt_contains_table_block(orders):
    llm = FakeLLM(wrap(CODE_NUMBER))
    Agent([orders], llm=llm).chat("count")
    assert 'table_name="orders"' in llm.last_prompt
    assert 'dialect="spark"' in llm.last_prompt
    assert "execute_sql_query" in llm.last_prompt


def test_skill_injected(orders):
    skills_registry.clear()

    @skill
    def shout(s: str) -> str:
        """Uppercase a string."""
        return s.upper()

    code = '''
df = execute_sql_query("SELECT count(*) AS n FROM orders")
result = {"type": "string", "value": shout("ok")}
'''
    llm = FakeLLM(wrap(code))
    resp = Agent([orders], llm=llm).chat("shout")
    assert resp.value == "OK"
    assert "def shout" in llm.last_prompt
    skills_registry.clear()


def test_skill_requires_docstring():
    with pytest.raises(ValueError, match="docstring"):
        @skill
        def nodoc(x):
            return x


# -- unit layers ------------------------------------------------------------

def test_validate_code_requires_sql_call():
    with pytest.raises(ExecuteSQLQueryNotUsed):
        validate_code("x = 1")
    validate_code("df = execute_sql_query('SELECT 1')")


def test_clean_code_rewrites_chart_path_and_show():
    code = (
        "df = execute_sql_query('SELECT 1')\n"
        "plt.savefig('mychart.png')\n"
        "plt.show()\n"
        "result = {'type': 'plot', 'value': 'mychart.png'}\n"
    )
    cleaned, chart = clean_code(code, set())
    assert "plt.show()" not in cleaned
    assert "mychart.png" not in cleaned
    assert chart and chart.startswith("exports/charts/temp_chart_")
    assert cleaned.count(chart) == 2  # both literals rewritten to ONE path


def test_clean_code_strips_redefined_entrypoint():
    code = (
        "def execute_sql_query(q):\n    return None\n"
        "df = execute_sql_query('SELECT 1')\n"
        "result = {'type': 'string', 'value': 'x'}\n"
    )
    cleaned, _ = clean_code(code, set())
    assert "def execute_sql_query" not in cleaned


def test_response_parser_validation():
    p = ResponseParser()
    assert isinstance(p.parse({"type": "number", "value": "3.5"}), NumberResponse)
    assert isinstance(p.parse({"type": "string", "value": 5}), StringResponse)
    assert isinstance(p.parse({"type": "plot", "value": "a.png"}), ChartResponse)
    with pytest.raises(InvalidOutputValueMismatch):
        p.parse({"type": "bogus", "value": 1})
    with pytest.raises(InvalidOutputValueMismatch):
        p.parse({"value": 1})
    with pytest.raises(InvalidOutputValueMismatch):
        p.parse({"type": "number", "value": "not-a-number"})
    with pytest.raises(InvalidOutputValueMismatch):
        p.parse({"type": "dataframe", "value": 42})


def test_memory_truncates_assistant_replay():
    m = Memory()
    m.add("question", is_user=True)
    m.add("x" * 500, is_user=False)
    convo = m.get_conversation()
    assert "x" * 101 not in convo
    assert convo.count("### ") == 2


def test_pai_chat_module_level(orders):
    resp = pai.chat("count", orders, llm=FakeLLM(wrap(CODE_NUMBER)))
    assert resp.value == 1500
    resp2 = pai.follow_up("again")
    assert resp2.value == 1500


def test_output_type_mismatch_retries(orders):
    """Requested output_type enforced; mismatch triggers a corrective
    regeneration (CorrectOutputTypeErrorPrompt semantics)."""
    llm = FakeLLM([
        wrap('df = execute_sql_query("SELECT count(*) AS n FROM orders")\n'
             'result = {"type": "string", "value": "wrong type"}'),
        wrap(CODE_NUMBER),
    ])
    agent = Agent([orders], llm=llm)
    resp = agent.chat("count", output_type="number")
    assert isinstance(resp, NumberResponse)
    assert llm.call_count == 2


def test_output_type_match_no_retry(orders):
    llm = FakeLLM(wrap(CODE_NUMBER))
    resp = Agent([orders], llm=llm).chat("count", output_type="number")
    assert isinstance(resp, NumberResponse)
    assert llm.call_count == 1


def test_chat_without_llm_raises(orders):
    with pytest.raises(ValueError, match="No LLM configured"):
        Agent([orders]).chat("anything")


# -- legacy v2 shims ---------------------------------------------------------


def test_smart_dataframe_shim(spark):
    """SmartDataframe: deprecation banner on construction, chat
    delegates to one Agent, last_code_executed passes through, pandas /
    Spark / engine frames all accepted, junk rejected (reference
    pandasai/smart_dataframe/__init__.py:16-160)."""
    import warnings

    import pandas as pd
    import pytest

    import pandas_ai_spark as pai
    from pandas_ai_spark.agent import FakeLLM

    llm = FakeLLM(
        '```python\n'
        'df = execute_sql_query("SELECT count(*) AS n FROM legacy_orders")\n'
        'result = {"type": "number", "value": int(df["n"][0])}\n```')
    pdf = pd.DataFrame({"o_orderkey": [1, 2, 3], "o_totalprice": [9.0, 8.0, 7.0]})

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sdf = pai.SmartDataframe(pdf, name="legacy_orders", llm=llm)
        assert any(issubclass(x.category, DeprecationWarning)
                   and "SmartDataframe" in str(x.message) for x in w)

    out = sdf.chat("how many orders?")
    assert out.value == 3
    assert "execute_sql_query" in sdf.last_code_executed
    assert sdf.rows_count == 3 and sdf.columns_count == 2
    assert sdf.original_import() is pdf

    # Spark and engine frames accepted too; junk rejected
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pai.SmartDataframe(spark.createDataFrame(pdf), name="legacy2")
        with pytest.raises(ValueError, match="cannot convert"):
            pai.SmartDataframe("not a frame")


def test_smart_datalake_shim(spark):
    """SmartDatalake: multi-frame Agent delegation + clear_memory
    (reference pandasai/smart_datalake/__init__.py:13-110)."""
    import warnings

    import pandas as pd

    import pandas_ai_spark as pai
    from pandas_ai_spark.agent import FakeLLM

    import hashlib

    a = pd.DataFrame({"k": [1, 2]})
    b = pd.DataFrame({"v": [1, 2, 3]})
    # ad-hoc frames get synthesized table_<md5> names; query one of them
    a_name = f"table_{hashlib.md5(b'k').hexdigest()[:8]}"
    llm = FakeLLM(
        '```python\n'
        f'df = execute_sql_query("SELECT count(*) AS n FROM {a_name}")\n'
        'result = {"type": "string", "value": "ok"}\n```')
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        lake = pai.SmartDatalake([a, b], llm=llm)
        assert any("SmartDatalake" in str(x.message) for x in w)
    assert lake.chat("anything").value == "ok"
    lake.follow_up("more")
    lake.clear_memory()
    assert lake._agent.memory.count == 0
