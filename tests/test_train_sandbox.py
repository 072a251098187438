"""Vectorstore train/retrieval + sandbox execution tests (reference:
tests for Agent.train and the docker sandbox design)."""

import pytest

import pandas_ai_spark as pai
from pandas_ai_spark.agent import Agent, FakeLLM
from pandas_ai_spark.sandbox import RestrictedSandbox, Sandbox, SandboxError
from pandas_ai_spark.vectorstore import LocalVectorStore, render_training_section

from conftest import SF_SMOKE


@pytest.fixture()
def orders(spark):
    sdf = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    return pai.DataFrame(sdf, schema=pai.DataFrame.get_default_schema(sdf, "orders"))


def test_vectorstore_qa_retrieval():
    vs = LocalVectorStore()
    vs.add_question_answer(
        ["how many orders are there", "top customers by revenue"],
        ["SELECT count(*) FROM orders", "SELECT ... revenue"])
    got = vs.get_relevant_question_answers("count of orders", k=1)
    assert got[0]["question"] == "how many orders are there"


def test_vectorstore_docs_retrieval():
    vs = LocalVectorStore()
    vs.add_docs(["orders table holds one row per order",
                 "customer table has demographics"])
    got = vs.get_relevant_docs("order rows", k=1)
    assert "orders" in got[0]


def test_vectorstore_delete():
    vs = LocalVectorStore()
    ids = vs.add_question_answer(["q"], ["c"])
    vs.delete_question_and_answers(ids)
    assert vs.get_relevant_question_answers("q") == []


def test_agent_train_injects_prompt(orders):
    llm = FakeLLM(
        '```python\n'
        'df = execute_sql_query("SELECT count(*) AS n FROM orders")\n'
        'result = {"type": "number", "value": int(df["n"][0])}\n```')
    agent = Agent([orders], llm=llm)
    agent.train(queries=["how many orders"],
                codes=['execute_sql_query("SELECT count(*) FROM orders")'],
                docs=["the orders table is one row per order"])
    agent.chat("how many orders are there?")
    assert "similar questions answered before" in llm.last_prompt
    assert "Relevant documentation" in llm.last_prompt


def test_agent_train_requires_pairs(orders):
    agent = Agent([orders])
    with pytest.raises(ValueError, match="Both queries and codes"):
        agent.train(queries=["only a query"])


def test_render_training_section_empty():
    assert render_training_section([], []) == ""


# -- sandbox ---------------------------------------------------------------

def test_sandbox_preexecutes_sql(orders, spark):
    from pandas_ai_spark.sql import SQLExecutor

    ex = SQLExecutor(spark)
    ex.register("orders", orders.df)
    calls = []

    def host_sql(sql):
        calls.append(sql)
        return ex.execute(sql).toPandas()

    sb = RestrictedSandbox()
    code = (
        'df = execute_sql_query("SELECT count(*) AS n FROM orders")\n'
        'result = {"type": "number", "value": int(df["n"][0])}\n'
    )
    result = sb.execute(code, {"execute_sql_query": host_sql})
    assert result["value"] == 1500
    assert calls == ["SELECT count(*) AS n FROM orders"]


def test_sandbox_blocks_open_and_import():
    sb = RestrictedSandbox()
    env = {"execute_sql_query": lambda sql: None}
    with pytest.raises(SandboxError, match="NameError|ImportError"):
        sb.execute("execute_sql_query\nopen('/etc/passwd')\nresult={}", env)
    with pytest.raises(SandboxError):
        sb.execute("execute_sql_query\nimport os\nresult={}", env)


def test_sandbox_requires_result():
    sb = RestrictedSandbox()
    with pytest.raises(SandboxError, match="result"):
        sb.execute("x = 1", {"execute_sql_query": lambda s: None})


def test_agent_with_sandbox_end_to_end(orders):
    llm = FakeLLM(
        '```python\n'
        'df = execute_sql_query("SELECT count(*) AS n FROM orders")\n'
        'result = {"type": "number", "value": int(df["n"][0])}\n```')
    agent = Agent([orders], llm=llm, sandbox=RestrictedSandbox())
    resp = agent.chat("count")
    assert resp.value == 1500


def test_sandbox_is_abstract():
    with pytest.raises(TypeError):
        Sandbox()
