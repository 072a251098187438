"""SQL guard tests — mirrors the reference's test_sql_sanitizer.py and the
malicious-query agent tests (tests/unit_tests/helpers/test_sql_sanitizer.py,
code_cleaning allowlist at code_cleaning.py:42-73)."""

import pytest

from pandas_ai_spark.sql import (
    MaliciousQueryError,
    SQLExecutor,
    extract_table_names,
    is_sql_query_safe,
    sanitize_relation_name,
)

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def executor(spark):
    ex = SQLExecutor(spark)
    for t in ("orders", "customer"):
        ex.register(t, spark.read.parquet(f"{SF_SMOKE}/{t}.parquet"))
    return ex


SAFE = [
    "SELECT * FROM orders",
    "select o_orderkey from orders where o_totalprice > 10",
    "WITH t AS (SELECT 1 AS x) SELECT * FROM t",
    "  (SELECT 1)  ",
    "SELECT 'DROP TABLE users' AS payload",  # keyword inside a literal
    "SELECT * FROM orders UNION SELECT * FROM orders",
]

UNSAFE = [
    "DROP TABLE orders",
    "INSERT INTO orders VALUES (1)",
    "UPDATE orders SET x = 1",
    "DELETE FROM orders",
    "SELECT * FROM orders; DROP TABLE orders",
    "SELECT * FROM orders -- sneaky",
    "SELECT * FROM orders /* sneaky */",
    "CREATE TABLE t AS SELECT 1",
    "SELECT * FROM orders WHERE sleep(5)",
    "GRANT ALL ON orders TO PUBLIC",
    "CACHE TABLE orders",
    "EXPORT DATABASE 'x'",
    # JVM reflection escape hatches (env exfiltration / Thread.sleep DoS)
    "SELECT java_method('java.lang.System','getenv','PATH')",
    "SELECT reflect('java.lang.Thread','sleep',1000)",
    "SELECT REFLECT ('java.lang.System','getenv','HOME')",
    "SELECT current_user()",
    "SELECT session_user()",
    "SELECT version()",
]


@pytest.mark.parametrize("sql", SAFE)
def test_safe_queries_pass(sql):
    assert is_sql_query_safe(sql), sql


@pytest.mark.parametrize("sql", UNSAFE)
def test_unsafe_queries_blocked(sql):
    assert not is_sql_query_safe(sql), sql


def test_sanitize_relation_name():
    assert sanitize_relation_name("/tmp/My Data-2024.csv") == "my_data_2024"
    assert sanitize_relation_name("9lives.parquet") == "t_9lives"
    assert len(sanitize_relation_name("x" * 100)) <= 64


def test_extract_table_names(spark):
    names = extract_table_names(
        spark,
        "WITH t AS (SELECT * FROM orders) "
        "SELECT * FROM t JOIN customer ON 1=1")
    assert names == {"orders", "customer"}


def test_executor_runs_allowed(executor):
    assert executor.execute("SELECT count(*) AS n FROM orders").collect()[0].n > 0


def test_executor_blocks_unknown_table(executor):
    with pytest.raises(MaliciousQueryError, match="unauthorized"):
        executor.execute("SELECT * FROM lineitem")


def test_executor_blocks_write(executor):
    with pytest.raises(MaliciousQueryError):
        executor.execute("DELETE FROM orders")


def test_executor_blocks_unparseable(executor):
    # NB: "SELECT FROM WHERE" parses in Spark's grammar (non-reserved
    # keywords become identifiers) — use genuinely invalid syntax.
    with pytest.raises(MaliciousQueryError, match="parse"):
        executor.execute("SELECT )( FROM orders")


def test_cte_name_not_treated_as_table(executor):
    df = executor.execute(
        "WITH sub AS (SELECT o_orderkey FROM orders LIMIT 5) "
        "SELECT count(*) AS n FROM sub")
    assert df.collect()[0].n == 5
