import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from pandas_ai_spark.session import get_session

    s = get_session(app_name="pandas_ai_spark_tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    return con


def pytest_terminal_summary(terminalreporter, exitstatus):
    """Report and consume the LLM-judge average-score file (reference
    parity: tests/unit_tests/conftest.py:204-217 — the grishasen fork's
    eval-summary hook)."""
    scores_file = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "test_agent_llm_judge.txt")
    if os.path.exists(scores_file):
        with open(scores_file) as file:
            score_line = file.readline().strip()
            if score_line.replace(".", "", 1).isdigit():
                avg_score = float(score_line)
                terminalreporter.write(
                    "\n--- Evaluation Score Summary ---\n")
                terminalreporter.write(f"Average Score: {avg_score:.2f}\n")
        os.remove(scores_file)


def sorted_rows(obj):
    """Order-insensitive canonical rows for comparison.

    Accepts a Spark DataFrame or a list of row tuples (e.g. duckdb
    fetchall) so both sides of a compare use the identical sort key.
    """
    rows = [tuple(r) for r in (obj.collect() if hasattr(obj, "collect") else obj)]
    return sorted(rows, key=lambda t: tuple(str(x) for x in t))
