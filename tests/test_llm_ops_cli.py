"""LLM-column op + CLI tests."""

import pytest
from pyspark.sql import functions as F

from pandas_ai_spark.functions.llm_ops import (
    EchoBackend,
    RateLimiter,
    llm_transform,
)

from conftest import SF_SMOKE


def test_llm_transform_deterministic(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(10)
    out = docs.select(
        "doc_id",
        llm_transform("Classify: {text}", "text").alias("label"),
    ).collect()
    assert len(out) == 10
    assert all(len(r.label) == 12 for r in out)
    # deterministic: same input → same output
    out2 = docs.select(
        llm_transform("Classify: {text}", "text").alias("label")).collect()
    assert [r.label for r in out] == [r.label for r in out2]


def test_llm_transform_multi_column(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(5)
    out = docs.select(
        llm_transform("{0} in language {1}", "text", "lang").alias("x")
    ).collect()
    assert len(out) == 5


def test_llm_transform_custom_backend(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(3)
    out = docs.select(
        "lang",
        llm_transform("{0}", "lang", backend=str.upper).alias("x")).collect()
    assert all(r.x == r.lang.upper() for r in out)


def test_llm_transform_requires_columns():
    with pytest.raises(ValueError):
        llm_transform("no columns")


def test_rate_limiter_blocks():
    import time

    rl = RateLimiter(100.0)
    t0 = time.monotonic()
    for _ in range(20):
        rl.acquire()
    # 20 calls at 100/s: first ~100 tokens free... bucket starts full with
    # `rate` tokens, so 20 calls pass instantly at rate=100
    assert time.monotonic() - t0 < 0.5
    rl2 = RateLimiter(10.0)
    rl2._allowance = 0.0
    t0 = time.monotonic()
    rl2.acquire()
    assert time.monotonic() - t0 >= 0.05  # waited for a token


def test_cli_dataset_create(tmp_path, monkeypatch, spark):
    from pandas_ai_spark.cli import main

    monkeypatch.setenv("PANDAS_AI_SPARK_DATA", str(tmp_path))
    rc = main(["dataset", "create",
               "--path", "acme/orders-cli",
               "--file", f"{SF_SMOKE}/orders.parquet",
               "--columns", "o_orderkey,o_totalprice"])
    assert rc == 0
    assert (tmp_path / "acme" / "orders-cli" / "schema.yaml").exists()


def test_cli_login(capsys):
    from pandas_ai_spark.cli import main

    assert main(["login"]) == 0
