"""Yahoo Finance source (driver-side fetch → createDataFrame).

Reference parity: extensions/connectors/yfinance/pandasai_yfinance/
__init__.py (ticker history via the yfinance package). The fetch is
inherently driver-side/small; the result is parallelized into a Spark
DataFrame. yfinance is not installed in this environment — gated behind
an import-try.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import Source


def load_yahoo_finance(spark: SparkSession, source: Source) -> DataFrame:
    try:
        import yfinance  # type: ignore
    except ImportError as exc:
        raise NotImplementedError(
            "yahoo_finance source requires the 'yfinance' package"
        ) from exc
    conn = source.connection or {}
    ticker = source.table or conn.get("ticker")
    period = conn.get("period", "1mo")
    pdf = yfinance.Ticker(ticker).history(period=period).reset_index()
    return spark.createDataFrame(pdf)
