"""Typed response values + parser for the generated-code output contract.

Reference parity: pandasai/core/response/{base,parser}.py — generated code
must set ``result = {"type": <number|string|dataframe|plot>, "value": …}``;
the parser validates type/value coherence and wraps in a typed response.
A Spark DataFrame value is kept lazy; ``.to_pandas()`` materializes.
"""

from __future__ import annotations

from typing import Any


class InvalidOutputValueMismatch(Exception):
    """result dict malformed or type/value mismatch
    (reference: pandasai/exceptions.py)."""


class BaseResponse:
    type: str = "base"

    def __init__(self, value: Any = None, last_code_executed: str | None = None,
                 error: str | None = None):
        self.value = value
        self.last_code_executed = last_code_executed
        self.error = error

    def __repr__(self) -> str:
        return f"<{type(self).__name__} value={self.value!r}>"

    def __str__(self) -> str:
        return str(self.value)


class NumberResponse(BaseResponse):
    type = "number"


class StringResponse(BaseResponse):
    type = "string"


class DataFrameResponse(BaseResponse):
    """Wraps either a Spark DataFrame, a pandas_ai_spark.DataFrame, or a
    pandas DataFrame (the exec env post-processes in pandas)."""

    type = "dataframe"

    def to_pandas(self):
        v = self.value
        if hasattr(v, "toPandas"):
            return v.toPandas()
        if hasattr(v, "to_pandas"):
            return v.to_pandas()
        return v


class ChartResponse(BaseResponse):
    type = "chart"

    def __init__(self, value: Any = None, last_code_executed: str | None = None,
                 error: str | None = None):
        super().__init__(value, last_code_executed, error)
        self.path = value


class ErrorResponse(BaseResponse):
    type = "error"


_VALID_TYPES = {"number", "string", "dataframe", "plot"}


class ResponseParser:
    """core/response/parser.py:16-75 semantics."""

    def parse(self, result: Any, last_code_executed: str | None = None) -> BaseResponse:
        if not isinstance(result, dict) or "type" not in result or "value" not in result:
            raise InvalidOutputValueMismatch(
                'result must be a dict {"type": ..., "value": ...}')
        rtype, value = result["type"], result["value"]
        if rtype not in _VALID_TYPES:
            raise InvalidOutputValueMismatch(
                f"Invalid output type: {rtype!r}; expected one of {sorted(_VALID_TYPES)}")
        if rtype == "number":
            if isinstance(value, str):
                try:
                    value = float(value) if "." in value else int(value)
                except ValueError as exc:
                    raise InvalidOutputValueMismatch(
                        f"Expected numeric value, got {value!r}") from exc
            if not isinstance(value, (int, float)):
                raise InvalidOutputValueMismatch(
                    f"Expected numeric value, got {type(value).__name__}")
            return NumberResponse(value, last_code_executed)
        if rtype == "string":
            return StringResponse(str(value), last_code_executed)
        if rtype == "dataframe":
            if not (hasattr(value, "toPandas") or hasattr(value, "to_pandas")
                    or type(value).__name__ in ("DataFrame", "Series")):
                raise InvalidOutputValueMismatch(
                    f"Expected a dataframe value, got {type(value).__name__}")
            return DataFrameResponse(value, last_code_executed)
        # plot: a path string or base64 payload
        if not isinstance(value, str):
            raise InvalidOutputValueMismatch(
                f"Expected a chart path string, got {type(value).__name__}")
        return ChartResponse(value, last_code_executed)
