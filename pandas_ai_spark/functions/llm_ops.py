"""LLM calls as column operations (north-star scope, SURVEY §2.12).

Absent in the reference (its LLM sits only in the agent loop); at
training-pipeline scale you want "run this prompt over every row" as a
first-class, distributed, rate-limited column op:

    df.withColumn("label", llm_transform("classify the sentiment: {text}"))

Execution model: an Arrow-batched ``pandas_udf`` per partition; each batch
is processed by a driver-configured backend callable (string → string).
The backend is shipped to executors by closure, so it must be
picklable — a client wrapper holding an endpoint/key, not a live socket.
Rate limiting is token-bucket per executor process (the only place a
limiter can live without coordination); cluster-wide QPS =
per-process rate × executor count, so size it as target_qps / executors.

No network client is bundled (and none is available here): the default
backend is :class:`EchoBackend`, deterministic and test-friendly; wire a
real one by passing any ``Callable[[str], str]``.
"""

from __future__ import annotations

import time
from typing import Callable, Iterator, Optional

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


class EchoBackend:
    """Deterministic offline backend: echoes a stable digest of the prompt
    — lets the whole pipeline (formatting, batching, limiting, schema) be
    tested without a model."""

    def __call__(self, prompt: str) -> str:
        import hashlib

        return hashlib.md5(prompt.encode()).hexdigest()[:12]


class RateLimiter:
    """Token bucket; ``acquire()`` blocks until a slot frees. Per-process —
    see module docstring for cluster-wide sizing."""

    def __init__(self, calls_per_second: float):
        self.rate = float(calls_per_second)
        self._allowance = self.rate
        self._last = time.monotonic()

    def acquire(self) -> None:
        if self.rate <= 0:
            return
        while True:
            now = time.monotonic()
            self._allowance = min(
                self.rate, self._allowance + (now - self._last) * self.rate)
            self._last = now
            if self._allowance >= 1.0:
                self._allowance -= 1.0
                return
            time.sleep((1.0 - self._allowance) / self.rate)


def llm_transform(
    prompt_template: str,
    *cols: Column | str,
    backend: Optional[Callable[[str], str]] = None,
    calls_per_second: float = 0.0,
    max_prompt_chars: int = 8000,
) -> Column:
    """Column op: format ``prompt_template`` with the given columns (in
    ``{0}``/``{1}`` positional or a single ``{text}``-style slot for one
    column) and run the backend per row, Arrow-batched.

    >>> df.withColumn("lang", llm_transform("Language of: {0}", "text"))
    """
    backend = backend or EchoBackend()
    n_slots = len(cols)
    if n_slots == 0:
        raise ValueError("llm_transform needs at least one input column")

    @F.pandas_udf(T.StringType())
    def apply(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        limiter = RateLimiter(calls_per_second)
        for batch in it:
            out = []
            for row in batch.itertuples(index=False):
                vals = [("" if v is None else str(v))[:max_prompt_chars]
                        for v in row]
                if n_slots == 1 and "{0}" not in prompt_template:
                    # single named/anonymous slot: substitute the one value
                    import re as _re

                    prompt = _re.sub(r"\{[a-zA-Z_][a-zA-Z0-9_]*\}",
                                     lambda _: vals[0], prompt_template)
                else:
                    prompt = prompt_template.format(*vals)
                limiter.acquire()
                out.append(backend(prompt))
            yield pd.Series(out)

    struct = F.struct(*[F.col(c) if isinstance(c, str) else c for c in cols])
    return apply(struct)
