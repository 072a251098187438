"""Structured Streaming over the semantic layer (north-star scope).

The reference has no streaming surface (SURVEY §2.11); this maps the same
declarative schema + operator set onto ``spark.readStream``:
tumbling / sliding / session windows, watermarked late-data handling,
streaming dedup, and ``foreachBatch`` sinks. Batch/stream parity by
construction — the transformations are the same Column expressions the
batch compiler uses.
"""

from .stream import (
    StreamCompiler,
    StreamingNearDup,
    sessionize,
    stateful_reservoir,
    stateful_sessionize,
    stream_dedup,
    stream_interval_join,
    windowed_agg,
)

__all__ = ["StreamCompiler", "StreamingNearDup", "windowed_agg", "sessionize",
           "stateful_reservoir", "stateful_sessionize", "stream_dedup",
           "stream_interval_join"]
