"""Pipeline operators beyond the reference surface (BASELINE.json north
star): text analysis, deduplication, similarity search, multimodal
plumbing."""

from . import (bpe, cache, classify, dedup, events, llm_ops, multimodal,
               packing, pipeline, similarity, skew, state_store, stats,
               text, timeseries)
from .cache import cache_scope, operator_persist, release_operator_caches

__all__ = ["bpe", "cache", "cache_scope", "classify", "dedup", "events",
           "llm_ops", "multimodal", "operator_persist", "packing",
           "pipeline", "release_operator_caches", "similarity", "skew",
           "state_store", "stats", "text", "timeseries"]
