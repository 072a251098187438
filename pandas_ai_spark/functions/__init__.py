"""Pipeline operators beyond the reference surface (BASELINE.json north
star): text analysis, deduplication, similarity search, record linkage,
graph/statistical analytics, sketching, multimodal plumbing."""

from . import (audit, bpe, cache, classify, dedup, diff, events, graph,
               linkage, llm_ops, mining, multimodal, packing, pipeline,
               search, similarity, sketch, skew, state_store, stats,
               text, timeseries)
from .cache import cache_scope, operator_persist, release_operator_caches

__all__ = ["audit", "bpe", "cache", "cache_scope", "classify", "dedup",
           "diff", "events", "graph", "linkage", "llm_ops", "mining",
           "multimodal", "operator_persist", "packing", "pipeline",
           "release_operator_caches", "search", "similarity", "sketch",
           "skew", "state_store", "stats", "text", "timeseries"]
