"""Pipeline operators beyond the reference surface (BASELINE.json north
star): text analysis, deduplication, similarity search, multimodal
plumbing."""

from . import (dedup, llm_ops, multimodal, packing, pipeline, similarity,
               skew, stats, text, timeseries)

__all__ = ["dedup", "llm_ops", "multimodal", "packing", "pipeline",
           "similarity", "skew", "stats", "text", "timeseries"]
