"""Pipeline operators beyond the reference surface (BASELINE.json north
star): text analysis, deduplication, similarity search, multimodal
plumbing."""

from . import dedup, llm_ops, multimodal, pipeline, similarity, skew, text

__all__ = ["dedup", "llm_ops", "multimodal", "pipeline", "similarity", "skew", "text"]
