"""Pipeline operators beyond the reference surface (BASELINE.json north
star): text analysis, deduplication, similarity search, multimodal
plumbing."""

from . import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
