"""Hashing-trick linear classification as a pure-JVM projection.

A fasttext-style linear text classifier is, at inference time, just
``score(doc) = σ(Σ_t w[h(t) mod D])`` — a per-token hash, a weight
lookup, a sum. At 100 TB that must NOT be a Python UDF or a vocabulary
join: the hashing trick removes the vocabulary entirely (no shuffle, no
broadcast dictionary needed when weights are a *function* of the
bucket), and the whole score folds into whole-stage codegen as one
``aggregate`` over the token array.

Here the weight table is a deterministic function of the bucket id (a
stand-in for trained weights — this sandbox has no labeled data); a real
deployment swaps ``_bucket_weight`` for an ``element_at`` lookup into a
broadcast ``array<double>`` literal of trained weights, keeping the
identical plan shape.

The token hash is md5 first-8-bytes little-endian — the same family the
dedup oracles replicate in DuckDB (``md5_number_upper``) — computed
JVM-side by byte-reversing the md5 hex and ``conv``-ing to DECIMAL(20,0)
(unsigned 64-bit exceeds BIGINT), so the score is reproducible in any
engine with md5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pandas_ai_spark.functions.text import normalize_text, whitespace_tokens


def md5_u64(col: Column) -> Column:
    """First 8 bytes of md5(col) as a little-endian unsigned 64-bit int
    (DECIMAL(20,0)) — equals DuckDB's ``md5_number_upper`` and Python's
    ``int.from_bytes(md5(s).digest()[:8], 'little')``. All JVM: md5 hex
    → byte-reversed first 16 hex chars → base-16 conv."""
    h = F.md5(col)
    rev = F.concat(*[F.substring(h, p, 2) for p in (15, 13, 11, 9, 7, 5, 3, 1)])
    return F.conv(rev, 16, 10).cast("decimal(20,0)")


def _bucket_weight_sum(toks: Column, n_buckets: int) -> Column:
    """Σ over tokens of (h(t) mod D − (D−1)/2): exact integer arithmetic
    (the float division happens once, outside the fold), so engines
    can't diverge on summation order."""
    centre = (n_buckets - 1) // 2
    return F.aggregate(
        F.transform(
            toks,
            lambda t: F.pmod(md5_u64(t), F.lit(n_buckets))
                       .cast("long") - F.lit(centre)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def hashed_feature_score(col: Column, n_buckets: int = 2001) -> Column:
    """Mean hashed-bucket weight of the document's tokens, in [−1, 1]:
    the linear-model decision value. ``n_buckets`` odd keeps the weight
    distribution zero-centred. Empty docs score 0."""
    toks = whitespace_tokens(normalize_text(col))
    centre = (n_buckets - 1) // 2
    return (
        _bucket_weight_sum(toks, n_buckets).cast("double")
        / (F.greatest(F.size(toks), F.lit(1)) * F.lit(float(centre)))
    )


def classify(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id", threshold: float = 0.0,
             n_buckets: int = 2001) -> DataFrame:
    """Score every document and attach the binary label — one narrow
    projection, no shuffle, no Python."""
    score = hashed_feature_score(F.col(text_col), n_buckets)
    return df.select(
        F.col(id_col),
        score.alias("score"),
        (score > F.lit(threshold)).alias("label"),
    )
