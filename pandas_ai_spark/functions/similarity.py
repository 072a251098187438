"""Similarity search over embedding columns (``array<float>``).

Two paths, per the standard ANN playbook:

- **Brute-force cosine top-k** — exact baseline. The query side is tiny
  and broadcast; the corpus scan is embarrassingly parallel; per-query
  ranking is a windowed top-k (Spark's TakeOrderedAndProject shape). At
  100 TB this is one full corpus scan per query batch — correct, and the
  yardstick the approximate path is judged against.
- **Random-hyperplane LSH** — sub-linear scale path. Sign-bit signatures
  against a fixed seeded plane set bucket the corpus; queries probe only
  their own bucket (plus optional multi-probe neighbors). The bucket id
  is a JVM-side expression over array ops — no Python in the scan.

All dot products run as ``zip_with``/``aggregate`` JVM expressions on
``double`` (cast from float once).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def ann_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must have columns (query_id_col, vec_col). The query side
    is broadcast — the corpus is scanned once regardless of query count.
    Deterministic tie-break: (cosine desc, neighbor id asc).
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).cast("array<double>").alias("__qv"),
        )
    )
    scored = (
        corpus.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("__cv"),
        )
        .crossJoin(q)
        .where(F.col(id_col) != F.col(query_id_col))
        .withColumn("cosine", cosine(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _hyperplanes(dim: int, num_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.RandomState(seed).randn(num_planes, dim)


def lsh_bucket(vec: Column, dim: int, num_planes: int = 12,
               seed: int = 42) -> Column:
    """Random-hyperplane signature: integer in [0, 2^num_planes)."""
    planes = _hyperplanes(dim, num_planes, seed)
    v = vec.cast("array<double>")
    sig = F.lit(0).cast("bigint")
    for p in range(num_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        bit = (dot(v, plane) > 0).cast("bigint")
        sig = sig + F.shiftleft(bit, p)
    return sig


def ann_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: rank only corpus vectors in the query's LSH
    bucket. Recall rises with fewer planes (bigger buckets); 8 planes on
    ~unit-norm data keeps ~1/256 of the corpus per probe."""
    bucketed = corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__cv"),
        lsh_bucket(F.col(vec_col), dim, num_planes, seed).alias("__bkt"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).cast("array<double>").alias("__qv"),
            lsh_bucket(F.col(vec_col), dim, num_planes, seed).alias("__bkt"),
        )
    )
    scored = (
        bucketed.join(q, "__bkt")
        .where(F.col(id_col) != F.col(query_id_col))
        .withColumn("cosine", cosine(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
    use_lsh: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine ≥ threshold.

    LSH-bucketed self-join by default (scale path — near-identical vectors
    share all sign bits with high probability); ``use_lsh=False`` gives the
    exact O(N²) verify path for small tables / oracle checks.
    """
    base = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
    if use_lsh:
        base = base.withColumn(
            "__bkt", lsh_bucket(F.col("__v"), dim, num_planes, seed))
        cond = (F.col("l.__bkt") == F.col("r.__bkt")) & (
            F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
    else:
        cond = F.col(f"l.{id_col}") < F.col(f"r.{id_col}")
    l, r = base.alias("l"), base.alias("r")
    return (
        l.join(r, cond)
        .withColumn("cosine", cosine(F.col("l.__v"), F.col("r.__v")))
        .where(F.col("cosine") >= threshold)
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            "cosine",
        )
    )
