"""Skew-resilient joins: explicit key salting.

At 100 TB a handful of hot keys (the null key, a default account, a bot
user) can put one shuffle partition hours behind the rest. AQE's skew-join
split (on by default in the session) handles sort-merge cases at runtime;
this helper is the explicit form for when the planner can't — e.g. a hot
key on the *probe* side of a shuffled hash join, or deterministic plans
for repeated production runs.

Mechanics: probe rows get a random salt in [0, salt); the build side is
replicated once per salt value via an exploded literal array; the join key
becomes (key, salt), spreading each hot key over ``salt`` partitions.
Build-side cost is size × salt — use it on the smaller table, or first
isolate hot keys (``hot_keys``) and salt only those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str, min_count: int = 100_000) -> DataFrame:
    """Keys whose row count exceeds ``min_count`` — one cheap partial-agg
    pass; use to salt selectively instead of replicating the whole build
    side."""
    return (
        df.groupBy(key).count()
        .where(F.col("count") >= min_count)
        .select(key)
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side salted and the build side replicated
    ``salt`` times. Row-identical to ``probe.join(build, key)``; hot probe
    keys spread over ``salt`` shuffle partitions.

    The salt is derived from a hash of monotonically increasing row id —
    deterministic within a run without an extra random column.

    Only probe-preserving join types are supported: with ``right``/
    ``full``, an unmatched build row would surface once per salt replica
    (duplicated null-extended rows), so those raise.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti",
                   "semi", "anti", "cross"):
        raise ValueError(
            f"salted_join supports probe-preserving joins only, not "
            f"'{how}': the replicated build side would emit unmatched "
            f"build rows once per salt bucket")
    if salt < 2:
        return probe.join(build, probe.df[probe_key] == build[build_key]
                          if hasattr(probe, "df") else
                          F.col(probe_key) == F.col(build_key), how)
    p = probe.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
         .cast("int"))
    b = build.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    joined = p.join(
        b,
        (p[probe_key] == b[build_key]) & (p["__salt"] == b["__salt"]),
        how,
    )
    return joined.drop("__salt")
