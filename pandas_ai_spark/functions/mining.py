"""Co-occurrence mining: frequent item pairs and association strength.

Market-basket analysis (which items ship together, which query terms
co-occur, which domains co-cite) is the 2-itemset core of FP-growth /
Apriori. At 100 TB the full lattice is pointless — what production
pipelines actually compute is the PAIR level with support/confidence/
lift, and that is expressible as plain relational algebra:

1. distinct (basket, item) — one shuffle, collapses quantity noise;
2. pair generation as a self-EQUI-join on the basket id with
   ``item_a < item_b`` (every unordered pair once, never a cross
   join); a per-basket item cap bounds the quadratic term — a
   pathological basket with 10⁵ items would otherwise emit 5·10⁹
   pairs on its own;
3. one aggregation per pair + a broadcast-joined per-item count table
   for the lift denominator.

Every step is a hash shuffle on (basket) or (pair) — partial aggs
apply, AQE splits skewed baskets, nothing touches Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_items_per_basket: int = 1000,
) -> DataFrame:
    """All unordered item pairs co-occurring in at least ``min_support``
    baskets, with association metrics.

    Returns ``(item_a, item_b, support, support_a, support_b,
    confidence, lift)`` where ``support`` counts baskets containing
    both items, ``confidence = support / support_a`` (a→b), and
    ``lift = support · N / (support_a · support_b)`` with ``N`` the
    total basket count — lift > 1 means the pair co-occurs more than
    independence predicts.

    Baskets larger than ``max_items_per_basket`` are truncated to their
    ``max_items_per_basket`` smallest items (deterministic, and
    WindowGroupLimit pushes the cut ahead of the shuffle) — the
    documented guard against quadratic blowup on degenerate baskets.
    """
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    items = (df.select(F.col(basket_col).alias("__b"),
                       F.col(item_col).alias("__i"))
               .where(F.col("__i").isNotNull())
               .distinct())
    if max_items_per_basket:
        w = Window.partitionBy("__b").orderBy(F.col("__i").asc())
        items = (items.withColumn("__rk", F.row_number().over(w))
                      .where(F.col("__rk") <= int(max_items_per_basket))
                      .drop("__rk"))

    # ONE scalar to the driver (the q53/q58 pattern — a count, not
    # data): attaching N as a literal keeps the lift projection
    # row-local instead of planning a 1-row nested-loop cross join
    n_baskets = items.select("__b").distinct().count()
    item_counts = items.groupBy("__i").agg(F.count("*").alias("__ni"))

    a = items.select("__b", F.col("__i").alias("item_a"))
    b = items.select("__b", F.col("__i").alias("item_b"))
    pairs = (a.join(b, "__b")
              .where(F.col("item_a") < F.col("item_b"))
              .groupBy("item_a", "item_b")
              .agg(F.count("*").alias("support"))
              .where(F.col("support") >= int(min_support)))

    # lift denominators: item counts are |distinct items| rows —
    # broadcast both lookups; the scalar N rides a broadcast cross join
    pairs = (
        pairs
        .join(F.broadcast(item_counts.withColumnRenamed("__i", "item_a")
                          .withColumnRenamed("__ni", "support_a")),
              "item_a")
        .join(F.broadcast(item_counts.withColumnRenamed("__i", "item_b")
                          .withColumnRenamed("__ni", "support_b")),
              "item_b")
    )
    return pairs.select(
        "item_a", "item_b", "support", "support_a", "support_b",
        (F.col("support") / F.col("support_a")).alias("confidence"),
        (F.col("support").cast("double") * F.lit(int(n_baskets))
         / (F.col("support_a").cast("double") * F.col("support_b")))
        .alias("lift"),
    )
