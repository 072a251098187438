"""Bucketed persistence for incremental-dedup state tables.

The incremental dedup operators (``dedup.minhash_incremental``,
``similarity.embedding_near_dup_incremental``) equi-join every new
batch against a corpus-sized state table — bands on ``(band, bsig)``,
LSH buckets on ``(tbl, bkt)``, shingle-hash sets on the doc id. At
100 TB that state is the big side of every join, and re-shuffling it
per batch is the dominant cost of continuous ingestion.

These writers persist state BUCKETED on the full join key
(:func:`~..sources.layout.write_bucketed`): the shuffle is paid once at
write time, and every later batch join reads the state pre-partitioned
— no Exchange under the state-side scan (asserted in tests; the
planner keeps a bucketed scan only when the bucket column set matches
the join's clustering keys). The tiny batch side still shuffles; that
is the side you want shuffling.

Tables are registered in the session catalog (``saveAsTable``
semantics) with files at ``<path>``; ``load_*`` returns them by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.layout import write_bucketed


def save_minhash_state(bands: DataFrame, hashes: DataFrame,
                       base_table: str, path: str,
                       num_buckets: int = 32,
                       mode: str = "overwrite") -> tuple[str, str]:
    """Persist ``minhash_state`` output bucketed for incremental joins:
    bands on ``bsig`` (⊆ the (band, bsig) join key), hashes on the id
    column (the verify join key). Returns the two table names."""
    bands_table = f"{base_table}_bands"
    hashes_table = f"{base_table}_hashes"
    id_col = [c for c in hashes.columns if c != "hashes"][0]
    write_bucketed(bands, bands_table, ["band", "bsig"],
                   num_buckets=num_buckets,
                   path=f"{path}/bands", mode=mode)
    write_bucketed(hashes, hashes_table, id_col, num_buckets=num_buckets,
                   path=f"{path}/hashes", mode=mode)
    return bands_table, hashes_table


def load_minhash_state(spark: SparkSession, base_table: str
                       ) -> tuple[DataFrame, DataFrame]:
    return (spark.table(f"{base_table}_bands"),
            spark.table(f"{base_table}_hashes"))


def save_embedding_lsh_state(state: DataFrame, base_table: str,
                             path: str, num_buckets: int = 32,
                             mode: str = "overwrite") -> str:
    """Persist ``embedding_lsh_state`` output bucketed on the
    ``(tbl, bkt)`` join key. Returns the table name."""
    table = f"{base_table}_lsh"
    write_bucketed(state, table, ["tbl", "bkt"], num_buckets=num_buckets,
                   path=path, mode=mode)
    return table


def load_embedding_lsh_state(spark: SparkSession,
                             base_table: str) -> DataFrame:
    return spark.table(f"{base_table}_lsh")


def save_novelty_vocab(vocab: DataFrame, base_table: str,
                       path: str | None = None,
                       num_buckets: int = 32,
                       mode: str = "overwrite") -> str:
    """Persist a :func:`~pandas_ai_spark.functions.text
    .build_novelty_vocab` table bucketed on ``gram`` (the novelty
    join key): the reference-side shuffle is paid once here, and every
    later :func:`ngram_novelty` batch joins the pre-partitioned
    vocabulary with no state-side Exchange. Returns the table name."""
    table = f"{base_table}_vocab"
    write_bucketed(vocab, table, "gram", num_buckets=num_buckets,
                   path=path, mode=mode)
    return table


def load_novelty_vocab(spark: SparkSession, base_table: str) -> DataFrame:
    return spark.table(f"{base_table}_vocab")
