"""Sequence packing: concat-and-chunk documents into fixed-token-budget
training sequences (the GPT-style pretraining pack: shuffle docs
deterministically, concatenate, slice into ``chunk_tokens`` windows).

The core primitive is a GLOBAL prefix sum over a deterministic order —
the naive Spark form (``Window.orderBy`` with no partition) funnels the
whole corpus through ONE partition. This implementation is the
distributed prefix-sum shape that survives 100 TB:

1. order key = md5(seed:doc_id) — deterministic pseudo-shuffle;
2. bucket = first two hex chars of the key (256 ordered buckets; the
   lexicographic (bucket, key) order IS the global key order);
3. per-bucket token totals → driver (256 rows) → running offsets;
4. within-bucket cumulative sum (window PARTITIONED by bucket — 256-way
   parallel, no global sort) + broadcast bucket offset.

Token counting uses :func:`text.token_count` (whitespace tokens of the
raw text) so the oracle can reproduce it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count


def pack_sequences(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", chunk_tokens: int = 2048,
                   seed: int = 42) -> DataFrame:
    """Assign every document a global token ``start_offset`` in the
    shuffled concatenation and the ``chunk_id`` its first token lands in.

    Returns ``(id_col, n_tokens, start_offset, chunk_id)``. Documents
    longer than ``chunk_tokens`` straddle chunks, as in concat-and-chunk
    pretraining; consumers slice ``[start_offset, start_offset +
    n_tokens)`` out of the virtual token stream.
    """
    keyed = df.select(
        F.col(id_col),
        # long, not int: the DuckDB oracle's len() yields BIGINT and the
        # driver's value-hash is dtype-sensitive
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(":", F.lit(str(seed)),
                          F.col(id_col).cast("string"))).alias("__h"),
    ).withColumn("__bucket", F.substring("__h", 1, 2))

    # 256-row driver aggregate → running offset per bucket
    totals = (keyed.groupBy("__bucket")
              .agg(F.sum("n_tokens").alias("__tot"))
              .orderBy("__bucket").collect())
    offsets = {}
    running = 0
    for r in totals:
        offsets[r["__bucket"]] = running
        running += r["__tot"]
    spark = df.sparkSession
    off_df = F.broadcast(spark.createDataFrame(
        [(b, int(o)) for b, o in offsets.items()],
        "__bucket string, __off long"))

    w = (Window.partitionBy("__bucket").orderBy("__h", id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        keyed.join(off_df, "__bucket")
        .withColumn("__cum", F.sum("n_tokens").over(w))
        .select(
            id_col, "n_tokens",
            (F.col("__off") + F.col("__cum") - F.col("n_tokens"))
            .alias("start_offset"),
        )
        .withColumn("chunk_id",
                    F.floor(F.col("start_offset") / chunk_tokens))
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window chunking for RAG/embedding ingestion: each doc's
    token array is sliced into windows of ``chunk_size`` tokens starting
    every ``stride`` tokens (overlap = chunk_size − stride). Returns one
    row per chunk: ``(id, chunk_idx, start_tok, chunk_len, chunk_md5)``
    — the md5 stands in for the chunk text so results stay narrow.

    All JVM: sequence → transform → posexplode; embarrassingly parallel
    (no shuffle at all — chunk rows inherit the scan's partitioning).
    Docs shorter than ``chunk_size`` produce one truncated chunk; the
    last window is the final partial slice unless a full window already
    covers the tail.

    The token array is materialized in its OWN projection before the
    window lambda: Catalyst does no CSE inside higher-order-function
    lambdas, so referencing the normalize+split expression there would
    re-tokenize the document once per window — measured 3.5× slower.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    if stride > chunk_size:
        # stride > size leaves inter-window gaps AND breaks the
        # cover-the-tail window count; no retrieval pipeline wants that
        raise ValueError("stride must be <= chunk_size (overlap >= 0)")
    from .text import normalize_text, whitespace_tokens

    pre = df.select(
        F.col(id_col),
        whitespace_tokens(normalize_text(F.col(text_col)))
         .alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    # number of windows: 1 + ceil(max(n - chunk_size, 0) / stride)
    n_win = (F.lit(1)
             + F.ceil(F.greatest(n - chunk_size, F.lit(0))
                      / F.lit(stride)).cast("int"))
    starts = F.sequence(F.lit(0), (n_win - 1) * stride, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start_tok"),
            F.concat_ws(" ", F.slice(toks, s + 1, chunk_size))
             .alias("txt")))
    exploded = pre.select(
        F.col(id_col), n.alias("__n"),
        F.posexplode(chunks).alias("chunk_idx", "c"))
    return exploded.select(
        id_col,
        "chunk_idx",
        F.col("c.start_tok").alias("start_tok"),
        F.least(F.lit(chunk_size), F.col("__n") - F.col("c.start_tok"))
         .alias("chunk_len"),
        F.md5(F.col("c.txt")).alias("chunk_md5"),
    )
