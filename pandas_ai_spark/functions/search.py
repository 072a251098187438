"""Full-text retrieval: BM25 ranking over a document table.

The retrieval primitive a RAG/training-data pipeline needs next to the
embedding ANN family (`similarity.py`): lexical top-k with the Okapi
BM25 weighting (Robertson & Walker), entirely in DataFrame algebra.

Scale shape:
- the per-document token pass filters to QUERY TERMS BEFORE the tf
  aggregation (array_intersect on a literal term array — the filter
  rides the scan; a 100 TB corpus aggregates only rows containing at
  least one query term);
- document lengths come from the same single pass over matching docs
  plus one corpus-level (count, avg-length) aggregate — two driver
  scalars (scalar-only collect, the q58/q89 pattern);
- document frequencies aggregate the (doc, term) table — query-term
  cardinality rows, broadcast back;
- final top-k is ``TakeOrderedAndProject`` (never a global sort).

Reference parity: the reference has no search operator; its RAG story
is vector-store retrieval (`extensions/ee/vectorstores/`). BM25 is the
lexical complement of that surface.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str):
    return F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda t: t != "")


def bm25_search(df: DataFrame, query: str, id_col: str = "doc_id",
                text_col: str = "text", k1: float = 1.2,
                b: float = 0.75, top_k: int = 10,
                corpus_stats: tuple[int, float] | None = None
                ) -> DataFrame:
    """Top-k documents for ``query`` under Okapi BM25:
    ``(id, score)``, score descending (ties broken by id ascending).

    ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`` (the Lucene form —
    never negative), ``score(d) = Σ_t idf·tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl))`` with ``dl`` the document's token
    count and ``avgdl`` the corpus mean. N/avgdl cover the WHOLE
    corpus (not just matching docs), as the formula requires; pass
    ``corpus_stats`` from :func:`bm25_corpus_stats` to skip that pass
    when issuing many queries against one corpus.
    """
    q_terms = sorted({t for t in re.split(r"[^a-z0-9]+", query.lower())
                      if t})
    if not q_terms:
        raise ValueError("query contains no indexable terms")
    toks = _tokens(text_col)
    base = df.select(F.col(id_col).alias("id"), toks.alias("__toks"))
    if corpus_stats is None:
        corpus_stats = bm25_corpus_stats(df, text_col)
    n_docs, avgdl = corpus_stats
    if n_docs == 0:
        return base.select("id", F.lit(0.0).alias("score")).limit(0)
    lit_terms = F.array(*[F.lit(t) for t in q_terms])
    # keep only docs containing ≥1 query term, explode only the
    # matching terms — the tf table is tiny next to the corpus
    matched = (base
               .withColumn("__dl", F.size("__toks"))
               .withColumn("__hits",
                           F.array_intersect("__toks", lit_terms))
               .where(F.size("__hits") > 0))
    tf = (matched
          .select("id", "__dl",
                  F.explode(
                      F.filter("__toks",
                               lambda t: F.array_contains(lit_terms, t))
                  ).alias("term"))
          .groupBy("id", "__dl", "term")
          .agg(F.count("*").alias("tf")))
    df_counts = tf.groupBy("term").agg(
        F.countDistinct("id").alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df")
                              + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
    denom = (F.col("tf")
             + F.lit(float(k1)) * (F.lit(1.0 - b)
                                   + F.lit(float(b)) * F.col("__dl")
                                   / F.lit(float(avgdl))))
    scored = (tf.join(F.broadcast(df_counts.withColumn("idf", idf)
                                  .select("term", "idf")), "term")
                .withColumn("__s", F.col("idf") * F.col("tf")
                            * F.lit(float(k1 + 1)) / denom)
                .groupBy("id").agg(F.sum("__s").alias("score")))
    return (scored.orderBy(F.desc("score"), "id").limit(top_k))


def bm25_corpus_stats(df: DataFrame, text_col: str = "text"):
    """The (N, avgdl) corpus aggregate, exposed separately so repeated
    queries against one corpus compute it once and pass it to
    :func:`bm25_search` via ``corpus_stats``."""
    row = df.agg(
        F.count("*").alias("n"),
        F.avg(F.size(_tokens(text_col))).alias("avgdl")).collect()[0]
    return int(row["n"] or 0), float(row["avgdl"] or 0.0)


def build_trigram_index(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Character-trigram inverted index ``(gram, id)`` (the pg_trgm
    pattern): each doc's DISTINCT trigrams built row-locally
    (``transform`` over ``sequence`` + ``array_distinct`` — the dedup
    between positions happens before the explode), one pass over the
    corpus. Build once, ``write.bucketBy("gram")``, and every
    subsequent :func:`substring_search` touches only the needle's
    gram rows — the amortization that makes trigram search pay at
    100 TB (a one-shot query should just scan; see below)."""
    hay = F.lower(F.col(text_col))
    t = F.col("__t")
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - 2, F.lit(0))),
        lambda i: t.substr(i, F.lit(3))))
    return (df.select(F.col(id_col).alias("id"), hay.alias("__t"))
              .where(F.length(t) >= 3)
              .select("id", F.explode(grams).alias("gram")))


def substring_search(df: DataFrame, needle: str, id_col: str = "doc_id",
                     text_col: str = "text",
                     index: DataFrame | None = None) -> DataFrame:
    """Substring search over a document table, returning matching
    ``(id,)`` rows — case-insensitive ``contains`` semantics.

    With ``index`` (a persisted :func:`build_trigram_index` table):
    candidates are the ids whose index rows cover ALL the needle's
    trigrams (filter to the ≤len(needle) needle grams — rides the
    index scan / bucket pruning — then a count-equals check), and the
    exact ``contains`` verification joins back to fetch only candidate
    texts. Only the needle's gram rows and the candidate docs are ever
    read — the shape that pays when one index serves many queries.

    Without ``index``: one direct ``contains`` scan. Building a gram
    table inline would cost MORE than the scan it avoids (measured
    8.8 s vs 0.3 s at sf0.1) — an index is an amortized artifact, not
    a per-query one.
    """
    hay = F.lower(F.col(text_col))
    n = needle.lower()
    direct = (df.where(F.contains(hay, F.lit(n)))
                .select(F.col(id_col).alias("id")))
    if index is None or len(n) < 3:
        return direct
    needle_grams = sorted({n[i:i + 3] for i in range(len(n) - 2)})
    lit_grams = F.array(*[F.lit(g) for g in needle_grams])
    cand = (index.where(F.array_contains(lit_grams, F.col("gram")))
                 .groupBy("id")
                 .agg(F.countDistinct("gram").alias("__m"))
                 .where(F.col("__m") == len(needle_grams))
                 .select("id"))
    return (df.join(cand, df[id_col] == cand.id)
              .where(F.contains(hay, F.lit(n)))
              .select(cand.id))


def rrf_fuse(rankings: "list[DataFrame]", k: int = 60,
             top_k: int = 10, id_col: str = "id",
             score_col: str = "score") -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of several ranked
    retrieval lists — the standard hybrid-search combiner (BM25 +
    vector ANN): ``rrf = Σ_lists 1/(k + rank)`` where ``rank`` is the
    item's 1-based position in that list (absent ⇒ contributes 0).
    Returns ``(id, rrf, n_lists)`` — top ``top_k`` by rrf desc, id asc.

    Each input is an ALREADY-BOUNDED top-k list (``bm25_search`` /
    ``ann_bruteforce`` outputs — tens of rows by contract), so the
    per-list rank window is over a bounded input: a plan-audit ALLOW
    of the q83 class (the window's input is a top-k result, never a
    table scan). Ranks are recomputed from ``(score desc, id asc)``
    rather than trusted from the caller so fusion is deterministic
    even if a list arrives unordered. The union + one aggregation is
    the whole cost; at scale the expensive part is producing the
    input lists, never the fusion.
    """
    from pyspark.sql import Window

    if not rankings:
        raise ValueError("rankings must be non-empty")
    ranked = []
    # ALLOW(global_window): input lists are bounded top-k results.
    # Window over the POST-select aliases — score_col/id_col no longer
    # exist after the select below, so referencing them here would
    # raise for any non-default column names.
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    for r in rankings:
        ranked.append(
            r.select(F.col(id_col).alias("id"),
                     F.col(score_col).cast("double").alias("score"))
             .withColumn("__rank", F.row_number().over(w))
             .select("id", (F.lit(1.0)
                            / (F.lit(float(k)) + F.col("__rank")))
                     .alias("__c")))
    allc = ranked[0]
    for r in ranked[1:]:
        allc = allc.unionByName(r)
    return (allc.groupBy("id")
                .agg(F.sum("__c").alias("rrf"),
                     F.count("*").cast("bigint").alias("n_lists"))
                .orderBy(F.desc("rrf"), F.asc("id"))
                .limit(top_k))


def rbo_suffix_weights(p: float, depth: int) -> "list[tuple[int, float]]":
    """``[(m, S(m))]`` for ``S(m) = Σ_{i=m..depth} p^(i-1)/i`` —
    computed ONCE on the driver in Python so both the Spark plan and
    any SQL oracle embed the identical double literals (Spark's JVM
    ``pow`` and DuckDB's libm ``pow`` disagree in the last ulp for
    some ``(0.9, i)`` pairs; literal weights make the statistic
    engine-exact by construction). Bounded by ``depth`` rows."""
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0, 1)")
    if depth < 1:
        raise ValueError("depth must be >= 1")
    svals: dict[int, float] = {}
    acc = 0.0
    for i in range(int(depth), 0, -1):
        acc += (p ** (i - 1)) / i
        svals[i] = acc
    return [(i, svals[i]) for i in range(1, int(depth) + 1)]


def rbo(ranked_a: DataFrame, ranked_b: DataFrame, id_col: str = "id",
        rank_col: str = "rank", p: float = 0.9,
        depth: int = 50) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010), truncated at
    ``depth`` with no extrapolation — the ranking-eval companion of
    :func:`rrf_fuse`: how similar are two top-k retrieval lists,
    weighting agreement at the TOP of the lists more (persistence
    ``p``: weight of depth i is ``p^(i-1)``). Returns one row
    ``(depth, p, overlap_at_depth, rbo)`` where ``overlap_at_depth``
    is ``|A_d ∩ B_d|`` and
    ``rbo = (1-p) Σ_{i=1..d} p^(i-1) · |A_i ∩ B_i| / i``.

    Inputs are ``(id, rank)`` tables with unique 1-based ranks (the
    shape every top-k operator here emits; ranks beyond ``depth`` are
    ignored). Distributed form: an id in both top-d lists enters every
    prefix ``i >= m = max(rank_a, rank_b)``, so its total contribution
    is the suffix sum ``S(m) = Σ_{i=m..d} p^(i-1)/i`` — a function of
    ``m`` alone. The join is one bounded equi-join of two top-d lists;
    S(m) is a ``depth``-row DRIVER-computed literal table
    (:func:`rbo_suffix_weights` — engine ``pow`` implementations
    differ in the last ulp, so the weights are Python floats embedded
    as literals on both engines instead); the final fold is over at
    most ``depth`` m-classes with integer counts, order-pinned
    (``aggregate(sort_array)``) so both engines add the same doubles
    in the same order.
    """
    spark = ranked_a.sparkSession
    d = int(depth)
    a = ranked_a.select(F.col(id_col).alias("__id"),
                        F.col(rank_col).cast("bigint").alias("__ra")) \
        .where(F.col("__ra") <= d)
    b = ranked_b.select(F.col(id_col).alias("__idb"),
                        F.col(rank_col).cast("bigint").alias("__rb")) \
        .where(F.col("__rb") <= d)
    both = a.join(b, F.col("__id") == F.col("__idb")).select(
        F.greatest("__ra", "__rb").alias("__m"))
    suffix = spark.createDataFrame(
        rbo_suffix_weights(p, d), "__i bigint, __S double")
    counts = both.groupBy("__m").agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt"))
    joined = counts.join(F.broadcast(suffix),
                         F.col("__m") == F.col("__i"))
    stk = joined.select(
        F.col("__cnt"),
        F.struct(F.col("__m").alias("m"),
                 (F.col("__cnt").cast("double") * F.col("__S"))
                 .alias("term")).alias("__s"))
    agg = stk.agg(
        F.sum("__cnt").cast("bigint").alias("overlap_at_depth"),
        F.aggregate(F.sort_array(F.collect_list("__s")), F.lit(0.0),
                    lambda acc, x: acc + x["term"]).alias("__sum"))
    return agg.select(
        F.lit(d).cast("bigint").alias("depth"),
        F.lit(float(p)).alias("p"),
        F.coalesce(F.col("overlap_at_depth"), F.lit(0).cast("bigint"))
         .alias("overlap_at_depth"),
        ((1.0 - F.lit(float(p))) * F.coalesce(F.col("__sum"),
                                              F.lit(0.0)))
        .alias("rbo"))


def dcg_discounts(k: int) -> "list[tuple[int, float]]":
    """``[(i, 1/log2(i+1))]`` for i = 1..k — driver-computed Python
    literals embedded on BOTH engines (the rbo_suffix_weights device:
    engine log implementations can differ in the last ulp)."""
    import math

    if k < 1:
        raise ValueError("k must be >= 1")
    return [(i, 1.0 / math.log2(i + 1)) for i in range(1, int(k) + 1)]


def ranking_metrics(runs: DataFrame, qrels: DataFrame, k: int = 10,
                    query_col: str = "query_id", id_col: str = "doc_id",
                    rank_col: str = "rank",
                    rel_col: str = "rel") -> DataFrame:
    """Retrieval-evaluation battery per query: nDCG@k (graded), MRR@k,
    AP@k, precision@k, recall@k — the eval a training pipeline runs
    over its retriever before trusting retrieved context. ``runs`` is
    ``(query, doc, rank)`` with unique 1-based ranks per query (every
    top-k operator's output shape); ``qrels`` is ``(query, doc, rel)``
    graded relevance (rel > 0 counts as relevant for the binary
    metrics; rel grades weight nDCG).

    Determinism: the 1/log2(i+1) discount table is driver-computed
    literals (:func:`dcg_discounts`) shared with any SQL oracle; all
    per-query folds are order-pinned by rank (``aggregate(sort_array)``)
    over at most k terms; precision terms are exact-integer ratios.

    Scale shape: one bounded equi-join of the top-k run table with
    qrels, one per-query rank window (bounded at k rows per query),
    one per-query aggregation — nothing wider than queries × k.
    """
    from pyspark.sql.window import Window

    spark = runs.sparkSession
    kk = int(k)
    w = F.broadcast(spark.createDataFrame(
        dcg_discounts(kk), "__i bigint, __w double"))
    r = runs.select(F.col(query_col).alias("__q"),
                    F.col(id_col).alias("__d"),
                    F.col(rank_col).cast("bigint").alias("__r")) \
        .where(F.col("__r") <= kk)
    qr = qrels.select(F.col(query_col).alias("__q"),
                      F.col(id_col).alias("__d"),
                      F.col(rel_col).cast("bigint").alias("__rel"))
    j = r.join(qr, ["__q", "__d"], "left") \
         .withColumn("__rel", F.coalesce(F.col("__rel"), F.lit(0)))
    win = Window.partitionBy("__q").orderBy("__r")
    j = j.withColumn(
        "__cum", F.sum((F.col("__rel") > 0).cast("bigint")).over(win))
    j = j.join(w, F.col("__r") == F.col("__i"))
    hit = F.col("__rel") > 0
    per_q = j.groupBy(F.col("__q")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ranked"),
        F.sum(hit.cast("bigint")).cast("bigint").alias("__hits"),
        F.min(F.when(hit, F.col("__r"))).cast("bigint")
         .alias("__first"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct(
                F.col("__r").alias("r"),
                (F.col("__rel").cast("double") * F.col("__w"))
                .alias("t")))),
            F.lit(0.0), lambda a, x: a + x["t"]).alias("__dcg"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct(
                F.col("__r").alias("r"),
                F.when(hit, F.col("__cum") / F.col("__r"))
                 .otherwise(F.lit(0.0)).alias("t")))),
            F.lit(0.0), lambda a, x: a + x["t"]).alias("__apn"))
    nr = qr.where(F.col("__rel") > 0).groupBy("__q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rel"))
    iwin = Window.partitionBy("__q").orderBy(
        F.desc("__rel"), F.asc("__d"))
    ideal = (qr.where(F.col("__rel") > 0)
             .withColumn("__ir", F.row_number().over(iwin)
                         .cast("bigint"))
             .where(F.col("__ir") <= kk)
             .join(w, F.col("__ir") == F.col("__i"))
             .groupBy("__q")
             .agg(F.aggregate(
                 F.sort_array(F.collect_list(F.struct(
                     F.col("__ir").alias("r"),
                     (F.col("__rel").cast("double") * F.col("__w"))
                     .alias("t")))),
                 F.lit(0.0), lambda a, x: a + x["t"]).alias("__idcg")))
    out = (per_q.join(nr, "__q", "left").join(ideal, "__q", "left")
           .withColumn("n_rel", F.coalesce(F.col("n_rel"), F.lit(0))))
    nrel = F.col("n_rel").cast("double")
    ndcg = F.when(F.col("__idcg") > 0, F.col("__dcg") / F.col("__idcg"))
    mrr = F.coalesce(1.0 / F.col("__first").cast("double"), F.lit(0.0))
    ap = F.when(F.col("n_rel") > 0,
                F.col("__apn")
                / F.least(nrel, F.lit(float(kk))))
    prec = F.col("__hits").cast("double") / F.lit(float(kk))
    rec = F.when(F.col("n_rel") > 0,
                 F.col("__hits").cast("double") / nrel)
    return out.select(
        F.col("__q").alias(query_col), "n_ranked", "n_rel",
        ndcg.alias("ndcg_at_k"), mrr.alias("mrr_at_k"),
        ap.alias("ap_at_k"), prec.alias("precision_at_k"),
        rec.alias("recall_at_k"))
