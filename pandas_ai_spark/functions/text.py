"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): language ID,
quality scoring, token counting, document fingerprinting. Everything here
is built from JVM-side ``pyspark.sql.functions`` — no Python in the hot
path — so a 100 TB documents table processes at parquet-scan speed with
zero shuffles (all operators are row-local projections).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# A small deterministic stopword inventory per language for the n-gram/
# stopword language heuristic. Real pipelines would plug fastText/CLD3 in
# via a pandas_udf; the heuristic keeps everything JVM-side.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "las", "es", "una", "para", "con", "por", "del"],
}

# BPE-ish pre-tokenizer: words, numbers, or single non-space symbols —
# the GPT-2 pre-tokenizer family without the byte-level details.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

PUNCT_REGEX = r"[^\w\s]"


def whitespace_tokens(col: Column) -> Column:
    """Array of whitespace-delimited tokens (empty array for blank text)."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(trimmed, r"\s+"))


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(whitespace_tokens(col))


def regex_token_count(col: Column) -> Column:
    """BPE-ish token count (words / numbers / symbols as separate tokens)."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), 0))


def punct_ratio(col: Column) -> Column:
    return (
        F.size(F.regexp_extract_all(col, F.lit(PUNCT_REGEX), 0))
        / F.greatest(F.length(col), F.lit(1))
    )


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    # single pass: hits and count accumulate together; `acc` is a lambda
    # variable, so the token split evaluates ONCE (Catalyst does no CSE
    # inside HOF lambdas — referencing toks twice doubles the split cost)
    stops = LANG_STOPWORDS[lang]
    toks = whitespace_tokens(F.lower(col))
    return F.aggregate(
        toks,
        F.struct(F.lit(0).alias("hits"), F.lit(0).alias("n")),
        lambda acc, t: F.struct(
            (acc["hits"] + t.isin(*stops).cast("int")).alias("hits"),
            (acc["n"] + 1).alias("n")),
        lambda acc: acc["hits"] / F.greatest(acc["n"], F.lit(1)),
    )


def mean_word_length(col: Column) -> Column:
    toks = whitespace_tokens(col)
    return F.aggregate(
        toks,
        F.struct(F.lit(0).cast("bigint").alias("total"),
                 F.lit(0).alias("n")),
        lambda acc, t: F.struct(
            (acc["total"] + F.length(t)).alias("total"),
            (acc["n"] + 1).alias("n")),
        lambda acc: acc["total"] / F.greatest(acc["n"], F.lit(1)),
    )


def quality_score(col: Column, lang: str = "en") -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    stopword presence + sane mean word length. Mirrors the C4/Gopher-style
    rule filters used in LLM data pipelines, expressed as one JVM
    projection."""
    n_tok = token_count(col)
    len_ok = (n_tok >= 5) & (n_tok <= 100000)
    punct_ok = punct_ratio(col) < 0.3
    stop_ok = stopword_ratio(col, lang) > 0.01
    word_len = mean_word_length(col)
    wordlen_ok = (word_len >= 2) & (word_len <= 15)
    score = (
        len_ok.cast("int") + punct_ok.cast("int")
        + stop_ok.cast("int") + wordlen_ok.cast("int")
    )
    return (score / F.lit(4.0)).alias("quality_score")


def detect_language(col: Column) -> Column:
    """Stopword-vote language ID over :data:`LANG_STOPWORDS`.

    Ties and zero-hit rows return 'und' (undetermined). Deterministic:
    highest hit count wins, ties broken by language code order.
    """
    toks = whitespace_tokens(F.lower(col))
    langs = sorted(LANG_STOPWORDS)

    def merge(acc: Column, t: Column) -> Column:
        return F.array(*[
            acc[i] + t.isin(*LANG_STOPWORDS[lang]).cast("int")
            for i, lang in enumerate(langs)
        ])

    def finish(acc: Column) -> Column:
        best = F.greatest(*[acc[i] for i in range(len(langs))])
        result = F.lit("und")
        # reversed so the first language in sorted order wins ties
        for i, lang in reversed(list(enumerate(langs))):
            result = F.when((acc[i] == best) & (best > 0), lang) \
                      .otherwise(result)
        return result

    # one pass over the tokens; all per-language counters ride in one
    # accumulator array, and `finish` sees the accumulator variable — the
    # split itself is evaluated once per row
    return F.aggregate(
        toks, F.array(*[F.lit(0) for _ in langs]), merge, finish)


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, strip
    punctuation, collapse whitespace."""
    lowered = F.lower(col)
    no_punct = F.regexp_replace(lowered, PUNCT_REGEX, "")
    return F.trim(F.regexp_replace(no_punct, r"\s+", " "))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: MD5 of the normalized text.
    Pair with :func:`rolling_hashes` for shift-tolerant fingerprints."""
    return F.md5(normalize_text(col))


def rolling_hashes(col: Column, window: int = 8) -> Column:
    """Array of rolling (Rabin-Karp-style) hashes over word ``window``-grams
    of the normalized text — the winnowing primitive for near-dup detection.
    One xxhash64 per n-gram, all JVM-side."""
    toks = whitespace_tokens(normalize_text(col))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
    return F.when(n < window, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            idx,
            lambda i: F.xxhash64(
                F.concat_ws(" ", F.slice(toks, i + 1, window))
            ),
        )
    )


def with_text_stats(df: DataFrame, text_col: str = "text",
                    lang: str = "en") -> DataFrame:
    """Convenience: append the full stat block to a documents table."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        regex_token_count(c).alias("n_tokens_bpe"),
        punct_ratio(c).alias("punct_ratio"),
        stopword_ratio(c, lang).alias("stopword_ratio"),
        mean_word_length(c).alias("mean_word_len"),
        quality_score(c, lang).alias("quality_score"),
        detect_language(c).alias("lang_detected"),
        fingerprint(c).alias("fingerprint"),
    )


def fuzzy_pairs(df, col: str, id_col: str, max_dist: int = 2,
                block_col=None):
    """Pairs of rows whose ``col`` values are within ``max_dist`` edit
    distance (Levenshtein, JVM builtin).

    Candidate generation is an EQUI-join, never a nested loop: lengths
    are bucketed with width ``max_dist+1``, so any pair within the
    length-band bound ``|len(a)−len(b)| ≤ max_dist`` (a necessary
    condition for edit distance) sits in the same or an adjacent bucket.
    The probe side explodes each row to its bucket ±1; joining that
    against the build side's home bucket hits every qualifying unordered
    pair exactly once (the ``id_a < id_b`` filter keeps one direction).
    Spark plans a shuffled hash/sort-merge join on the bucket key — a
    plain ``|len(a)−len(b)| ≤ d`` predicate has no equality and planned
    as BroadcastNestedLoopJoin, O(N²) comparisons at any scale.

    Length alone is a skewed blocker on real corpora (most strings
    cluster around a few lengths); pass ``block_col`` (first-k-chars,
    phonetic key, LSH bucket...) to tighten candidates — it is AND-ed
    into the equi-key, not applied post-join.
    """
    from pyspark.sql import functions as F

    w = max_dist + 1
    base = df.select(F.col(id_col), F.col(col),
                     F.length(col).alias("__len"),
                     *([F.col(block_col)] if block_col else []))
    home = base.withColumn("__b", F.floor(F.col("__len") / w))
    probe = home.withColumn(
        "__b", F.explode(F.array(F.col("__b") - 1, F.col("__b"),
                                 F.col("__b") + 1)))
    l, r = probe.alias("l"), home.alias("r")
    key = (F.col("l.__b") == F.col("r.__b"))
    if block_col:
        key = key & (F.col(f"l.{block_col}") == F.col(f"r.{block_col}"))
    lev = F.levenshtein(F.col(f"l.{col}"), F.col(f"r.{col}"), max_dist)
    return (
        l.join(r, key)
        .where((F.col(f"l.{id_col}") < F.col(f"r.{id_col}")) &
               (F.abs(F.col("l.__len") - F.col("r.__len")) <= max_dist))
        .withColumn("dist", lev)
        .where(F.col("dist") >= 0)  # threshold form returns -1 if > max
        .select(F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"), "dist")
    )


# ---------------------------------------------------------------------------
# PII redaction + repetition-quality signals (training-corpus hygiene)
# ---------------------------------------------------------------------------

# Patterns restricted to syntax valid in BOTH Java regex (Spark) and RE2
# (DuckDB) — no lookaround — so the oracle can replicate redaction
# byte-for-byte. Order matters: email before phone (digits in domains),
# url before ip (IPs inside urls are part of the url token).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("url", r"https?://[^\s]+"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{3}-\d{4}"),
]


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-type PII occurrence counts — pure JVM projections."""
    return {
        name: F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
        for name, pat in PII_PATTERNS
    }


def redact_pii(col: Column) -> Column:
    """Replace each PII occurrence with a ``<TYPE>`` placeholder, applied
    in PII_PATTERNS order (row-local, scan-speed at 100 TB)."""
    out = col
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def _top_gram_fraction_udf(ns: tuple[int, ...]):
    """Arrow-batched UDF: text → struct of top-n-gram fractions, one per
    ``n`` in ``ns`` (fields ``f{n}``), computed in ONE pass over each
    document.

    Execution-shape note (all three forms measured at sf0.1, two-signal
    query): explode → groupBy(doc, gram) → groupBy(doc) is 1.9s and
    moves every token through two shuffles; a pure-JVM ``aggregate``
    fold over the sorted gram array avoids the shuffle but runs
    interpreted (higher-order functions have no codegen) at 3.5s; this
    Arrow UDF with a per-doc Counter is 1.15s. Per-doc mode counting is
    the case the built-ins genuinely can't express shuffle-free, so the
    vectorized-Python path is the right one: row-local (zero shuffles —
    at 100 TB it rides the scan), O(doc length) per doc, and the Arrow
    batch transfer is the only overhead.

    Tokenization mirrors :func:`normalize_text` + whitespace split
    byte-for-byte: Java regex ``\\w``/``\\s`` are ASCII-only, hence
    ``re.ASCII`` here.
    """
    import re

    from pyspark.sql import types as T

    npunct = re.compile(PUNCT_REGEX, re.ASCII)
    ws = re.compile(r"\s+", re.ASCII)
    schema = T.StructType(
        [T.StructField(f"f{n}", T.DoubleType()) for n in ns])

    @F.pandas_udf(schema)
    def f(texts: pd.Series) -> pd.DataFrame:
        from collections import Counter

        cols: dict[str, list[float]] = {f"f{n}": [] for n in ns}
        for t in texts:
            toks = [x for x in ws.split(
                npunct.sub("", (t or "").lower()).strip()) if x]
            for n in ns:
                if len(toks) < n:
                    cols[f"f{n}"].append(0.0)
                    continue
                counts = Counter(
                    toks if n == 1
                    else zip(*(toks[j:] for j in range(n))))
                cols[f"f{n}"].append(
                    max(counts.values()) / (len(toks) - n + 1))
        return pd.DataFrame(cols)

    return f


def top_ngram_fraction_col(text: Column, n: int = 1) -> Column:
    """Fraction of the text's token n-grams taken by its single most
    frequent n-gram — see :func:`_top_gram_fraction_udf` for the
    execution shape. For several ``n`` over the same column, call the
    factory once with all of them (one pass) instead of this per-n."""
    return _top_gram_fraction_udf((n,))(text)[f"f{n}"]


def top_ngram_fraction(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 1) -> DataFrame:
    """Fraction of a doc's token n-grams taken by its single most
    frequent n-gram — the Gopher-style repetition signal (high fraction
    = boilerplate / degenerate repetition; typical filters drop docs
    above ~0.2 for unigrams). Returns ``(id_col, frac)``; docs with no
    n-grams (shorter than n) get frac 0.0.
    """
    return df.select(
        F.col(id_col),
        top_ngram_fraction_col(F.col(text_col), n).alias("frac"))


def tfidf_top_terms(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Top-``k`` TF-IDF terms per document (keyword extraction):
    ``tfidf = tf · ln(N/df)``, ties broken by term so the result is
    deterministic. Returns ``(id, rk, term, tfidf)``.

    Scale shape: explode → one shuffle on ``(id, term)`` for tf; the
    document-frequency agg reuses those rows with a second shuffle on
    ``term`` (partial-agg combines first — df rows are one per distinct
    term, tiny); the tf↔df join shuffles on ``term``; the final top-k
    is a per-doc window over ≤|distinct terms per doc| rows. N is one
    count() job — a scalar, not a collect of data. No Python in the
    plan.
    """
    c = F.col(text_col)
    n_docs = df.count()
    terms = df.select(
        F.col(id_col), F.explode(whitespace_tokens(normalize_text(c)))
         .alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "term").withColumn(
        "tfidf",
        F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(id_col, "rk", "term", "tfidf")
    )


def unigram_cross_entropy(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Per-document cross-entropy under the corpus's own unigram LM —
    the CCNet-style quality signal (KenLM stand-in): ``H(doc) = ln(T)
    − Σ tf·ln(c_term) / Σ tf`` where ``c`` is the corpus count of the
    term and ``T`` the total token count. High = unusual/garbage, low =
    boilerplate. Returns ``(id, n_tokens, cross_entropy)``.

    Scale shape: (doc,term) tf agg → global term counts (rows = vocab,
    partial-agg combined) → tf⊳counts join on term (distinct terms per
    doc, not occurrences) → per-doc agg. Three shuffles, all on keys
    with natural cardinality control; the only driver value is the
    scalar T. ln(T) is computed with the C library (math.log) so SQL
    engines on the same libm agree bit-for-bit.
    """
    import math

    c = F.col(text_col)
    terms = df.select(
        F.col(id_col), F.explode(whitespace_tokens(normalize_text(c)))
         .alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    cnt = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    total = cnt.agg(F.sum("c")).collect()[0][0]
    return (
        tf.join(cnt, "term")
        .groupBy(id_col)
        .agg(F.sum("tf").alias("n_tokens"),
             (F.lit(math.log(float(total)))
              - F.sum(F.col("tf") * F.log("c")) / F.sum("tf"))
             .alias("cross_entropy"))
    )


def remove_boilerplate_lines(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id",
                             max_doc_frac: float = 0.5) -> DataFrame:
    """Line-level boilerplate removal (RefinedWeb/trafilatura-style):
    a line whose normalized form appears in more than ``max_doc_frac``
    of all documents (site headers, cookie banners, license footers) is
    dropped from every document; document line order is preserved.
    Returns ``(id, text, n_lines_kept)`` with the cleaned text.

    Scale shape: lines explode once; frequency counts group on the
    line's md5 (16 bytes shuffled, never line text) with countDistinct
    per doc; the boilerplate key set — only keys above the threshold,
    tiny by construction — is BROADCAST into an anti-join; documents
    reassemble with one per-doc group (array_sort on (idx, line)
    structs, no window). Total: two shuffles plus a scalar count.
    """
    n_docs = df.count()
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n"))
         .alias("__idx", "__line"),
    ).withColumn("__key", F.md5(F.trim(F.col("__line"))))
    boiler = (
        lines.groupBy("__key")
        .agg(F.countDistinct(id_col).alias("__docs"))
        .where(F.col("__docs") > F.lit(float(max_doc_frac) * n_docs))
        .select("__key")
    )
    kept = lines.join(F.broadcast(boiler), "__key", "left_anti")
    return (
        kept.groupBy(id_col)
        .agg(F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("__idx"), F.col("__line")))),
                    lambda s: s["__line"])).alias(text_col),
             F.count("*").alias("n_lines_kept"))
    )


def compression_ratio(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", level: int = 6) -> DataFrame:
    """zlib compression ratio per document (compressed/raw bytes) — the
    Gopher-family redundancy signal: highly repetitive or degenerate
    text compresses far below normal prose. Arrow-batched pandas_udf
    (zlib is C-speed; ~100 MB/s/core) — no JVM zlib expression exists,
    so this is a legitimate Python-path operator. No SQL oracle (no
    compression function in the oracle engine); known-value bounds are
    unit-tested. Returns ``(id, raw_bytes, ratio)``."""
    import pandas as pd
    import zlib

    def _comp(texts):
        raws, ratios = [], []
        for t in texts:
            b = (t or "").encode("utf-8")
            raws.append(len(b))
            ratios.append(
                round(len(zlib.compress(b, level)) / max(len(b), 1), 6))
        return pd.DataFrame({"raw_bytes": raws, "ratio": ratios})

    comp = F.pandas_udf(_comp, "struct<raw_bytes: long, ratio: double>")

    return df.select(
        F.col(id_col), comp(F.col(text_col)).alias("c")
    ).select(id_col, "c.raw_bytes", "c.ratio")


def pmi_collocations(df: DataFrame, text_col: str = "text",
                     min_count: int = 5, top_k: int = 50) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information:
    ``(w1, w2, n_pair, n_w1, n_w2, pmi)`` — the standard
    corpus-statistics pass for multiword-expression discovery
    (Church & Hanks 1990).

    Tokenization is alphabetic-lowercase (``[^a-z]+`` split), shared
    with the DuckDB oracle. Bigrams are built ROW-LOCALLY with an array
    ``transform`` over adjacent token pairs — no positional self-join,
    no Python. Unigram and bigram counts are two aggregations; the
    unigram table (vocabulary-sized) re-attaches via two
    broadcast-eligible joins; the corpus token total is one driver
    scalar (scalar-only collect, as q58). Final top-k is
    ``TakeOrderedAndProject`` — never a global sort materialization.

    ``pmi = ln(n_pair · T / (n_w1 · n_w2))`` with T the corpus token
    count; ``min_count`` suppresses the low-frequency pairs whose PMI
    is spuriously high (the classic PMI pathology).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda t: t != "")
    base = df.select(toks.alias("__toks"))
    uni = (base.select(F.explode("__toks").alias("w"))
               .groupBy("w").agg(F.count("*").alias("n_w")))
    total = uni.agg(F.sum("n_w")).collect()[0][0] or 0
    if total == 0:
        return uni.select(
            F.col("w").alias("w1"), F.col("w").alias("w2"),
            F.lit(0).cast("long").alias("n_pair"),
            F.lit(0).cast("long").alias("n_w1"),
            F.lit(0).cast("long").alias("n_w2"),
            F.lit(0.0).alias("pmi")).limit(0)
    bigrams = F.transform(
        F.slice(F.col("__toks"), 1,
                F.greatest(F.size("__toks") - 1, F.lit(0))),
        lambda x, i: F.struct(
            x.alias("w1"),
            F.element_at(F.col("__toks"), i + 2).alias("w2")))
    pairs = (base.where(F.size("__toks") >= 2)
                 .select(F.explode(bigrams).alias("__b"))
                 .groupBy(F.col("__b.w1").alias("w1"),
                          F.col("__b.w2").alias("w2"))
                 .agg(F.count("*").alias("n_pair"))
                 .where(F.col("n_pair") >= min_count))
    out = (pairs
           .join(F.broadcast(uni.select(F.col("w").alias("w1"),
                                        F.col("n_w").alias("n_w1"))),
                 "w1")
           .join(F.broadcast(uni.select(F.col("w").alias("w2"),
                                        F.col("n_w").alias("n_w2"))),
                 "w2")
           .withColumn("pmi", F.log(
               F.col("n_pair") * F.lit(float(total))
               / (F.col("n_w1") * F.col("n_w2")))))
    return (out.select("w1", "w2", "n_pair", "n_w1", "n_w2", "pmi")
               .orderBy(F.desc("pmi"), "w1", "w2")
               .limit(top_k))


def jsd_term_drift(df_expected: DataFrame, df_actual: DataFrame,
                   text_col: str = "text", top_k: int = 50) -> DataFrame:
    """Jensen–Shannon term-distribution drift between two corpus
    snapshots: per term, both unigram probabilities and the term's JSD
    contribution ``½·p·ln(p/m) + ½·q·ln(q/m)`` with ``m = (p+q)/2``;
    total JSD (nats, 0 ≤ JSD ≤ ln 2) = Σ over ALL terms. Output: the
    ``top_k`` largest contributors (the words driving the drift — the
    actionable monitoring artifact), ordered by contribution.

    The lexical complement of
    :func:`~pandas_ai_spark.functions.stats.population_stability_index`
    (numeric drift): same two-snapshot shape, same scalar-only-collect
    totals, tokenization shared with :func:`pmi_collocations` and the
    DuckDB oracle. A term absent from one side contributes its other
    side's ½·ln 2 share — no flooring needed (JSD, unlike KL/PSI, is
    finite by construction). Each snapshot is one token-count
    aggregation; the two (vocabulary-sized) count tables full-outer
    join on the term.
    """
    def counts(d: DataFrame) -> DataFrame:
        toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z]+"),
                        lambda t: t != "")
        return (d.select(F.explode(toks).alias("term"))
                 .groupBy("term").agg(F.count("*").alias("n")))

    ce, ca = counts(df_expected), counts(df_actual)
    t_e = ce.agg(F.sum("n")).collect()[0][0] or 0
    t_a = ca.agg(F.sum("n")).collect()[0][0] or 0
    if t_e == 0 or t_a == 0:
        raise ValueError("both snapshots must contain tokens")
    j = (ce.withColumnRenamed("n", "n_expected")
           .join(ca.withColumnRenamed("n", "n_actual"),
                 "term", "full")
           .fillna(0, ["n_expected", "n_actual"]))
    p = F.col("n_expected") / F.lit(float(t_e))
    q = F.col("n_actual") / F.lit(float(t_a))
    m = (p + q) / 2
    contrib = (F.when(p > 0, 0.5 * p * F.log(p / m)).otherwise(0.0)
               + F.when(q > 0, 0.5 * q * F.log(q / m)).otherwise(0.0))
    return (j.select("term", "n_expected", "n_actual",
                     p.alias("p_expected"), q.alias("p_actual"),
                     contrib.alias("jsd_contribution"))
             .orderBy(F.desc("jsd_contribution"), "term")
             .limit(top_k))


def _gram_hashes(d: DataFrame, n: int, text_col: str, *keep):
    """Row-local distinct token n-gram hashes: grams leave the row as
    64-bit hashes, never strings — the q21/q52 shuffle-width
    discipline. xxhash64 hashes the token-array SLICE structurally (no
    per-gram string build); false-share risk is a 2⁻⁶⁴ collision, the
    documented dedup-family tradeoff. Shared by :func:`ngram_novelty`
    and :func:`build_novelty_vocab` so a persisted vocabulary is
    bit-compatible with the one-shot path."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z]+"),
                    lambda tkn: tkn != "")
    # materialize the token array through a projection boundary before
    # the transform: referencing the raw expression inside the lambda
    # re-runs the regex split once per gram position (r14 q107 fix —
    # the explode dropped ~6x at sf0.1)
    base = (d.select(*keep, toks.alias("__tk"))
             .where(F.size("__tk") >= n))
    arr = F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.size("__tk") - n),
        lambda i: F.xxhash64(F.slice(F.col("__tk"), i + 1, n))))
    return base.select(*[F.col(c) for c in base.columns
                         if c != "__tk"],
                       F.explode(arr).alias("__h"))


def build_novelty_vocab(reference: DataFrame, n: int = 3,
                        text_col: str = "text") -> DataFrame:
    """The reference-side artifact of :func:`ngram_novelty`: DISTINCT
    reference gram hashes as one ``gram bigint`` column. The 5 s cold
    cost of a novelty query is almost entirely this build — construct
    it once, persist it bucketed on ``gram``
    (:func:`~pandas_ai_spark.functions.state_store.save_novelty_vocab`),
    and every later batch scores against the pre-partitioned table with
    no state-side shuffle — the same build-once/join-many shape as the
    trigram index and the minhash/LSH state stores."""
    return (_gram_hashes(reference, n, text_col).distinct()
            .withColumnRenamed("__h", "gram"))


def ngram_novelty(df: DataFrame, reference: DataFrame | None = None,
                  n: int = 3,
                  id_col: str = "doc_id", text_col: str = "text",
                  vocab: DataFrame | None = None) -> DataFrame:
    """Per-document n-gram novelty vs a reference corpus:
    ``(id, n_grams, n_novel, novelty)`` where ``novelty`` is the
    fraction of the document's distinct token ``n``-grams NOT seen
    anywhere in ``reference`` — the memorization-risk / originality
    score next to decontamination (which flags overlap with a known
    EVAL set; this measures overlap with any reference corpus, in the
    inverse direction).

    Shape: both gram sets are row-local array transforms (the shingle
    construction :mod:`~pandas_ai_spark.functions.dedup` uses); the
    reference side collapses to DISTINCT grams (vocabulary-sized);
    the per-doc grams LEFT-join that table and one grouped agg counts
    misses. Tokenization is alphabetic-lowercase, shared with the
    DuckDB oracle. Documents with fewer than ``n`` tokens are omitted
    (no grams to score).

    Pass ``vocab`` (a :func:`build_novelty_vocab` table, typically
    persisted + reloaded via ``state_store.save_novelty_vocab``) to
    skip the reference-side distinct-gram build — results are
    byte-identical to the one-shot ``reference`` path (test-asserted);
    ``n`` must match the value the vocabulary was built with.
    """
    if (reference is None) == (vocab is None):
        raise ValueError(
            "ngram_novelty needs exactly one of reference= or vocab=")
    if vocab is not None:
        ref = vocab.select(F.col("gram").alias("__h"),
                           F.lit(1).alias("__seen"))
    else:
        ref = (_gram_hashes(reference, n, text_col).distinct()
               .withColumn("__seen", F.lit(1)))
    doc = _gram_hashes(df, n, text_col, F.col(id_col).alias("id"))
    return (doc.join(ref, "__h", "left")
               .groupBy("id")
               .agg(F.count("*").alias("n_grams"),
                    F.sum(F.when(F.col("__seen").isNull(), 1)
                           .otherwise(0)).alias("n_novel"))
               .withColumn("novelty",
                           F.col("n_novel") / F.col("n_grams")))


def readability(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document readability profile:
    ``(id, n_sentences, n_words, n_syllables, words_per_sentence,
    syllables_per_word, flesch)`` with the Flesch reading-ease formula
    ``206.835 − 1.015·(words/sentences) − 84.6·(syllables/word)``.
    Syllables use the standard vowel-group proxy (runs of ``[aeiouy]``
    in the lowercased text — the Flesch-Kincaid implementations ship
    the same heuristic); sentences are runs of ``[.!?]`` (min 1 so a
    fragment without terminal punctuation is one sentence, not a
    division by zero).

    Scale shape: every count is a row-local ``regexp_extract_all``
    over the document — zero shuffles, the projection rides the scan;
    replicable in any engine with POSIX regexes (the DuckDB oracle
    uses the identical patterns). Documents with no words are dropped
    (no readability to report).
    """
    low = F.lower(F.col(text_col))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(low, F.lit("[.!?]+"), 0)), F.lit(1))
    n_words = F.size(F.regexp_extract_all(low, F.lit("[a-z]+"), 0))
    n_syll = F.size(F.regexp_extract_all(low, F.lit("[aeiouy]+"), 0))
    wps = n_words.cast("double") / n_sent
    spw = n_syll.cast("double") / n_words
    return (df.select(F.col(id_col).alias("id"),
                      n_sent.alias("n_sentences"),
                      n_words.alias("n_words"),
                      n_syll.alias("n_syllables"))
              .where(F.col("n_words") > 0)
              .withColumn("words_per_sentence",
                          F.col("n_words").cast("double")
                          / F.col("n_sentences"))
              .withColumn("syllables_per_word",
                          F.col("n_syllables").cast("double")
                          / F.col("n_words"))
              .withColumn("flesch",
                          F.lit(206.835)
                          - 1.015 * F.col("words_per_sentence")
                          - 84.6 * F.col("syllables_per_word")))


def char_entropy(col: Column) -> Column:
    """Shannon character entropy (bits/char) of a string via the
    identity ``H = log2(N) − (Σ n_c·log2 n_c)/N`` — the gibberish/
    compression-quality signal (random bytes ≈ log2|charset|,
    repeated filler → 0). NULL/empty text yields NULL.

    Implementation: an Arrow-batched ``pandas_udf`` — per row, the
    text's UTF-32 codepoints go through ``np.unique(return_counts)``
    and one vectorized log2 pass. ROW-LOCAL (no explode, no per-doc
    shuffle: a 100 TB corpus would otherwise shuffle one (doc, char)
    row PER CHARACTER through a doc-keyed aggregation), and ~50×
    faster than the pure-Catalyst fold over a sorted char array that
    this replaced — higher-order-function lambdas evaluate
    interpreted per element, so a 2 000-char document paid 2 000
    struct allocations per row (measured 11.9 s vs 0.25 s at sf0.1).
    The dedup-family tradeoff, consciously taken: heavy per-row
    compute belongs in Arrow batches, not interpreted expression
    trees.
    """
    @F.pandas_udf("double")
    def _ent(s: pd.Series) -> pd.Series:
        import numpy as np

        out = np.full(len(s), np.nan)
        for i, t in enumerate(s):
            if t is None or len(t) == 0:
                continue
            a = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            counts = np.unique(a, return_counts=True)[1]
            n = float(len(a))
            out[i] = (np.log2(n)
                      - float((counts * np.log2(counts)).sum()) / n)
        return pd.Series(out)

    return _ent(col)


def update_novelty_vocab(vocab: DataFrame, new_docs: DataFrame,
                         n: int = 3,
                         text_col: str = "text") -> DataFrame:
    """Incrementally extend a :func:`build_novelty_vocab` table with a
    new batch's grams (union + distinct — one shuffle bounded by the
    NEW batch's vocabulary since the existing side is already
    distinct). The continuous-ingestion companion to the minhash/LSH
    incremental state: score a batch, admit it, fold its grams in,
    persist back bucketed (``state_store.save_novelty_vocab``).
    Results are identical to a full rebuild over old∪new
    (test-asserted); ``n`` must match the original build."""
    return (vocab.unionByName(
        build_novelty_vocab(new_docs, n, text_col)).distinct())


def gopher_rules(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", *,
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 max_bullet_line_frac: float = 0.9,
                 max_ellipsis_line_frac: float = 0.3,
                 min_distinct_stopwords: int = 2,
                 lang: str = "en") -> DataFrame:
    """Gopher-style rule-filter battery (Rae et al. 2021 §A1.1 /
    C4): per document, one boolean per rule (True = the document
    PASSES the rule) plus the conjunction ``keep`` — the standard
    pre-training quality gate expressed as a single row-local JVM
    projection (no shuffle, no UDF; the whole battery rides the scan).

    Rules: word count in ``[min_words, max_words]``; mean word length
    in ``[min_mean_word_len, max_mean_word_len]``; symbol-to-word
    ratio (``#``/ellipsis) ≤ ``max_symbol_ratio``; ≤
    ``max_bullet_line_frac`` of lines starting with a bullet; ≤
    ``max_ellipsis_line_frac`` of lines ending in an ellipsis; ≥
    ``min_distinct_stopwords`` distinct ``lang`` stopwords present
    (the Gopher "contains common words" screen).

    Unlike :func:`quality_score` (a graded composite for ranking),
    this is the REJECT-with-reason battery: per-rule flags let a
    pipeline report WHY each document fell out, which is what a
    100 TB cleaning audit needs. Reference parity: the reference has
    no corpus-filter surface; additive (SURVEY §2.14).
    """
    text = F.col(text_col)
    toks = whitespace_tokens(text)
    n_words = F.size(toks)
    mwl = mean_word_length(text)
    n_sym = F.size(F.regexp_extract_all(
        text, F.lit(r"#|\.\.\.|…"), 0))
    lines = F.split(text, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = (F.size(F.filter(
        lines, lambda ln: F.trim(ln).startswith("-")
        | F.trim(ln).startswith("*") | F.trim(ln).startswith("•")))
        / n_lines)
    ellipsis_frac = (F.size(F.filter(
        lines, lambda ln: F.trim(ln).endswith("...")
        | F.trim(ln).endswith("…"))) / n_lines)
    stops = LANG_STOPWORDS[lang]
    n_stop = F.size(F.array_intersect(
        F.array_distinct(F.transform(toks, F.lower)),
        F.array(*[F.lit(s) for s in stops])))
    def rule(expr):
        # NULL text must read as a concrete FAIL, not NULL: a
        # reject-audit like where(~keep) or sums over the flags would
        # otherwise silently skip NULL documents
        return F.coalesce(expr, F.lit(False))

    return df.select(
        F.col(id_col),
        rule((n_words >= min_words) & (n_words <= max_words))
        .alias("r_word_count"),
        rule((mwl >= min_mean_word_len) & (mwl <= max_mean_word_len))
        .alias("r_mean_word_len"),
        rule(n_sym / F.greatest(n_words, F.lit(1)) <= max_symbol_ratio)
        .alias("r_symbol_ratio"),
        rule(bullet_frac <= max_bullet_line_frac)
        .alias("r_bullet_lines"),
        rule(ellipsis_frac <= max_ellipsis_line_frac)
        .alias("r_ellipsis_lines"),
        rule(n_stop >= min_distinct_stopwords).alias("r_stopwords"),
    ).withColumn(
        "keep",
        F.col("r_word_count") & F.col("r_mean_word_len")
        & F.col("r_symbol_ratio") & F.col("r_bullet_lines")
        & F.col("r_ellipsis_lines") & F.col("r_stopwords"))


def zipf_fit(df: DataFrame, text_col: str = "text",
             top_k: int = 1000) -> DataFrame:
    """Zipf's-law fit of the corpus token-frequency distribution: OLS
    of ln(frequency) on ln(rank) over the ``top_k`` most frequent
    normalized tokens — one row ``(total_tokens, vocab_size, k_fit,
    slope, intercept, r2)``. A natural-language corpus sits near
    slope -1; strong departures (flat: synthetic/templated text;
    steep: tiny effective vocabulary) are a corpus-level quality
    screen to run next to per-document signals.

    Scale shape: token counts are ONE explode + map-side-combined
    aggregation (the q37 vocabulary pass, shuffle bounded by distinct
    tokens); the top-k cut is a distributed TakeOrdered on
    (count desc, token) — never a global sort of the vocabulary —
    and ranking then happens on the BOUNDED k-row list (a
    single-partition window over top_k rows by construction, the
    q143 bounded-list pattern). The OLS reduces to six sums in one
    final aggregation; corpus totals ride the same counts table.
    Ties at the boundary break on the token string, so the fitted
    set is deterministic.
    """
    if top_k < 2:
        raise ValueError("top_k must be >= 2")
    from pyspark.sql import Window

    from pandas_ai_spark.functions.dedup import _norm_tokens
    from pandas_ai_spark.functions.fold import fold_scalars

    counts = (df.select(F.explode(_norm_tokens(F.col(text_col)))
                        .alias("token"))
              .where(F.length("token") > 0)
              .groupBy("token")
              .agg(F.count("*").cast("bigint").alias("n")))
    totals = counts.agg(
        F.sum("n").cast("bigint").alias("total_tokens"),
        F.count("*").cast("bigint").alias("vocab_size"))
    top = counts.orderBy(F.desc("n"), F.col("token")).limit(top_k)
    w = Window.orderBy(F.desc("n"), F.col("token"))
    ranked = top.select(
        F.col("n"),
        F.row_number().over(w).cast("bigint").alias("rank"))
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("n").cast("double"))
    s = ranked.agg(
        F.count("*").cast("bigint").alias("k_fit"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sx2"), F.sum(y * y).alias("sy2"))
    k = F.col("k_fit").cast("double")
    cov = k * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = k * F.col("sx2") - F.col("sx") * F.col("sx")
    vy = k * F.col("sy2") - F.col("sy") * F.col("sy")
    slope = cov / vx
    return fold_scalars(s, totals).select(
        "total_tokens", "vocab_size", "k_fit",
        F.when(vx > 0, slope).alias("slope"),
        F.when(vx > 0,
               (F.col("sy") - slope * F.col("sx")) / k)
         .alias("intercept"),
        F.when((vx > 0) & (vy > 0), cov * cov / (vx * vy))
         .alias("r2"))


def heaps_fit(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id",
              checkpoints: int = 16) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: ``V(n) ≈ K·n^β`` — OLS of
    ``ln V`` on ``ln n`` over ``checkpoints`` sample points of the
    cumulative (tokens seen, distinct terms seen) curve in ``id_col``
    order. One row ``(n_points, total_tokens, vocab_size, beta,
    log_k, r2)``. Natural corpora sit near β ≈ 0.5 (typed text);
    β → 1 flags open-ended vocabulary (ids/hashes/codes in text —
    dedup keys leaking into prose), β → 0 a closed template
    vocabulary. The corpus-level companion to :func:`zipf_fit`:
    Zipf reads the frequency distribution, Heaps the GROWTH — how
    much new vocabulary another 10× of this source will bring.

    Exactness & scale shape: checkpoint doc-id cuts are integer
    arithmetic on the (min, max) id aggregate — no sort, no
    percentile sketch, reproducible in any SQL engine. Every V/n
    point is an exact integer: token counts bucket row-locally
    (``checkpoints−1`` comparisons), new-term counts bucket on each
    term's ``min(doc_id)`` first occurrence (one vocab-bounded
    aggregation), and both prefix-sum over the BOUNDED checkpoint
    spine (≤ ``checkpoints`` rows). The final ln-OLS folds
    checkpoint-ordered (``aggregate(sort_array)``, the q191 device)
    so the float sums are order-pinned cross-engine.
    """
    if checkpoints < 2:
        raise ValueError("checkpoints must be >= 2")
    from pyspark.sql import Window

    from pandas_ai_spark.functions.dedup import _norm_tokens
    from pandas_ai_spark.functions.fold import fold_scalars

    K = int(checkpoints)
    from .cache import operator_persist

    toks = (df.select(F.col(id_col).cast("bigint").alias("__id"),
                      F.explode(_norm_tokens(F.col(text_col)))
                      .alias("token"))
              .where(F.length("token") > 0))
    # per-doc token counts + per-term first-occurrence doc; both are
    # consumed by several downstream aggregates (bucket counts, the
    # min/max cut aggregate, corpus totals) — persist the SMALL
    # aggregated grains so the corpus tokenizes exactly twice, not
    # once per consumer
    tc = operator_persist(toks.groupBy("__id").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")))
    fo = operator_persist(
        toks.groupBy("token").agg(F.min("__id").alias("__fd")))
    mm = tc.agg(F.min("__id").alias("__lo"),
                F.max("__id").alias("__hi"))

    def k_idx(idc):
        # 1 + #{checkpoint cuts strictly below this id}; cut_j =
        # lo + (j*(hi-lo)) div K — the subtraction makes the double
        # division exact (numerator exactly divisible), so the cut is
        # identical bigint arithmetic in every engine
        span = F.col("__hi") - F.col("__lo")
        e = F.lit(1)
        for j in range(1, K):
            jspan = F.lit(j) * span
            cut = F.col("__lo") + ((jspan - jspan % F.lit(K))
                                   / F.lit(K)).cast("bigint")
            e = e + (idc > cut).cast("int")
        return e.cast("int")

    tb = tc.crossJoin(F.broadcast(mm)).groupBy(
        k_idx(F.col("__id")).alias("__k")).agg(
        F.sum("__c").cast("bigint").alias("__nt"))
    vb = fo.crossJoin(F.broadcast(mm)).groupBy(
        k_idx(F.col("__fd")).alias("__k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__nv"))
    spine = df.sparkSession.range(1, K + 1).select(
        F.col("id").cast("int").alias("__k"))
    w = Window.orderBy("__k").rowsBetween(
        Window.unboundedPreceding, 0)
    pts = (spine.join(tb, "__k", "left").join(vb, "__k", "left")
           .select("__k",
                   F.sum(F.coalesce(F.col("__nt"), F.lit(0)))
                    .over(w).cast("bigint").alias("n_cum"),
                   F.sum(F.coalesce(F.col("__nv"), F.lit(0)))
                    .over(w).cast("bigint").alias("v_cum"))
           .where((F.col("n_cum") > 0) & (F.col("v_cum") > 0))
           # identical consecutive points (empty checkpoint ranges)
           # would double-weight a sample; keep the first of each run
           .withColumn("__pn", F.lag("n_cum").over(
               Window.orderBy("__k")))
           .where(F.col("__pn").isNull()
                  | (F.col("n_cum") != F.col("__pn"))))
    x = F.log(F.col("n_cum").cast("double"))
    y = F.log(F.col("v_cum").cast("double"))
    st = pts.select(F.struct(
        F.col("__k").alias("k"),
        x.alias("x"), y.alias("y"),
        (x * y).alias("xy"), (x * x).alias("x2"),
        (y * y).alias("y2")).alias("__s"))

    def fold(field):
        return F.aggregate(F.sort_array(F.collect_list("__s")),
                           F.lit(0.0),
                           lambda acc, s: acc + s[field])

    s = st.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        fold("x").alias("sx"), fold("y").alias("sy"),
        fold("xy").alias("sxy"), fold("x2").alias("sx2"),
        fold("y2").alias("sy2"))
    totals = tc.agg(F.sum("__c").cast("bigint").alias("total_tokens"))
    vocab = fo.agg(F.count(F.lit(1)).cast("bigint")
                   .alias("vocab_size"))
    kk = F.col("n_points").cast("double")
    cov = kk * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = kk * F.col("sx2") - F.col("sx") * F.col("sx")
    vy = kk * F.col("sy2") - F.col("sy") * F.col("sy")
    beta = cov / vx
    return fold_scalars(fold_scalars(s, totals), vocab).select(
        "n_points", "total_tokens", "vocab_size",
        F.when(vx > 0, beta).alias("beta"),
        F.when(vx > 0, (F.col("sy") - beta * F.col("sx")) / kk)
         .alias("log_k"),
        F.when((vx > 0) & (vy > 0), cov * cov / (vx * vy))
         .alias("r2"))


def corpus_profile_exact(df: DataFrame, by: str = "source",
                         text_col: str = "text",
                         len_col: str = "n_chars",
                         approx: bool | None = None) -> DataFrame:
    """Exact per-group corpus profile — the deterministic complement
    of the q55 sketch profile (same grain, every number reproducible
    on any engine): per ``by`` group ``(n_docs, n_distinct_fp,
    min_chars, max_chars, p50_chars, p90_chars)`` with the distinct
    count over :func:`fingerprint` EXACT and the length quantiles the
    EXACT continuous percentile (``percentile``, the interpolation
    DuckDB calls ``quantile_cont``) — no HLL, no sketch.

    The two-path convention (q98/q140 winsorize family): exact is for
    data scales where a distinct-fingerprint shuffle and a per-group
    length sort are affordable; above
    :data:`~pandas_ai_spark.functions.stats.EXACT_STATE_MAX_BYTES`
    the default ``approx=None`` auto-swaps to the sketch aggregates
    (HLL distinct + ``percentile_approx``) — at that point the output
    is the q55 sketch profile and loses engine-exactness. Pass
    ``approx=False`` to force exact.

    Scale shape: ONE aggregation pass either way (Catalyst plans the
    exact distinct as an Expand + two-stage agg; min/max/count ride
    the same shuffle), grouped by ``by`` so parallelism is the group
    count × Expand fan-out. Reference parity: the reference profiles
    via pandas ``describe()``/``nunique()`` on collected frames
    (semantic_agent tests); this is the distributed form.
    """
    from .stats import _resolve_approx

    approx = _resolve_approx(df, approx)
    fp = fingerprint(F.col(text_col))
    length = F.col(len_col).cast("double")
    if approx:
        n_distinct = F.approx_count_distinct(fp)
        pcts = F.percentile_approx(
            length, F.array(F.lit(0.5), F.lit(0.9)), 10_000)
    else:
        n_distinct = F.countDistinct(fp)
        pcts = F.percentile(length, F.array(F.lit(0.5), F.lit(0.9)))
    return (
        df.groupBy(by)
          .agg(F.count("*").cast("bigint").alias("n_docs"),
               n_distinct.cast("bigint").alias("n_distinct_fp"),
               F.min(len_col).cast("bigint").alias("min_chars"),
               F.max(len_col).cast("bigint").alias("max_chars"),
               pcts.alias("__p"))
          .select(by, "n_docs", "n_distinct_fp", "min_chars",
                  "max_chars",
                  F.element_at("__p", 1).alias("p50_chars"),
                  F.element_at("__p", 2).alias("p90_chars"))
    )


def encoding_anomalies(df: DataFrame, text_col: str = "text",
                       keep: list[str] | None = None,
                       mojibake_per_mille: int = 5) -> DataFrame:
    """Encoding-damage screen for a text corpus - the ftfy-style
    triage a web-scrape ingest runs before spending tokenizer/LLM
    cycles on garbage: per row, exact counts of the three classic
    UTF-8 damage signatures and a routing flag.

    - ``repl_chars``: U+FFFD replacement characters (a decoder
      already gave up once);
    - ``mojibake_marks``: the latin-1-decoded-UTF-8 tells - 'A-tilde'
      (0xC3 lead byte as text), 'A-circumflex' (0xC2), and the
      'a-circumflex + euro' pair every smart-quote/dash turns into;
    - ``ctrl_chars``: C0 control characters other than tab/LF/CR
      (binary spill into a text column).

    ``enc_suspect`` flags any replacement char, any control char, or
    a mojibake density over ``mojibake_per_mille`` per 1000 chars -
    the density compare is cleared-denominator integer arithmetic
    (``1000*marks > threshold*n_chars``), so the flag is exact.

    Scale shape: pure Column expressions (literal replace + one
    regexp_replace), whole-stage codegen, zero shuffles, zero UDFs -
    a linear scan that pushes the text column read straight to the
    parquet scan. NULL text yields NULL counts and NULL flag
    (nothing is silently dropped).
    """
    t = F.col(text_col)

    def lit_count(lit: str):
        cnt = ((F.length(t)
                - F.length(F.replace(t, F.lit(lit), F.lit(""))))
               / F.lit(len(lit)))
        return cnt.cast("bigint")

    repl = lit_count("�")
    moji = (lit_count("Ã") + lit_count("Â")
            + lit_count("â€")).cast("bigint")
    ctrl = (F.length(t) - F.length(F.regexp_replace(
        t, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))) \
        .cast("bigint")
    n = F.length(t).cast("bigint")
    suspect = (repl > 0) | (ctrl > 0) \
        | (moji * 1000 > F.lit(int(mojibake_per_mille)) * n)
    cols = list(keep or [])
    return df.select(
        *[F.col(c) for c in cols],
        n.alias("n_chars"), repl.alias("repl_chars"),
        moji.alias("mojibake_marks"), ctrl.alias("ctrl_chars"),
        suspect.alias("enc_suspect"))
