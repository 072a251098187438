"""End-to-end training-corpus cleaning: the composition layer.

The canonical LLM-data pipeline (C4/Gopher/RefinedWeb shape) as one
declarative call over a documents table:

    quality filter → exact dedup → near-dup dedup (transitive) → stats

Every stage is one of the operators in this package; the composition adds
nothing imperative — the output is a single lazy plan (plus the bounded
clustering step), so Catalyst sees the whole pipeline and pushes the
quality predicate into the scan.
"""

from __future__ import annotations

from contextlib import nullcontext
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup as dd
from . import text as tx
from .cache import cache_scope, operator_persist


@dataclass
class CleanStats:
    input_docs: int
    after_quality: int
    after_exact: int
    after_near_dup: int
    final_docs: int = -1
    removed: dict = field(default_factory=dict)


def _swap_text(df: DataFrame, rewritten: DataFrame, text_col: str,
               id_col: str) -> DataFrame:
    """Replace ``text_col`` with a rewrite stage's output, preserving
    every other column; docs the stage dropped entirely disappear
    (inner join on the id)."""
    return df.drop(text_col).join(
        rewritten.select(id_col, text_col), id_col, "inner")


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    lang: str = "en",
    near_dup_threshold: float = 0.7,
    compute_stats: bool = True,
    remove_boilerplate: bool = False,
    boilerplate_frac: float = 0.5,
    min_compression_ratio: float | None = None,
    excise_spans: bool = False,
    span_w: int = 8,
    eval_docs: DataFrame | None = None,
    decontaminate_n: int = 8,
    bounded_cache: bool | None = None,
) -> tuple[DataFrame, CleanStats | None]:
    """The full RefinedWeb-shape pipeline as one declarative call:

        boilerplate-line removal → quality filter → compression-ratio
        filter → exact dedup → near-dup dedup (transitive) →
        duplicate-span excision → benchmark decontamination

    Optional stages are off by default (backward-compatible with the
    original quality→exact→near-dup composition). Returns
    (cleaned DataFrame, stage-by-stage stats).

    ``compute_stats=False`` skips the per-stage counts (each is an
    action); the cleaned frame itself stays one lazy plan either way
    (plus the bounded clustering / rewrite-join stages).

    **Cache lifecycle** (``bounded_cache``, default = ``compute_stats``):
    when bounded, the dedup stages' internal signature-table persists
    run inside a :func:`~.cache.cache_scope` and are released before
    returning; the cleaned result is checkpointed first (reliable
    checkpoint when ``sc.setCheckpointDir`` was called, else
    ``localCheckpoint``) so the returned frame references no released
    intermediate — a days-long cluster run does not accumulate cached
    signature tables. With ``bounded_cache=False`` the persists land in
    the module ledger (release with
    :func:`~.cache.release_operator_caches`) and the result stays a
    fully lazy plan.
    """
    bounded = compute_stats if bounded_cache is None else bounded_cache
    with cache_scope() if bounded else nullcontext():
        return _clean_corpus_impl(
            df, text_col, id_col, min_quality, lang, near_dup_threshold,
            compute_stats, remove_boilerplate, boilerplate_frac,
            min_compression_ratio, excise_spans, span_w, eval_docs,
            decontaminate_n, checkpoint_result=bounded)


def _checkpoint(df: DataFrame) -> DataFrame:
    """Materialize + truncate lineage: reliable checkpoint when a
    checkpoint dir is configured (the cluster-correct path — survives
    executor loss), else an executor-local checkpoint."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir():
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def _clean_corpus_impl(
    df, text_col, id_col, min_quality, lang, near_dup_threshold,
    compute_stats, remove_boilerplate, boilerplate_frac,
    min_compression_ratio, excise_spans, span_w, eval_docs,
    decontaminate_n, checkpoint_result,
) -> tuple[DataFrame, CleanStats | None]:
    n0 = df.count() if compute_stats else -1
    removed: dict = {}

    cur = df
    if remove_boilerplate:
        rewritten = tx.remove_boilerplate_lines(
            cur, text_col, id_col, max_doc_frac=boilerplate_frac)
        cur = _swap_text(cur, rewritten, text_col, id_col)
        if compute_stats:
            removed["all_boilerplate"] = n0 - cur.count()

    scored = cur.withColumn(
        "__q", tx.quality_score(F.col(text_col), lang))
    quality = scored.where(F.col("__q") >= min_quality).drop("__q")
    n1 = quality.count() if compute_stats else -1
    removed["low_quality"] = (n0 - removed.get("all_boilerplate", 0) - n1
                              if compute_stats else -1)

    if min_compression_ratio is not None:
        ratios = tx.compression_ratio(quality, text_col, id_col)
        keep = ratios.where(
            F.col("ratio") >= F.lit(min_compression_ratio))
        quality = quality.join(keep.select(id_col), id_col, "left_semi")
        if compute_stats:
            prev, n1b = n1, quality.count()
            removed["too_compressible"] = prev - n1b
            n1 = n1b

    exact = dd.dedup_exact_normalized(quality, text_col, id_col)
    n2 = exact.count() if compute_stats else -1
    removed["exact_dup"] = n1 - n2 if compute_stats else -1

    cleaned = dd.minhash_dedup_transitive(
        exact, text_col, id_col, threshold=near_dup_threshold)
    n3 = cleaned.count() if compute_stats else -1
    removed["near_dup"] = n2 - n3 if compute_stats else -1

    if excise_spans:
        rewritten = dd.excise_duplicate_spans(
            cleaned, text_col, id_col, w=span_w)
        cleaned = _swap_text(cleaned, rewritten, text_col, id_col)
        if compute_stats:
            prev, n3b = n3, cleaned.count()
            removed["all_duplicated_spans"] = prev - n3b
            n3 = n3b

    if eval_docs is not None:
        cleaned, flagged = dd.decontaminate(
            cleaned, eval_docs, text_col, id_col, n=decontaminate_n)
        if compute_stats:
            removed["contaminated"] = flagged.count()

    if checkpoint_result:
        # one materializing pass (the nf count below then reads the
        # checkpoint); after this the frame owns no scoped intermediate
        cleaned = _checkpoint(cleaned)

    nf = cleaned.count() if compute_stats else -1
    stats = None
    if compute_stats:
        stats = CleanStats(
            input_docs=n0, after_quality=n1, after_exact=n2,
            after_near_dup=n3, final_docs=nf, removed=removed)
    return cleaned, stats


def hash_split(df: DataFrame, weights: dict[str, float],
               id_col: str = "doc_id", seed: str = "split",
               buckets: int = 10_000) -> DataFrame:
    """Deterministic train/val/test assignment: ``split`` =
    f(md5(seed‖id)) against cumulative weight cutoffs over ``buckets``
    hash buckets.

    Properties a training pipeline needs and random sampling lacks:
    STABLE under corpus growth (a document's assignment never changes
    when other docs are added/removed — no holdout leakage across
    dataset versions), reproducible across engines (md5, not a seeded
    RNG; DuckDB computes identical buckets — see
    :func:`~pandas_ai_spark.functions.classify.md5_bucket`), and
    re-keyable via ``seed`` for independent re-splits. Zero shuffles:
    one row-local projection, rides the scan at any scale.

    ``weights`` need not sum to 1 (they are normalized); insertion
    order fixes the cutoff order. Expected split sizes are exact to
    ±1/buckets.
    """
    from .classify import md5_bucket

    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    b = md5_bucket(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")),
        buckets)
    names = list(weights)
    chain = None
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name] / total * buckets
        cut = int(round(acc))
        chain = (F.when(b < cut, F.lit(name)) if chain is None
                 else chain.when(b < cut, F.lit(name)))
    split = (F.lit(names[-1]) if chain is None
             else chain.otherwise(F.lit(names[-1])))
    return df.withColumn("split", split)


def stratified_sample(df: DataFrame, strata_cols,
                      fraction: float, id_col: str = "doc_id",
                      seed: str = "strat") -> DataFrame:
    """EXACT-allocation proportional stratified sampling: every
    stratum contributes exactly ``ceil(fraction * n_stratum)`` rows
    (never zero for a non-empty stratum), chosen by deterministic
    md5 order — the sampler to reach for when per-stratum quotas must
    be met exactly (eval-set construction, per-language floors),
    where ``sampleBy``'s Bernoulli draw only hits the quota in
    expectation and can empty out small strata entirely.

    Determinism: selection order is ``md5(seed‖id)`` (id tie-break),
    a pure function of the row — stable across runs, retries, engine
    (DuckDB reproduces the identical sample via its ``md5``), and
    executor placement; re-key with ``seed`` for an independent
    re-draw. Rows keep their input schema.

    Scale shape: ONE shuffle — the stratum size and the rank come
    from the same window partition spec (a ``count`` over the
    unbounded frame and a ``row_number`` over the md5 order share one
    exchange + sort), then a row-local keep predicate. Exact
    allocation inherently needs the group size, so there is no
    WindowGroupLimit pre-push here; a hot stratum costs its sort,
    never a quadratic term. For fixed-size (not proportional) quotas
    use :func:`cap_per_domain`, which DOES pre-push the top-k.
    """
    from pyspark.sql import Window

    if not (0.0 < fraction <= 1.0):
        raise ValueError("fraction must be in (0, 1]")
    strata_cols = list(strata_cols)
    if not strata_cols:
        raise ValueError("strata_cols must be non-empty")
    key = F.md5(F.concat(F.lit(seed), F.lit(":"),
                         F.col(id_col).cast("string")))
    wp = Window.partitionBy(*strata_cols)
    w = wp.orderBy(key.asc(), F.col(id_col).asc())
    quota = F.ceil(F.lit(float(fraction))
                   * F.count(F.lit(1)).over(wp).cast("double"))
    return (df.withColumn("__rk", F.row_number().over(w))
              .withColumn("__quota", quota)
              .where(F.col("__rk") <= F.col("__quota"))
              .drop("__rk", "__quota"))


def neyman_sample(df: DataFrame, stratum_col: str, value_col: str,
                  total_n: int, id_col: str = "doc_id",
                  seed: str = "ney") -> DataFrame:
    """EXECUTE the Neyman-optimal allocation: the
    :func:`neyman_allocation` table (``n_h ∝ N_h·σ_h``, floored and
    population-capped) is joined back broadcast and each stratum
    contributes exactly its ``alloc`` rows in deterministic md5 order
    — the variance-minimizing stratified sample itself, not just its
    design. Complements :func:`stratified_sample` (proportional
    quotas ignore within-stratum spread; Neyman spends the budget
    where the variable is noisy).

    Determinism: same md5-order contract as
    :func:`stratified_sample` — selection is a pure function of
    ``(seed, id)``, reproducible in any engine with md5.

    Scale shape: the allocation pass is one map-side-combined
    group-by (strata-bounded) plus a scalar fold; the selection is
    one rank window partitioned by stratum against the broadcast
    alloc table. Rows keep the input schema.
    """
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    alloc = neyman_allocation(df, stratum_col, value_col, total_n) \
        .select(F.col("stratum").alias("__stratum"), "alloc")
    key = F.md5(F.concat(F.lit(seed), F.lit(":"),
                         F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(
        key.asc(), F.col(id_col).asc())
    return (df.join(broadcast(alloc),
                    F.col(stratum_col).eqNullSafe(F.col("__stratum")))
              .withColumn("__rk", F.row_number().over(w))
              .where(F.col("__rk") <= F.col("alloc"))
              .drop("__stratum", "alloc", "__rk"))


def temperature_mixture_rates(
    df: DataFrame,
    domain_col: str = "lang",
    alpha: float = 0.5,
    sample_frac: float = 0.3,
) -> tuple[dict, dict]:
    """Temperature-weighted mixture rates for corpus composition: domain
    ``i`` with ``c_i`` docs gets sampling weight ∝ ``c_i**alpha``
    (α < 1 upweights rare domains — the multilingual-mixing scheme), and
    per-domain rates are scaled so the expected total sample is
    ``sample_frac`` of the corpus, capped at 1.0 per domain.

    Returns ``(counts, rates)`` dicts keyed by domain. The collect here
    is one partial-agg result bounded by the number of DOMAINS (tens to
    thousands), not rows — the only driver-side state ``sampleBy``
    needs anyway.
    """
    counts = {r[domain_col]: r["n"] for r in
              df.groupBy(domain_col).agg(F.count("*").alias("n"))
                .collect()}
    total = sum(counts.values())
    wsum = sum(c ** alpha for c in counts.values())
    rates = {}
    for d, c in counts.items():
        target = total * sample_frac * (c ** alpha) / wsum
        rates[d] = min(1.0, target / c)
    return counts, rates


def mixture_sample(
    df: DataFrame,
    domain_col: str = "lang",
    alpha: float = 0.5,
    sample_frac: float = 0.3,
    seed: int = 42,
) -> tuple[DataFrame, dict, dict]:
    """Sample the corpus to the temperature mixture: one ``sampleBy``
    pass (per-row Bernoulli, no shuffle), seeded and deterministic.
    Returns ``(sampled_df, counts, rates)``."""
    counts, rates = temperature_mixture_rates(
        df, domain_col, alpha, sample_frac)
    return df.sampleBy(domain_col, rates, seed=seed), counts, rates


def cap_per_domain(df: DataFrame, domain_col: str = "source",
                   id_col: str = "doc_id", cap: int = 10_000) -> DataFrame:
    """Cap each domain's contribution at ``cap`` docs, chosen by a
    deterministic pseudo-random order (md5 of the id — reproducible
    across runs and engines, no RNG state). The anti-boilerplate quota
    every web-corpus build applies to mega-domains.

    Plan shape: one shuffle on the domain + rank; Spark's
    WindowGroupLimit pushes the top-``cap`` selection ahead of the
    shuffle (partial limit per map task), so a 10⁸-doc domain ships at
    most ``cap`` rows per input partition, not its whole row set.
    """
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit("cap:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(domain_col).orderBy(key.asc(),
                                               F.col(id_col).asc())
    return (df.withColumn("__rk", F.row_number().over(w))
              .where(F.col("__rk") <= cap).drop("__rk"))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES): each row draws a reproducible uniform
    ``u = f(md5(seed‖id)) ∈ (0, 1]`` and the ``k`` rows with the
    smallest priority ``-ln(u) / w`` win — exactly the classic
    exponential-race scheme, so inclusion probabilities follow the
    weights without any sequential pass.

    Why this and not ``rand()``: the draw is a pure function of the row
    id, so the sample is stable across runs, engines (any SQL engine
    with md5 + ln reproduces it bit-for-bit), retries, and executor
    placement — the property a training-data sampler needs for
    provenance. Re-key with ``seed`` for an independent re-draw.

    Plan shape: one row-local projection (md5 + ln, whole-stage
    codegen) and ONE global top-k — Catalyst plans
    ``TakeOrderedAndProject``, so each input partition ships only its
    local k candidates to the driver-side heap: no full sort, no
    shuffle of the corpus, constant memory at any scale. Rows with
    non-positive or NULL weight never qualify.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    # first 13 md5 hex chars = 52 uniform bits -> exact double in (0,1]
    u = ((F.conv(F.substring(
            F.md5(F.concat(F.lit(seed), F.lit(":"),
                           F.col(id_col).cast("string"))), 1, 13),
          16, 10).cast("double") + F.lit(1.0)) / F.lit(float(1 << 52)))
    w = F.col(weight_col).cast("double")
    pri = -F.log(u) / w
    return (df.where(w > 0)
              .withColumn("priority", pri)
              .orderBy(F.col("priority").asc(), F.col(id_col).asc())
              .limit(int(k)))


def negative_samples(df: DataFrame, user_col: str, item_col: str,
                     k: int = 3, seed: str = "ns") -> DataFrame:
    """Deterministic negative sampling for recommender/contrastive
    training pairs: for every user, ``k`` items they did NOT interact
    with, pseudo-randomly but REPRODUCIBLY chosen (md5 of
    ``seed:user:item`` orders the candidates — engine-portable, no
    RNG, so backfills and the DuckDB oracle reproduce bit-for-bit).
    Returns ``(user, item, rk)`` with rk 1..k.

    Shape: positives collapse to per-user sorted item arrays in ONE
    user-keyed shuffle; the item vocabulary — which must be
    driver-bounded (catalogs/brands/labels are ~10³–10⁷; for
    larger-than-driver vocabs use a hash-bucketed anti-join instead)
    — is collected once and folded in as a literal array; the
    candidate filter, md5 ordering, and top-k slice are all ROW-LOCAL
    array ops (no cross join, no per-user explode until the final
    k-slice). A user who has interacted with the whole vocabulary
    yields no rows.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    # persisted: the vocab collect and the per-user aggregation both
    # consume the distinct pass — without the persist the upstream
    # plan (often a multi-way join) runs twice. Scope-managed
    # lifetime (functions/cache.py).
    pos = operator_persist(
        df.select(F.col(user_col).alias("__u"),
                  F.col(item_col).alias("__i"))
          .where(F.col("__u").isNotNull() & F.col("__i").isNotNull())
          .distinct())
    vocab = sorted(r["__i"] for r in
                   pos.select("__i").distinct().collect())
    if not vocab:
        raise ValueError("negative_samples needs a non-empty input")
    varr = F.array(*[F.lit(i) for i in vocab])
    per_user = pos.groupBy("__u").agg(
        F.array_sort(F.collect_set("__i")).alias("__pos"))
    cand = F.filter(varr, lambda i: ~F.array_contains(
        F.col("__pos"), i))
    scored = F.transform(
        cand,
        lambda i: F.struct(
            F.md5(F.concat_ws(":", F.lit(seed),
                              F.col("__u").cast("string"),
                              i.cast("string"))).alias("h"),
            i.alias("item")))
    picked = F.slice(F.array_sort(scored), 1, int(k))
    out = per_user.select(
        F.col("__u").alias(user_col),
        F.posexplode(picked).alias("__p", "__s"))
    return out.select(
        user_col, F.col("__s.item").alias(item_col),
        (F.col("__p") + 1).alias("rk"))


def temporal_split(df: DataFrame, ts_col: str, cutoff: str,
                   embargo_days: int = 0,
                   split_col: str = "split") -> DataFrame:
    """Leakage-safe temporal train/test split: appends ``split_col`` ∈
    {'train', 'embargo', 'test'} — train strictly before ``cutoff``,
    test at/after ``cutoff + embargo_days``, and an embargo buffer
    between them that is EXCLUDED from both (the purged-split rule
    from financial ML: rows whose labels/windows straddle the boundary
    leak future information into training; an explicit gap removes
    them instead of trusting every feature's lookback to be short).

    Row-local literal comparisons riding the scan — zero shuffles,
    deterministic for backfills (an explicit cutoff, never now()).
    NULL timestamps get NULL split — surfaced, not silently trained on.
    """
    if embargo_days < 0:
        raise ValueError("embargo_days must be >= 0")
    ts = F.col(ts_col).cast("timestamp")
    lo = F.lit(cutoff).cast("timestamp")
    hi = F.timestamp_add("DAY", F.lit(int(embargo_days)), lo)
    return df.withColumn(
        split_col,
        F.when(ts < lo, "train")
         .when(ts >= hi, "test")
         .when(ts.isNotNull(), "embargo"))


def neyman_allocation(df: DataFrame, stratum_col: str,
                      value_col: str, total_n: int) -> DataFrame:
    """Optimal (Neyman) stratified-sample allocation: given a target
    total sample size, allocate ``n_h ∝ N_h · σ_h`` — more budget to
    strata that are BIG and VARIABLE — the survey-sampling rule that
    minimizes the variance of the stratified mean at fixed cost
    (vs proportional allocation, which ignores within-stratum
    spread). Returns one row per stratum:
    ``(stratum, n_rows, stddev, weight, alloc)`` with ``alloc`` the
    rounded-down allocation capped at the stratum's population
    (``min(floor(total_n · w_h), N_h)``; single-row strata carry
    σ = 0 and get 0 — by construction they need no sampling variance
    budget).

    ONE partial-aggregated group-by (count + stddev share the pass);
    the normalizing constant Σ N_h·σ_h is a driver scalar off the
    tiny per-stratum table (scalar-only collect — the q89/q58
    pattern), folded back as a literal so the weights are row-local.
    The allocation TABLE is the product at scale — feeding it to a
    per-stratum sampler (``weighted_sample`` / ``mixture_sample``) is
    one broadcast join.
    """
    if total_n < 1:
        raise ValueError("total_n must be >= 1")
    per = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.coalesce(F.stddev_samp(F.col(value_col).cast("double")),
                   F.lit(0.0)).alias("stddev"))
    # persist the tiny per-stratum table: it is actioned twice (the
    # Σ N_h·σ_h collect and the returned select) and would otherwise
    # re-scan the input — the benford/key_skew double-action fix
    per = operator_persist(
        per.withColumn("__ns", F.col("n_rows") * F.col("stddev")))
    tot = per.agg(F.sum("__ns")).collect()[0][0]
    if not tot:
        raise ValueError("all strata have zero variance — Neyman "
                         "allocation is undefined (use proportional)")
    w = F.col("__ns") / F.lit(float(tot))
    return per.select(
        "stratum", "n_rows", "stddev", w.alias("weight"),
        F.least(F.floor(F.lit(int(total_n)) * w).cast("bigint"),
                F.col("n_rows")).alias("alloc"))


def _hashed_grams(df: DataFrame, text_col: str, n: int,
                  buckets: int, *keep):
    """Token n-gram MULTISET (counts, not distinct — DSIR weighs by
    occurrence) bucketed by a cross-engine md5 hash: bucket =
    first-15-hex-chars of md5(gram) as int, mod ``buckets`` — exact
    bigint arithmetic in Spark (``conv``), DuckDB (``'0x'||…`` cast)
    and Python (``int(hexdigest[:15], 16)``), all JVM/engine-side, no
    UDF. Grams leave the row as bucket ids (the q21/q52 shuffle-width
    discipline)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z]+"),
                    lambda t: t != "")
    # materialize the token array through a projection boundary FIRST:
    # referencing the raw expression inside the transform lambda would
    # re-run the regex split once per gram position (r14: 3.3s -> 0.5s
    # at sf0.1 for the explode alone)
    keep = [str(k) for k in keep]
    base = (df.select(*[F.col(k) for k in keep], toks.alias("__tk"))
              .where(F.size("__tk") >= n))
    grams = F.transform(
        F.sequence(F.lit(0), F.size("__tk") - n),
        lambda i: F.array_join(F.slice(F.col("__tk"), i + 1, n), " "))
    g = base.select(*[F.col(k) for k in keep],
                    F.explode(grams).alias("__g"))
    bucket = (F.conv(F.substring(F.md5(F.col("__g")), 1, 15), 16, 10)
              .cast("bigint") % F.lit(int(buckets)))
    return g.select(*keep, bucket.alias("__b"))


def dsir_logweights(df: DataFrame, target: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    n: int = 2, buckets: int = 1024,
                    alpha: float = 1.0) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.,
    NeurIPS 2023): per-document hashed-n-gram importance log-weights
    ``log w(x) = Σ_b c_b(x) · (ln p_target(b) − ln p_raw(b))`` with
    add-``alpha`` smoothing over ``buckets`` hashed features — rank
    raw documents by how target-like their n-gram profile is, then
    resample the top mass (``weighted_sample``/top-k downstream) to
    steer a 100 TB crawl toward a small high-quality target domain.
    Returns ``(id_col, n_feats, log_weight)`` for EVERY raw document
    (docs shorter than ``n`` tokens carry 0 features and weight 0 —
    they provide no evidence either way).

    Exactness: bucket counts are exact integers; with integral
    ``alpha`` every ln argument is an exact-integer double, so each
    bucket's log-ratio λ_b is one identical IEEE expression tree
    cross-engine; the per-document Σ c_b·λ_b folds bucket-ordered
    (``aggregate(sort_array)``, the q191 device).

    Scale shape: the raw corpus is tokenized ONCE — the per-(doc,
    bucket) counts are the finest grain needed and the raw bucket
    distribution re-aggregates from them map-side; the target corpus
    is the only second pass. λ is built on the bounded bucket table
    and BROADCAST back; the only document-grain shuffle is the one
    (doc, bucket) count — no join ever exceeds the bucket bound, and
    the hashing cap makes driver/broadcast state O(buckets) no matter
    the corpus.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    from pyspark.sql.functions import broadcast

    from .fold import fold_scalars

    B = int(buckets)
    a = float(alpha)
    # ONE gram pass over the raw corpus: the per-(doc, bucket) counts
    # are the finest grain needed, and the raw bucket distribution is
    # their re-aggregation — the target corpus is the only second pass
    dc = operator_persist(
        _hashed_grams(df, text_col, n, B, id_col)
        .groupBy(id_col, "__b").agg(
            F.count(F.lit(1)).cast("bigint").alias("__c")))
    tgt_b = _hashed_grams(target, text_col, n, B)
    rc = dc.groupBy("__b").agg(
        F.sum("__c").cast("bigint").alias("__rc"))
    tc = tgt_b.groupBy(F.col("__b").alias("__tb")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__tc"))
    rtot = rc.agg(F.sum("__rc").cast("bigint").alias("__R"))
    ttot = tc.agg(F.sum("__tc").cast("bigint").alias("__T"))
    # λ on the bounded bucket table: every bucket a raw doc can carry
    # appears in rc; absent-in-target buckets smooth to alpha
    lam_tbl = fold_scalars(
        fold_scalars(
            rc.join(tc, F.col("__b") == F.col("__tb"), "left")
              .drop("__tb"),
            rtot),
        ttot).select(
        "__b",
        (F.log(F.coalesce(F.col("__tc"), F.lit(0)).cast("double")
               + F.lit(a))
         - F.log(F.col("__T").cast("double") + F.lit(a * B))
         - F.log(F.col("__rc").cast("double") + F.lit(a))
         + F.log(F.col("__R").cast("double") + F.lit(a * B)))
        .alias("__lam"))
    contrib = dc.join(broadcast(lam_tbl), "__b").select(
        F.col(id_col), F.col("__c"),
        F.struct(F.col("__b").alias("b"),
                 (F.col("__c").cast("double") * F.col("__lam"))
                 .alias("t")).alias("__s"))
    per = contrib.groupBy(id_col).agg(
        F.sum("__c").cast("bigint").alias("n_feats"),
        F.aggregate(F.sort_array(F.collect_list("__s")), F.lit(0.0),
                    lambda acc, s: acc + s["t"]).alias("log_weight"))
    spine = df.select(F.col(id_col)).distinct()
    return (spine.join(per, id_col, "left")
            .select(id_col,
                    F.coalesce(F.col("n_feats"), F.lit(0))
                     .cast("bigint").alias("n_feats"),
                    F.coalesce(F.col("log_weight"), F.lit(0.0))
                     .alias("log_weight")))
