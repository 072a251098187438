"""Scaling probe: run representative operators at sf0.001 / 0.01 / 0.1 and
report wall-clock scaling exponents (slope of log t vs log sf).

An exponent ≈ 0 means fixed overhead dominates (fine — it amortizes at
scale); ≈ 1 means linear in data; > 1.3 flags super-linear behavior that
would blow up at 100 TB. Writes SCALING.md.

Usage: python tools/scale_probe.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, ".")

SFS = ["0.001", "0.01", "0.1"]

# operator families worth a scaling claim (skip sub-second trivia)
DEFAULT = [
    "q01_pricing_summary",      # scan+agg
    "q04_view_region_revenue",  # multi-join
    "q09_sql_window_topn",      # window
    "q16_sessionization",       # window+agg
    "q20_dedup_exact",          # hash dedup
    "q21_ngram_jaccard",        # inverted-index join
    "q22_minhash_pairs",        # LSH + verify
    "q24_ann_bruteforce",       # GEMM scan
    "q25_ann_lsh",              # multi-table LSH bucket join
    "q26_embedding_near_dup",   # derived-LSH fused bucket join
    "q30_llm_column",           # pandas_udf column op
    "q34_dedup_clusters",       # pair graph + union-find (exact path)
    "q35_ann_ivf",              # k-means cells + probed-cell scan
    "q186_near_dup_clusters_lsh",  # LSH-band default clustering
    "q36_asof_join",            # union-sort-carry window
    "q49_repetition_signals",   # Arrow per-doc pass (zero shuffles)
    "q51_range_join_attribution",  # bucketed interval equi-join
    "q52_decontaminate",        # broadcast semi-join on shingle hashes
    "q54_quality_classifier",   # pure-JVM hash-bucket projection
    "q58_lm_cross_entropy",     # tf/vocab aggs + term join
    "q60_rag_chunking",         # shuffle-free explode projection
    "q61_ann_join",             # cogrouped per-cell GEMM
    "q63_span_excision",        # positional-gram interval cover
    "q65_semantic_dedup",       # k-means cells + within-cell cosine
    "q68_dedup_keep_best",      # pair graph + per-cluster argmax
    "q76_snapshot_diff",        # full-outer key join
    "q78_frequent_pairs",       # basket self-join + broadcast lookups
    "q82_pagerank",             # unrolled power iteration (3 rounds)
    "q83_pq_ann",               # Arrow encode + LUT-broadcast ADC scan
    "q88_triangle_centrality",  # degree-oriented wedge join
    "q90_pmi_collocations",     # row-local bigram agg + broadcast join
    "q91_time_weighted_avg",    # lead window + grouped agg
    "q93_sorted_neighborhood",  # block-partitioned lead pairing
    "q95_bm25_search",          # pre-agg term filter + idf re-attach
    "q96_rfm_segments",         # user agg + 3-array percentile pass
    "q97_upsert_merge",         # union + key-window rank-1 merge
    "q98_winsorize",            # shared percentile pass + clamp
    "q99_grouped_ols",          # regr_* co-moment single scan
    "q102_jsd_drift",           # two token aggs + full-outer term join
    "q103_countmin_heavy_hitters",  # CMS sketch agg + candidate verify
    "q105_windowed_funnel",     # ordered-step window funnel
    "q106_trigram_search",      # direct contains scan (one-shot path)
    "q107_ngram_novelty",       # persisted-vocab gram join (steady rep)
    "q110_image_phash",         # Arrow decode + banded int hash
    "q111_join_size_estimate",  # two CMS aggs + bucket dot product
    "q112_clean_pipeline",      # quality→dedup→decontaminate composed
    "q113_welch_ttest",         # one filtered co-moment scan
    "q114_kaplan_meier",        # duration-grain cumulative window
    "q115_gini_concentration",  # group-partitioned rank window
    "q116_benford_screen",      # digit agg + persisted counts + spine join
    "q117_association_rules",   # basket pair expansion + direction split
    "q118_readability",         # row-local syllable/sentence regex pass
    "q119_interevent_gaps",     # lag window + grouped gap agg
    "q121_audience_overlap",    # distinct pass + row-local pair expand
    "q122_outlier_fences",      # quartile pass + broadcast bounds + count
    "q123_token_fertility",     # row-local regex counts + grouped agg
    "q124_char_entropy",        # Arrow np.unique per-row pass
    "q125_robust_zscore",       # grouped_mad passes + broadcast re-attach
    "q126_attribution",         # tolerance as-of join + revenue rollup
    "q127_rolling_actives",     # persisted distinct + window explode
    "q128_containment",         # inverted-index join, min-size denominator
    "q129_negative_samples",    # per-user arrays + literal vocab ops
    "q130_weighted_median",     # cumulative-weight window + crossing agg
    "q131_key_skew",            # persisted key counts + top-N + percentiles
    "q132_ks_drift",            # RANGE-frame dual-ECDF window
    "q134_calibration",         # scalar decile edges + grouped rates
    "q135_session_stats",       # running-sum session ids + rollup
    "q136_temporal_split",      # scalar boundary quantiles + row-local tags
    "q137_corpus_overlap",      # distinct fingerprints + semi-join counts
    "q138_hits",                # fixed-iteration broadcast score joins
    "q139_wilson_intervals",    # one grouped agg + row-local interval math
    "q140_trimmed_stats",       # percentile pass + broadcast bounds + trim agg
    "q141_gopher_rules",        # row-local regex/token rule flags
    "q142_hard_negatives",      # per-cell ANN candidates + positive anti-join
    "q143_rrf_fuse",            # bounded per-list rank windows + fuse agg
    "q144_neyman_allocation",   # per-stratum variance agg + allocation math
    "q145_k_anonymity",         # quasi-identifier groupBy + class-size audit
    "q146_label_propagation",   # fixed-round broadcast min-label joins
    "q147_connected_components",  # star contraction, O(log^2) rounds
    "q148_golden_records",      # hybrid clustering + linked-only argmax
    "q149_l_diversity",         # two chained map-side-combined aggs
    "q150_t_closeness",         # cell counts + broadcast gdist + class rollup
    "q151_woe_iv",              # category agg + scalar totals fold
    "q152_target_encoding",     # (sum,count) agg + broadcast join back
    "q153_acf",                 # one per-group lag window + integer sums
    "q154_cusum",               # running-sum window + broadcast totals
    "q155_assortativity",       # symmetrize distinct + two degree joins
    "q156_dup_ngram_coverage",  # gram doc-frequency agg + join back
    "q158_zipf_fit",            # vocab agg + TakeOrdered + bounded OLS
    "q159_mann_whitney",        # value-grain agg + midrank window
    "q160_ks_fdr",              # per-nation ECDF windows + bounded BH
    "q161_nelson_aalen",        # duration-grain cumulative window
    "q162_mmr_rerank",          # brute-force pool + per-query greedy
    "q164_cohens_kappa",        # pair agg + marginal-product join
    "q165_classification_report",  # one cell agg + rollup joins
    "q167_auc",                 # score-grain midrank window
    "q170_bootstrap_ci",        # one-pass B-replicate weighted sums
    "q171_ma_decompose",        # centered MA window + seasonal join
    "q172_fellegi_sunter",      # sorted-neighborhood pairs + row-local scoring
    "q173_stratified_sample",   # one-window md5-rank quota sample
    "q175_cross_encoder_rerank",  # pool + Arrow scorer + rank window
    "q176_neyman_sample",       # strata agg + broadcast alloc + rank window
    "q177_spearman",            # two ordered rank windows + co-moment agg
    "q178_conformal_interval",  # fold split + broadcast yhat + rank pick
    "q179_information_gain",    # explode + bounded cell agg + rollups
    "q180_spearman_distributed",  # bucketed two-pass rank + co-moments
    "q187_ks_distributed",      # bucketed distributed ECDF + offsets
    "q188_wasserstein_drift",   # value-grain ECDF-gap integral
    "q189_kendall_tau",         # bounded cell grain + dominance join
    "q190_wasserstein_distributed",  # bucketed ECDF integral + seams
    "q191_kruskal_wallis",      # pooled midrank windows + level fold
    "q192_kw_distributed",      # bucketed two-pass rank + level fold
    "q193_cramers_v_matrix",    # one grouping-sets Expand, all pairs
    "q194_permutation_test",    # n_perm x n hash-order label windows
    "q196_mantel_haenszel",     # (group, stratum) 2x2 agg + fold
    "q197_dunn_test",           # midrank windows + pair join + BH
    "q198_theil_sen",           # cell-grain slope pairs + med windows
    "q200_brown_forsythe",      # exact medians + moment agg + fold
    "q201_dunn_distributed",    # bucketed rank pass + pair join + BH
    "q202_cliffs_delta",        # cell-grain dominance join
    "q203_hodges_lehmann",      # cell cross-pair diffs + med windows
    "q204_kcore",               # fixed-round peel, broadcast filters
    "q206_jonckheere",          # cell-grain ordered dominance join
    "q217_weighted_kappa",      # cell/marginal grain + k×k cross
]


# De-flooring probe (VERDICT r8 item 4): every query ≥2 s at sf0.1 whose
# inputs are FACT tables (customer/orders/lineitem/events) also runs at
# the derived 3x point .scale/sf0.3 (tools/make_scale_data.py — keyed
# replication preserves those tables' distributions). Text queries run
# at sf0.3 since r10: the corpus there is 1x natural + 2x
# SYNTHETIC-UNIQUE docs (per-language empirical BIGRAM-chain draws,
# seeded — unigram i.i.d. was refuted in r10: top-token shingles
# recur across thousands of docs and inflate exact-Jaccard candidate
# counts adversarially; see make_scale_data.py) — shingle/token
# volume scales 3x without the near-dup inflation plain replication
# would cause.
# Embedding queries probe sf0.3 since r11: embeddings there are 1x
# natural + 2x cluster-conditional Gaussian draws (per-label mean/cov
# fit on the natural vectors — make_scale_data.make_embeddings), so
# cluster geometry scales 3x with zero accidental ≥0.9-cosine pairs
# (measured). q107's vocab growth at sf0.3 is an upper bound
# (synthetic text is more n-gram-novel than natural text).
PROBE_SF03 = [
    "q21_ngram_jaccard",
    "q24_ann_bruteforce",
    "q25_ann_lsh",
    "q26_embedding_near_dup",
    "q35_ann_ivf",
    "q61_ann_join",
    "q65_semantic_dedup",
    "q83_pq_ann",
    "q22_minhash_pairs",
    "q34_dedup_clusters",
    "q186_near_dup_clusters_lsh",
    "q107_ngram_novelty",
    "q82_pagerank",
    "q88_triangle_centrality",
    "q98_winsorize",
    "q111_join_size_estimate",
    "q129_negative_samples",
    "q138_hits",
    "q140_trimmed_stats",
    "q146_label_propagation",
    "q147_connected_components",
    "q148_golden_records",
    "q170_bootstrap_ci",
    "q172_fellegi_sunter",
    "q177_spearman",
    "q178_conformal_interval",
    "q191_kruskal_wallis",
    "q192_kw_distributed",
    "q194_permutation_test",
    "q197_dunn_test",
    "q198_theil_sen",
    "q201_dunn_distributed",
    "q204_kcore",
    "q217_weighted_kappa",
]

SF03_DIR = ".scale/sf0.3"

# The ≥0.7 de-floored-exponent tail gets a FOURTH point at 10x
# (.scale/sf1.0, make_scale_data.py --sf1): the 0.1→0.3 slopes for
# these rest on a single doubling and are noisy (VERDICT r11 item 6);
# the 0.3→1.0 column confirms they stay ≤~1 over a full extra decade.
# q21/q34 stay exempt as documented exact-verifiers whose default
# route is the LSH path (q186/q22).
PROBE_SF10 = [
    "q65_semantic_dedup",
    "q98_winsorize",
    "q107_ngram_novelty",
    "q170_bootstrap_ci",
    "q177_spearman",
    "q192_kw_distributed",
]

SF10_DIR = ".scale/sf1.0"


def probe_gk_switch(spark) -> list[str]:
    """Demonstrate the q98/q140 exact→GK auto-switch (r9 VERDICT item
    3): run winsorize / trimmed_stats at sf0.1 and sf0.3 on BOTH
    paths — auto with the DEFAULT ``EXACT_STATE_MAX_BYTES`` (asserted
    to stay exact at these scales via the Catalyst size estimate) and
    auto with the cap lowered to 1 byte (asserted to engage the
    bounded-memory GK sketch via the once-per-process switch warning)
    — and report each path's 0.1→0.3 slope plus the projected scale
    factor where the default cap flips. Returns markdown lines for
    SCALING.md."""
    from pandas_ai_spark.functions import stats
    from pandas_ai_spark.functions import text as tx

    dirs = {"0.1": "/root/testdata/sf0.1", "0.3": SF03_DIR}
    if os.path.exists(f"{SF10_DIR}/lineitem.parquet"):
        dirs["1.0"] = SF10_DIR
    est = {}
    for sf, d in dirs.items():
        li = spark.read.parquet(f"{d}/lineitem.parquet")
        est[sf] = int(li._jdf.queryExecution().optimizedPlan()
                      .stats().sizeInBytes())
        # the r12 cap (64 MiB, the measured CPU crossover) resolves
        # sf0.1/sf0.3 to the EXACT path and sf1.0 (137 MB estimate)
        # to the GK sketch — assert the dispatch on every probed scale
        want_gk = sf == "1.0"
        assert stats._resolve_approx(li, None) is want_gk, \
            f"unexpected approx dispatch at sf{sf}"
        stats._warned_auto.discard("big")

    # (table, op) pairs — q181 joins the switch table (r10 VERDICT
    # item 8): corpus_profile_exact shares the same _resolve_approx /
    # EXACT_STATE_MAX_BYTES machinery, auto-swapping to the q55
    # sketch shape (HLL distinct + percentile_approx)
    ops = {
        "q98 winsorize": ("lineitem", lambda df: stats.winsorize(
            df, "l_extendedprice", by=["l_returnflag"],
            p_lo=0.05, p_hi=0.95).where(
            "l_extendedprice != l_extendedprice_winsorized")
            .agg({"*": "count"})),
        "q140 trimmed_stats": ("lineitem", lambda df:
            stats.trimmed_stats(
                df, "l_extendedprice", by=["l_returnflag"],
                trim=0.05)),
        "q181 corpus_profile": ("documents", lambda df:
            tx.corpus_profile_exact(df)),
    }
    t: dict[tuple, float] = {}
    default_cap = stats.EXACT_STATE_MAX_BYTES
    for path in ("exact", "gk-sketch"):
        # force each path regardless of scale: the exact row must
        # stay exact even at sf1.0 (where the DEFAULT cap dispatches
        # GK) so the superlinear exact slope stays measurable
        stats.EXACT_STATE_MAX_BYTES = ((4 << 30) if path == "exact"
                                       else 1)
        try:
            for sf, d in dirs.items():
                tables = {n: spark.read.parquet(f"{d}/{n}.parquet")
                          for n in {tab for tab, _ in ops.values()}}
                if path == "gk-sketch":
                    stats._warned_auto.discard("big")
                for op, (tab, fn) in ops.items():
                    best = float("inf")
                    for _ in range(2):
                        spark.catalog.clearCache()
                        t0 = time.perf_counter()
                        fn(tables[tab]).collect()
                        best = min(best, time.perf_counter() - t0)
                    t[(op, path, sf)] = best
                if path == "gk-sketch":
                    # the switch is LOGGED: the once-per-process
                    # warning key proves the sketch engaged
                    assert "big" in stats._warned_auto, \
                        "GK switch warning did not fire"
        finally:
            stats.EXACT_STATE_MAX_BYTES = default_cap

    have10 = "1.0" in dirs
    hdr = ("| op | path | sf0.1 s | sf0.3 s | exp (0.1→0.3) |"
           + (" sf1.0 s | exp (0.3→1.0) |" if have10 else ""))
    lines = [
        "",
        "## Exact→sketch auto-switch (q98/q140/q181 family)",
        "",
        "Both paths probed at sf0.1 and the de-floored sf0.3/sf1.0",
        "points — `exact` with `EXACT_STATE_MAX_BYTES` forced high",
        "and `gk-sketch` with the cap lowered to 1 byte (the",
        "auto-switch warning fired, asserted). Since r12 the DEFAULT",
        "cap is 64 MiB — the measured CPU-crossover region, not a",
        "memory bound: the exact sort-based percentile grows",
        "superlinearly in distinct values (1.46 exponent 0.3→1.0)",
        "while GK stays sub-linear, so the AUTO path is exact at",
        "sf≤0.3 (and every oracle/test scale — dispatch asserted) and",
        "GK from sf1.0 up.",
        "",
        hdr,
        "|---|---|---|---|---|" + ("--|--|" if have10 else ""),
    ]
    for op in ops:
        for path in ("exact", "gk-sketch"):
            a, b = t[(op, path, "0.1")], t[(op, path, "0.3")]
            e = math.log(b / a) / math.log(3)
            row = (f"| {op} | {path} | {a:.2f} | {b:.2f} "
                   f"| {e:.2f} |")
            if have10:
                c = t.get((op, path, "1.0"))
                e10 = math.log(c / b) / math.log(10 / 3)
                row += f" {c:.2f} | {e10:.2f} |"
            lines.append(row)
    # the estimate the dispatch actually reads, per probed scale
    ests = ", ".join(f"sf{sf} = {est[sf] >> 20} MiB"
                     for sf in dirs)
    lines += [
        "",
        f"Catalyst scan estimates: {ests}; default cap",
        f"{default_cap >> 20} MiB → the auto-switch engages between",
        "sf0.3 and sf1.0 (asserted above) — exact percentiles",
        "everywhere the oracle checks correctness, bounded-memory GK",
        "from the scale where exact state starts dominating CPU",
        "(measured r12: q98 51.9 s exact vs 9.0 s GK at sf1.0).",
    ]
    return lines


def probe_ngram_growth(spark) -> list[str]:
    """Explain the q21/q34 sf0.3 exponent with the quantity that
    drives it: exact shared-shingle candidate generation is
    Θ(Σ bucket²) — every shingle's doc-frequency grows ∝ sf, so the
    candidate-pair volume grows ∝ sf² BY CONSTRUCTION, spread across
    the long tail of small buckets (no cap can linearize it without
    changing the answer; ``max_doc_freq`` guards degenerate
    boilerplate shingles, it is a recall/cost knob, not an
    asymptotic fix). Measures n_docs, candidate pairs, and runtime
    at sf0.1/sf0.3; the 100 TB path for near-dup detection is the
    q22 MinHash-LSH banding (measured sub-linear in the main
    table), per the two-path convention."""
    from pandas_ai_spark.functions import dedup as dd
    from pandas_ai_spark.functions.text import (normalize_text,
                                                whitespace_tokens)
    from pyspark.sql import functions as F

    dirs = {"0.1": "/root/testdata/sf0.1", "0.3": SF03_DIR}
    rows = []
    for sf, d in dirs.items():
        docs = spark.read.parquet(f"{d}/documents.parquet")
        n_docs = docs.count()
        toks = whitespace_tokens(normalize_text(F.col("text")))
        idx = F.sequence(F.lit(1),
                         F.greatest(F.size(toks) - 2, F.lit(1)))
        sh = F.array_distinct(F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(toks, i, 3))))
        cand = (docs.select(F.explode(sh).alias("sh"))
                    .groupBy("sh").count()
                    .agg(F.sum(F.col("count") * (F.col("count") - 1)
                               / 2).alias("p"))
                    .collect()[0]["p"])
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            dd.ngram_jaccard_pairs(docs, n=3,
                                   threshold=0.12).count()
            best = min(best, time.perf_counter() - t0)
        rows.append((sf, n_docs, int(cand), best))
    lines = [
        "",
        "## q21/q34 shared-shingle growth — why, measured",
        "",
        "Exact n-gram-Jaccard candidates are Θ(Σ bucket²) over shared",
        "shingles: every shingle's doc-frequency grows ∝ sf, so",
        "candidate pairs grow ∝ sf² BY CONSTRUCTION — spread across",
        "the long tail of small buckets, so no doc-frequency cap can",
        "linearize it without changing the answer (`max_doc_freq`",
        "guards degenerate boilerplate shingles — a recall/cost knob).",
        "The elevated q21/q34 sf0.3 exponents in the main table ARE",
        "this candidate term; runtime tracks it sub-proportionally",
        "(per-candidate work is one hash-join row). The 100 TB",
        "near-dup path is q22's MinHash-LSH banding (sub-linear in",
        "the main table) — exact Jaccard is the small/medium-corpus",
        "verifier, per the two-path convention.",
        "",
        "| sf | docs | candidate pairs | runtime s |",
        "|---|---|---|---|",
    ]
    for sf, n, c, b in rows:
        lines.append(f"| {sf} | {n} | {c} | {b:.2f} |")
    (s1, _, c1, t1), (s3, _, c3, t3) = rows
    lines += [
        "",
        f"Candidate growth {c3 / c1:.1f}x for 3x docs (exp "
        f"{math.log(c3 / c1) / math.log(3):.2f} — the quadratic "
        f"term); runtime growth {t3 / t1:.1f}x (exp "
        f"{math.log(t3 / t1) / math.log(3):.2f}).",
    ]
    return lines


def probe_streaming(spark) -> list[str]:
    """Streaming drains at sf0.1 vs the 3x sf0.3 point (r9 VERDICT
    stretch item 8): q29's built-in windowed agg and q174's custom
    stateful reservoir each drain the events feed at both scales;
    steady rows/s should hold or improve at 3x volume (state is
    O(windows) / O(strata·k), never O(events) — more rows per
    micro-batch amortizes the fixed per-batch commit cost). Best of
    2 drains per point. Returns markdown lines for SCALING.md."""
    import __spark_entry__ as entry
    from pandas_ai_spark.streaming.stream import LAST_STREAM_METRICS

    qs = entry.queries()
    pairs = [("q29_stream_windowed", "entry_stream_windowed"),
             ("q174_stream_reservoir", "q174_stream_reservoir")]
    dirs = {"0.1": "/root/testdata/sf0.1", "0.3": SF03_DIR}
    res: dict = {}
    for name, metric in pairs:
        for sf, d in dirs.items():
            best, rows, nb = None, None, None
            for _ in range(2):
                spark.catalog.clearCache()
                qs[name](spark, d).collect()
                m = LAST_STREAM_METRICS.get(metric) or {}
                r = m.get("steady_rows_per_sec")
                if r is not None and (best is None or r > best):
                    best = r
                    rows = m.get("input_rows")
                    nb = m.get("micro_batches")
            res[(name, sf)] = (best, rows, nb)
    lines = [
        "",
        "## Streaming drains at 3x volume",
        "",
        "Steady drain rows/s (best of 2) at sf0.1 vs the sf0.3 point —",
        "state is O(windows) / O(strata·k), never O(events), so more",
        "rows per micro-batch amortize the fixed per-batch commit cost",
        "and the rate should hold or improve at 3x:",
        "",
        "| stream | sf0.1 rows | sf0.1 rows/s | sf0.3 rows "
        "| sf0.3 rows/s | ratio |",
        "|---|---|---|---|---|---|",
    ]
    for name, _ in pairs:
        a, ra, _na = res[(name, "0.1")]
        b, rb, _nb = res[(name, "0.3")]
        ratio = (b / a) if (a and b) else float("nan")
        lines.append(f"| {name} | {ra} | {a:.0f} | {rb} | {b:.0f} "
                     f"| {ratio:.2f}x |")
    lines += [
        "",
        "q174's 15k rows/s bench floor was re-derived against the",
        "sf0.3 point: a 3x-volume drain must not fall below the",
        "sf0.1 rate (ratio ≥ ~1 expected; << 1 would mean per-batch",
        "state work grows with volume — the O(events) failure the",
        "bounded-state design rules out).",
    ]
    return lines


def main() -> int:
    import os

    import __spark_entry__ as entry
    from pandas_ai_spark.session import get_session

    if "--streaming" in sys.argv:
        # append-only spot run: probe the streams and extend the
        # existing SCALING.md (the full-run path regenerates it)
        spark = get_session(app_name="scale_probe")
        lines = probe_streaming(spark)
        print("\n".join(lines))
        try:
            with open("SCALING.md", "a") as f:
                f.write("\n".join(lines) + "\n")
        except OSError:
            pass
        return 0

    if "--sections" in sys.argv:
        # refresh ONLY the extra sections (GK switch / ngram growth /
        # streaming) in place: the main table keeps its measured
        # values, everything from the first extra heading down is
        # regenerated — the cheap path when a section's method
        # changes without touching the per-query probes
        spark = get_session(app_name="scale_probe")
        fresh = (probe_gk_switch(spark) + probe_ngram_growth(spark)
                 + probe_streaming(spark))
        print("\n".join(fresh))
        with open("SCALING.md") as f:
            cur = f.read()
        cut = cur.find("\n## Exact→sketch auto-switch")
        if cut == -1:
            cut = cur.find("\n## Exact→GK auto-switch")
        base = cur[:cut] if cut != -1 else cur.rstrip() + "\n"
        with open("SCALING.md", "w") as f:
            f.write(base + "\n".join(fresh) + "\n")
        return 0

    names = sys.argv[1:] or DEFAULT
    partial = bool(sys.argv[1:])
    spark = get_session(app_name="scale_probe")
    qs = entry.queries()
    have_03 = os.path.exists(f"{SF03_DIR}/lineitem.parquet")
    have_10 = os.path.exists(f"{SF10_DIR}/lineitem.parquet")

    # warm codegen
    w = spark.read.parquet("/root/testdata/sf0.01/region.parquet")
    w.groupBy(w.columns[0]).count().collect()

    def timed(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            # same hygiene as bench.py: cold cache before EVERY rep
            # — operators that persist intra-query tables (the dedup
            # family) must not hand rep 2 a warm partial execution,
            # or the scaling exponent measures cache reads
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    results: dict[str, dict[str, float]] = {}
    for name in names:
        results[name] = {}
        for sf in SFS:
            results[name][sf] = timed(name, f"/root/testdata/sf{sf}")
        if have_03 and name in PROBE_SF03:
            results[name]["0.3"] = timed(name, SF03_DIR)
        if have_10 and name in PROBE_SF10:
            results[name]["1.0"] = timed(name, SF10_DIR)

    lines = [
        "# SCALING — measured wall-clock vs scale factor",
        "",
        "Generated by tools/scale_probe.py (best of 2 reps, local[32]).",
        "`exp` = least-squares slope of log(t) vs log(sf) over the top",
        "decade (sf 0.01 → 0.1); ≈0 ⇒ overhead-bound, ≈1 ⇒ linear, >1.3 ⇒",
        "super-linear (a 100 TB risk). Queries ≥2 s at sf0.1 over FACT",
        "tables also run at the derived 3x point (.scale/sf0.3,",
        "tools/make_scale_data.py) — `exp (0.1→0.3)` is the de-floored",
        "slope there, free of the sub-second scheduler floor that",
        "contaminates the top-decade column for small times. The ≥0.7",
        "de-floored tail (PROBE_SF10) gets a FOURTH point at 10x",
        "(.scale/sf1.0, make_scale_data.py --sf1): a single 0.1→0.3",
        "doubling is noisy, so `exp (0.3→1.0)` confirms those slopes",
        "over a full extra decade of data.",
        "",
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | exp (0.01→0.1) "
        "| sf0.3 s | exp (0.1→0.3) | sf1.0 s | exp (0.3→1.0) |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    worst, worst03, worst10 = 0.0, 0.0, 0.0
    for name, ts in results.items():
        exp = math.log(ts["0.1"] / ts["0.01"]) / math.log(10)
        worst = max(worst, exp)
        if "0.3" in ts:
            e3 = math.log(ts["0.3"] / ts["0.1"]) / math.log(3)
            worst03 = max(worst03, e3)
            tail = f"| {ts['0.3']:.2f} | {e3:.2f} |"
        else:
            tail = "| — | — |"
        if "1.0" in ts and "0.3" in ts:
            e10 = math.log(ts["1.0"] / ts["0.3"]) / math.log(10 / 3)
            worst10 = max(worst10, e10)
            tail += f" {ts['1.0']:.2f} | {e10:.2f} |"
        else:
            tail += " — | — |"
        lines.append(
            f"| {name} | {ts['0.001']:.2f} | {ts['0.01']:.2f} "
            f"| {ts['0.1']:.2f} | {exp:.2f} {tail}")
        print(lines[-1])
    lines.append("")
    lines.append(f"Worst top-decade exponent: {worst:.2f}; worst"
                 f" de-floored (0.1→0.3) exponent: {worst03:.2f}; worst"
                 f" 10x-point (0.3→1.0) exponent: {worst10:.2f}.")
    lines += [
        "",
        "## Notes on elevated exponents",
        "",
        "The de-floored (0.1→0.3) column is the trustworthy slope for",
        "every probed query; top-decade values for sub-second queries",
        "mix the ~0.2-0.9 s scheduler floor into the denominator and",
        "can under- OR over-state growth. Known causes for the",
        "elevated top-decade values:",
        "",
        "- **q98 winsorize / q140 trimmed stats (~0.6-0.7)**:",
        "  exact-percentile aggregation state",
        "  grows with distinct values (~rows for a continuous column), so",
        "  cost climbs faster than the scan until the",
        "  `EXACT_STATE_MAX_BYTES` auto-switch engages the bounded-memory",
        "  GK sketch — since r12 at a 64 MiB estimate (the measured CPU",
        "  crossover; the sf1.0 column for q98 is the AUTO path, which",
        "  takes GK there — see the switch section below for both",
        "  paths' slopes).",
        "- **q107 novelty (~0.7)**: the probed number includes the",
        "  once-per-session vocabulary build+persist at each sf; the",
        "  steady (vocab-reuse) path measured separately is ~2.2 s at",
        "  sf0.1 and linear in the batch's grams.",
        "- **q111 join-size estimate / q103 heavy hitters (~0.4-0.6)**:",
        "  two CMS grid scans whose sub-second small-sf points are",
        "  scheduler-floor-bound — the top-decade slope mixes the floor",
        "  out of the denominator, not super-linear work.",
        "- **q112 clean-pipeline / q54 classifier / q63 excision",
        "  (~0.5)**: sub-second at sf≤0.01 (overhead-bound), so the",
        "  first data-dominated point is sf0.1; per-stage work is",
        "  row-linear by construction (single scans + equi-joins).",
        "- **text-corpus queries probe sf0.3 since r10** on a corpus",
        "  of 1x natural + 2x SYNTHETIC-UNIQUE documents (seeded",
        "  draws from the per-language empirical BIGRAM chain —",
        "  tools/make_scale_data.py; naive unigram i.i.d. was",
        "  measured adversarial: top-token shingle combos shared",
        "  across thousands of docs): shingle/token volume scales 3x",
        "  without whole-doc near-duplication, preserving the local",
        "  n-gram frequency structure. q107's sf0.3 slope is an upper",
        "  bound (synthetic text is still more n-gram-novel than",
        "  natural text); q21/q34's sf0.3 slope carries the inherent",
        "  shared-shingle quadratic term — see the dedicated section",
        "  below.",
        "- **embedding-corpus queries probe sf0.3 since r11** on a",
        "  table of 1x natural + 2x cluster-conditional synthetic",
        "  vectors (per-label mean/cov Gaussian draws —",
        "  tools/make_scale_data.make_embeddings; plain copies would",
        "  plant cosine-1.0 pairs a corpus with max 0.60 never has):",
        "  cluster geometry and per-label counts scale 3x exactly,",
        "  with measured zero accidental ≥0.9-cosine pairs, so the",
        "  ANN/near-dup slopes measure volume growth, not a",
        "  distribution change.",
        "- **the ≥0.7 tail carries a 10x point since r12** (sf1.0,",
        "  PROBE_SF10): the first sf1.0 sweep caught two real",
        "  super-linear defaults and both were FIXED, not explained —",
        "  q65's derived cell count was capped at 256 (78-row cells at",
        "  20k vectors → exponent 1.25; cap now 1024 with the training",
        "  sample scaling at 16 points/centroid → 0.77), and q98's",
        "  exact-percentile path measured exponent 1.46 with GK at",
        "  0.70, so the auto-switch cap moved from the 4 GiB memory",
        "  rationale to the 64 MiB measured CPU crossover.",
    ]
    if have_03 and not partial:
        lines += probe_gk_switch(spark)
        lines += probe_ngram_growth(spark)
        lines += probe_streaming(spark)
    if partial:
        # a subset invocation is a spot-check: print, never clobber
        # the full SCALING.md table (r9 fix — a one-query run used to
        # overwrite the whole file)
        print(f"\nWorst top-decade exponent: {worst:.2f} "
              f"(partial run; SCALING.md not rewritten)")
        return 0
    with open("SCALING.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nWorst exponents: {worst:.2f} top-decade, "
          f"{worst03:.2f} de-floored — wrote SCALING.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
