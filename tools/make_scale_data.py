"""Derive a 3x scale-probe dataset (sf0.3) from the driver's sf0.1
parquet — SCALING.md de-flooring only, never correctness input.

Why: the sf0.01 -> sf0.1 decade is scheduler-floor-contaminated for
sub-second points (VERDICT r8 item 4), so measured exponents understate
true slopes. A third point at 3x the top scale separates fixed overhead
from data-driven growth for every query whose inputs can be extrapolated
FAITHFULLY by keyed replication:

- fact tables (customer / orders / lineitem / events) are unioned 3x
  with disjoint key ranges (shift K=10M per copy, FKs shifted together,
  key-derived names regenerated from the new key so the value
  distribution is preserved);
- continuous measure columns get a tiny per-copy jitter (+i*0.013) so
  distinct-value counts grow with rows (exact-percentile state would
  otherwise collapse across copies and understate q98/q140 growth);
- dimension tables (nation/region/supplier/part) are copied as-is —
  matching TPC-H's slower dim growth; fact-to-dim joins densify, which
  can only OVERSTATE an exponent, never hide one.

documents / embeddings are NOT replicated: copies of a text corpus are
near-duplicates of each other (and copied vectors are cosine-1.0
pairs), which would inflate dedup/LSH pair counts far beyond the
generator's natural duplicate rate — a distribution change, not a
scale change. Instead both get SYNTHETIC-UNIQUE extra rows: documents
from per-language bigram chains (make_documents), embeddings from
per-cluster mean/cov Gaussian draws (make_embeddings).

Output: .scale/sf0.3/*.parquet (gitignored). Usage:
    python tools/make_scale_data.py           # 3x -> .scale/sf0.3
    python tools/make_scale_data.py --sf1     # 10x -> .scale/sf1.0
                                              # (r12: the sf1.0 probe
                                              # point for the ≥0.7
                                              # exponent tail)
"""
from __future__ import annotations

import os
import shutil
import sys

SRC = "/root/testdata/sf0.1"
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# (re)bound in main() from argv; module defaults keep the sf0.3 form
DST = os.path.join(_ROOT, ".scale", "sf0.3")
N_COPIES = 3  # total row multiple (1x natural + N-1 synthetic/shifted)
K = 10_000_000  # key shift per copy — far above every sf0.1 key max


def main() -> int:
    global DST, N_COPIES
    if "--sf1" in sys.argv:
        DST = os.path.join(_ROOT, ".scale", "sf1.0")
        N_COPIES = 10
    import duckdb

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()

    def save(name: str, sql: str) -> None:
        con.execute(f"COPY ({sql}) TO '{DST}/{name}.parquet' "
                    f"(FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{DST}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    def src(name: str) -> str:
        return f"read_parquet('{SRC}/{name}.parquet')"

    copies = ("(SELECT unnest(["
              + ", ".join(str(i) for i in range(N_COPIES))
              + "]) AS i)")

    # * REPLACE keeps each table's exact driver schema (the synthetic
    # tables carry fewer columns than full TPC-H)
    save("customer", f"""
        SELECT * EXCLUDE (i) REPLACE (
               c_custkey + i * {K} AS c_custkey,
               'Customer#' || lpad((c_custkey + i * {K})::VARCHAR,
                                   9, '0') AS c_name,
               c_acctbal + i * 0.013 AS c_acctbal)
        FROM {src('customer')} CROSS JOIN {copies}
    """)
    save("orders", f"""
        SELECT * EXCLUDE (i) REPLACE (
               o_orderkey + i * {K} AS o_orderkey,
               o_custkey + i * {K} AS o_custkey,
               o_totalprice + i * 0.013 AS o_totalprice)
        FROM {src('orders')} CROSS JOIN {copies}
    """)
    save("lineitem", f"""
        SELECT * EXCLUDE (i) REPLACE (
               l_orderkey + i * {K} AS l_orderkey,
               l_extendedprice + i * 0.013 AS l_extendedprice)
        FROM {src('lineitem')} CROSS JOIN {copies}
    """)
    save("events", f"""
        SELECT * EXCLUDE (i) REPLACE (
               event_id + i * {K} AS event_id,
               user_id + i * {K} AS user_id,
               value + i * 0.0013 AS value)
        FROM {src('events')} CROSS JOIN {copies}
    """)
    for dim in ("region", "nation", "supplier", "part"):
        shutil.copyfile(f"{SRC}/{dim}.parquet",
                        f"{DST}/{dim}.parquet")
        print(f"{dim}: copied as-is")
    make_documents(con)
    make_embeddings(con)
    return 0


def make_documents(con) -> None:
    """3x documents with SYNTHETIC-UNIQUE added text (r9 VERDICT item
    5): copies of a text corpus are near-duplicates of each other, so
    plain replication would inflate dedup/LSH pair counts beyond the
    generator's natural duplicate rate — a distribution change, not a
    scale change. Instead the original sf0.1 corpus is kept VERBATIM
    (its natural near-dup structure intact) and each extra copy is
    freshly GENERATED: per original doc, a new doc with the same
    (lang, source) and the same token count, its tokens drawn from
    that language's empirical BIGRAM chain (first token from the
    doc-start distribution, each next token from P(next|prev);
    seeded per-doc — deterministic). The bigram chain matters: naive
    i.i.d. unigram draws concentrate probability on top-token
    shingle combinations natural text never repeats ("the of the"
    in thousands of docs), blowing shared-shingle buckets — and
    candidate pairs — quadratically (measured: q21 sf0.3 exponent
    1.66 under i.i.d.). Chain draws reproduce the corpus's local
    n-gram frequency structure, so shingle volume and bucket sizes
    scale ~linearly while whole-doc near-duplication stays
    vanishingly unlikely. Known caveat (documented in SCALING.md):
    synthetic docs are still somewhat more n-gram-novel than natural
    text, so q107-style vocab growth is an upper bound at 3x."""
    import numpy as np
    import pandas as pd

    docs = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars FROM "
        f"read_parquet('{SRC}/documents.parquet') ORDER BY doc_id"
    ).df()
    chains: dict = {}
    for lang, grp in docs.groupby("lang"):
        token_lists = [str(t).split() for t in grp["text"]]
        starts: dict = {}
        trans: dict = {}
        for toks in token_lists:
            if not toks:
                continue
            starts[toks[0]] = starts.get(toks[0], 0) + 1
            for a, b in zip(toks, toks[1:]):
                trans.setdefault(a, {})[b] = \
                    trans.setdefault(a, {}).get(b, 0) + 1

        def dist(counts: dict):
            vals = np.array(sorted(counts), dtype=object)
            c = np.array([counts[v] for v in vals], dtype=np.float64)
            return vals, np.cumsum(c / c.sum())

        chains[lang] = (dist(starts),
                        {a: dist(cs) for a, cs in trans.items()})
    out = [docs]
    for i in range(1, N_COPIES):
        rows = []
        for doc_id, text, lang, source, _nc in docs.itertuples(
                index=False):
            (svals, scum), trans = chains[lang]
            n_tok = max(1, len(str(text).split()))
            rng = np.random.Generator(
                np.random.PCG64(int(doc_id) + i * K))
            us = rng.random(n_tok)
            toks = [svals[min(np.searchsorted(scum, us[0],
                                              side="right"),
                              len(svals) - 1)]]
            for j in range(1, n_tok):
                prev = toks[-1]
                # doc-final tokens have no successors: restart the
                # chain from the start distribution
                vals, cum = trans.get(prev, (svals, scum))
                toks.append(vals[min(np.searchsorted(
                    cum, us[j], side="right"), len(vals) - 1)])
            new_text = " ".join(toks)
            rows.append((int(doc_id) + i * K, new_text, lang, source,
                         len(new_text)))
        out.append(pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source",
                           "n_chars"]))
    full = pd.concat(out, ignore_index=True)
    con.register("__docs3", full)
    con.execute(f"COPY (SELECT * FROM __docs3 ORDER BY doc_id) TO "
                f"'{DST}/documents.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM "
                    f"'{DST}/documents.parquet'").fetchone()[0]
    print(f"documents: {n} rows (1x natural + {N_COPIES - 1}x "
          f"synthetic-unique)")


# Controlled near-dup injection rate for synthetic embeddings: the
# fraction of synthetic rows emitted as a jittered copy (cosine
# ≈0.999) of a random natural vector instead of a fresh cluster draw.
# Default 0.0 MATCHES the measured natural corpus: sf0.1 embeddings
# contain ZERO pairs above cosine 0.9 (max 0.60) — the near-dup
# operators plant their own dups inside the query (_q26_corpus's one
# perturbed copy per vector, which scales with table size
# automatically), so injecting table-level dups would CHANGE the
# distribution, not scale it. Raise explicitly to stress recall.
EMB_NEAR_DUP_RATE = 0.0


def make_embeddings(con) -> None:
    """3x embeddings with CLUSTER-CONDITIONAL synthetic vectors (r10
    VERDICT item 4 — the last sf0.3 blind spot): plain replication
    would plant exact-duplicate vectors (cosine 1.0 pairs a corpus
    with a measured max of 0.60 never has — the embedding analog of
    the near-dup text inflation make_documents avoids), so the
    original sf0.1 table is kept VERBATIM and each extra copy is
    freshly SAMPLED: per label (10 clusters, 182-218 vectors each in
    64 dims), fit mean + full covariance on the natural vectors and
    draw one multivariate-normal vector per original row (ridge
    1e-9 on the diagonal for Cholesky stability; seeded — fully
    deterministic). Cluster geometry (centroid placement, spread,
    per-label counts) scales 3x exactly; continuous 64-dim draws
    make accidental ≥0.9-cosine pairs vanishingly unlikely, so the
    ANN/near-dup probes measure VOLUME growth, not a distribution
    change. ``EMB_NEAR_DUP_RATE`` documents the controlled injection
    knob (default 0 — matches the measured natural rate of zero)."""
    import numpy as np
    import pandas as pd

    df = con.execute(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{SRC}/embeddings.parquet') ORDER BY vec_id"
    ).df()
    V = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    labels = df["label"].to_numpy()
    dim = V.shape[1]
    params = {}
    for lab in np.unique(labels):
        X = V[labels == lab]
        params[int(lab)] = (X.mean(axis=0),
                            np.cov(X, rowvar=False)
                            + 1e-9 * np.eye(dim))
    out = [df]
    for i in range(1, N_COPIES):
        rng = np.random.Generator(np.random.PCG64(9173 + i))
        vecs = np.empty_like(V)
        for lab, (mu, cov) in params.items():
            mask = labels == lab
            vecs[mask] = rng.multivariate_normal(
                mu, cov, size=int(mask.sum()), method="cholesky")
        if EMB_NEAR_DUP_RATE > 0:
            m = rng.random(len(V)) < EMB_NEAR_DUP_RATE
            src = rng.integers(0, len(V), size=int(m.sum()))
            vecs[m] = V[src] * (1.0 + 0.001 * rng.standard_normal(
                (int(m.sum()), dim)))
        out.append(pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy() + i * K,
            "embedding": [r.astype(np.float32) for r in vecs],
            "label": labels,
        }))
    full = pd.concat(out, ignore_index=True)
    con.register("__emb3", full)
    # cast back to the driver schema's FLOAT[] (float32 list)
    con.execute(f"COPY (SELECT vec_id, embedding::FLOAT[] AS embedding,"
                f" label FROM __emb3 ORDER BY vec_id) TO "
                f"'{DST}/embeddings.parquet' (FORMAT PARQUET)")
    n, mx = con.execute(
        f"SELECT count(*), max(len(embedding)) FROM "
        f"'{DST}/embeddings.parquet'").fetchone()
    print(f"embeddings: {n} rows x {mx} dims (1x natural + "
          f"{N_COPIES - 1}x cluster-conditional synthetic)")


if __name__ == "__main__":
    raise SystemExit(main())
