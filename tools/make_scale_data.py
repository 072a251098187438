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
near-duplicates of each other, which would inflate dedup/LSH pair counts
far beyond the generator's natural duplicate rate — a distribution
change, not a scale change. Text/embedding queries keep the
sf0.01->sf0.1 decade exponent (noted in SCALING.md).

Output: .scale/sf0.3/*.parquet (gitignored). Usage:
    python tools/make_scale_data.py
"""
from __future__ import annotations

import os
import shutil

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scale", "sf0.3")
K = 10_000_000  # key shift per copy — far above every sf0.1 key max


def main() -> int:
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

    copies = "(SELECT unnest([0, 1, 2]) AS i)"

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
    for dim in ("region", "nation", "supplier", "part",
                "documents", "embeddings"):
        shutil.copyfile(f"{SRC}/{dim}.parquet",
                        f"{DST}/{dim}.parquet")
        print(f"{dim}: copied as-is")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
