"""Isolate one entry query: dump .explain("formatted") to
plans/r14/<query>_<tag>.txt and time the computation with the noop sink
(guide §1.4 — no result collection, no output write), labeled via
setJobDescription (guide §1.5).

Usage: python tools/explain_query.py <tag> <query> [query ...]
       [--sf-dir D] [--reps N] [--no-noop]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--no-noop", action="store_true")
    ap.add_argument("--round", default="r15",
                    help="plans/<round>/ output subdir")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from pandas_ai_spark.functions.cache import release_operator_caches
    from pandas_ai_spark.session import get_session

    spark = get_session(app_name=f"explain_{args.tag}")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", args.round)
    os.makedirs(outdir, exist_ok=True)

    qs = entry.queries()
    for name in args.queries:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"{name}: plan build")
        df = fn(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{args.tag}.txt"),
                  "w") as f:
            f.write(plan)
        release_operator_caches()
        if not args.no_noop:
            best = float("inf")
            for i in range(args.reps):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(
                    f"{name}: noop rep {i}")
                t0 = time.perf_counter()
                fn(spark, args.sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                release_operator_caches()
            # collect-timing too, matching the bench protocol exactly
            cbest = float("inf")
            for i in range(args.reps):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(
                    f"{name}: collect rep {i}")
                t0 = time.perf_counter()
                fn(spark, args.sf_dir).collect()
                cbest = min(cbest, time.perf_counter() - t0)
                release_operator_caches()
            print(f"TIMING {name} noop={best:.3f}s collect={cbest:.3f}s")
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
