"""Root-cause probe for the in-session streaming-drain degradation.

r9 observed: after ~170 batch queries in one session, the
entry_stream_windowed drain measures 42-52k rows/s vs 87-93k in a
fresh session. bench.py works around it with a best-of-two isolation
re-measure. This probe reproduces the aging in a controlled loop and
tests remedies in-place, logging JVM health at every checkpoint:

  phase 0  fresh-session drain baseline (3 reps)
  phase 1  age with the batch query sweep (sf from argv, default 0.1)
  phase 2  aged drain (3 reps)  -> reproduces or not
  phase 3  remedy A: System.gc() (ContextCleaner ref-queue backlog)
  phase 4  remedy B: clear Spark catalog cache + operator caches
  phase 5  aged drain again after remedies

Usage: python tools/aging_probe.py [sf_dir] [n_age_queries]

VERDICT (r10 run, AGING_PROBE_r10.json): aging REFUTED. Steady drain
rates stay 83-105k rows/s across ~180 aged sf0.1 queries (fresh best
106.2k vs aged best 104.9k); System.gc() and cache clears change
nothing; classes/metaspace/codegen plateau (~33k classes, ~210 MB
metaspace, ~130 MB code heap); thread growth (638→1387) is capped
thread-POOL warm-up (block-manager ask/storage pools cap at 100
each, exchange pools likewise — parked threads, no scheduler cost).
r9's 42-52k in-run readings were therefore EXTERNAL box contention —
the same documented drift that moved identical-code paired runs
0.676x→0.803x within two hours. bench.py's best-of-two isolation
re-measure stays, re-documented as a contention guard.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def jvm_health(spark) -> dict:
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    out = {
        "threads": mf.getThreadMXBean().getThreadCount(),
        "classes": mf.getClassLoadingMXBean().getLoadedClassCount(),
        "heap_used_mb": round(
            mf.getMemoryMXBean().getHeapMemoryUsage().getUsed()
            / 1048576),
    }
    try:
        for pool in mf.getMemoryPoolMXBeans().toArray():
            n = pool.getName()
            if "CodeHeap" in n or "Code Cache" in n:
                out[f"pool_{n.replace(' ', '_')}_mb"] = round(
                    pool.getUsage().getUsed() / 1048576)
            if "Metaspace" == n:
                out["metaspace_mb"] = round(
                    pool.getUsage().getUsed() / 1048576)
    except Exception:
        pass
    try:
        gc_total = 0.0
        for g in mf.getGarbageCollectorMXBeans().toArray():
            gc_total += g.getCollectionTime()
        out["gc_time_s"] = round(gc_total / 1000.0, 1)
    except Exception:
        pass
    try:
        import glob
        import os
        local_dirs = glob.glob("/tmp/blockmgr-*")
        nfiles = sum(len(files) for d in local_dirs
                     for _, _, files in os.walk(d))
        out["shuffle_files"] = nfiles
    except Exception:
        pass
    return out


def drain_rate(spark, sf_dir: str, reps: int = 3) -> list:
    import __spark_entry__ as entry
    from pandas_ai_spark.streaming.stream import LAST_STREAM_METRICS

    qs = entry.queries()
    rates = []
    for _ in range(reps):
        spark.catalog.clearCache()
        qs["q29_stream_windowed"](spark, sf_dir).collect()
        m = LAST_STREAM_METRICS.get("entry_stream_windowed") or {}
        rates.append(m.get("steady_rows_per_sec"))
    return rates


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_age = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    from pandas_ai_spark.session import get_session
    import __spark_entry__ as entry
    from pandas_ai_spark.functions.cache import release_operator_caches

    spark = get_session()
    log = []

    def ck(label, rates=None):
        h = jvm_health(spark)
        rec = {"phase": label, "jvm": h}
        if rates is not None:
            rec["drain_steady_rows_per_sec"] = rates
        log.append(rec)
        print(json.dumps(rec), flush=True)

    ck("fresh", drain_rate(spark, sf_dir))

    qs = entry.queries_numeric()
    skip = {"q29_stream_windowed", "q56_stream_interval_join",
            "q67_stream_near_dup", "q100_stream_anomaly",
            "q174_stream_reservoir"}
    t0 = time.perf_counter()
    n = 0
    for name, fn in qs.items():
        if name in skip or n >= n_age:
            continue
        spark.catalog.clearCache()
        try:
            fn(spark, sf_dir).collect()
        except Exception as exc:  # age regardless
            print(f"age {name} failed: {exc}", file=sys.stderr)
        release_operator_caches()
        n += 1
        if n % 50 == 0:
            ck(f"aged_{n}", drain_rate(spark, sf_dir, reps=2))
    print(f"aged with {n} queries in "
          f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)

    ck("aged_final", drain_rate(spark, sf_dir))

    # remedy A: force a full JVM GC (ContextCleaner drains its weak-ref
    # queue on GC; a 12g heap under bounded load may never major-GC)
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)
    ck("after_system_gc", drain_rate(spark, sf_dir))

    # remedy B: catalog + operator cache clear (bench already does this
    # per query; kept as a control)
    spark.catalog.clearCache()
    release_operator_caches()
    ck("after_cache_clear", drain_rate(spark, sf_dir))

    with open("aging_probe_last.json", "w") as f:
        json.dump(log, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
