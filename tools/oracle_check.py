"""Driver-mimic correctness harness: runs every __spark_entry__ query on
Spark and its oracle_sql on DuckDB at the same sf, compares row count,
column names, and order-insensitive values.

Usage: python tools/oracle_check.py [--rotation[=N]] [sf_dir] [query ...]

``--rotation`` restricts the sweep to ``__spark_entry__.rotation()`` —
the N (default 50) registry queries with the stalest driver-verified
correctness record — mirroring how a capped driver sweep should cycle
through the registry round-robin instead of re-verifying the same
prefix every round.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")


_INTEGRAL = {"byte", "short", "integer", "long"}


def spark_kinds(schema, rows) -> dict[str, str]:
    """Pandas-visible dtype kind per column, as the driver's hash sees it.

    The driver converts both sides to pandas before hashing, so an
    integral Spark column containing NULLs renders float64 ('f'), and a
    DuckDB HUGEINT (uncast integer ``sum``) renders float64 while Spark's
    int64 renders 'i' — a mismatch the old ``==`` value compare was blind
    to (r7 q92/q107/q109).
    """
    kinds = {}
    for i, f in enumerate(schema.fields):
        t = f.dataType.typeName()
        has_null = any(r[i] is None for r in rows)
        if t in _INTEGRAL:
            k = "f" if has_null else "i"
        elif t in ("float", "double"):
            k = "f"
        elif t == "boolean":
            k = "O" if has_null else "b"
        elif t in ("timestamp", "timestamp_ntz"):
            k = "M"
        else:
            k = "O"
        kinds[f.name.lower()] = k
    return kinds


def duck_kinds(pdf) -> dict[str, str]:
    out = {}
    for c in pdf.columns:
        k = pdf[c].dtype.kind
        if k == "u":
            k = "i"
        elif k not in ("i", "f", "b", "M"):
            k = "O"
        out[c.lower()] = k
    return out


def canonical(rows, cols) -> list[tuple]:
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    rv = round(v, 9)
                    if rv == 0.0 and math.copysign(1.0, rv) < 0:
                        # the driver hashes pandas frames, where -0.0
                        # and +0.0 have different bit patterns; Python
                        # tuple equality treats them as equal, which
                        # made the r12 q212 driver FAIL invisible to
                        # this sweep. Keep them distinct here so local
                        # ALL-MATCH means what the driver's hash means.
                        vals.append("-0.0")
                    else:
                        vals.append(rv)
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main() -> int:
    args = sys.argv[1:]
    rotation_cap = None
    for a in list(args):
        if a == "--rotation":
            rotation_cap = 50
            args.remove(a)
        elif a.startswith("--rotation="):
            rotation_cap = int(a.split("=", 1)[1])
            args.remove(a)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import duckdb
    import __spark_entry__ as entry
    from pandas_ai_spark.functions.cache import release_operator_caches
    from pandas_ai_spark.session import get_session

    if rotation_cap is not None:
        rot = entry.rotation(rotation_cap)
        if only:
            only &= set(rot)
            if not only:
                # an empty set would read as "no filter" in the sweep
                # loop below and silently run EVERYTHING
                print("requested queries are not in the rotation; "
                      "nothing to do")
                return 0
        else:
            only = set(rot)
        print(f"rotation: {len(only)} stalest-verified queries")

    spark = get_session()
    con = duckdb.connect()
    for t in entry.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = [c.lower() for c in sdf.columns]
        # free operator-internal persists (hits/rolling_actives/
        # negative_samples pin MEMORY_AND_DISK tables) so a full
        # 138-query sweep doesn't accumulate pinned blocks
        release_operator_caches()
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(srows)} rows OK")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0].lower() for d in res.description]
        drows = res.fetchall()
        status = []
        if scols != dcols:
            status.append(f"COLS spark={scols} duck={dcols}")
        if len(srows) != len(drows):
            status.append(f"COUNT spark={len(srows)} duck={len(drows)}")
        if not status:
            sk = spark_kinds(sdf.schema, srows)
            dk = duck_kinds(con.execute(oracles[name]).df())
            bad = {c: (sk[c], dk[c]) for c in sk
                   if c in dk and sk[c] != dk[c]}
            if bad:
                status.append(f"DTYPE spark-vs-duck kinds {bad}")
        if not status:
            a = canonical([tuple(r) for r in srows], scols)
            b = canonical(drows, dcols)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                status.append(f"VALUES first-diffs={diffs}")
        if status:
            failures.append(name)
            print(f"{name:28s} FAIL  {' | '.join(status)}")
        else:
            print(f"{name:28s} match ({len(srows)} rows)")
    print()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
