"""Paired-bench runner: N full BENCH_BASELINE=1 bench.py runs (fresh
JVM each, the per-round protocol), with the MEDIAN paired ratio as the
round's representative number (VERDICT r10 item 3 — the best-of-N
headline was cherry-picking; r10's three identical-code runs spanned
0.654x–0.836x from box contention alone).

Writes ONE artifact (default bench_paired_r{N}.json):
  {"summary": {"paired_ratio_median", "paired_ratio_runs": [...],
               "max_consecutive_delta_pct", "agree_within_5pct", ...},
   "runs": [per-run paired block + loadavg + wall],
   "representative": <full bench_last.json of the median-ratio run>}

The runs also serve VERDICT r10 item 6's done-condition: bench.py now
interleaves the engines per query (A/B), and `agree_within_5pct`
records whether consecutive full runs reproduce within ~5%.

Usage: python tools/bench_paired.py --round 11 [--runs 2] [--sf-dir D]
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def one_run(sf_dir: str, idx: int, log) -> dict:
    env = dict(os.environ, BENCH_BASELINE="1",
               SPARK_GRAFT_SF_DIR=sf_dir)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, env=env, stdout=log, stderr=log)
    wall = time.time() - t0
    if proc.returncode != 0:
        raise RuntimeError(f"bench.py run {idx} exited "
                           f"{proc.returncode}")
    with open(os.path.join(REPO, "bench_last.json")) as f:
        full = json.load(f)
    return {"full": full, "wall_sec": round(wall, 1)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out_path = args.out or os.path.join(
        REPO, f"bench_paired_r{args.round}.json")
    log_path = out_path.rsplit(".", 1)[0] + ".log"

    runs = []
    with open(log_path, "w") as log:
        for i in range(args.runs):
            print(f"paired run {i + 1}/{args.runs} ...", flush=True)
            r = one_run(args.sf_dir, i, log)
            p = r["full"].get("paired") or {}
            runs.append({
                "ratio": p.get("ratio"),
                "n": p.get("n"),
                "spark_sec": p.get("spark_sec"),
                "duckdb_sec": p.get("duckdb_sec"),
                "loadavg": r["full"].get("loadavg"),
                "stream_all_pass": (r["full"].get("streaming_floor")
                                    or {}).get("all_pass"),
                "wall_sec": r["wall_sec"],
                "full": r["full"],
            })
            print(f"  ratio={p.get('ratio')} n={p.get('n')} "
                  f"spark={p.get('spark_sec')}s "
                  f"duckdb={p.get('duckdb_sec')}s "
                  f"load={r['full'].get('loadavg')}", flush=True)

    ratios = [r["ratio"] for r in runs if r["ratio"] is not None]
    median = round(statistics.median(ratios), 3) if ratios else None
    deltas = [abs(a - b) / min(a, b) * 100
              for a, b in zip(ratios, ratios[1:])] if len(ratios) > 1 \
        else []
    max_delta = round(max(deltas), 1) if deltas else None
    # the representative run = the one whose ratio IS the median for
    # odd N, else the closest-to-median (median of 2 averages — pick
    # the nearer measured run so the full table is a real run)
    rep = min((r for r in runs if r["ratio"] is not None),
              key=lambda r: abs(r["ratio"] - median)) if median else None
    # heavy-pair cut (VERDICT r12 item 6, r13 item 2): the totals
    # ratio hides the per-query distribution — sub-second DuckDB CTEs
    # vs Spark's ~0.2-0.5 s job floor dominate a per-query median at
    # toy scale. A pair is heavy when EITHER engine does real work:
    # DuckDB >= 1 s OR Spark >= 2 s — the either-engine form is
    # dodge-proof (r13: q138 at spark 9.1 s vanished from a
    # DuckDB-only cut when duck dipped to 0.854 s).
    heavy = None
    if rep:
        full = rep["full"]
        sp_t = full.get("queries") or {}
        du_t = full.get("baseline") or {}
        pairs = {q: {"ratio": round(sp_t[q] / du_t[q], 3),
                     "spark_sec": round(sp_t[q], 3),
                     "duck_sec": round(du_t[q], 3)}
                 for q in sorted(set(sp_t) & set(du_t))
                 if du_t[q] > 0
                 and (du_t[q] >= 1.0 or sp_t[q] >= 2.0)}
        if pairs:
            # two sub-cuts, both fully listed: pairs where the
            # BASELINE does >=1 s of real work (the engine-speed
            # story), and pairs only Spark's side is heavy (>=2 s over
            # a sub-second baseline — scheduler-floor / forced
            # scale-path-demo tail; visible, never hidden, but a
            # different claim than "slower on real work").
            dheavy = {q: v for q, v in pairs.items()
                      if v["duck_sec"] >= 1.0}
            sonly = {q: v for q, v in pairs.items()
                     if v["duck_sec"] < 1.0}
            heavy = {
                "cut": "duckdb >= 1.0s OR spark >= 2.0s",
                "duckdb_floor_sec": 1.0,
                "spark_floor_sec": 2.0,
                "n": len(pairs),
                "ratios": {q: v["ratio"] for q, v in pairs.items()},
                "pairs": pairs,
                "median": round(statistics.median(
                    v["ratio"] for v in pairs.values()), 3),
                "duck_heavy": {
                    "n": len(dheavy),
                    "median": (round(statistics.median(
                        v["ratio"] for v in dheavy.values()), 3)
                        if dheavy else None),
                    "over_2x": sorted(
                        q for q, v in dheavy.items()
                        if v["ratio"] > 2.0),
                },
                "spark_only_heavy": {
                    "n": len(sonly),
                    "median": (round(statistics.median(
                        v["ratio"] for v in sonly.values()), 3)
                        if sonly else None),
                    "over_2x": sorted(
                        q for q, v in sonly.items()
                        if v["ratio"] > 2.0),
                },
                "over_2x": sorted(q for q, v in pairs.items()
                                  if v["ratio"] > 2.0),
            }
    summary = {
        "round": args.round,
        "sf_dir": args.sf_dir,
        "paired_ratio_median": median,
        "paired_ratio_runs": ratios,
        "paired_n": rep["n"] if rep else None,
        "max_consecutive_delta_pct": max_delta,
        "agree_within_5pct": (max_delta is not None
                              and max_delta <= 5.0),
        "protocol": "engines interleaved per query (A/B); median of "
                    "full runs is the representative ratio — never "
                    "the best run",
    }
    if heavy:
        summary["heavy_pairs"] = heavy
    doc = {"summary": summary,
           "runs": [{k: v for k, v in r.items() if k != "full"}
                    for r in runs],
           "representative": rep["full"] if rep else None}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
