"""Round-15 (optimization round 2) tests.

Covers the operator-internal restructurings of this round — every one
is REQUIRED to be output-identical to the shape it replaced:

- distributed_midrank/_multi, ks_test_distributed,
  wasserstein_1d_distributed, bh_fdr_distributed: fully lazy form
  (deterministic slog-width buckets + window prefix-sum offsets) —
  zero internal Spark jobs at plan-build, outputs identical to the
  window forms across ties / negatives / wide magnitudes / NULLs.
- poisson_bootstrap_ci: hex-threshold inverse CDF — weights identical
  to an independent hashlib/python reference.
- graph ADVICE fixes: _kcore_local / _cc_local NULL endpoints match
  the distributed paths instead of crashing / mislabeling.
- triangle_counts: local fast path + assume_canonical are
  count-identical to the distributed join chain.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted((tuple(r[c] for c in cols) for r in df.collect()),
                  key=lambda t: tuple(str(x) for x in t))


# ---------------------------------------------------------------------
# lazy distributed twins: zero internal jobs, window-form equality
# ---------------------------------------------------------------------

class TestLazyTwins:
    def _mixed_df(self, spark):
        # ties, negatives, zero, wide magnitudes, NULLs, two groups
        vals = [
            ("g1", 3.5), ("g1", 3.5), ("g1", -2.0), ("g1", 0.0),
            ("g1", 1e8), ("g1", 1e-8), ("g1", None), ("g1", 42.0),
            ("g2", -1e6), ("g2", -1e6), ("g2", 7.0), ("g2", 7.0),
            ("g2", 7.0), ("g2", None), ("g2", 123.456), ("g2", -0.5),
        ]
        return spark.createDataFrame(vals, "grp string, v double")

    def test_midrank_build_runs_zero_jobs(self, spark):
        from pandas_ai_spark.functions.stats import distributed_midrank
        df = self._mixed_df(spark)
        sc = spark.sparkContext
        sc.setJobGroup("midrank_build_r15", "lazy check")
        try:
            out = distributed_midrank(df, "v", by=["grp"], buckets=4)
            jobs = sc.statusTracker().getJobIdsForGroup(
                "midrank_build_r15")
        finally:
            sc.setJobGroup(None, None)
        assert list(jobs) == [], (
            f"plan-build ran Spark jobs: {jobs} — the r15 rework "
            f"made the midrank fully lazy")
        assert "r2" in out.columns

    def test_midrank_matches_window_form(self, spark):
        from pyspark.sql.window import Window
        from pandas_ai_spark.functions.stats import distributed_midrank
        df = self._mixed_df(spark)
        wo = (Window.partitionBy("grp").orderBy("v")
              .rangeBetween(Window.unboundedPreceding, 0))
        wt = Window.partitionBy("grp", "v")
        cum = F.count(F.lit(1)).over(wo)
        t = F.count(F.lit(1)).over(wt)
        r2w = (F.lit(2) * (cum - t) + t + F.lit(1)).cast("bigint")
        want = _rows(df.select("grp", "v", r2w.alias("r2")))
        got = _rows(distributed_midrank(
            df, "v", by=["grp"], buckets=4).select("grp", "v", "r2"))
        assert got == want

    def test_midrank_single_value_and_all_null_groups(self, spark):
        from pandas_ai_spark.functions.stats import distributed_midrank
        df = spark.createDataFrame(
            [("a", 5.0), ("b", None), ("b", None)],
            "grp string, v double")
        got = {(r["grp"], r["v"]): r["r2"]
               for r in distributed_midrank(
                   df, "v", by=["grp"], buckets=4).collect()}
        # single value: midrank 1 doubled -> 2*0+1+1... r2 = 2*(1-1)+1+1
        assert got[("a", 5.0)] == 2
        # two tied NULLs share the lowest midrank: r2 = 2*(2-2)+2+1 = 3
        assert got[("b", None)] == 3

    def test_ks_distributed_matches_window_form(self, spark):
        from pandas_ai_spark.functions.stats import (ks_test,
                                                     ks_test_distributed)
        import random
        rnd = random.Random(7)
        rows = [("k%d" % (i % 3), rnd.choice(["x", "y"]),
                 round(rnd.gauss(0, 10 ** rnd.randint(-3, 5)), 4))
                for i in range(400)]
        df = spark.createDataFrame(rows, "g string, s string, v double")
        want = _rows(ks_test(df, "g", "v", "s", "x", "y",
                             distributed=False))
        got = _rows(ks_test_distributed(df, "g", "v", "s", "x", "y",
                                        buckets=4))
        assert got == want

    def test_ks_distributed_build_runs_zero_jobs(self, spark):
        from pandas_ai_spark.functions.stats import ks_test_distributed
        df = spark.createDataFrame(
            [("g", "x", 1.0), ("g", "y", 2.0), ("g", "x", 3.0)],
            "g string, s string, v double")
        sc = spark.sparkContext
        sc.setJobGroup("ks_build_r15", "lazy check")
        try:
            ks_test_distributed(df, "g", "v", "s", "x", "y", buckets=4)
            jobs = sc.statusTracker().getJobIdsForGroup("ks_build_r15")
        finally:
            sc.setJobGroup(None, None)
        assert list(jobs) == []

    def test_wasserstein_distributed_matches_window_form(self, spark):
        from pandas_ai_spark.functions.stats import (
            wasserstein_1d, wasserstein_1d_distributed)
        import random
        rnd = random.Random(11)
        rows = [("k%d" % (i % 2), rnd.choice(["x", "y"]),
                 float(rnd.randint(-50, 50)))
                for i in range(300)]
        df = spark.createDataFrame(rows, "g string, s string, v double")
        want = _rows(wasserstein_1d(df, "g", "v", "s", "x", "y",
                                    distributed=False))
        got = _rows(wasserstein_1d_distributed(df, "g", "v", "s",
                                               "x", "y", buckets=4))
        assert got == want

    def test_bh_fdr_distributed_matches_window_form(self, spark):
        from pandas_ai_spark.functions.stats import (bh_fdr,
                                                     bh_fdr_distributed)
        rows = [("t%02d" % i, p) for i, p in enumerate(
            [0.001, 0.004, 0.004, 0.02, 0.03, 0.5, 0.5, 0.8, None,
             0.049, 0.051, 1.0, 0.0001, 0.25])]
        df = spark.createDataFrame(rows, "test string, p double")
        want = _rows(bh_fdr(df, "p", alpha=0.05,
                            tiebreak_cols=["test"], distributed=False))
        got = _rows(bh_fdr_distributed(df, "p", alpha=0.05,
                                       tiebreak_cols=["test"],
                                       buckets=4))
        assert got == want

    def test_mw_kw_distributed_match_window_forms(self, spark):
        from pandas_ai_spark.functions.stats import (
            kruskal_wallis, kruskal_wallis_distributed, mann_whitney_u,
            mann_whitney_u_distributed)
        import random
        rnd = random.Random(3)
        rows = [("b%d" % (i % 2), "l%d" % (i % 3),
                 float(rnd.randint(0, 30)))
                for i in range(240)]
        df = spark.createDataFrame(rows, "byk string, lev string, "
                                         "v double")
        want = _rows(mann_whitney_u(df, "v", "lev", "l0", "l1",
                                    by=["byk"], distributed=False))
        got = _rows(mann_whitney_u_distributed(df, "v", "lev",
                                               "l0", "l1", by=["byk"],
                                               buckets=4))
        assert got == want
        want = _rows(kruskal_wallis(df, "v", "lev", by=["byk"],
                                    distributed=False))
        got = _rows(kruskal_wallis_distributed(df, "v", "lev",
                                               by=["byk"], buckets=4))
        assert got == want


# ---------------------------------------------------------------------
# q170 hex-threshold inverse CDF: independent python reference
# ---------------------------------------------------------------------

class TestBootstrapHexThresholds:
    def test_weights_match_hashlib_reference(self, spark):
        import hashlib

        from pandas_ai_spark.functions.stats import (_POISSON1_CDF,
                                                     poisson_bootstrap_ci)
        B = 8
        rows = [("g", i, i % 7) for i in range(50)]
        df = spark.createDataFrame(rows, "g string, rid bigint, x int")
        out = poisson_bootstrap_ci(df, "x", "rid", by=["g"], B=B,
                                   seed="t15").collect()[0]

        # independent reference: hashlib md5, float division
        def weight(rid: int, b: int) -> int:
            h = hashlib.md5(
                f"t15:{rid}:{b // 4}".encode()).hexdigest()
            t = int(h[8 * (b % 4): 8 * (b % 4) + 8], 16)
            u = t / 4294967296.0
            return sum(u >= c for c in _POISSON1_CDF)

        means = []
        for b in range(B):
            sw = sum(weight(r, b) for _, r, _ in rows)
            swx = sum(weight(r, b) * x for _, r, x in rows)
            if sw > 0:
                means.append(swx / sw)
        means.sort()
        n = len(means)
        lo = means[max(math.ceil(0.025 * n), 1) - 1]
        hi = means[min(math.ceil(0.975 * n), n) - 1]
        assert out["ci_lo"] == lo
        assert out["ci_hi"] == hi

    def test_hex_threshold_identity(self, spark):
        # the exact claim behind the rewrite: for every 32-bit T,
        # T/2^32 >= c  <=>  hex8(T) >= hex8(ceil(c * 2^32))
        from pandas_ai_spark.functions.stats import _POISSON1_CDF
        import random
        rnd = random.Random(5)
        samples = [0, 1, 2 ** 32 - 1] + \
            [math.ceil(c * 4294967296.0) + d
             for c in _POISSON1_CDF for d in (-1, 0, 1)] + \
            [rnd.getrandbits(32) for _ in range(1000)]
        for T in samples:
            if not 0 <= T < 2 ** 32:
                continue
            for c in _POISSON1_CDF:
                thr = format(math.ceil(c * 4294967296.0), "08x")
                assert ((T / 4294967296.0) >= c) == \
                    (format(T, "08x") >= thr), (T, c)


# ---------------------------------------------------------------------
# graph ADVICE fixes + triangle local path
# ---------------------------------------------------------------------

class TestGraphR15:
    def test_kcore_local_null_endpoint_matches_distributed(self, spark):
        from pandas_ai_spark.functions.graph import kcore
        # triangle a-b-c (sym) + a null-dst edge inflating a's round-1
        # degree, exactly the distributed groupBy semantics
        sym = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
               ("b", "c"), ("c", "b"), ("a", None)]
        df = spark.createDataFrame(sym, "src string, dst string")
        local = _rows(kcore(df, k=2, rounds=4))
        dist = _rows(kcore(df, k=2, rounds=4, local_edges_below=0))
        assert local == dist

    def test_cc_local_null_node_self_labeled(self, spark):
        from pandas_ai_spark.functions.graph import connected_components
        df = spark.createDataFrame(
            [("a", "b"), ("c", None), (None, None)],
            "src string, dst string")
        local = _rows(connected_components(df))
        stats: dict = {}
        dist = _rows(connected_components(df, stats=stats))
        assert local == dist
        # the null node is restored self-labeled (component NULL)
        assert (None, None) in local

    def test_triangle_local_matches_distributed_and_canonical(self, spark):
        from pandas_ai_spark.functions.graph import triangle_counts
        import random
        rnd = random.Random(9)
        raw = {(f"n{rnd.randint(0, 15)}", f"n{rnd.randint(0, 15)}")
               for _ in range(80)}
        edges = [(u, v) for u, v in raw]
        # feed both directions + dupes to the canonicalizing path
        df = spark.createDataFrame(edges + [(v, u) for u, v in edges],
                                   "src string, dst string")
        local = _rows(triangle_counts(df))
        dist = _rows(triangle_counts(df, local_edges_below=0))
        assert local == dist
        # canonical input, assume_canonical skips the re-dedup
        canon = sorted({(min(u, v), max(u, v))
                        for u, v in edges if u != v})
        cdf = spark.createDataFrame(canon, "src string, dst string")
        got = _rows(triangle_counts(cdf, assume_canonical=True))
        assert got == local
        got_dist = _rows(triangle_counts(cdf, assume_canonical=True,
                                         local_edges_below=0))
        assert got_dist == local

    def test_triangle_local_empty_edges(self, spark):
        # q88 at sf0.001 yields ZERO edges above min_support — the
        # local path must return an empty frame, not a shape error
        from pandas_ai_spark.functions.graph import triangle_counts
        df = spark.createDataFrame([], "src string, dst string")
        assert triangle_counts(df).count() == 0
        assert triangle_counts(df, assume_canonical=True).count() == 0
