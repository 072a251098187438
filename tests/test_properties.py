"""Property-based tests (hypothesis) — beyond the reference's test
strategy: the security gates and format translators must be total
functions (never crash) and must uphold their invariants on arbitrary
input, not just the curated cases."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from pandas_ai_spark.plans.transformations import strftime_to_spark
from pandas_ai_spark.sql import is_sql_query_safe, sanitize_relation_name

WRITE_KEYWORDS = ["INSERT", "UPDATE", "DELETE", "DROP", "CREATE", "ALTER",
                  "TRUNCATE", "GRANT", "MERGE", "ATTACH", "COPY", "VACUUM"]


@given(st.text(max_size=500))
@settings(max_examples=300, deadline=None)
def test_sanitizer_total(s):
    assert is_sql_query_safe(s) in (True, False)


@given(st.sampled_from(WRITE_KEYWORDS), st.text(max_size=100))
@settings(max_examples=200, deadline=None)
def test_write_statements_always_blocked(kw, rest):
    assert not is_sql_query_safe(f"{kw} {rest}")


@given(st.sampled_from(WRITE_KEYWORDS), st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_keyword_outside_literal_blocks_select(kw, rest):
    # a write keyword anywhere outside a string literal must block the
    # query even when it starts with SELECT
    rest = rest.replace("'", "")
    assert not is_sql_query_safe(f"SELECT * FROM t WHERE {kw} {rest}")


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_semicolon_stacking_always_blocked(s):
    assert not is_sql_query_safe(f"SELECT 1; {s};")


@given(st.text(min_size=1, max_size=200))
@settings(max_examples=300, deadline=None)
def test_relation_name_always_valid_identifier(s):
    out = sanitize_relation_name(s)
    assert re.fullmatch(r"[a-z0-9_][a-z0-9_]*", out), out
    assert len(out) <= 66


@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=50))
@settings(max_examples=300, deadline=None)
def test_strftime_translation_total(fmt):
    out = strftime_to_spark(fmt)
    # every ASCII letter in the output is either part of a known pattern
    # or quoted — unbalanced quotes would crash Spark's formatter
    assert out.count("'") % 2 == 0




# ---------------------------------------------------------------------------
# Round-6 operator invariants (Spark-backed: few examples, hard laws)
# ---------------------------------------------------------------------------

_vals = st.lists(st.floats(min_value=0.0, max_value=1e6,
                           allow_nan=False, allow_infinity=False),
                 min_size=1, max_size=12)


@given(_vals, st.lists(st.booleans(), min_size=1, max_size=12))
@settings(max_examples=5, deadline=None)
def test_kaplan_meier_monotone_in_unit_interval(spark, ds, es):
    from pandas_ai_spark.functions.survival import kaplan_meier

    n = min(len(ds), len(es))
    df = spark.createDataFrame(
        [(ds[i], int(es[i])) for i in range(n)], "d double, e int")
    rows = kaplan_meier(df, "d", "e").collect()
    surv = [r.survival for r in rows]  # already ordered by t
    assert all(0.0 <= s <= 1.0 + 1e-12 for s in surv)
    assert all(a >= b - 1e-12 for a, b in zip(surv, surv[1:]))
    assert rows[0].n_risk == n  # everyone at risk at the first time


@given(_vals)
@settings(max_examples=5, deadline=None)
def test_gini_bounded(spark, vs):
    from pandas_ai_spark.functions.stats import gini_coefficient

    df = spark.createDataFrame([(v,) for v in vs], "v double")
    g = gini_coefficient(df, "v").collect()[0]
    if g.gini is not None:  # all-zero groups surface NULL
        n = len(vs)
        assert -1e-9 <= g.gini <= (n - 1) / n + 1e-9


@given(_vals, st.lists(st.floats(min_value=0.01, max_value=100.0,
                                 allow_nan=False), min_size=1,
                       max_size=12))
@settings(max_examples=5, deadline=None)
def test_weighted_median_within_range(spark, vs, ws):
    from pandas_ai_spark.functions.stats import weighted_median

    n = min(len(vs), len(ws))
    df = spark.createDataFrame(
        [("g", vs[i], ws[i]) for i in range(n)],
        "g string, v double, w double")
    r = weighted_median(df, "g", "v", "w").collect()[0]
    assert min(vs[:n]) - 1e-9 <= r.wmedian <= max(vs[:n]) + 1e-9


@given(_vals, _vals)
@settings(max_examples=5, deadline=None)
def test_ks_statistic_in_unit_interval(spark, a, b):
    from pandas_ai_spark.functions.stats import ks_test

    rows = [("g", v, "a") for v in a] + [("g", v, "b") for v in b]
    df = spark.createDataFrame(rows, "g string, v double, s string")
    r = ks_test(df, "g", "v", "s", "a", "b").collect()[0]
    assert -1e-12 <= r.d_stat <= 1.0 + 1e-12


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=2, max_size=20),
       st.integers(min_value=2, max_value=6))
@settings(max_examples=5, deadline=None)
def test_quantile_buckets_range_and_cover(spark, vs, k):
    from pandas_ai_spark.functions.stats import quantile_buckets

    df = spark.createDataFrame([(v,) for v in vs], "v double")
    rows = quantile_buckets(df, "v", n_buckets=k).collect()
    assert all(1 <= r.bucket <= k for r in rows)
