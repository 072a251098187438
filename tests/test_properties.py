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


