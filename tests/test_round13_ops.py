"""Round-13 guards: signed-zero normalization (VERDICT r12 item 1).

The r12 driver failed q212 on value-hash alone: DuckDB's ``round(x, 9)``
preserves IEEE ``-0.0`` while Spark's ``F.round`` (BigDecimal HALF_UP)
normalizes it to ``+0.0``, and the driver hashes pandas frames where the
two zeros differ bitwise.  The fix is mechanical on the oracle side
(``__spark_entry__._fold_negzero_rounds`` rewrites every two-arg
``round`` as ``(round(...) + 0.0)``); this module pins the Spark side:
no registry query may emit ``-0.0`` in any float output column.
"""

import math
import sys

import pytest

sys.path.insert(0, ".")

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _negzero_cols(rows) -> set:
    bad = set()
    for r in rows:
        for c, v in r.asDict().items():
            if isinstance(v, float) and v == 0.0 \
                    and math.copysign(1.0, v) < 0:
                bad.add(c)
    return bad


def test_no_entry_query_emits_negative_zero(spark):
    """Registry-wide: every queries() entry, run at sf0.001, has no
    -0.0 in any output cell (the driver-hash-visible signed-zero class;
    tools/oracle_check.py's canonical() now distinguishes the two zeros
    so the sf0.01 sweep guards the other scale)."""
    from pandas_ai_spark.functions.cache import release_operator_caches

    offenders = {}
    for name, fn in entry.queries_numeric().items():
        rows = fn(spark, SF_DIR).collect()
        release_operator_caches()
        bad = _negzero_cols(rows)
        if bad:
            offenders[name] = sorted(bad)
    assert not offenders, (
        f"entry queries emit -0.0 (driver hash mismatch): {offenders}"
    )


def test_oracle_check_canonical_distinguishes_signed_zero():
    sys.path.insert(0, "tools")
    from oracle_check import canonical

    a = canonical([(0.0, "x")], ["v", "k"])
    b = canonical([(-0.0, "x")], ["v", "k"])
    assert a != b, "sweep comparator is blind to signed zero again"
    # and rounding still folds sub-9dp jitter onto equal values
    assert canonical([(1.0000000001, "x")], ["v", "k"]) == \
        canonical([(1.0000000004, "x")], ["v", "k"])
