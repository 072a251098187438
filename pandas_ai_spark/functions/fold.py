"""Scalar fold-back: attach a one-row aggregate to every row of a
frame.

``fold_scalars(df, one_row_agg)`` is the declarative alternative to
the collect-and-fold-as-literal pattern (``neyman_allocation``): no
action at plan-build time, the whole pipeline stays one lazy plan.

Physical shape: Catalyst constant-folds any key you could join on (a
literal equi-key is eliminated by the optimizer), so this ALWAYS plans
as ``BroadcastNestedLoopJoin`` with an ``IdentityBroadcastMode``
build of the one-row aggregate. That is O(N * 1) work — one broadcast
row visited per input row — categorically not the O(N*M) comparison
join the name suggests. ``tools/plan_audit.py`` recognizes exactly
this shape (identity-broadcast build whose child is an ungrouped
aggregate) and exempts it; any other nested-loop join still flags.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fold_scalars(left: DataFrame, scalars: DataFrame) -> DataFrame:
    """Append ``scalars``'s columns (a ONE-ROW frame — typically an
    ungrouped ``agg``) to every row of ``left``. The caller
    guarantees ``scalars`` has exactly one row; more rows would
    multiply ``left`` (same contract as ``crossJoin``)."""
    from pyspark.sql.functions import broadcast

    return left.crossJoin(broadcast(scalars))
