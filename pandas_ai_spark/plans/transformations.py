"""All 29 semantic-layer column transformations as Spark combinators.

The reference implements these twice (pandas ops and SQL-text rewrites in
pandasai/query_builders/sql_transformation_manager.py:36-246); here each is
a pure function over ``pyspark.sql.Column`` — JVM-side, whole-stage-codegen
friendly, zero Python in the hot path — or, where the semantics genuinely
need the whole DataFrame (stats passes, dedup, one-hot), a DataFrame-level
step.

Scale notes:
- Column-level transforms are embarrassingly parallel — no shuffle.
- ``normalize`` / ``standardize`` need global stats. The reference emits
  ``(x - MIN(x)) / (MAX(x) - MIN(x))`` as a bare aggregate-in-projection
  (sql_transformation_manager.py:118-124), which only DuckDB tolerates.
  We run an explicit two-pass: a partial-aggregated stats pass (one cheap
  scan, no single-partition window trap) whose scalar result is folded
  into the projection as literals.
- ``validate_foreign_key`` becomes a broadcast-able left join against the
  distinct reference keys — Catalyst would rewrite the reference's
  IN-subquery the same way.
- ``encode_categorical`` (unimplemented in the reference — dispatch at
  sql_transformation_manager.py:42-47 raises) is defined here for real:
  distinct-scan for vocabulary, then one 0/1 column per category.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from ..schema import TransformationParams

EMAIL_REGEX = r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$"

# strftime directive → Spark (java.time) datetime pattern
_STRFTIME_MAP = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd", "H": "HH", "I": "hh",
    "M": "mm", "S": "ss", "f": "SSSSSS", "p": "a", "B": "MMMM", "b": "MMM",
    "A": "EEEE", "a": "EEE", "j": "DDD", "%": "%",
}


def strftime_to_spark(fmt: str) -> str:
    """Translate a strftime format to a Spark datetime pattern.

    Characters reserved by Java's DateTimeFormatter — ASCII letters plus
    ``# { }`` and the quote — are emitted as quoted literals. CONSECUTIVE
    literal characters are accumulated into ONE quoted run: quoting each
    character separately would put adjacent runs like ``'a''t'`` in the
    pattern, which Java parses as the literal ``a't`` (``''`` inside a
    quoted section is an escaped quote), silently corrupting the output.
    A run consisting solely of quotes is emitted as ``''`` pairs (the
    enclosed form ``''''`` would parse as TWO literal quotes). Unknown
    ``%x`` directives become literal characters of the run.
    """
    out: list[str] = []
    lit: list[str] = []

    def flush() -> None:
        if not lit:
            return
        run = "".join(lit)
        lit.clear()
        if set(run) == {"'"}:
            out.append("''" * len(run))
        else:
            out.append("'" + run.replace("'", "''") + "'")

    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            nxt = fmt[i + 1]
            if nxt in _STRFTIME_MAP:
                flush()
                out.append(_STRFTIME_MAP[nxt])
            else:
                # unknown directive → its character is a literal
                lit.append(nxt)
            i += 2
        elif (ch.isascii() and ch.isalpha()) or ch in "'#{}":
            lit.append(ch)
            i += 1
        else:
            flush()
            out.append(ch)
            i += 1
    flush()
    return "".join(out)


def _lit(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


# ---------------------------------------------------------------------------
# Column-level transforms: (col, params) -> Column
# ---------------------------------------------------------------------------

def anonymize(col: Column, p: "TransformationParams") -> Column:
    # reference SQL: MD5(expr)  (sql_transformation_manager.py:51-54)
    return F.md5(col.cast("string"))


def convert_timezone(col: Column, p: "TransformationParams") -> Column:
    # reference SQL: CONVERT_TZ(expr, from, to)  (:126-130)
    from_tz = p.from_tz or "UTC"
    to_tz = p.to_tz or "UTC"
    return F.from_utc_timestamp(F.to_utc_timestamp(col, from_tz), to_tz)


def to_lowercase(col: Column, p) -> Column:
    return F.lower(col)


def to_uppercase(col: Column, p) -> Column:
    return F.upper(col)


def strip(col: Column, p) -> Column:
    return F.trim(col)


def round_numbers(col: Column, p) -> Column:
    return F.round(col, p.decimals if p.decimals is not None else 0)


def scale(col: Column, p) -> Column:
    return col * _lit(p.factor if p.factor is not None else 1.0)


def format_date(col: Column, p) -> Column:
    fmt = strftime_to_spark(p.format or "%Y-%m-%d")
    return F.date_format(col, fmt)


def to_numeric(col: Column, p) -> Column:
    # reference SQL: CAST(expr AS DECIMAL) (:136-138). Double keeps parity
    # with the pandas path (pd.to_numeric) and avoids DECIMAL(10,0) scale loss.
    return col.cast("double")


def to_datetime(col: Column, p) -> Column:
    if p.format:
        return F.to_timestamp(col, strftime_to_spark(p.format))
    return F.to_timestamp(col)


def fill_na(col: Column, p) -> Column:
    return F.coalesce(col, _lit(p.value))


def replace(col: Column, p) -> Column:
    # literal (non-regex) replace, like SQL REPLACE (:146-150)
    return F.replace(col, F.lit(str(p.old_value)), F.lit(str(p.new_value)))


def extract(col: Column, p) -> Column:
    # REGEXP_SUBSTR returns NULL on no-match; regexp_extract returns '' —
    # guard with rlike for identical semantics.
    pat = p.pattern or ""
    return F.when(col.rlike(pat), F.regexp_extract(col, pat, 0))


def truncate(col: Column, p) -> Column:
    n = p.length if p.length is not None else 10
    if p.add_ellipsis:
        return F.when(
            F.length(col) > n,
            F.concat(F.substring(col, 1, max(n - 3, 0)), F.lit("...")),
        ).otherwise(col)
    return F.substring(col, 1, n)


def pad(col: Column, p) -> Column:
    width = p.width if p.width is not None else 10
    ch = p.pad_char if p.pad_char is not None else " "
    if (p.side or "left") == "left":
        return F.lpad(col, width, ch)
    return F.rpad(col, width, ch)


def clip(col: Column, p) -> Column:
    out = col
    if p.lower is not None:
        out = F.greatest(out, _lit(p.lower))
    if p.upper is not None:
        out = F.least(out, _lit(p.upper))
    return out


def bin_(col: Column, p) -> Column:
    bins = p.bins or []
    labels = p.labels or []
    if len(bins) < 2 or len(labels) != len(bins) - 1:
        raise ValueError("bin requires len(labels) == len(bins) - 1")
    expr = None
    for i, label in enumerate(labels):
        cond = (col >= _lit(bins[i])) & (col < _lit(bins[i + 1]))
        expr = F.when(cond, _lit(label)) if expr is None else expr.when(cond, _lit(label))
    return expr


def map_values(col: Column, p) -> Column:
    expr = None
    for k, v in (p.mapping or {}).items():
        cond = col == _lit(k)
        expr = F.when(cond, _lit(v)) if expr is None else expr.when(cond, _lit(v))
    return expr.otherwise(col) if expr is not None else col


def validate_email(col: Column, p) -> Column:
    # CASE WHEN expr REGEXP pat THEN expr ELSE NULL (:195-199); drop_invalid
    # handled at the DataFrame level by the compiler.
    return F.when(col.rlike(EMAIL_REGEX), col)


def validate_date_range(col: Column, p) -> Column:
    return F.when(col.between(_lit(p.start_date), _lit(p.end_date)), col)


def normalize_phone(col: Column, p) -> Column:
    cc = p.country_code or "+1"
    return F.concat(F.lit(cc), F.regexp_replace(col.cast("string"), r"[^0-9]", ""))


def ensure_positive(col: Column, p) -> Column:
    return F.when(col > 0, col)


def standardize_categories(col: Column, p) -> Column:
    expr = None
    for k, v in (p.mapping or {}).items():
        cond = F.lower(col) == str(k).lower()
        expr = F.when(cond, _lit(v)) if expr is None else expr.when(cond, _lit(v))
    return expr.otherwise(col) if expr is not None else col


COLUMN_TRANSFORMS: dict[str, Callable] = {
    "anonymize": anonymize,
    "convert_timezone": convert_timezone,
    "to_lowercase": to_lowercase,
    "to_uppercase": to_uppercase,
    "strip": strip,
    "round_numbers": round_numbers,
    "scale": scale,
    "format_date": format_date,
    "to_numeric": to_numeric,
    "to_datetime": to_datetime,
    "fill_na": fill_na,
    "replace": replace,
    "extract": extract,
    "truncate": truncate,
    "pad": pad,
    "clip": clip,
    "bin": bin_,
    "map_values": map_values,
    "validate_email": validate_email,
    "validate_date_range": validate_date_range,
    "normalize_phone": normalize_phone,
    "ensure_positive": ensure_positive,
    "standardize_categories": standardize_categories,
}


# ---------------------------------------------------------------------------
# DataFrame-level transforms: (df, column, params, ctx) -> DataFrame
# ctx: object with resolve_table(name) -> DataFrame (for foreign keys)
# ---------------------------------------------------------------------------

def tf_normalize(df: DataFrame, column: str, p, ctx=None) -> DataFrame:
    stats = df.agg(
        F.min(column).alias("mn"), F.max(column).alias("mx")
    ).collect()[0]
    mn, mx = stats["mn"], stats["mx"]
    rng = (mx - mn) if (mn is not None and mx is not None) else None
    if not rng:
        return df.withColumn(column, F.lit(None).cast("double"))
    return df.withColumn(
        column, (F.col(column) - F.lit(mn)) / F.lit(rng)
    )


def tf_standardize(df: DataFrame, column: str, p, ctx=None) -> DataFrame:
    stats = df.agg(
        F.avg(column).alias("mu"), F.stddev(column).alias("sd")
    ).collect()[0]
    mu, sd = stats["mu"], stats["sd"]
    if not sd:
        return df.withColumn(column, F.lit(None).cast("double"))
    return df.withColumn(
        column, (F.col(column) - F.lit(mu)) / F.lit(sd)
    )


_ENCODE_MAX_LEVELS = 1_000


def tf_encode_categorical(df: DataFrame, column: str, p, ctx=None) -> DataFrame:
    """One-hot encode. Vocabulary from a distinct scan (sorted for
    determinism); ``drop_first`` drops the lexicographically-first level.

    Guarded for scale: the distinct collect is capped at
    ``_ENCODE_MAX_LEVELS`` (one-hot over a high-cardinality column —
    user_id by mistake — would stall the driver and explode the schema),
    detected with a ``limit(N+1)`` probe so the full distinct set is
    never shipped. All indicator columns are built in ONE ``select``:
    N chained ``withColumn`` calls are quadratic in Catalyst
    analysis time."""
    probe = (df.select(column).where(F.col(column).isNotNull())
             .distinct().limit(_ENCODE_MAX_LEVELS + 1).collect())
    if len(probe) > _ENCODE_MAX_LEVELS:
        raise ValueError(
            f"encode_categorical: column '{column}' has more than "
            f"{_ENCODE_MAX_LEVELS} distinct levels; one-hot encoding a "
            f"high-cardinality column explodes the schema — bin or hash "
            f"it first")
    values = sorted(r[0] for r in probe)
    drop_first = True if p.drop_first is None else p.drop_first
    if drop_first:
        values = values[1:]
    indicators = [
        F.when(F.col(column).isNull(), None)
        .otherwise((F.col(column) == F.lit(v)).cast("int"))
        .alias(f"{column}_{re.sub(r'[^A-Za-z0-9_]', '_', str(v))}")
        for v in values
    ]
    keep = [F.col(c) for c in df.columns if c != column]
    return df.select(*keep, *indicators)


def tf_remove_duplicates(df: DataFrame, column: str | None, p, ctx=None) -> DataFrame:
    cols = p.columns or ([column] if column else None)
    if not cols:
        return df.distinct()
    keep = p.keep or "first"
    if keep == "any":
        return df.dropDuplicates(cols)
    # 'first'/'last' need a deterministic order; without a declared order
    # column Spark rows have no order, so fall back to dropDuplicates —
    # same contract the reference's SQL path offers (DISTINCT, :212-214).
    return df.dropDuplicates(cols)


def tf_validate_foreign_key(df: DataFrame, column: str, p, ctx=None) -> DataFrame:
    """NULL out (or drop) values missing from ref_table.ref_column.

    reference SQL: CASE WHEN expr IN (SELECT ref…) (:216-220). Here: a left
    join against the broadcast-able distinct key set — the same plan
    Catalyst derives from the IN-subquery, minus the correlated-subquery
    analysis cost.
    """
    if ctx is None or p.ref_table is None or p.ref_column is None:
        raise ValueError("validate_foreign_key requires ref_table/ref_column")
    ref = (
        ctx.resolve_table(p.ref_table)
        .select(F.col(p.ref_column).alias("__fk_ref"))
        .distinct()
    )
    joined = df.join(
        F.broadcast(ref), df[column] == F.col("__fk_ref"), "left"
    )
    if p.drop_invalid:
        return joined.where(F.col("__fk_ref").isNotNull()).drop("__fk_ref")
    return joined.withColumn(
        column, F.when(F.col("__fk_ref").isNotNull(), F.col(column))
    ).drop("__fk_ref")


DATAFRAME_TRANSFORMS: dict[str, Callable] = {
    "normalize": tf_normalize,
    "standardize": tf_standardize,
    "encode_categorical": tf_encode_categorical,
    "remove_duplicates": tf_remove_duplicates,
    "validate_foreign_key": tf_validate_foreign_key,
}


def apply_transformation(
    df: DataFrame, ttype: str, column: str | None, params, ctx=None
) -> DataFrame:
    """Apply one transformation by name to ``df`` (sequential fold — the
    reference applies transformations in schema order,
    sql_transformation_manager.py:40-47)."""
    if ttype == "rename":
        if not column or not params.new_name:
            raise ValueError("rename requires column and new_name")
        return df.withColumnRenamed(column, params.new_name)
    if ttype in DATAFRAME_TRANSFORMS:
        return DATAFRAME_TRANSFORMS[ttype](df, column, params, ctx)
    fn = COLUMN_TRANSFORMS.get(ttype)
    if fn is None:
        raise ValueError(f"Unsupported transformation type: {ttype}")
    if not column:
        raise ValueError(f"Transformation '{ttype}' requires params.column")
    out = df.withColumn(column, fn(F.col(column), params))
    # post-filters for validators with drop semantics
    if ttype == "ensure_positive" and params.drop_negative:
        out = out.where(F.col(column).isNotNull())
    if ttype in ("validate_email", "validate_date_range") and params.drop_invalid:
        out = out.where(F.col(column).isNotNull())
    return out
