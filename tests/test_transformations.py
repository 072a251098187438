"""Per-transformation behavior tests — one per §2.7 transformation,
mirroring the reference's test_sql_transformation_manager.py (which golden-
tests emitted SQL; we assert result values instead, the stronger check)."""

import datetime

import pytest
from pyspark.sql import functions as F

from pandas_ai_spark.plans.transformations import (
    apply_transformation,
    strftime_to_spark,
)
from pandas_ai_spark.schema import TransformationParams


def P(**kw):
    return TransformationParams(**kw)


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(
        [
            (1, "  Hello World  ", 3.14159, "2021-03-05 10:00:00", -5.0,
             "a@b.com", "(555) 123-4567"),
            (2, "FOO bar", 2.71828, "2022-12-31 23:59:59", 7.5,
             "not-an-email", "555.987.6543"),
            (3, None, None, None, 0.0, None, None),
        ],
        "id bigint, s string, x double, dt string, v double, email string, phone string",
    )


def _vals(df, col="out"):
    return [r[col] for r in df.orderBy("id").select(col).collect()]


def run(df, ttype, column, **params):
    out = apply_transformation(df, ttype, column, P(**params))
    return _vals(out.withColumnRenamed(column, "out"))


def test_anonymize(tdf):
    vals = run(tdf, "anonymize", "s")
    assert vals[0] != "  Hello World  " and len(vals[0]) == 32
    assert vals[2] is None


def test_to_lowercase(tdf):
    assert run(tdf, "to_lowercase", "s")[1] == "foo bar"


def test_to_uppercase(tdf):
    assert run(tdf, "to_uppercase", "s")[1] == "FOO BAR"


def test_strip(tdf):
    assert run(tdf, "strip", "s")[0] == "Hello World"


def test_round_numbers(tdf):
    assert run(tdf, "round_numbers", "x", decimals=2) == [3.14, 2.72, None]


def test_scale(tdf):
    assert run(tdf, "scale", "x", factor=2.0)[0] == pytest.approx(6.28318)


def test_format_date(tdf, spark):
    df = tdf.withColumn("dt", F.to_timestamp("dt"))
    assert run(df, "format_date", "dt", format="%Y/%m") == [
        "2021/03", "2022/12", None]


def test_to_numeric(tdf):
    df = tdf.withColumn("s", F.lit("42.5"))
    assert run(df, "to_numeric", "s")[0] == 42.5


def test_to_datetime(tdf):
    vals = run(tdf, "to_datetime", "dt", format="%Y-%m-%d %H:%M:%S")
    assert vals[0] == datetime.datetime(2021, 3, 5, 10, 0)


def test_fill_na(tdf):
    assert run(tdf, "fill_na", "x", value=1.5)[2] == 1.5


def test_replace(tdf):
    assert run(tdf, "replace", "s", old_value="bar", new_value="baz")[1] == "FOO baz"


def test_extract(tdf):
    vals = run(tdf, "extract", "s", pattern="[A-Z]+")
    assert vals[0] == "H" and vals[1] == "FOO"


def test_truncate_with_ellipsis(tdf):
    vals = run(tdf, "truncate", "s", length=8)
    assert vals[0] == "  Hel..." and vals[1] == "FOO bar"


def test_truncate_no_ellipsis(tdf):
    assert run(tdf, "truncate", "s", length=5, add_ellipsis=False)[1] == "FOO b"


def test_pad(tdf):
    assert run(tdf, "pad", "s", width=10, side="right", pad_char="*")[1] == "FOO bar***"


def test_clip(tdf):
    assert run(tdf, "clip", "v", lower=0.0, upper=5.0) == [0.0, 5.0, 0.0]


def test_bin(tdf):
    vals = run(tdf, "bin", "v", bins=[-10, 0, 10], labels=["neg", "pos"])
    assert vals == ["neg", "pos", "pos"]


def test_map_values(tdf):
    assert run(tdf, "map_values", "s", mapping={"FOO bar": "mapped"})[1] == "mapped"


def test_rename(tdf):
    out = apply_transformation(tdf, "rename", "s", P(new_name="s2"))
    assert "s2" in out.columns and "s" not in out.columns


def test_validate_email(tdf):
    assert run(tdf, "validate_email", "email") == ["a@b.com", None, None]


def test_validate_date_range(tdf):
    df = tdf.withColumn("dt", F.to_timestamp("dt"))
    vals = run(df, "validate_date_range", "dt",
               start_date="2021-01-01", end_date="2021-12-31")
    assert vals[0] is not None and vals[1] is None


def test_normalize_phone(tdf):
    vals = run(tdf, "normalize_phone", "phone", country_code="+1")
    assert vals[0] == "+15551234567" and vals[1] == "+15559876543"


def test_ensure_positive(tdf):
    assert run(tdf, "ensure_positive", "v") == [None, 7.5, None]


def test_ensure_positive_drop(tdf):
    out = apply_transformation(tdf, "ensure_positive", "v",
                               P(drop_negative=True))
    assert out.count() == 1


def test_standardize_categories(tdf):
    vals = run(tdf, "standardize_categories", "s",
               mapping={"foo BAR": "canonical"})
    assert vals[1] == "canonical"


def test_normalize(tdf):
    out = apply_transformation(tdf, "normalize", "v", P())
    vals = _vals(out.withColumnRenamed("v", "out"))
    assert vals == [0.0, 1.0, 0.4]


def test_standardize(tdf):
    out = apply_transformation(tdf, "standardize", "v", P())
    vals = _vals(out.withColumnRenamed("v", "out"))
    assert vals[1] == max(vals)
    assert abs(sum(vals)) < 1e-9


def test_encode_categorical(spark):
    df = spark.createDataFrame(
        [(1, "red"), (2, "blue"), (3, "red"), (4, None)],
        "id bigint, color string")
    out = apply_transformation(df, "encode_categorical", "color",
                               P(drop_first=False))
    assert set(out.columns) == {"id", "color_blue", "color_red"}
    rows = {r["id"]: (r["color_blue"], r["color_red"])
            for r in out.collect()}
    assert rows[1] == (0, 1) and rows[2] == (1, 0) and rows[4] == (None, None)
    out2 = apply_transformation(df, "encode_categorical", "color",
                                P(drop_first=True))
    assert set(out2.columns) == {"id", "color_red"}


def test_encode_categorical_level_cap_and_single_project(spark):
    """A high-cardinality column must raise (schema explosion guard, and
    the probe ships at most cap+1 rows to the driver); the indicator
    build must be ONE select, not N chained withColumns."""
    import pytest

    big = spark.range(5000).selectExpr(
        "id", "concat('lvl_', id) AS cat")
    with pytest.raises(ValueError, match="distinct levels"):
        apply_transformation(big, "encode_categorical", "cat",
                             P(drop_first=False))

    small = spark.createDataFrame(
        [(i, f"c{i % 40}") for i in range(200)], "id bigint, cat string")
    out = apply_transformation(small, "encode_categorical", "cat",
                               P(drop_first=False))
    assert len(out.columns) == 41
    # one Project over the scan — chained withColumns stack analysis
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Project") <= 2, plan


def test_remove_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id bigint, k string")
    out = apply_transformation(df, "remove_duplicates", None, P(columns=["k"]))
    assert out.count() == 2


def test_validate_foreign_key(spark):
    df = spark.createDataFrame([(1, 10), (2, 99)], "id bigint, fk bigint")
    ref = spark.createDataFrame([(10,), (20,)], "k bigint")

    class Ctx:
        def resolve_table(self, name):
            return ref

    out = apply_transformation(
        df, "validate_foreign_key", "fk",
        P(ref_table="ref", ref_column="k"), Ctx())
    rows = {r["id"]: r["fk"] for r in out.collect()}
    assert rows[1] == 10 and rows[2] is None


def test_convert_timezone(spark):
    df = spark.createDataFrame([(1, "2021-06-01 12:00:00")], "id bigint, ts string") \
              .withColumn("ts", F.to_timestamp("ts"))
    out = apply_transformation(df, "convert_timezone", "ts",
                               P(from_tz="UTC", to_tz="America/New_York"))
    assert out.collect()[0]["ts"] == datetime.datetime(2021, 6, 1, 8, 0)


def test_strftime_translation():
    assert strftime_to_spark("%Y-%m-%d") == "yyyy-MM-dd"
    assert strftime_to_spark("%H:%M:%S") == "HH:mm:ss"
    assert strftime_to_spark("%Y年") == "yyyy年"
    # literal RUNS quote once ('a''t' would be Java for the literal a't)
    assert strftime_to_spark("at %H") == "'at' HH"
    # reserved punctuation #{} is quoted (bare, it crashes the formatter)
    assert strftime_to_spark("%Y#%j") == "yyyy'#'DDD"
    # quote-only runs use the '' escaped form ('''' would be TWO quotes)
    assert strftime_to_spark("%'") == "''"
    assert strftime_to_spark("it's %H") == "'it''s' HH"


def test_strftime_literals_render_correctly(spark):
    """End-to-end through Java's formatter: the quoted-run rules above
    must survive an actual date_format evaluation."""
    df = spark.sql("SELECT timestamp'2024-03-05 14:07:09' AS t")

    def render(fmt):
        return df.select(
            F.date_format("t", strftime_to_spark(fmt))).collect()[0][0]

    assert render("at %H") == "at 14"
    assert render("%Y#%j") == "2024#065"
    assert render("it's %H") == "it's 14"
    assert render("%'") == "'"
    assert strftime_to_spark("week %A") == "'week' EEEE"
    assert render("week %A") == "week Tuesday"


def test_transformation_sequential_order(spark):
    """Transformations fold left-to-right in schema order
    (sql_transformation_manager.py:40-47 parity)."""
    df = spark.createDataFrame([(1, " x ")], "id bigint, s string")
    out = apply_transformation(df, "strip", "s", P())
    out = apply_transformation(out, "to_uppercase", "s", P())
    assert out.collect()[0]["s"] == "X"
