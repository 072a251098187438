"""Round-6 fixes and additive operators: upsert_merge deterministic
tiebreak, rfm empty-input guard, perceptual-hash band-width guard,
auto exact→approx percentile switching at scale.
"""

import datetime as dt

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# upsert_merge: deterministic last-resort tiebreak (ADVICE r5)
# ---------------------------------------------------------------------------

class TestUpsertTiebreak:
    def test_duplicate_key_version_is_deterministic(self, spark):
        from pandas_ai_spark.functions.diff import upsert_merge

        base = spark.createDataFrame([(1, "old", 0)],
                                     "k long, v string, ver long")
        # two update rows share (key, version) — a malformed CDC batch;
        # the winner must be content-determined, not partition-order
        ups = spark.createDataFrame([(1, "a", 5), (1, "b", 5)],
                                    "k long, v string, ver long")
        winners = set()
        for n_parts in (1, 2, 7):
            out = upsert_merge(base, ups.repartition(n_parts),
                               ["k"], "ver").collect()
            assert len(out) == 1
            winners.add(out[0].v)
        assert len(winners) == 1  # same winner under every shuffle

    def test_explicit_tiebreak_column(self, spark):
        from pandas_ai_spark.functions.diff import upsert_merge

        base = spark.createDataFrame(
            [(1, "old", 0, 0)], "k long, v string, ver long, seq long")
        ups = spark.createDataFrame(
            [(1, "early", 5, 10), (1, "late", 5, 20)],
            "k long, v string, ver long, seq long")
        out = upsert_merge(base, ups, ["k"], "ver",
                           tiebreak_col="seq").collect()
        assert len(out) == 1 and out[0].v == "late"  # highest seq wins

    def test_bad_tiebreak_column_raises(self, spark):
        from pandas_ai_spark.functions.diff import upsert_merge

        base = spark.createDataFrame([(1, "a", 0)],
                                     "k long, v string, ver long")
        with pytest.raises(ValueError):
            upsert_merge(base, base, ["k"], "ver",
                         tiebreak_col="nope")


# ---------------------------------------------------------------------------
# rfm_segments: clear error on empty input (ADVICE r5)
# ---------------------------------------------------------------------------

class TestRfmEmptyInput:
    def test_empty_input_raises_value_error(self, spark):
        from pandas_ai_spark.functions.events import rfm_segments

        df = spark.createDataFrame(
            [], "cust long, ts timestamp, amt double")
        with pytest.raises(ValueError, match="non-empty"):
            rfm_segments(df, "cust", "ts", "amt",
                         ref_date="2024-01-01")


# ---------------------------------------------------------------------------
# perceptual_hash_bands: band width must fit array<int> (ADVICE r5)
# ---------------------------------------------------------------------------

class TestPhashBandWidth:
    def test_over_31_bits_per_band_raises(self, spark):
        from pandas_ai_spark.functions.multimodal import \
            perceptual_hash_bands

        df = spark.createDataFrame([(1, bytearray(b"x" * 300))],
                                   "doc_id long, media binary")
        # grid=16, bands=8 → 32 bits per band: would overflow int32
        with pytest.raises(ValueError, match="31-bit"):
            perceptual_hash_bands(df, "media", "doc_id",
                                  decoder="fake", grid=16, bands=8)

    def test_16_grid_with_enough_bands_ok(self, spark):
        from pandas_ai_spark.functions.multimodal import \
            perceptual_hash_bands

        df = spark.createDataFrame([(1, bytearray(bytes(range(256))))],
                                   "doc_id long, media binary")
        out = perceptual_hash_bands(df, "media", "doc_id",
                                    decoder="fake", grid=16,
                                    bands=16).collect()
        assert len(out) == 1 and len(out[0].band) == 16
        assert all(0 <= b < (1 << 16) for b in out[0].band)
