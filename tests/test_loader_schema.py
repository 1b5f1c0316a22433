"""Loader drift guard: the testdata has been silently regenerated with a
different physical timestamp type between rounds (timestamp[ns] → tz-less
timestamp[us], VERDICT r4). The loader must normalize every generation to
one stable logical schema, and assert_testdata_schema must turn the NEXT
drift into one loud error.
"""

import pyspark.sql.functions as F
import pytest

from rad_database_parse_spark.catalog.io import (
    EXPECTED_SCHEMAS,
    TESTDATA_TABLES,
    assert_testdata_schema,
    load_table,
    normalize_timestamps,
)


def test_all_tables_match_expected_schema(spark, sf_dir):
    assert_testdata_schema(spark, sf_dir)


def test_expected_schemas_cover_every_table():
    assert set(EXPECTED_SCHEMAS) == set(TESTDATA_TABLES)


def test_events_ts_is_plain_timestamp_and_micros_work(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    assert dict(e.dtypes)["ts"] == "timestamp"
    # the exact call every sessionization/window/streaming site makes —
    # TIMESTAMP_NTZ input would throw DATATYPE_MISMATCH here
    n = e.select(F.unix_micros("ts").alias("us")).filter(F.col("us").isNotNull()).count()
    assert n == e.count()


def test_normalize_timestamps_casts_ntz(spark):
    df = spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-01-02 03:04:05.123456' AS ts, 1 AS x"
    )
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    out = normalize_timestamps(df)
    assert dict(out.dtypes) == {"ts": "timestamp", "x": "int"}
    # UTC session: the wall-clock value is preserved bit-for-bit
    got = out.select(F.unix_micros("ts").alias("us")).collect()[0]["us"]
    assert got == 1704164645123456


def test_assert_fails_loud_on_drift(spark, sf_dir, monkeypatch):
    import rad_database_parse_spark.catalog.io as io_mod

    bad = {k: dict(v) for k, v in EXPECTED_SCHEMAS.items()}
    bad["events"]["ts"] = "timestamp_ntz"
    monkeypatch.setattr(io_mod, "EXPECTED_SCHEMAS", bad)
    with pytest.raises(AssertionError, match="events"):
        assert_testdata_schema(spark, sf_dir)
