"""Batch-equivalence tests: the same aggregation computed over the events
table in batch and via a file-replay stream (2 microbatches) must agree."""

import math
import os

import pytest
from pyspark.sql import functions as F

from rad_database_parse_spark.catalog.io import load_table
from rad_database_parse_spark.streaming.events import (
    read_events_stream,
    sessionized_stream,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Re-land the events table as two parquet files so maxFilesPerTrigger=1
    produces a genuinely incremental 2-microbatch replay."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    e = load_table(spark, sf_dir, "events")
    e.repartition(2).write.mode("overwrite").parquet(out)
    return out


def _collect_map(df, keys, val):
    return {tuple(getattr(r, k) for k in keys): getattr(r, val) for r in df.collect()}


def test_tumbling_counts_stream_equals_batch(spark, sf_dir, events_dir):
    batch = tumbling_counts(load_table(spark, sf_dir, "events"))
    stream = tumbling_counts(read_events_stream(spark, events_dir))
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = _collect_map(
        spark.sql("SELECT * FROM tumbling_out"), ["win_start", "event_type"], "n"
    )
    want = _collect_map(batch, ["win_start", "event_type"], "n")
    assert got == want
    # value sums agree within float tolerance (stream accumulates partials)
    got_v = _collect_map(
        spark.sql("SELECT * FROM tumbling_out"), ["win_start", "event_type"], "total_value"
    )
    want_v = _collect_map(batch, ["win_start", "event_type"], "total_value")
    assert all(math.isclose(got_v[k], want_v[k], rel_tol=1e-9) for k in want_v)


def test_session_window_stream_equals_batch(spark, sf_dir, events_dir):
    batch = sessionized_stream(load_table(spark, sf_dir, "events"))
    stream = sessionized_stream(read_events_stream(spark, events_dir))
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("session_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = _collect_map(
        spark.sql("SELECT * FROM session_out"),
        ["user_id", "session_start"],
        "n_events",
    )
    want = _collect_map(batch, ["user_id", "session_start"], "n_events")
    assert got == want


def test_streaming_dedup_drops_replayed_duplicates(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_dup"))
    e = load_table(spark, sf_dir, "events").limit(200).cache()
    n_unique = e.select("event_id").distinct().count()
    # land the same rows twice as two files → replay delivers duplicates
    e.coalesce(1).write.mode("overwrite").parquet(out)
    e.coalesce(1).write.mode("append").parquet(out)
    stream = read_events_stream(spark, out)
    deduped = stream.withWatermark("ts", "10 days").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.sql("SELECT COUNT(*) AS n FROM dedup_out").collect()[0].n == n_unique


def test_watermark_drops_too_late_events(spark, tmp_path_factory):
    """Late-data semantics: with a 2h watermark in append mode, an event
    arriving after its window's watermark horizon is dropped; a late-but-
    within-horizon event still lands."""
    import datetime as dt

    out = str(tmp_path_factory.mktemp("events_late"))
    day = dt.datetime(2024, 1, 1)

    def ev(eid, h, m=0):
        return (eid, day + dt.timedelta(hours=h, minutes=m), 1, "view", 1.0, "{}")

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    # batch 1 advances the watermark to 13:00 - 2h = 11:00
    spark.createDataFrame([ev(1, 10), ev(2, 10, 30), ev(3, 13)], cols).coalesce(
        1
    ).write.mode("overwrite").parquet(out)

    stream = tumbling_counts(read_events_stream(spark, out), watermark="2 hours")
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .start()
    )
    q.processAllAvailable()  # batch 1 processed; watermark now 11:00
    # batch 2 lands AFTER the watermark advanced: 08:30 is below 11:00
    # (window 08-09 finalized) → dropped; 12:30 is within horizon → kept
    spark.createDataFrame([ev(4, 8, 30), ev(5, 12, 30)], cols).coalesce(
        1
    ).write.mode("append").parquet(out)
    q.processAllAvailable()
    q.stop()
    got = {
        r.win_start.hour: r.n
        for r in spark.sql("SELECT * FROM late_out").collect()
    }
    # 08:00 window: either never emitted or emitted WITHOUT the late event
    assert got.get(8, 0) == 0
    # 10:00 window finalized with both on-time events
    assert got[10] == 2


def test_stream_stream_join_equals_batch(spark, sf_dir, tmp_path_factory):
    """Stream-stream interval join (views ⋈ purchases within 1h per user)
    produces the same pairs as the batch interval join."""
    from pyspark.sql import functions as F

    from rad_database_parse_spark.streaming.events import (
        view_purchase_interval_join,
    )

    e = load_table(spark, sf_dir, "events")
    views_b = e.filter(F.col("event_type") == "view")
    purch_b = e.filter(F.col("event_type") == "purchase")
    want = sorted(
        map(
            tuple,
            view_purchase_interval_join(views_b, purch_b)
            .select("purchase_id", "view_id")
            .collect(),
        )
    )

    out = str(tmp_path_factory.mktemp("events_ss"))
    e.repartition(2).write.mode("overwrite").parquet(out)
    s = read_events_stream(spark, out)
    stream = view_purchase_interval_join(
        s.filter(F.col("event_type") == "view"),
        s.filter(F.col("event_type") == "purchase"),
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        map(
            tuple,
            spark.sql("SELECT purchase_id, view_id FROM ss_join_out").collect(),
        )
    )
    assert got == want and len(want) > 0


def test_stream_stream_right_outer_join_emits_unmatched(
    spark, sf_dir, tmp_path_factory
):
    """Right-outer interval join: purchases with NO view in the preceding
    hour emit with NULL view columns once the watermark proves no match
    can arrive. Streaming holds tail-of-timeline rows in state when the
    stream ends (watermark never passes them), so equivalence is checked
    on the safe zone: everything the stream emitted must match batch, and
    every batch-unmatched purchase older than max_ts - (horizon +
    watermark) must have been emitted."""
    from pyspark.sql import functions as F

    from rad_database_parse_spark.streaming.events import (
        view_purchase_interval_join,
    )

    e = load_table(spark, sf_dir, "events")
    views_b = e.filter(F.col("event_type") == "view")
    purch_b = e.filter(F.col("event_type") == "purchase")
    batch = view_purchase_interval_join(views_b, purch_b, how="right_outer")
    batch_unmatched = {
        r["purchase_id"]
        for r in batch.filter(F.col("view_id").isNull()).collect()
    }
    max_ts = e.agg(F.max("ts")).collect()[0][0]
    import datetime

    safe_cutoff = max_ts - datetime.timedelta(hours=3, minutes=5)
    safe_unmatched = {
        r["purchase_id"]
        for r in batch.filter(
            F.col("view_id").isNull() & (F.col("purchase_ts") < F.lit(safe_cutoff))
        ).collect()
    }

    # replay in TIME ORDER (quartile files written sequentially — the file
    # source triggers by modification time): with out-of-order files an old
    # view can arrive after the watermark passed its purchase, get dropped
    # as late, and the purchase legitimately emits unmatched — real
    # late-data semantics, but not what this equivalence test targets
    out = str(tmp_path_factory.mktemp("events_ss_outer"))
    bounds = e.agg(
        F.expr("percentile(unix_micros(ts), array(0.25, 0.5, 0.75))").alias("q")
    ).collect()[0]["q"]
    prev = None
    for i, hi in enumerate(list(bounds) + [None]):
        part = e
        if prev is not None:
            part = part.filter(F.unix_micros("ts") > prev)
        if hi is not None:
            part = part.filter(F.unix_micros("ts") <= hi)
        part.coalesce(1).write.mode("append").parquet(out)
        prev = hi
    s = read_events_stream(spark, out)
    stream = view_purchase_interval_join(
        s.filter(F.col("event_type") == "view"),
        s.filter(F.col("event_type") == "purchase"),
        how="right_outer",
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_outer_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT purchase_id, view_id FROM ss_outer_out")
    got_unmatched = {
        r["purchase_id"] for r in got.filter(F.col("view_id").isNull()).collect()
    }
    # everything emitted as unmatched is truly unmatched in batch
    assert got_unmatched <= batch_unmatched
    # everything safely past the watermark horizon was emitted
    assert safe_unmatched <= got_unmatched
    assert len(safe_unmatched) > 0


def test_foreachbatch_idempotent_sink(spark, sf_dir, tmp_path_factory):
    """The reference's idempotent ingest (A14/A16 exists-probe dedup,
    database.py:18-32,43-61) in streaming form: foreachBatch anti-joins
    each microbatch against the sink before appending, so a twice-replayed
    stream still lands every event exactly once."""
    import pathlib

    from pyspark.sql import functions as F

    replay = str(tmp_path_factory.mktemp("events_dup")) + "/events"
    ev = load_table(spark, sf_dir, "events").repartition(2)
    ev.write.mode("overwrite").parquet(replay)
    ev.write.mode("append").parquet(replay)

    sink = str(tmp_path_factory.mktemp("sink")) + "/events_clean"

    def upsert(batch_df, batch_id):
        batch = batch_df.dropDuplicates(["event_id"])
        if pathlib.Path(sink).exists():
            existing = batch_df.sparkSession.read.parquet(sink).select("event_id")
            batch = batch.join(existing, "event_id", "left_anti")
        batch.write.mode("append").parquet(sink)

    q = (
        read_events_stream(spark, replay)
        .writeStream.outputMode("append")
        .foreachBatch(upsert)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    landed = spark.read.parquet(sink)
    n_total = landed.count()
    n_distinct = landed.select("event_id").distinct().count()
    n_src = ev.count()
    assert n_total == n_distinct == n_src
