"""Checkpoint-recovery tests: a streaming query killed mid-replay and
restarted from its checkpoint must neither reprocess consumed files nor
lose operator state — the exactly-once property a production deployment
(landing directory + long-lived job) actually relies on.
"""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from rad_database_parse_spark.catalog.io import load_table
from rad_database_parse_spark.streaming.events import (
    read_events_stream,
    stateful_user_totals,
)


@pytest.fixture()
def staged_files(spark, sf_dir, tmp_path):
    """The events table landed as 4 parquet part files in a staging dir,
    plus an empty replay dir the test feeds incrementally."""
    staging = str(tmp_path / "staging")
    replay = str(tmp_path / "replay")
    os.makedirs(replay)
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(staging)
    parts = sorted(glob.glob(f"{staging}/part-*.parquet"))
    assert len(parts) == 4
    return parts, replay


def _run_until_drained(stream_df, start_writer):
    q = start_writer(stream_df)
    q.processAllAvailable()
    q.stop()


def test_source_offset_recovery_no_reprocess(spark, sf_dir, staged_files, tmp_path):
    """Stateless projection stream with a parquet APPEND sink: after a
    stop + restart from the same checkpoint, files consumed before the
    restart must not be re-emitted (an offset-tracking failure would
    duplicate every pre-restart row in the append-only sink)."""
    parts, replay = staged_files
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")

    def writer(df):
        return (
            df.select("event_id", "user_id", "event_type")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .start()
        )

    for p in parts[:2]:
        shutil.copy(p, replay)
    _run_until_drained(read_events_stream(spark, replay), writer)
    for p in parts[2:]:
        shutil.copy(p, replay)
    _run_until_drained(read_events_stream(spark, replay), writer)

    got = spark.read.parquet(sink)
    n_events = load_table(spark, sf_dir, "events").count()
    assert got.count() == n_events  # every event exactly once
    assert got.select("event_id").distinct().count() == n_events


def test_stateful_recovery_resumes_totals(spark, sf_dir, staged_files, tmp_path):
    """applyInPandasWithState across a restart: per-user running totals
    accumulated before the stop must still be in the recovered state
    store, so the final cumulative counts equal the batch groupBy over
    the full corpus (a state loss would restart every user at zero)."""
    parts, replay = staged_files
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")

    def writer(df):
        def append_batch(batch_df, _batch_id):
            batch_df.write.mode("append").parquet(sink)

        return (
            df.writeStream.outputMode("update")
            .foreachBatch(append_batch)
            .option("checkpointLocation", ck)
            .start()
        )

    for p in parts[:2]:
        shutil.copy(p, replay)
    _run_until_drained(stateful_user_totals(read_events_stream(spark, replay)), writer)
    for p in parts[2:]:
        shutil.copy(p, replay)
    _run_until_drained(stateful_user_totals(read_events_stream(spark, replay)), writer)

    # the LAST emission per user (max cumulative count) must equal the
    # batch count over all four files
    got = (
        spark.read.parquet(sink)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    got_m = {r.user_id: r.n_events for r in got.collect()}
    want_m = {r.user_id: r.n_events for r in want.collect()}
    assert got_m == want_m
