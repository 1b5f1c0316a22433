"""Structured Streaming surface over the events table.

Stream-shaped operators with batch-equivalent semantics (tested by running
the same aggregation in batch and via a file-replay stream into a memory
sink). Watermarks bound state; session windows and watermark dedup use the
built-in stateful operators — no custom state unless semantics force it
(SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_events_stream(spark: SparkSession, dir_path: str) -> DataFrame:
    """File-replay stream over the events parquet (one file ⇒ one microbatch
    locally; on a cluster this is the same code over a landing directory)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir_path)
    )


def build_time_ordered_replay(
    df: DataFrame, out_dir: str, ts_col: str = "ts", n_slices: int = 4
) -> None:
    """TEST-FIXTURE construction, not a production operator: write a
    bounded corpus as ``n_slices`` single-file parquet slices in ascending
    event-time order, so ``read_events_stream`` (maxFilesPerTrigger=1,
    file source triggers by modification time) replays them as ordered
    microbatches — the shape stream-stream join equivalence tests need
    (an out-of-time-order slice would make genuinely-matchable rows late).

    Deliberately driver-paced: the percentile fetch collects exactly
    ``n_slices - 1`` scalars, and each slice writes through ``coalesce(1)``
    because one-file-per-slice IS the fixture contract (file == microbatch)
    and mtime ordering requires the writes to be sequential. Each slice's
    files get an EXPLICIT strictly-increasing mtime after the write — on a
    fast filesystem two sequential writes can land in the same mtime
    granule and tie-break arbitrarily, which would replay slices out of
    order. On a real cluster the stream source is a landing directory or
    Kafka topic and this function is not in the execution path at any
    scale.
    """
    import os as _os
    import pathlib
    import time

    from ..catalog.io import normalize_timestamps

    # testdata generations differ in timestamp physical type; fold to
    # TIMESTAMP so the unix_micros slicing below never sees TIMESTAMP_NTZ
    df = normalize_timestamps(df)
    qs = [i / n_slices for i in range(1, n_slices)]
    bounds = df.agg(
        F.expr(
            f"percentile(unix_micros({ts_col}), array({','.join(map(str, qs))}))"
        ).alias("q")
    ).collect()[0]["q"]  # bounded: one quantile row
    prev = None
    stamped: set = set()
    # Slice stamps live strictly in the PAST (base - n_slices + i): ascending
    # across slices, and guaranteed OLDER than anything a caller appends
    # afterward with a natural mtime (e.g. a watermark sentinel). Stamping
    # FORWARD from now (base + i) is subtly wrong: a warm JVM finishes the
    # whole build in under a second, so a later natural write lands BETWEEN
    # the stamps, replays mid-stream, and its far-future event time makes
    # every remaining slice late — silently dropped rows.
    base_mtime = time.time()
    for i, hi in enumerate(list(bounds) + [None]):
        part = df
        if prev is not None:
            part = part.filter(F.unix_micros(ts_col) > prev)
        if hi is not None:
            part = part.filter(F.unix_micros(ts_col) <= hi)
        part.coalesce(1).write.mode("append").parquet(out_dir)
        # stamp this slice's new files one second apart so the file
        # source's mtime ordering is deterministic, never a tie
        t_slice = base_mtime - n_slices + i
        for p in sorted(pathlib.Path(out_dir).glob("*.parquet")):
            if p not in stamped:
                _os.utime(p, (t_slice, t_slice))
                stamped.add(p)
        prev = hi


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts+sums per event_type with late-data bound."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionized_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows via the built-in session_window operator
    (works identically in batch, which the batch-equivalence test uses)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def stream_static_segment_totals(
    events: DataFrame, customers: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-static enrichment: the event stream joins the customer
    dimension (static side broadcast — re-read per microbatch on a real
    cluster, so dimension updates are picked up), then hourly totals per
    market segment. The stream-static join is stateless; only the windowed
    aggregation keeps state."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    return (
        src.join(F.broadcast(dim), "user_id")
        .groupBy(F.window("ts", "1 hour").alias("win"), "segment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("total_value_dec"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "segment",
            "n",
            F.col("total_value_dec").cast("double").alias("total_value"),
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-event within the watermark horizon."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.dropDuplicatesWithinWatermark(["event_id"]) if events.isStreaming else src.dropDuplicates(["event_id"])


def view_purchase_interval_join(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: each purchase matched to the same user's views
    in the preceding `horizon`. Both sides carry watermarks so the join
    state is bounded — Spark evicts view rows older than the horizon plus
    watermark delay. Works identically in batch (no watermark needed),
    which the batch-equivalence test exploits. how='right_outer' emits
    view-less purchases with NULL view columns once the watermark passes
    them (streaming outer joins hold rows in state until the watermark
    proves no match can arrive)."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if views.isStreaming:
        v = v.withWatermark("view_ts", "2 hours")
        p = p.withWatermark("purchase_ts", "2 hours")
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
        how,
    ).select("p_user", "purchase_id", "view_id", "view_ts", "purchase_ts")


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (event count, value sum) carried across microbatches.

    This is the escape hatch for semantics the built-in stateful operators
    can't express (SURVEY §7.3); the state is one tiny row per user, Arrow-
    batched per group. Each trigger emits the user's cumulative totals, so
    after a full bounded replay the LAST emission per user equals the batch
    groupBy — which is how the oracle checks it."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    # totals accumulate as integer CENTS in state (the repo's decimal-exact
    # policy): float accumulation would drift with microbatch order, so the
    # emitted total could differ between replays of the same data. INPUT
    # CONTRACT: event values are cent-granular (exact 2-decimal amounts) —
    # each event is rounded to cents before summing, and the update fn
    # asserts the per-event rounding residual is negligible so sub-cent
    # inputs fail fast instead of silently diverging from the float sum.
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total_cents", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            scaled = pdf["value"] * 100
            rounded = scaled.round()
            if len(scaled) and (scaled - rounded).abs().max() > 1e-6:
                raise ValueError(
                    "stateful_user_totals requires cent-granular values; "
                    "got a sub-cent amount (see streaming/events.py input "
                    "contract)"
                )
            cents += int(rounded.sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_sessions(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """CUSTOM stateful sessionizer over applyInPandasWithState with an
    EVENT-TIME TIMEOUT — the session close a built-in ``session_window``
    can't customize (e.g. to attach per-session derived payloads or emit
    mid-session checkpoints). Complements ``sessionized_stream`` (built-in
    operator) and ``stateful_user_totals`` (NoTimeout running totals): here
    the OPEN session lives in state and is flushed by the watermark passing
    ``last_event + gap``, not by new data arriving for the key.

    Semantics match the batch gaps-and-islands sessionization exactly
    (new session iff gap ≥ 30 min, ties ordered by (ts, event_id)):
    sessions closed by an observed in-data gap emit immediately; the final
    open session per user emits when the event-time timeout fires. Spark
    runs a no-data microbatch when the watermark advances, so a bounded
    replay flushes completely once a sentinel advances event time past
    every real session's horizon.

    Value totals accumulate as integer cents in state (same decimal-exact
    policy and input contract as stateful_user_totals). State per key is
    ONE open session tuple — bounded regardless of history length, the
    property that lets this run forever on an unbounded stream."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("session_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("cents", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        def emit(rows):
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(rows),
                    "session_start": [
                        pd.Timestamp(r[0], unit="us") for r in rows
                    ],
                    "session_end": [pd.Timestamp(r[1], unit="us") for r in rows],
                    "n_events": [r[2] for r in rows],
                    "session_value": [r[3] / 100.0 for r in rows],
                }
            )

        if state.hasTimedOut:
            # watermark passed last_event + gap: the open session is final
            start_us, last_us, n, cents = state.get
            state.remove()
            yield emit([(start_us, last_us, n, cents)])
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        # datetime64[us] first: int64-viewing a datetime column yields the
        # epoch in whatever unit the column carries (ns under classic
        # pandas, us under Arrow-backed frames) — an unconditional //1000
        # would silently mis-scale micros-typed input
        ts_us = rows["ts"].astype("datetime64[us]").astype("int64").tolist()
        scaled = rows["value"] * 100
        rounded = scaled.round()
        if len(scaled) and (scaled - rounded).abs().max() > 1e-6:
            raise ValueError(
                "stateful_sessions requires cent-granular values (see "
                "stateful_user_totals input contract)"
            )
        cents_list = rounded.astype("int64").tolist()

        # INPUT CONTRACT: microbatches arrive in per-key event-time order
        # (rows within a batch are sorted above; ACROSS batches the ordered
        # replay fixture guarantees it, and on a real stream a late row that
        # lands after its session's successor batch cannot be re-sorted from
        # one-open-session state — use the built-in session_window operator
        # when genuine late data must be merged). A late row inside the open
        # session's span is folded in WITHOUT regressing session_end; a late
        # row older than (open_start - gap) would belong to an already-
        # emitted session and is counted into the open one — the documented
        # degradation under contract violation, never a crash or a
        # session_end that moves backwards.
        cur = state.get if state.exists else None  # (start, last, n, cents)
        closed = []
        for t_us, c in zip(ts_us, cents_list):
            if cur is None:
                cur = (t_us, t_us, 1, c)
            elif t_us - cur[1] >= gap_us:
                closed.append(cur)
                cur = (t_us, t_us, 1, c)
            else:
                cur = (
                    min(cur[0], t_us),
                    max(cur[1], t_us),
                    cur[2] + 1,
                    cur[3] + c,
                )
        state.update(cur)
        # event-time timeout must be strictly beyond the current watermark;
        # an already-expired horizon fires on the next no-data batch
        horizon_ms = (cur[1] + gap_us) // 1000
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(horizon_ms, wm_ms + 1))
        if closed:
            yield emit(closed)

    # streaming-only by construction: applyInPandasWithState rejects batch
    # input, and without a real watermark the event-time timeout that
    # flushes final open sessions would never fire — no batch fallback is
    # offered (the batch twin is the gaps-and-islands sessionization in
    # registry/events_ops.py, which is also this operator's oracle)
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_stream_to_memory(
    df: DataFrame,
    name: str,
    mode: str = "append",
    flush=None,
) -> None:
    """Drive a bounded file-replay stream to completion synchronously.

    ``mode`` is the writeStream output mode — each caller knows its own plan
    shape (aggregations → complete, applyInPandasWithState update flows →
    update, stateless/watermark-final → append), so it is passed explicitly
    rather than sniffed from private plan APIs.

    ``flush`` (optional zero-arg callable) closes the watermark-flush race:
    ``processAllAvailable`` only guarantees SOURCE data is processed — the
    emissions that depend on the advanced watermark (streaming outer-join
    unmatched rows, event-time-timeout state flushes) happen in a follow-up
    no-data microbatch that can commit AFTER processAllAvailable returns,
    nondeterministically dropping the final rows. A caller whose query holds
    watermark-gated state passes ``flush`` to append one more benign
    far-future row to the source; the second processAllAvailable then waits
    on a REAL batch that runs entirely at the advanced watermark, making the
    flush part of a commit we provably wait for."""
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    if flush is not None:
        flush()
        q.processAllAvailable()
    q.stop()
