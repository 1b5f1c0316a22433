"""A Spark 4 Python DataSource STREAMING reader: ``spark.readStream
.format("events_replay")`` — deterministic micro-batch replay of an events
parquet file.

Completes the Python DataSource API matrix next to the batch reader
(sources/pdf_datasource.py, one partition per PDF) and the manifested
writer (sources/jsonl_sink.py): batch read, batch write, and now a
streaming source with real offset bookkeeping — initialOffset /
read(start) / readBetweenOffsets(start, end), the contract Structured
Streaming uses for exactly-once replay after failure.

Rows replay in fixed-size chunks ordered by event_id, so every run (and
every failure-recovery re-read between two committed offsets) yields
byte-identical micro-batches. This uses the SimpleDataSourceStreamReader
API (driver-side reads, prefetched to executors by the engine) — the
right fit for low-throughput control streams; a partitioned
DataSourceStreamReader with per-partition offset ranges is the
high-throughput variant and keeps the same offset semantics.

Reference tie-in: the reference's ingest loop (main.py:88-106) is a
sequential one-shot replay of a document directory; this source is that
loop rebuilt as a resumable, offset-tracked stream.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

REPLAY_SCHEMA = "event_id bigint, user_id bigint, event_type string, cents bigint"


class EventsReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.chunk = int(options.get("chunk", "2000"))
        self._rows: list | None = None

    def _load(self) -> list:
        if self._rows is None:
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            tbl = pq.read_table(
                self.path,
                columns=["event_id", "user_id", "event_type", "value"],
            )
            tbl = tbl.take(
                pc.sort_indices(tbl, sort_keys=[("event_id", "ascending")])
            )
            cents = [
                int(round(v * 100)) for v in tbl.column("value").to_pylist()
            ]
            self._rows = list(
                zip(
                    tbl.column("event_id").to_pylist(),
                    tbl.column("user_id").to_pylist(),
                    tbl.column("event_type").to_pylist(),
                    cents,
                )
            )
        return self._rows

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        rows = self._load()
        s = int(start["pos"])
        e = min(s + self.chunk, len(rows))
        return iter(rows[s:e]), {"pos": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        # failure recovery: re-yield EXACTLY the rows between two
        # committed offsets — deterministic because the replay order is
        # pinned by event_id
        rows = self._load()
        return iter(rows[int(start["pos"]) : int(end["pos"])])

    def commit(self, end: dict) -> None:
        pass


class EventsReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "events_replay"

    def schema(self) -> str:
        return REPLAY_SCHEMA

    def simpleStreamReader(self, schema):
        return EventsReplayStreamReader(self.options)


def register_events_replay_source(spark) -> None:
    spark.dataSource.register(EventsReplayDataSource)
