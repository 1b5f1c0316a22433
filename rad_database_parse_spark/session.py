"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]``; the configs are
chosen so the same code scales to a multi-executor cluster:

- AQE on (runtime partition coalescing, skew-join splitting) so shuffle
  partition counts self-correct between the sf0.001 smoke and a 100 TB run.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a cluster AQE
  coalesces from a higher initial number.
- Arrow enabled so every Pandas-UDF boundary is batched, never per-row.
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle and are cluster-location-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    app_name: str = "rad_database_parse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    An existing active session is reused — the driver harness owns session
    lifecycle in verification runs.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Janino generated-class cache (default 100 entries). A long
        # session running many distinct plans (the bench battery, the
        # 570-query gate, any multi-query job) evicts earlier fragments,
        # and big-plan queries then RECOMPILE every execution — measured
        # r10: docs_minhash_lsh (12-join plan) reads 5.1-5.4s in a fresh
        # session but 6.9-7.5s after 21 bench predecessors with the
        # default cache; at 1000 entries the same polluted-session run
        # returns to 5.07-5.19s. Cost is bounded driver memory for cached
        # class objects; on a cluster the same thrash would hit every
        # executor-side codegen consumer, so the setting travels.
        .config("spark.sql.codegen.cache.maxEntries", "1000")
        # The larger codegen cache pins more generated classes' JIT'd
        # code; JDK17's default 240 MB ReservedCodeCacheSize can then
        # fill over a many-hundred-plan session, disabling further JIT
        # compilation (everything after runs interpreted). 512 MB keeps
        # the battery fully compiled; applies at driver-JVM launch, a
        # no-op when the JVM already exists (getActiveSession reuse).
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
