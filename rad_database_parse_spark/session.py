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

_JVM_OPTS_KEY = "spark.driver.extraJavaOptions"
_CODE_CACHE_FLAG = "-XX:ReservedCodeCacheSize=512m"


def _merge_driver_java_options(
    extra_conf: dict[str, str] | None, env_opts: str = ""
) -> tuple[str, dict[str, str]]:
    """Merge the code-cache flag into caller/env driver JVM options.

    Returns ``(merged_extraJavaOptions, remaining_extra_conf)``.
    Precedence: an ``extra_conf`` extraJavaOptions wins over the env
    value; the ReservedCodeCacheSize flag is appended only when no
    explicit ReservedCodeCacheSize is already present (ADVICE r10 —
    never clobber external options, never get silently clobbered)."""
    remaining = dict(extra_conf or {})
    caller_opts = remaining.pop(_JVM_OPTS_KEY, env_opts)
    if "-XX:ReservedCodeCacheSize" not in caller_opts:
        caller_opts = f"{caller_opts} {_CODE_CACHE_FLAG}".strip()
    return caller_opts, remaining


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
        # SPARK_GRAFT_STOCK_CODEGEN=1 reverts to stock defaults (cache
        # 100, no code-cache flag) — the A/B knob for the r11
        # battery-lifecycle config comparison (VERDICT r10 item 2c);
        # never set by the driver, so the shipped config is the default.
    )
    stock_codegen = os.environ.get("SPARK_GRAFT_STOCK_CODEGEN") == "1"
    if not stock_codegen:
        builder = builder.config("spark.sql.codegen.cache.maxEntries", "1000")
    # The larger codegen cache pins more generated classes' JIT'd
    # code; JDK17's default 240 MB ReservedCodeCacheSize can then
    # fill over a many-hundred-plan session, disabling further JIT
    # compilation (everything after runs interpreted). 512 MB keeps
    # the battery fully compiled; applies at driver-JVM launch, a
    # no-op when the JVM already exists (getActiveSession reuse).
    # MERGED, not overwritten (ADVICE r10): externally configured
    # driver JVM options (env / spark-defaults / extra_conf) are
    # appended-to rather than clobbered, and an extra_conf that sets
    # its own extraJavaOptions still gets the code-cache flag unless
    # it carries an explicit ReservedCodeCacheSize of its own.
    if stock_codegen:
        merged = dict(extra_conf or {})
        caller_opts = merged.pop(
            _JVM_OPTS_KEY,
            os.environ.get("SPARK_DRIVER_EXTRA_JAVA_OPTIONS", ""),
        )
    else:
        caller_opts, merged = _merge_driver_java_options(
            extra_conf, os.environ.get("SPARK_DRIVER_EXTRA_JAVA_OPTIONS", "")
        )
    if caller_opts:
        builder = builder.config(_JVM_OPTS_KEY, caller_opts)
    for k, v in merged.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def clear_caches(spark: SparkSession) -> None:
    """Gate/bench cache hygiene: drop ALL cached state between queries.

    ``spark.catalog.clearCache()`` only evicts CacheManager entries
    (DataFrame ``persist``/``cache``). ``localCheckpoint`` blocks are
    RDD-level persists OUTSIDE the CacheManager (ADVICE r10 —
    ``graph_bfs_landmark_distances``'s 4 per-round checkpoints), freed
    only when Python+JVM GC and the ContextCleaner get around to the
    dropped references — nondeterministic over a long many-query
    session. This sweeps both: the catalog cache, then every RDD still
    registered in the context's persistent-RDD map."""
    spark.catalog.clearCache()
    # JavaSparkContext.getPersistentRDDs(): Map<Integer, JavaRDD<?>>
    for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        jrdd.unpersist()
