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
import re

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

_JVM_OPTS_KEY = "spark.driver.extraJavaOptions"
_CODE_CACHE_FLAG = "-XX:ReservedCodeCacheSize=512m"
_GC_FLAG = "-XX:+UseParallelGC"
# A/B hook (round 12 optimization): semicolon-separated `key=value` pairs
# applied LAST, so an interleaved bench arm can flip any SQL/core conf
# through the environment without a code change, e.g.
#   SPARK_GRAFT_CONF="spark.sql.join.preferSortMergeJoin=false"
# Caller `extra_conf` still wins over the env (applied after it).
# LIFECYCLE (ADVICE r12): the hook is read only when a session is BUILT —
# get_session returns an already-active session untouched, so an
# in-process arm flip is a silent no-op. A/B tools must run each arm in
# a fresh subprocess (tools/ab_r12_conf.py does).
_CONF_ENV = "SPARK_GRAFT_CONF"


def _env_conf() -> dict[str, str]:
    raw = os.environ.get(_CONF_ENV, "")
    out: dict[str, str] = {}
    for item in raw.split(";"):
        item = item.strip()
        if not item:
            continue
        if "=" not in item:
            raise ValueError(f"{_CONF_ENV} entry without '=': {item!r}")
        k, v = item.split("=", 1)
        k = k.strip()
        if k == _JVM_OPTS_KEY:
            # Silently dropping JVM flags would make an A/B arm measure
            # stock with no signal (ADVICE r12); JVM options have their
            # own merge path via SPARK_DRIVER_EXTRA_JAVA_OPTIONS.
            raise ValueError(
                f"{_CONF_ENV} cannot set {_JVM_OPTS_KEY}; use the"
                " SPARK_DRIVER_EXTRA_JAVA_OPTIONS env var instead"
            )
        out[k] = v.strip()
    return out


def _merge_gc_flag(opts: str) -> str:
    """Append the throughput-collector flag unless the caller already
    names a collector or SPARK_GRAFT_STOCK_GC=1 asks for JVM defaults.

    Shipped round 12 from the four-arm interleaved full-battery GC A/B
    (tools/ab_r12_gc.py, BENCH_AB_r12_*.json; decision rule
    pre-registered in that file): vs stock G1, ParallelGC cut
    battery-concurrent ("organic") GC 21.5→5.3s (-75-80%, consistent in
    all four parallel-arm runs) and won battery min-of-2 342.0s vs
    429.2s (-20%) with headline not worse (19.2 vs 22.4 min-of-2);
    normalized by the CPU calibration it was best-or-tied in BOTH
    interleaved cycles (199/224 vs stock 250/270). Honest caveat,
    recorded in SCALE.md: the session VM drifted ±30% (calib 1.52-2.09)
    across arms and raw battery split 1-1 by cycle — the ship rests on
    the pre-registered min-of-2 rule, the every-run normalized
    consistency, and the mechanism (a latency-irrelevant batch engine
    doesn't need G1's pause guarantees; G1's write barriers +
    remembered-set upkeep tax Tungsten's allocation-heavy operators).
    This is the classic throughput-collector recommendation for batch
    Spark; on a real cluster apply the same flag to
    spark.executor.extraJavaOptions. SPARK_GRAFT_STOCK_GC=1 restores
    stock for future A/Bs."""
    if os.environ.get("SPARK_GRAFT_STOCK_GC") == "1":
        return opts
    if re.search(r"-XX:[+-]Use\w*GC", opts):
        return opts  # never clobber an explicit collector choice
    return f"{opts} {_GC_FLAG}".strip()


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
        # Codegen caching is STOCK (Janino cache 100 entries, default
        # 240 MB code cache) — REVERTED in round 11 after the
        # driver-lifecycle A/B the r10 verdict demanded (item 2c).
        # History: r10 root-caused a real recompile thrash (minhash's
        # 12-join plan reads 5.1-5.4s fresh but 6.9-7.5s after ~21
        # predecessors evict its fragments under the 100-entry cache)
        # and shipped maxEntries=1000 + -XX:ReservedCodeCacheSize=512m.
        # The r11 interleaved FULL-battery A/B through bench.py
        # subprocesses (tools/ab_r11_config.py, BENCH_AB_r11_*.json)
        # reversed that at battery grain: headline tied (30.7 vs 30.3s
        # min-of-2), but the full 460-query battery ran 553s shipped vs
        # 462s stock (~17% faster stock), the losses concentrated in
        # LATE families (r7j-r8 up to 2x) — the signature of JIT/GC
        # pressure from 1000 retained generated classes, while the
        # minhash recompile the big cache was bought for costs only
        # 0.27s/run under stock. SPARK_GRAFT_BIG_CODEGEN_CACHE=1
        # re-enables the r10 config for future A/Bs.
    )
    big_cache = os.environ.get("SPARK_GRAFT_BIG_CODEGEN_CACHE") == "1"
    if big_cache:
        builder = builder.config("spark.sql.codegen.cache.maxEntries", "1000")
        # the 1000-entry cache pins enough JIT'd code to exhaust JDK17's
        # default 240 MB ReservedCodeCacheSize mid-battery (JIT then
        # disables); 512m keeps it compiled. MERGED with external driver
        # JVM options, never clobbering them (ADVICE r10).
        caller_opts, merged = _merge_driver_java_options(
            extra_conf, os.environ.get("SPARK_DRIVER_EXTRA_JAVA_OPTIONS", "")
        )
    else:
        merged = dict(extra_conf or {})
        caller_opts = merged.pop(
            _JVM_OPTS_KEY,
            os.environ.get("SPARK_DRIVER_EXTRA_JAVA_OPTIONS", ""),
        )
    caller_opts = _merge_gc_flag(caller_opts)
    if caller_opts:
        builder = builder.config(_JVM_OPTS_KEY, caller_opts)
    for k, v in _env_conf().items():  # _env_conf rejects _JVM_OPTS_KEY
        builder = builder.config(k, v)
    for k, v in merged.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def clear_caches(spark: SparkSession) -> None:
    """HARNESS-ONLY cache sweep: drop ALL cached state between queries.

    For bench.py / the correctness gate / tests, which own the whole
    session. It is deliberately indiscriminate — it unpersists EVERY
    RDD in the context's persistent-RDD map, including caches owned by
    unrelated caller code on a shared ``getOrCreate`` session — so do
    NOT call it from library paths; registry ops release their own
    persists instead (ADVICE r11).

    ``spark.catalog.clearCache()`` only evicts CacheManager entries
    (DataFrame ``persist``/``cache``). ``localCheckpoint`` blocks are
    RDD-level persists OUTSIDE the CacheManager (ADVICE r10 —
    ``graph_bfs_landmark_distances``'s 4 per-round checkpoints), freed
    only when Python+JVM GC and the ContextCleaner get around to the
    dropped references — nondeterministic over a long many-query
    session. This sweeps both: the catalog cache, then every RDD still
    registered in the context's persistent-RDD map."""
    spark.catalog.clearCache()
    # JavaSparkContext.getPersistentRDDs(): Map<Integer, JavaRDD<?>>.
    # unpersist(True) = blocking, so block release can't bleed into the
    # next timed bench window (ADVICE r11).
    for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        jrdd.unpersist(True)
