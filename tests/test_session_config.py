"""Session-factory hygiene (ADVICE r10).

1. ``_merge_driver_java_options``: the ReservedCodeCacheSize fix must
   never clobber externally configured driver JVM options, and an
   ``extra_conf`` that sets its own ``extraJavaOptions`` must not
   silently drop the code-cache flag (unless it carries an explicit
   ReservedCodeCacheSize of its own).
2. ``clear_caches``: catalog ``clearCache()`` does not release
   RDD-level persists (``localCheckpoint`` blocks live outside the
   CacheManager); the gate/bench hygiene sweep must release both.
"""

from __future__ import annotations

from pyspark import StorageLevel

from rad_database_parse_spark.session import (
    _CODE_CACHE_FLAG,
    _merge_driver_java_options,
    clear_caches,
)


def test_merge_defaults_to_flag_only():
    opts, remaining = _merge_driver_java_options(None)
    assert opts == _CODE_CACHE_FLAG
    assert remaining == {}


def test_merge_appends_to_env_options():
    opts, _ = _merge_driver_java_options(None, "-Xss4m -Dfoo=bar")
    assert opts.startswith("-Xss4m -Dfoo=bar ")
    assert opts.endswith(_CODE_CACHE_FLAG)


def test_merge_extra_conf_wins_over_env_but_keeps_flag():
    opts, remaining = _merge_driver_java_options(
        {"spark.driver.extraJavaOptions": "-Xmx1g", "other.key": "v"},
        "-Xss4m",
    )
    assert "-Xss4m" not in opts  # extra_conf takes precedence over env
    assert opts == f"-Xmx1g {_CODE_CACHE_FLAG}"
    # the consumed extraJavaOptions entry must not be re-applied later
    assert remaining == {"other.key": "v"}


def test_merge_respects_explicit_code_cache_size():
    opts, _ = _merge_driver_java_options(
        {"spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=256m"}
    )
    assert opts == "-XX:ReservedCodeCacheSize=256m"
    assert "512m" not in opts


def test_merge_env_explicit_code_cache_size_respected():
    opts, _ = _merge_driver_java_options(None, "-XX:ReservedCodeCacheSize=1g")
    assert opts == "-XX:ReservedCodeCacheSize=1g"


def test_clear_caches_releases_localcheckpoint_blocks(spark):
    df = spark.range(100).localCheckpoint(eager=True)
    df.count()
    rdd = spark.range(50).rdd.persist(StorageLevel.MEMORY_AND_DISK)
    rdd.count()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() > 0
    clear_caches(spark)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0
