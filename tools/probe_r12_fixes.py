"""Round-12 optimization: isolated per-query timing probe.

Times the named registry queries with bench.py's exact methodology —
noop sink, min-of-N runs, clearCache + forced full JVM GC between timed
runs — and prints one JSON line. Used for the interleaved old/new-code
A/B of the round-12 rescan fixes (run this against each code state in
alternation so VM drift hits both arms; the stash-toggle sequence is
recorded in OPTIMIZATION_r12.md).

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        python tools/probe_r12_fixes.py [runs] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rad_database_parse_spark.registry import all_queries  # noqa: E402
from rad_database_parse_spark.session import clear_caches, get_session  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    runs = 2
    if args and args[0].isdigit():
        runs = int(args[0])
        args = args[1:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="probe_r12_fixes")
    reg = all_queries()
    out: dict[str, float] = {}
    for name in names:
        fn = reg[name].fn
        best = None
        for _ in range(runs):
            clear_caches(spark)
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
        out[name] = round(best, 3)
        clear_caches(spark)
    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
