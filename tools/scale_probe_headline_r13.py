"""One-decade scaling probe over the FULL 28-query headline set (r13).

VERDICT r12 item 2: the driver's 8-vs-32-core block at sf0.1 shows ≈1
ratios for every headline query because headline work at that SF is
sub-second scheduling overhead — the real scaling signal lives on the
SF axis. This extends the r12 decade-probe protocol (tools/
scale_probe_r12.py, tools/gen_sf1.py) from the slowest-5+dedup+ANN
subset to every query in bench.py's HEADLINE list and reports
alpha = log10(t_sf1 / t_sf0.1) per query (1.0 = linear, 2.0 =
quadratic; <1 = fixed overhead amortizing).

Protocol mirrors bench.py's hygiene: one session, clearCache + full JVM
GC between runs, min-of-2 per (query, sf), sf0.1 and sf1 interleaved
per query so VM drift hits both sides of each ratio equally. CPU
calibration brackets the session. Results land as one JSON line in
SCALE_PROBE_HEADLINE_r13.json.

Usage: python tools/scale_probe_headline_r13.py [SF1_DIR]  (default /tmp/sf1)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    from bench import HEADLINE
    from rad_database_parse_spark.session import get_session, clear_caches
    import __spark_entry__ as entry

    spark = get_session(app_name="scale-probe-headline-r13")
    qs = entry.queries()

    def calib() -> float:
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).selectExpr(
            "sum(id * 2 + 1) as s"
        ).collect()
        return round(time.perf_counter() - t0, 3)

    def run_once(name: str, sf_dir: str) -> float:
        # noop sink, exactly like bench.py: full distributed execution,
        # zero driver-side collection
        clear_caches(spark)
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    calib_pre = calib()
    out = {}
    for name in HEADLINE:
        # interleave: 0.1, 1, 0.1, 1 — drift hits both sides
        t01, t1 = [], []
        for _ in range(2):
            t01.append(run_once(name, SF01))
            t1.append(run_once(name, sf1))
        a, b = min(t01), min(t1)
        alpha = math.log10(b / a)
        out[name] = {
            "sf0.1_sec": round(a, 2),
            "sf1_sec": round(b, 2),
            "alpha": round(alpha, 2),
        }
        print(
            f"{name}: sf0.1 {a:.2f}s  sf1 {b:.2f}s  alpha {alpha:.2f}",
            flush=True,
        )
    calib_post = calib()
    line = {
        "probe": "headline_sf0.1_vs_sf1",
        "replicas": 10,
        "calib_pre": calib_pre,
        "calib_post": calib_post,
        "queries": out,
    }
    with open(os.path.join(REPO, "SCALE_PROBE_HEADLINE_r13.json"), "w") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    main()
