"""One-decade scaling probe: sf0.1 vs sf1 on the bench heavies (r12).

VERDICT r11 item 7: the 100x question has so far been answered by
design analysis and plan guards; this measures one decade of actual
scaling (10x rows via tools/gen_sf1.py) on the slowest-5 driver
entries plus the dedup/ANN family, and reports the scaling exponent
alpha = log10(t_sf1 / t_sf0.1)  (1.0 = linear, 2.0 = quadratic).

Protocol mirrors bench.py's hygiene: one session, clearCache + full GC
between runs, min-of-2 per (query, sf), sf0.1 and sf1 interleaved per
query so VM drift hits both sides of each ratio equally. CPU
calibration before/after brackets the session. Results land as one
JSON line in SCALE_PROBE_r12.json.

Usage: python tools/scale_probe_r12.py [SF1_DIR]   (default /tmp/sf1)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    # slowest-5 of BENCH_r11 (audited heavies; VERDICT item 6 says leave
    # them alone — this run measures, it does not re-plan)
    "graph_pagerank_fixedpoint",
    "docs_minhash_lsh",
    "part_name_neardup",
    "part_item_item_cf_topk",
    "graph_modularity_communities",
    # dedup family
    "docs_exact_dedup",
    "docs_incremental_neardup",
    "docs_simhash",
    # ANN family
    "emb_ivf_pq_adc_topk",
    "emb_lsh_or_amplified",
    "part_knn_graph_stats",
]

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    from rad_database_parse_spark.session import get_session, clear_caches
    import __spark_entry__ as entry

    spark = get_session(app_name="scale-probe-r12")
    qs = entry.queries()

    def calib() -> float:
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).selectExpr(
            "sum(id * 2 + 1) as s"
        ).collect()
        return round(time.perf_counter() - t0, 3)

    def run_once(name: str, sf_dir: str) -> float:
        # noop sink, exactly like bench.py: full distributed execution,
        # zero driver-side collection (a .collect() here hit
        # maxResultSize on docs_minhash_lsh's sf1 pair output and would
        # time driver materialization, not the operator).
        clear_caches(spark)
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    calib_pre = calib()
    out = {}
    for name in QUERIES:
        # interleave: 0.1, 1, 0.1, 1 — drift hits both sides
        t01, t1 = [], []
        for _ in range(2):
            t01.append(run_once(name, SF01))
            t1.append(run_once(name, sf1))
        a, b = min(t01), min(t1)
        import math
        alpha = math.log10(b / a)
        out[name] = {
            "sf0.1_sec": round(a, 2),
            "sf1_sec": round(b, 2),
            "alpha": round(alpha, 2),
        }
        print(f"{name}: sf0.1 {a:.2f}s  sf1 {b:.2f}s  alpha {alpha:.2f}",
              flush=True)
    calib_post = calib()
    line = {
        "probe": "sf0.1_vs_sf1",
        "replicas": 10,
        "calib_pre": calib_pre,
        "calib_post": calib_post,
        "queries": out,
    }
    with open(os.path.join(REPO, "SCALE_PROBE_r12.json"), "w") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    main()
