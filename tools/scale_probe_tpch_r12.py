"""One-decade scaling probe over the full TPC-H 22-query surface (r12).

tools/scale_probe_r12.py measured sf0.1 -> sf1 on the 11 bench heavies
(dedup/ANN/graph). This companion run covers the CORE RELATIONAL
surface — all 22 TPC-H-shaped registry queries — so the scaling
evidence spans both halves of the engine: the LLM-pipeline operators
(prior probe) and the join/agg/window workhorses (this one). TPC-H is
the canonical scale-sensitivity battery: its queries stress broadcast
vs shuffle joins (q2/q9/q21), multi-way joins with selective filters
(q3/q5/q7/q8), scan-dominated aggregation (q1/q6), anti/semi joins
(q16/q21/q22) and correlated-subquery rewrites (q11/q15/q17/q20) —
exactly the shapes whose exponents tell you whether the plan survives
100x. An 8-query time-series slice (sessionization, sliding/rolling
windows, as-of join, salted agg) rides along because gen_sf1.py scales
event DENSITY within an unchanged time range — growing per-window
group sizes, the axis key-offset scaling does not exercise.

Protocol identical to scale_probe_r12.py (bench.py hygiene): one
session, clearCache + full GC between runs, min-of-2 per (query, sf),
sf0.1/sf1 interleaved per query so VM drift hits both sides of each
ratio equally, noop sink (no driver materialization), CPU calibration
bracketing the session. alpha = log10(t_sf1 / t_sf0.1): 1.0 = linear,
<1 = overhead-amortizing (fixed job/plan cost dominates), 2.0 =
quadratic.

Usage: python tools/scale_probe_tpch_r12.py [SF1_DIR]  (default /tmp/sf1)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_priority_with_late_item",
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_item_revenue",
    "q11_important_stock",
    "q12_latency_priority",
    "q13_order_count_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_predicates",
    "q20_surplus_stock_suppliers",
    "q21_waiting_supplier",
    "q22_idle_customers",
]

# Time-series / windowed slice: gen_sf1.py deliberately does NOT shift
# events.ts (10x event density per unchanged time window is the
# realistic scale-up for windowed aggregation), so these exercise
# growing per-window/per-session group sizes — the axis TPC-H's
# key-offset scaling does not touch.
EVENTS_QUERIES = [
    "sessionize_events",           # gap-based sessionization (window lag + cumsum)
    "session_window_stats",        # per-session aggregation
    "sliding_window_counts",       # sliding time windows
    "events_rolling_wau",          # rolling distinct-user window
    "events_funnel_windowed_24h",  # ordered funnel within 24h windows
    "asof_last_view_before_purchase",  # as-of join
    "events_salted_twophase_agg",  # skew-mitigation two-phase agg
    "events_hurst_rescaled_range", # heaviest events entry in the battery
]

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    from rad_database_parse_spark.session import get_session, clear_caches
    import __spark_entry__ as entry

    spark = get_session(app_name="scale-probe-tpch-r12")
    qs = entry.queries()

    def calib() -> float:
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).selectExpr(
            "sum(id * 2 + 1) as s"
        ).collect()
        return round(time.perf_counter() - t0, 3)

    def run_once(name: str, sf_dir: str) -> float:
        clear_caches(spark)
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    calib_pre = calib()
    out = {}
    for name in QUERIES + EVENTS_QUERIES:
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
        print(f"{name}: sf0.1 {a:.2f}s  sf1 {b:.2f}s  alpha {alpha:.2f}",
              flush=True)
    calib_post = calib()
    line = {
        "probe": "tpch_events_sf0.1_vs_sf1",
        "replicas": 10,
        "calib_pre": calib_pre,
        "calib_post": calib_post,
        "queries": out,
    }
    with open(os.path.join(REPO, "SCALE_PROBE_TPCH_r12.json"), "w") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    main()
