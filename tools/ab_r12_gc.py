"""Round-12 GC/heap A/B (VERDICT r11 item 3).

BENCH_r11 recorded gc_ms=173,961 over a ~429s battery (~40% of wall,
granting that concurrent collectors inflate the ratio) — the largest
unexamined cost in the battery. This runs the FULL bench battery at
sf0.1 through `python bench.py` subprocesses — the driver's exact
session lifecycle — over four arms, interleaved A B C D A B C D so VM
drift hits every arm equally (the r11 codegen-cache lesson: judge at
battery grain, from interleaved full-battery arms, never a
headline-only read).

Arms (all via env knobs session.py already honors — no code change
needed to test, one default change to ship a winner):

  A stock    : driver heap 8g (session default), stock G1
  B heap16   : driver heap 16g — the box has 128 GiB; if GC wall is
               allocation-rate-driven, doubling young gen buys the
               cheapest win available
  C heap16+parallelgc : 16g + -XX:+UseParallelGC — the throughput
               collector; G1 optimizes pause, a batch battery wants
               throughput
  D heap16+g1tune : 16g + -XX:G1HeapRegionSize=32m
               -XX:MaxGCPauseMillis=400 — keep G1 but trade pause
               target for throughput and halve region-count overhead

Decision rule (pre-registered): ship the best arm's config as the
session default only if its min-of-2 battery total beats stock's by >5%
AND its headline is not worse by >5%; otherwise record the rejection in
SCALE.md. gc_ms / calib quartet from each arm's summary discriminate
"GC actually fell" from VM drift.

OUTCOME (BENCH_AB_r12_{arm}_{idx}.json; full analysis in SCALE.md):
parallelgc won the rule — battery min-of-2 342.0s vs stock 429.2s
(-20%), headline 19.2 vs 22.4, organic (battery-concurrent) GC
21.5→5.3s, normalized best-or-tied in both interleaved cycles — and
-XX:+UseParallelGC (at the UNCHANGED 8g heap: heap16 and g1tune read
as noise) was shipped as the session default (session._merge_gc_flag).
The session VM drifted ±30% (calib 1.52-2.09) across arms, so the raw
battery numbers split 1-1 by cycle; the ship rests on the
pre-registered rule + normalized consistency + mechanism. After the
ship, the "stock" arm pins SPARK_GRAFT_STOCK_GC=1 so re-runs keep
their original meaning (stock = pre-r12 G1 default).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARMS: dict[str, dict[str, str]] = {
    "stock": {"SPARK_GRAFT_STOCK_GC": "1"},
    "heap16": {"SPARK_GRAFT_DRIVER_MEM": "16g", "SPARK_GRAFT_STOCK_GC": "1"},
    "parallelgc": {
        "SPARK_GRAFT_DRIVER_MEM": "16g",
        "SPARK_DRIVER_EXTRA_JAVA_OPTIONS": "-XX:+UseParallelGC",
    },
    "g1tune": {
        "SPARK_GRAFT_DRIVER_MEM": "16g",
        "SPARK_GRAFT_STOCK_GC": "1",
        "SPARK_DRIVER_EXTRA_JAVA_OPTIONS": (
            "-XX:G1HeapRegionSize=32m -XX:MaxGCPauseMillis=400"
        ),
    },
}


def run_once(arm: str, idx: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
        **ARMS[arm],
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    # fail loudly on a mid-battery crash — a nonzero-rc bench must not
    # surface as an opaque IndexError or record a partial arm (ADVICE r11)
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        raise RuntimeError(f"bench.py rc={r.returncode} on arm {arm}#{idx}")
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    full = json.loads(lines[0])  # per-query map
    summary = json.loads(lines[-1])
    with open(os.path.join(REPO, f"BENCH_AB_r12_{arm}_{idx}.json"), "w") as f:
        json.dump({**summary, "queries": full.get("queries", {})}, f)
    print(
        f"{arm}#{idx}: headline={summary['value']} "
        f"hpc={summary['headline_per_calib']} "
        f"calib={summary['calib_sec']}/{summary['calib_post']} "
        f"mem={summary['calib_mem_sec']}/{summary['calib_mem_post']} "
        f"gc_ms={summary['gc_ms']} gc_forced_ms={summary['gc_forced_ms']} "
        f"gc_n={summary['gc_n']} heap_mb={summary['heap_mb']}",
        flush=True,
    )
    return summary


def battery_total(s: dict) -> float:
    return sum(
        v for k, v in s.items() if k == "value" or k.startswith("value_extended")
    )


def main() -> int:
    results: dict[str, list[dict]] = {a: [] for a in ARMS}
    for i in range(2):
        for arm in ARMS:
            results[arm].append(run_once(arm, i))
    fams = [k for k in results["stock"][0] if k.startswith("value_extended")]
    print("\nfamily, " + ", ".join(f"{a}(min of 2)" for a in ARMS))
    for fam in ["value"] + fams:
        cells = {a: min(r[fam] for r in results[a]) for a in ARMS}
        best = min(cells, key=cells.get)
        print(
            f"{fam}: "
            + " ".join(f"{a}={cells[a]}" for a in ARMS)
            + (f"  <-- {best}" if cells[best] < cells["stock"] * 0.9 else "")
        )
    print("\nbattery totals (min of 2) / gc split (min of 2):")
    for a in ARMS:
        tot = min(battery_total(r) for r in results[a])
        gc = min(r["gc_ms"] for r in results[a])
        forced = min(r["gc_forced_ms"] for r in results[a])
        print(
            f"  {a}: battery={tot:.1f}s gc_ms={gc} "
            f"forced={forced} organic={gc - forced}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
