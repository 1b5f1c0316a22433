"""Round-13 optimization: zstd shuffle-codec A/B re-draw (VERDICT r12
item 3).

The r12 zstd rejection was drift-confounded: both zstd batteries drew
degraded-VM windows (calib 2.85/2.40 vs stock 1.99/1.76) and the
CALIB-NORMALIZED read won both cycles, so the question stayed open.
This re-draw runs the same interleaved full-battery protocol
(stock zstd stock zstd through bench.py subprocesses — the driver's
exact lifecycle) with an explicit calibration-stability gate.

Decision rule (pre-registered, unchanged from r12): ship zstd as the
session default only if its min-of-2 battery total beats stock's by >5%
AND its headline is not worse by >5%. NEW validity gate (VERDICT r12
item 3): the verdict only counts when the CPU calibrations of all
batteries agree within ±10% of their median — otherwise the cycle is
drift-contaminated and must be re-drawn, decision deferred. Either way
the outcome is recorded in OPTIMIZATION_r13.md.

Outputs BENCH_AB_r13conf_{arm}_{idx}.json (summary + per-query map).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARMS: dict[str, dict[str, str]] = {
    "stock": {},
    "zstd": {"SPARK_GRAFT_CONF": "spark.io.compression.codec=zstd"},
}


def run_once(arm: str, idx: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1")
    env.pop("SPARK_GRAFT_CONF", None)  # stock must not inherit an outer hook
    env.update(ARMS[arm])
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        raise RuntimeError(f"bench.py rc={r.returncode} on arm {arm}#{idx}")
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    full = json.loads(lines[0])  # per-query map + family subtotals (r13)
    summary = json.loads(lines[-1])
    with open(os.path.join(REPO, f"BENCH_AB_r13conf_{arm}_{idx}.json"), "w") as f:
        json.dump({**full, "queries": full.get("queries", {})}, f)
    print(
        f"{arm}#{idx}: headline={summary['value']} "
        f"hpc={summary['headline_per_calib']} "
        f"calib={summary['calib_sec']}/{summary['calib_post']} "
        f"mem={summary['calib_mem_sec']}/{summary['calib_mem_post']} "
        f"gc_ms={summary['gc_ms']} gc_forced_ms={summary['gc_forced_ms']}",
        flush=True,
    )
    return full


def battery_total(s: dict) -> float:
    return sum(
        v for k, v in s.items() if k == "value" or k.startswith("value_extended")
    )


def main() -> int:
    results: dict[str, list[dict]] = {a: [] for a in ARMS}
    for i in range(2):
        for arm in ARMS:
            results[arm].append(run_once(arm, i))
    calibs = [r["calib_sec"] for rs in results.values() for r in rs]
    med = statistics.median(calibs)
    stable = all(abs(c - med) <= 0.10 * med for c in calibs)
    print(f"\ncalibs={calibs} median={med:.3f} stable(±10%)={stable}")
    fams = [k for k in results["stock"][0] if k.startswith("value_extended")]
    print("family, " + ", ".join(f"{a}(min of 2)" for a in ARMS))
    for fam in ["value"] + fams:
        cells = {a: min(r[fam] for r in results[a]) for a in ARMS}
        best = min(cells, key=cells.get)
        print(
            f"{fam}: "
            + " ".join(f"{a}={cells[a]}" for a in ARMS)
            # marker threshold matches the 5% ship rule (ADVICE r12)
            + (f"  <-- {best}" if cells[best] < cells["stock"] * 0.95 else "")
        )
    tot = {a: min(battery_total(r) for r in results[a]) for a in ARMS}
    hl = {a: min(r["value"] for r in results[a]) for a in ARMS}
    print("\nbattery totals (min of 2): " + str(tot))
    ship = (
        stable
        and tot["zstd"] < tot["stock"] * 0.95
        and hl["zstd"] < hl["stock"] * 1.05
    )
    verdict = (
        "SHIP zstd"
        if ship
        else ("REJECT zstd (rule)" if stable else "INVALID (calib drift >10%) — re-draw")
    )
    print(f"verdict: {verdict}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
