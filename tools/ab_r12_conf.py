"""Round-12 optimization: global-conf A/B (guide §3.1 / §2.3 / §9).

Two session knobs the optimization guide's baseline recommends that this
engine has never measured, each run as a FULL bench battery at sf0.1
through `python bench.py` subprocesses (the driver's exact lifecycle),
interleaved A B C A B C so VM drift hits every arm equally (the r11
codegen-cache lesson: judge at battery grain, never a headline-only
read).

Arms (via the SPARK_GRAFT_CONF env hook in session.py — no code change
to test, one default change to ship a winner):

  A stock : the shipped r12 session (ParallelGC 8g, lz4 shuffle codec,
            preferSortMergeJoin=true default)
  B shj   : spark.sql.join.preferSortMergeJoin=false
            + spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m
            — let the planner pick shuffled-hash joins when a build side
            fits per-partition, and let AQE convert SMJ->SHJ at runtime
            (guide §3.1: "often faster than sort-merge when one side is
            moderately small per partition"). Scale story: the win is
            removing the sort on both sides of every non-broadcast join;
            the 64m local-map threshold bounds build-side memory per
            task, so the knob is size-guarded at any SF.
  C zstd  : spark.io.compression.codec=zstd — guide §2.3: better shuffle
            compression ratio for a bit more CPU. On local[32] shuffle
            bytes never cross a NIC so this mostly measures the CPU cost
            side; a local no-worse + the ratio argument is the best we
            can measure here, and a local LOSS is a recorded rejection.

Decision rule (pre-registered, same as tools/ab_r12_gc.py): ship an
arm's conf as the session default only if its min-of-2 battery total
beats stock's by >5% AND its headline is not worse by >5%; otherwise
record the rejection in SCALE.md / OPTIMIZATION_r12.md.

Outputs BENCH_AB_r12conf_{arm}_{idx}.json (summary + per-query map).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARMS: dict[str, dict[str, str]] = {
    "stock": {},
    "shj": {
        "SPARK_GRAFT_CONF": (
            "spark.sql.join.preferSortMergeJoin=false;"
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=67108864"
        )
    },
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
    full = json.loads(lines[0])
    summary = json.loads(lines[-1])
    with open(os.path.join(REPO, f"BENCH_AB_r12conf_{arm}_{idx}.json"), "w") as f:
        json.dump({**summary, "queries": full.get("queries", {})}, f)
    print(
        f"{arm}#{idx}: headline={summary['value']} "
        f"hpc={summary['headline_per_calib']} "
        f"calib={summary['calib_sec']}/{summary['calib_post']} "
        f"mem={summary['calib_mem_sec']}/{summary['calib_mem_post']} "
        f"gc_ms={summary['gc_ms']} gc_forced_ms={summary['gc_forced_ms']}",
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
            # marker threshold matches the 5% ship rule (ADVICE r12)
            + (f"  <-- {best}" if cells[best] < cells["stock"] * 0.95 else "")
        )
    print("\nbattery totals (min of 2):")
    for a in ARMS:
        tot = min(battery_total(r) for r in results[a])
        print(f"  {a}: battery={tot:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
