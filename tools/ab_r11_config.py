"""Round-11 config A/B (VERDICT r10 item 2c).

Runs the FULL bench battery at sf0.1 through `python bench.py`
subprocesses — the driver's exact session lifecycle — alternating the
r10-shipped session config (codegen cache 1000 + 512 MB code cache)
against stock defaults (cache 100, no code-cache flag), interleaved
A B A B so VM drift hits both arms equally.

OUTCOME (recorded in BENCH_AB_r11_{shipped,stock}_{0,1}.json): the r10c
signature REPRODUCED — headline tied (30.71 vs 30.33s min-of-2) but the
full battery ran 553.1s shipped vs 461.7s stock, with the losses
concentrated in late families (r7j 11.3→6.7, r7k 19.7→9.7, r8
76.4→63.1) — JIT/GC pressure from the 1000 retained generated classes,
while docs_minhash_lsh (the query the big cache was bought for) loses
only 0.27s under stock. The session config was REVERTED to stock per
the verdict's rule; SPARK_GRAFT_BIG_CODEGEN_CACHE=1 re-enables the r10
config (this script now exercises that knob, so the arms keep their
original meaning on re-runs).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(stock: bool, idx: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
        # post-revert: stock is the session default; the "shipped" arm
        # (r10 config) is re-enabled via the big-cache knob
        SPARK_GRAFT_BIG_CODEGEN_CACHE="0" if stock else "1",
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
        raise RuntimeError(f"bench.py rc={r.returncode} on arm {'stock' if stock else 'shipped'}#{idx}")
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    full = json.loads(lines[0])  # per-query map
    summary = json.loads(lines[-1])
    tag = "stock" if stock else "shipped"
    with open(os.path.join(REPO, f"BENCH_AB_r11_{tag}_{idx}.json"), "w") as f:
        json.dump({**summary, "queries": full.get("queries", {})}, f)
    print(
        f"{tag}#{idx}: headline={summary['value']} "
        f"hpc={summary['headline_per_calib']} "
        f"calib={summary['calib_sec']}/{summary['calib_post']} "
        f"mem={summary['calib_mem_sec']}/{summary['calib_mem_post']} "
        f"gc_ms={summary['gc_ms']} codecache_mb={summary['codecache_mb']}",
        flush=True,
    )
    return summary


def main() -> int:
    results: dict[str, list[dict]] = {"shipped": [], "stock": []}
    for i in range(2):
        results["shipped"].append(run_once(stock=False, idx=i))
        results["stock"].append(run_once(stock=True, idx=i))
    fams = [k for k in results["shipped"][0] if k.startswith("value_extended")]
    print("\nfamily, shipped(min of 2), stock(min of 2)")
    for fam in ["value"] + fams:
        a = min(r[fam] for r in results["shipped"])
        b = min(r[fam] for r in results["stock"])
        flag = " <-- stock faster by >10%" if b < a * 0.9 else ""
        print(f"{fam}: shipped={a} stock={b}{flag}")
    tot_a = min(
        sum(v for k, v in r.items() if k == "value" or k.startswith("value_extended"))
        for r in results["shipped"]
    )
    tot_b = min(
        sum(v for k, v in r.items() if k == "value" or k.startswith("value_extended"))
        for r in results["stock"]
    )
    print(f"\nbattery total: shipped={tot_a:.1f}s stock={tot_b:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
