"""Round-12 optimization: bulk physical-plan audit over the whole registry.

For every registered query, builds the DataFrame at $SPARK_GRAFT_SF_DIR
(default sf0.01 — plan shape, not execution, is what's audited; AQE
re-planning happens at run time and is out of scope here) and records the
``explain("formatted")`` text plus extracted structural features:

- exchanges:       number of Exchange nodes (shuffle boundaries)
- smj / bhj / shj: join-strategy counts (SortMergeJoin / BroadcastHashJoin /
                   ShuffledHashJoin)
- bnlj / cartesian: BroadcastNestedLoopJoin / CartesianProduct counts
- py_batch / py_arrow / py_map / py_flatmap / py_agg:
                   BatchEvalPython / ArrowEvalPython / MapInPandas|MapInArrow
                   / FlatMapGroupsInPandas / AggregateInPandas node counts —
                   every JVM<->Python boundary in the plan
- expand:          Expand nodes (row replication: rollup/cube/multi-distinct)
- generate:        Generate nodes (explode)
- window / sort:   Window and global Sort node counts
- scans / widest_scan: parquet scan count and the widest ReadSchema
                   column count
- no_pushdown:     scans with a filter directly above them but an empty
                   PushedFilters list (predicate did not reach parquet)

Output: one JSON line per query to the path in argv[1]
(default /tmp/plan_audit_r12.jsonl). Queries whose builders fail to plan
are recorded with an "error" field rather than aborting the sweep.

Usage:
    python tools/plan_audit_r12.py [out.jsonl] [query ...]
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rad_database_parse_spark.registry import all_queries  # noqa: E402
from rad_database_parse_spark.session import clear_caches, get_session  # noqa: E402


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def features(plan: str) -> dict:
    def n(pat: str) -> int:
        return len(re.findall(pat, plan))

    # scans with empty pushed filters that have a Filter parent somewhere
    no_pushdown = 0
    widest = 0
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c for c in m.group(1).split(",") if ":" in c]
        widest = max(widest, len(cols))
    # count scan blocks with "PushedFilters: []" while the plan also has
    # Filter nodes (coarse — a per-scan association needs the tree, but a
    # nonzero count is a flag to look at the query by hand)
    if "Filter" in plan:
        no_pushdown = n(r"PushedFilters: \[\]")
    return {
        "exchanges": n(r"\bExchange\b"),
        "smj": n(r"\bSortMergeJoin\b"),
        "bhj": n(r"\bBroadcastHashJoin\b"),
        "shj": n(r"\bShuffledHashJoin\b"),
        "bnlj": n(r"\bBroadcastNestedLoopJoin\b"),
        "cartesian": n(r"\bCartesianProduct\b"),
        "py_batch": n(r"\bBatchEvalPython\b"),
        "py_arrow": n(r"\bArrowEvalPython\b"),
        "py_map": n(r"\bMapInPandas\b|\bMapInArrow\b|\bPythonMapInArrow\b"),
        "py_flatmap": n(r"\bFlatMapGroupsInPandas\b|\bFlatMapGroupsInArrow\b"),
        "py_agg": n(r"\bAggregateInPandas\b"),
        "py_udtf": n(r"\bBatchEvalPythonUDTF\b|\bArrowEvalPythonUDTF\b"),
        "expand": n(r"\bExpand\b"),
        "generate": n(r"\bGenerate\b"),
        "window": n(r"\bWindow\b"),
        "global_sort": n(r"\bExchange rangepartitioning"),
        "scans": n(r"Scan parquet"),
        "widest_scan": widest,
        "no_pushdown_scans": no_pushdown,
        "plan_bytes": len(plan),
    }


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_audit_r12.jsonl"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_session(app_name="plan_audit_r12")
    reg = all_queries()
    names = [n for n in reg if not only or n in only]
    with open(out_path, "w") as fh:
        for i, name in enumerate(names):
            rec: dict = {"name": name}
            try:
                df = reg[name].fn(spark, sf_dir)
                plan = plan_text(df)
                rec.update(features(plan))
                rec["plan"] = plan
            except Exception as e:  # record, keep sweeping
                rec["error"] = f"{type(e).__name__}: {e}"[:500]
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            if (i + 1) % 50 == 0:
                print(f"{i + 1}/{len(names)} planned", file=sys.stderr)
                clear_caches(spark)
    print(out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
