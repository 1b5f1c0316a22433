"""Interleaved A/B for the two r10 iterate re-plans (VERDICT r9 items 4+6).

A: graph_bfs_landmark_distances — r9 eager per-round count jobs (inline
   replica) vs r10 2-deep lazy unpersist (registry code).
B: graph_pagerank_fixedpoint — r9 eager setup (pagerank_fixed_point with
   no hint, the preserved default path) vs r10 lazy setup via
   n_edges_hint (registry code).

Each timed run is COLD in the bench sense: clearCache + full JVM GC
before the clock starts, noop sink (no driver collection), variants
alternated A,B,A,B,... so VM drift hits both arms equally.

Usage: python tools/ab_r10_iterates.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rad_database_parse_spark.catalog.io import load_table  # noqa: E402
from rad_database_parse_spark.registry import all_queries  # noqa: E402
from rad_database_parse_spark.session import get_session  # noqa: E402


def bfs_eager_r9(spark, sf_dir):
    """Inline replica of the r9 eager-count BFS (the pre-9c4e0c2 body)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .persist()
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    d = edges.agg(F.min("src").alias("node")).select(
        "node", F.lit(0).cast("bigint").alias("dist")
    )
    prev = None
    for _ in range(4):
        expand = d.join(edges, d.node == edges.src).select(
            F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist")
        )
        d = (
            d.unionByName(expand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .persist()
        )
        d.count()
        if prev is not None:
            prev.unpersist()
        prev = d
    hist = d.groupBy(F.col("dist").cast("bigint").alias("dist")).agg(
        F.count("*").cast("bigint").alias("n_nodes")
    )
    unre = (
        nodes.join(d, "node", "left_anti")
        .agg(F.count("*").cast("bigint").alias("n_nodes"))
        .select(F.lit(-1).cast("bigint").alias("dist"), "n_nodes")
    )
    return hist.unionByName(unre).orderBy("dist")


def pagerank_eager_r9(spark, sf_dir):
    """r9 pagerank: registry edge construction + no-hint (eager) iterate."""
    from rad_database_parse_spark.llm.cluster import pagerank_fixed_point
    from rad_database_parse_spark.registry.pipeline_ops import (
        PR_BASE,
        PR_ITERS,
        PR_SCALE,
    )

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("cust_node").alias("src"), F.col("supp_node").alias("dst")
    ).union(
        pairs.select(
            F.col("supp_node").alias("src"), F.col("cust_node").alias("dst")
        )
    )
    return pagerank_fixed_point(edges, iters=PR_ITERS, scale=PR_SCALE, base=PR_BASE)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session()
    reg = all_queries()
    arms = {
        "bfs_eager_r9": lambda: bfs_eager_r9(spark, sf_dir),
        "bfs_lazy_r10": lambda: reg["graph_bfs_landmark_distances"].fn(spark, sf_dir),
        "pr_eager_r9": lambda: pagerank_eager_r9(spark, sf_dir),
        "pr_lazy_r10": lambda: reg["graph_pagerank_fixedpoint"].fn(spark, sf_dir),
    }
    results: dict[str, list[float]] = {k: [] for k in arms}
    hashes: dict[str, set] = {k: set() for k in arms}
    # JIT warmup: one untimed run of each arm
    for name, fn in arms.items():
        fn().write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        spark._jvm.System.gc()
    for r in range(rounds):
        for name, fn in arms.items():
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            results[name].append(round(time.perf_counter() - t0, 3))
            # value check (tiny results: 5-row hist / node-grain ranks sum)
            spark.catalog.clearCache()
            chk = fn()
            agg = chk.agg(*[F.sum(F.hash(c)).alias(c) for c in chk.columns])
            hashes[name].add(tuple(agg.collect()[0]))
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            print(f"round {r} {name}: {results[name][-1]}s", flush=True)
    print("\n== medians ==")
    for name, ts in results.items():
        print(f"{name}: runs={ts} median={sorted(ts)[len(ts)//2]}")
    print("\n== value parity ==")
    print("bfs identical:", hashes["bfs_eager_r9"] == hashes["bfs_lazy_r10"],
          hashes["bfs_eager_r9"], hashes["bfs_lazy_r10"])
    print("pr identical:", hashes["pr_eager_r9"] == hashes["pr_lazy_r10"],
          hashes["pr_eager_r9"], hashes["pr_lazy_r10"])


if __name__ == "__main__":
    main()
