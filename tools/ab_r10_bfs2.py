"""Second BFS A/B (r10): eager persist+count (r9) vs per-round
localCheckpoint(eager=True) — the lineage-truncation alternative from
VERDICT r9 item 4. Same methodology as ab_r10_iterates.py."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rad_database_parse_spark.catalog.io import load_table  # noqa: E402
from rad_database_parse_spark.session import get_session  # noqa: E402
from tools.ab_r10_iterates import bfs_eager_r9  # noqa: E402


def _base(spark, sf_dir):
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
    return edges, nodes, d


def _finish(nodes, d):
    hist = d.groupBy(F.col("dist").cast("bigint").alias("dist")).agg(
        F.count("*").cast("bigint").alias("n_nodes")
    )
    unre = (
        nodes.join(d, "node", "left_anti")
        .agg(F.count("*").cast("bigint").alias("n_nodes"))
        .select(F.lit(-1).cast("bigint").alias("dist"), "n_nodes")
    )
    return hist.unionByName(unre).orderBy("dist")


def bfs_ckpt(spark, sf_dir):
    edges, nodes, d = _base(spark, sf_dir)
    for _ in range(4):
        expand = d.join(edges, d.node == edges.src).select(
            F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist")
        )
        d = (
            d.unionByName(expand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return _finish(nodes, d)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session()
    arms = {
        "bfs_eager_r9": lambda: bfs_eager_r9(spark, sf_dir),
        "bfs_ckpt_r10": lambda: bfs_ckpt(spark, sf_dir),
    }
    results = {k: [] for k in arms}
    hashes = {k: set() for k in arms}
    for name, fn in arms.items():  # warmup
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
    print("identical:", hashes["bfs_eager_r9"] == hashes["bfs_ckpt_r10"], hashes)


if __name__ == "__main__":
    main()
