"""Measured OR-amplification recall (VERDICT r2 item 8): two independent
8-bit hyperplane LSH tables must recall at least as many true near-dup
pairs as one table — structurally guaranteed here because table A of the
OR pair uses the same hyperplane dims as the single-table query — and the
measured recalls quantify the 1-(1-p^8)^2 claim SCALE.md makes.
"""

from pyspark.sql import functions as F

from rad_database_parse_spark.catalog.io import load_table
from rad_database_parse_spark.llm.similarity import cosine, sign_bucket
from rad_database_parse_spark.registry.pipeline_ops import (
    _LSH_DIMS_A,
    emb_lsh_or_amplified,
)

THRESHOLD = 0.2


def _pair_set(df):
    return {(r.id_a, r.id_b) for r in df.select("id_a", "id_b").collect()}


def test_or_amplification_recall(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # ground truth: all-pairs cosine >= threshold (sf0.001: 500 vectors,
    # 125k candidate pairs — brute force is the oracle, not the scale path)
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    truth = _pair_set(
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("sim") >= THRESHOLD)
    )
    assert truth, "corpus has no near-dup pairs; recall is undefined"

    # single-table LSH: bucket on the SAME dims as the OR pair's table A
    c = e.select(
        "vec_id", "embedding", sign_bucket(F.col("embedding"), _LSH_DIMS_A).alias("bk")
    )
    ca = c.select(F.col("vec_id").alias("id_a"), "bk", F.col("embedding").alias("va"))
    cb = c.select(F.col("vec_id").alias("id_b"), "bk", F.col("embedding").alias("vb"))
    single = _pair_set(
        ca.join(cb, "bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("sim") >= THRESHOLD)
    )

    both = _pair_set(emb_lsh_or_amplified(spark, sf_dir))

    # verified candidates can only be true pairs, and OR ⊇ single-table
    assert single <= truth and both <= truth
    assert single <= both

    recall_single = len(single) / len(truth)
    recall_or = len(both) / len(truth)
    assert recall_or >= recall_single
    # the second table must actually contribute on this corpus — if this
    # ever fails the amplification is vacuous and the dims need changing
    assert len(both) > len(single), (
        f"OR table added no pairs: single={len(single)} or={len(both)} "
        f"truth={len(truth)}"
    )
