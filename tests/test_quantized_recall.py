"""Scalar-quantization fidelity: cosine top-k over RECONSTRUCTED int8
vectors must recall almost all of the exact float top-k — the measured
evidence that the 4× memory compression (emb_scalar_quantize) is usable
for ANN search, mirroring tests/test_lsh_recall.py for the LSH tier.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from rad_database_parse_spark.catalog.io import load_table
from rad_database_parse_spark.llm.similarity import cosine

K = 10


def _topk(e, vec_col, k=K):
    a = e.select(F.col("vec_id").alias("id_a"), F.col(vec_col).alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col(vec_col).alias("vb"))
    w = Window.partitionBy("id_a").orderBy(
        F.col("sim").desc(), F.col("id_b").asc()
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") != F.col("id_b"))
        .withColumn("sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("id_a", "id_b")
    )


def test_quantized_topk_recall(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    comp = e.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "val"
        ),
    )
    st = comp.groupBy("dim").agg(
        F.min("val").alias("mn"), F.max("val").alias("mx")
    )
    # quantize → reconstruct each component at its bucket midpoint
    rec = (
        comp.join(F.broadcast(st), "dim")
        .withColumn(
            "q",
            F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
                F.floor(
                    (F.col("val") - F.col("mn"))
                    * 255.0
                    / (F.col("mx") - F.col("mn"))
                )
            ),
        )
        .withColumn(
            "rval",
            F.col("mn")
            + (F.col("q") + 0.5) * (F.col("mx") - F.col("mn")) / 255.0,
        )
        .groupBy("vec_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "rval"))
            ).alias("pairs")
        )
        .select(
            "vec_id",
            F.transform(F.col("pairs"), lambda p: p["rval"]).alias("rvec"),
        )
    )
    exact = {(r.id_a, r.id_b) for r in _topk(e, "embedding").collect()}
    quant = {
        (r.id_a, r.id_b)
        for r in _topk(rec.withColumnRenamed("rvec", "embedding"), "embedding").collect()
    }
    recall = len(exact & quant) / len(exact)
    # 8-bit per-dimension quantization on 64-dim vectors: near-lossless
    assert recall >= 0.9, f"quantized top-{K} recall {recall:.3f} < 0.9"
