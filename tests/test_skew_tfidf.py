"""Tests: salting equivalence, approx-distinct tolerance, TF-IDF semantics."""

from pyspark.sql import functions as F

from rad_database_parse_spark.catalog.io import load_table
from rad_database_parse_spark.llm.text import tfidf_top_terms
from rad_database_parse_spark.operators.skew import (
    salted_equi_join,
    salted_groupby_count,
)


def _hot_key_df(spark):
    # one hot key (0) with 1000 rows, 10 cold keys with 10 each
    rows = [(0, i) for i in range(1000)] + [(k, i) for k in range(1, 11) for i in range(10)]
    return spark.createDataFrame(rows, ["k", "row_id"])


def test_salted_join_equals_plain_join(spark):
    big = _hot_key_df(spark)
    dim = spark.createDataFrame([(k, f"seg{k % 3}") for k in range(11)], ["k", "seg"])
    salted = salted_equi_join(big, dim, "k", n_salts=4, salt_source="row_id")
    plain = big.join(dim, "k")
    assert salted.count() == plain.count() == 1100
    s = salted.groupBy("seg").count().orderBy("seg").collect()
    p = plain.groupBy("seg").count().orderBy("seg").collect()
    assert [tuple(r) for r in s] == [tuple(r) for r in p]


def test_salted_count_equals_plain_count(spark):
    df = _hot_key_df(spark)
    got = {r.k: r.n for r in salted_groupby_count(df, "k", 4, "row_id").collect()}
    want = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    assert got == want


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    both = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    )
    for r in both.collect():
        assert abs(r.approx - r.exact) <= max(0.05 * r.exact, 2)


def test_tfidf_ubiquitous_term_scores_zero(spark):
    docs = spark.createDataFrame(
        [(1, "common alpha alpha"), (2, "common beta"), (3, "common gamma")],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(docs, "text", "doc_id", k=3)
    rows = {(r.doc_id, r.token): r.tfidf for r in out.collect()}
    # 'common' appears in every doc → ln(3/3)=0
    assert rows[(1, "common")] == 0.0
    # 'alpha' tf=2, df=1 → 2·ln(3) ≈ 2.197 — ranked first for doc 1
    top_doc1 = [r for r in out.collect() if r.doc_id == 1 and r.rk == 1][0]
    assert top_doc1.token == "alpha" and top_doc1.tfidf > 2.0
