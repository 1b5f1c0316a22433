"""Tests for the A4 spatial title join, embedding near-dup pairs, and the
applyInPandasWithState custom stateful operator."""

import math

from pyspark.sql import functions as F

from rad_database_parse_spark.catalog.io import load_table
from rad_database_parse_spark.llm.similarity import cosine_neardup_pairs
from rad_database_parse_spark.operators.spatial import nearest_text_title_join
from rad_database_parse_spark.streaming.events import (
    read_events_stream,
    run_stream_to_memory,
    stateful_user_totals,
)


def test_nearest_text_picks_closest_and_gates(spark):
    tables = spark.createDataFrame(
        [(1, 0, 100, 100), (2, 0, 400, 400), (3, 1, 0, 0)],
        ["table_id", "page", "x", "y"],
    )
    texts = spark.createDataFrame(
        [
            (10, 0, 105, 110, "Near title"),       # dist ~11.2 from table 1
            (11, 0, 160, 180, "Farther title"),    # dist ~100.0 from table 1
            (12, 0, 401, 401, "x" * 60),           # nearest to table 2 but too long
            (13, 0, 420, 430, "Table 2 title"),    # qualifying for table 2
            (14, 1, 300, 300, "Beyond radius"),    # dist >100 from table 3
        ],
        ["text_id", "page", "tx", "ty", "text"],
    )
    got = {
        r.table_id: (r.title, r.text_id)
        for r in nearest_text_title_join(tables, texts).collect()
    }
    assert got[1] == ("Near title", 10)
    assert got[2] == ("Table 2 title", 13)  # long text skipped
    assert 3 not in got  # nothing within 100pt


def test_nearest_text_tie_breaks_deterministically(spark):
    tables = spark.createDataFrame([(1, 0, 0, 0)], ["table_id", "page", "x", "y"])
    texts = spark.createDataFrame(
        [(20, 0, 3, 4, "b title"), (21, 0, 4, 3, "a title")],
        ["text_id", "page", "tx", "ty", "text"],
    )  # equal distance 5.0 → lexicographic text wins
    row = nearest_text_title_join(tables, texts).collect()[0]
    assert (row.title, row.text_id) == ("a title", 21)


def test_cosine_neardup_symmetric_and_thresholded(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0] * 64),
            (2, [1.0] * 63 + [0.9]),  # nearly identical to 1
            (3, [-1.0] * 64),          # different sign bucket entirely
        ],
        ["vec_id", "embedding"],
    )
    pairs = {
        (r.id_a, r.id_b): r.sim
        for r in cosine_neardup_pairs(emb, threshold=0.9).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] > 0.99


def test_stateful_user_totals_equals_batch(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_stateful"))
    e = load_table(spark, sf_dir, "events")
    e.repartition(2).write.mode("overwrite").parquet(out)

    run_stream_to_memory(
        stateful_user_totals(read_events_stream(spark, out)),
        "stateful_test_out",
        mode="update",
    )
    final = (
        spark.sql("SELECT * FROM stateful_test_out")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
    )
    got = {r.user_id: (r.n_events, r.total_value) for r in final.collect()}
    want = {
        r.user_id: (r.n, r.tv)
        for r in e.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert set(got) == set(want)
    for u, (n, tv) in want.items():
        assert got[u][0] == n
        assert math.isclose(got[u][1], tv, rel_tol=1e-9)
