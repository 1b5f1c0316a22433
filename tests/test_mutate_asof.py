import datetime as dt

from pyspark.sql import functions as F

from rad_database_parse_spark.operators.asof import asof_join
from rad_database_parse_spark.operators.mutate import (
    delete_where,
    merge_upsert,
    update_where,
)


def test_update_where(spark):
    df = spark.createDataFrame([(1, 10), (2, -5)], ["k", "v"])
    out = update_where(df, F.col("v") < 0, {"v": F.lit(0)})
    assert {(r.k, r.v) for r in out.collect()} == {(1, 10), (2, 0)}


def test_delete_where_plain_and_limit(spark):
    df = spark.createDataFrame([(i, i % 2) for i in range(10)], ["k", "m"])
    assert delete_where(df, F.col("m") == 1).count() == 5
    # LIMIT 2: delete only the two smallest matching keys
    out = delete_where(df, F.col("m") == 1, limit=2, order_by=[F.col("k")])
    kept = {r.k for r in out.collect()}
    assert kept == {0, 2, 4, 6, 8, 5, 7, 9}


def test_merge_upsert(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    source = spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"])
    out = merge_upsert(target, source, ["k"])
    assert {(r.k, r.v) for r in out.collect()} == {(1, "a"), (2, "B"), (3, "c")}


def test_asof_join_matches_naive(spark):
    ts = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00"), "L1"), (1, ts("2024-01-01 12:00"), "L2"),
         (2, ts("2024-01-01 09:00"), "L3")],
        ["k", "lt", "lname"],
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:30"), 100.0), (1, ts("2024-01-01 11:00"), 200.0),
         (2, ts("2024-01-01 09:00"), 300.0)],
        ["k", "rt", "price"],
    )
    out = asof_join(left, right, on="k", left_time="lt", right_time="rt",
                    value_cols=["price"])
    got = {r.lname: r.price for r in out.collect()}
    # L1 sees 09:30→100; L2 sees 11:00→200; L3 ties at 09:00→300 (<= semantics)
    assert got == {"L1": 100.0, "L2": 200.0, "L3": 300.0}

def test_delete_where_keeps_null_predicate_rows(spark):
    # SQL DELETE removes only predicate-TRUE rows; NULL predicate keeps them.
    df = spark.createDataFrame(
        [(1, 1), (2, 0), (3, None)], ["k", "m"]
    )
    assert {r.k for r in delete_where(df, F.col("m") == 1).collect()} == {2, 3}
    out = delete_where(df, F.col("m") == 1, limit=5, order_by=[F.col("k")])
    assert {r.k for r in out.collect()} == {2, 3}
