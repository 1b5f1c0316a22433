from pyspark.sql import functions as F

from rad_database_parse_spark.operators.core import (
    anti_join_dedup,
    classify_title,
    continuation_union,
    exists_probe,
    normalize_expr,
    project_with_lineage,
    propagate_titles,
    row_density,
    row_validity_filter,
    semi_join,
    table_density_filter,
    top1_per_group,
    topk_per_group,
)


def test_normalize_expr(spark):
    df = spark.createDataFrame(
        [("  Foo\nBar   Baz ",), ("ALREADY ok",)], ["s"]
    ).select(normalize_expr("s").alias("n"))
    assert [r.n for r in df.collect()] == ["foo bar baz", "already ok"]


def test_classify_title_reference_semantics(spark):
    # keyword lists per reference tables.py:145-153; first-match-wins
    cases = [
        ("Principal Investigators", "principal_investigator"),
        ("List of Abbreviations", "abbreviation"),
        ("TID results for op-amps", "rad"),
        ("SEE Testing", "rad"),
        ("Dose rate summary", "rad"),
        ("Random heading", None),
        ("tidings of joy", None),  # word boundary: 'tidings' != 'tid'
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], ["title"]).select(
        "title", classify_title("title").alias("t")
    )
    got = {r.title: r.t for r in df.collect()}
    for title, expected in cases:
        assert got[title] == expected, title


def test_density_gates(spark):
    rows = [
        (1, "a", "b", "c", "d"),   # density 1.0
        (1, "a", None, "", "d"),   # density 0.5
        (2, None, None, "", "x"),  # density 0.25
        (2, None, None, None, ""), # density 0.0
    ]
    df = spark.createDataFrame(rows, ["tid", "v1", "v2", "v3", "v4"])
    dens = df.select(row_density(["v1", "v2", "v3", "v4"]).alias("d")).collect()
    assert [r.d for r in dens] == [1.0, 0.5, 0.25, 0.0]
    # table filter: table 1 mean=0.75 keeps, table 2 mean=0.125 drops
    kept = table_density_filter(df, ["tid"], ["v1", "v2", "v3", "v4"], 0.25)
    assert {r.tid for r in kept.collect()} == {1}
    valid = row_validity_filter(df, ["v1", "v2", "v3", "v4"], 0.5)
    assert valid.count() == 2


def test_continuation_union_and_title_propagation(spark):
    main = spark.createDataFrame(
        [(0, "h1"), (1, "r1"), (2, "r2")], ["row_idx", "val"]
    )
    cont = spark.createDataFrame([(0, "h1"), (1, "r3")], ["row_idx", "val"])
    out = continuation_union([main, cont])
    assert out.count() == 4  # continuation's repeated header dropped

    cells = spark.createDataFrame(
        [
            ("d.pdf", 1, 0, "Table A", 0, 0, "x"),
            ("d.pdf", 2, 0, None, 0, 0, "y"),      # page-break continuation
            ("d.pdf", 2, 1, "Table B", 0, 0, "z"),
            ("d.pdf", 3, 0, "", 0, 0, "w"),        # empty-string continuation
        ],
        ["doc_filename", "page", "table_idx", "table_title", "row_idx", "col_idx", "value"],
    )
    got = {
        (r.page, r.table_idx): r.effective_title
        for r in propagate_titles(cells).collect()
    }
    assert got == {(1, 0): "Table A", (2, 0): "Table A", (2, 1): "Table B", (3, 0): "Table B"}


def test_project_with_lineage(spark):
    df = spark.createDataFrame([("P1 ", "ACME\nCorp")], ["c0", "c1"])
    out = project_with_lineage(
        df, {"part_number": "c0", "manufacturer": "c1"}, "paper-key", "file.pdf"
    )
    r = out.collect()[0]
    assert r.part_number == "P1" and r.manufacturer == "ACME Corp"
    assert r.source_paper == "paper-key" and r.source_paper_filename == "file.pdf"


def test_anti_join_dedup_idempotent(spark):
    new = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    existing = spark.createDataFrame([(2, "b")], ["k", "v"])
    first = anti_join_dedup(new, existing)
    assert {(r.k, r.v) for r in first.collect()} == {(1, "a"), (3, "c")}
    # idempotence: re-ingesting the same batch after appending is a no-op
    appended = existing.unionByName(first)
    second = anti_join_dedup(new, appended)
    assert second.count() == 0


def test_semi_join_and_exists_probe(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    with_orders = semi_join(
        c.withColumnRenamed("c_custkey", "k"), o.withColumnRenamed("o_custkey", "k"), ["k"]
    )
    assert 0 < with_orders.count() <= c.count()
    assert exists_probe(o, F.col("o_orderpriority") == "1-URGENT")
    assert not exists_probe(o, F.col("o_orderpriority") == "NOPE")


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("g1", 3), ("g1", 1), ("g1", 2), ("g2", 9)], ["g", "x"]
    )
    top2 = topk_per_group(df, ["g"], [F.col("x").desc()], 2)
    assert {(r.g, r.x) for r in top2.collect()} == {("g1", 3), ("g1", 2), ("g2", 9)}
    top1 = top1_per_group(df, ["g"], [F.col("x").asc()])
    assert {(r.g, r.x) for r in top1.collect()} == {("g1", 1), ("g2", 9)}


def test_compact_parquet_reduces_file_count(spark, sf_dir, tmp_path):
    import pathlib

    from rad_database_parse_spark.catalog.io import compact_parquet, load_table

    src = str(tmp_path / "frag")
    # fragment: 64 tiny files
    load_table(spark, sf_dir, "orders").repartition(64).write.parquet(src)
    assert len(list(pathlib.Path(src).rglob("*.parquet"))) == 64
    dest = compact_parquet(spark, src, target_file_mb=128)
    files = list(pathlib.Path(dest).rglob("*.parquet"))
    assert len(files) <= 2  # sf0.001 orders is far under 128 MB
    assert (
        spark.read.parquet(dest).count()
        == load_table(spark, sf_dir, "orders").count()
    )


def test_deterministic_sample_stable_under_repartition(spark, sf_dir):
    from rad_database_parse_spark.registry.sampling_profile import (
        deterministic_sample,
    )

    base = deterministic_sample(spark, sf_dir)
    keys = sorted(
        (r["l_orderkey"], r["l_linenumber"]) for r in base.collect()
    )
    # same predicate over a differently-partitioned input picks the SAME rows
    from rad_database_parse_spark.catalog.io import load_table
    from pyspark.sql import functions as F
    from rad_database_parse_spark.registry.sampling_profile import _md5_bucket

    l = load_table(spark, sf_dir, "lineitem").repartition(17, "l_partkey")
    key = F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
    again = l.filter(_md5_bucket(key) < 5).select("l_orderkey", "l_linenumber")
    keys2 = sorted((r["l_orderkey"], r["l_linenumber"]) for r in again.collect())
    assert keys == keys2
