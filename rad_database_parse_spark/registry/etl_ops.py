"""Reference-pipeline ETL operators as oracle-checkable queries.

These express SURVEY §2A operators (classification, normalization, fuzzy
header mapping, density gates, abbreviation extraction/expansion, measure
parsing, merge/update/delete semantics) over the driver testdata — inputs
that need reference-shaped strings synthesize them deterministically from
table columns so both engines see identical data.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ..operators.core import classify_title, normalize_expr, row_density
from ..operators.header_map import distributed_header_map
from ..operators.measures import parse_measure_expr
from ..operators.mutate import delete_where, merge_upsert, update_where
from ._util import dbl, dec, t

# --------------------------------------------------------- A13 normalize
@register(
    "normalize_strings",
    """
    SELECT doc_id,
           lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm_text,
           length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS norm_len
    FROM documents
    """,
)
def normalize_strings(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    norm = normalize_expr("text")
    return d.select(
        "doc_id", norm.alias("norm_text"), F.length(norm).alias("norm_len")
    )


# --------------------------------------------------------- A9 classifier
_TITLE_SQL = """
    CASE doc_id % 5
      WHEN 0 THEN 'Principal Investigators'
      WHEN 1 THEN 'Abbreviations and Acronyms'
      WHEN 2 THEN 'TID Test Results for ' || source
      WHEN 3 THEN 'SEE and dose data'
      ELSE 'Unrelated heading'
    END
"""


@register(
    "classify_titles",
    f"""
    WITH titled AS (SELECT doc_id, {_TITLE_SQL} AS title FROM documents),
    typed AS (
      SELECT doc_id, title,
             CASE
               WHEN regexp_matches(lower(title), '\\b(principal|investigator)\\b')
                 THEN 'principal_investigator'
               WHEN regexp_matches(lower(title), '\\b(acronym|abbreviations)\\b')
                 THEN 'abbreviation'
               WHEN regexp_matches(lower(title), '\\b(tid|see|dd|ddd|seu|let|ongoing|dose|result)\\b')
                 THEN 'rad'
             END AS table_type
      FROM titled)
    SELECT table_type, COUNT(*) AS n FROM typed
    WHERE table_type IS NOT NULL GROUP BY table_type
    """,
)
def classify_titles(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    title = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("Principal Investigators"))
        .when(F.col("doc_id") % 5 == 1, F.lit("Abbreviations and Acronyms"))
        .when(F.col("doc_id") % 5 == 2, F.concat(F.lit("TID Test Results for "), F.col("source")))
        .when(F.col("doc_id") % 5 == 3, F.lit("SEE and dose data"))
        .otherwise(F.lit("Unrelated heading"))
    )
    return (
        d.select("doc_id", title.alias("title"))
        .withColumn("table_type", classify_title("title"))
        .filter(F.col("table_type").isNotNull())  # type_check drop (tables.py:117-126)
        .groupBy("table_type")
        .agg(F.count("*").alias("n"))
    )


# ------------------------------------------------- A10 fuzzy header map
_HEADERS = [
    (1, "Part Number"),
    (1, "Mfr."),
    (1, "Device Function"),
    (1, "Technology"),
    (1, "Deg. Level"),
    (1, "Dose Rate (rad/s)"),
    (1, "Notes"),
    (2, "Part  No."),
    (2, "Manufacturer"),
    (2, "LET (MeV cm2/mg)"),
    (2, "Proton Energy (MeV)"),
    (2, "Proton Fluence"),
    (2, "Results"),
    (2, "Spec?"),
]
_CANON = [
    "part_number", "manufacturer", "device_function", "technology", "results",
    "spec", "dose_rate", "proton_energy", "degradation_level", "proton_fluence",
]
_HEADERS_SQL = ", ".join(f"({tid}, '{h}')" for tid, h in _HEADERS)
_CANON_SQL = ", ".join(f"('{c}', '{c.replace('_', ' ')}')" for c in _CANON)


@register(
    "fuzzy_header_map",
    f"""
    WITH headers(table_id, header) AS (VALUES {_HEADERS_SQL}),
    canon(canonical, canon_text) AS (VALUES {_CANON_SQL}),
    scored AS (
      SELECT table_id, header, canonical,
             round(100.0 * (1.0 - CAST(levenshtein(
                      lower(trim(regexp_replace(header, '\\s+', ' ', 'g'))), canon_text) AS DOUBLE)
                    / greatest(length(lower(trim(regexp_replace(header, '\\s+', ' ', 'g')))),
                               length(canon_text))), 4) AS score
      FROM headers CROSS JOIN canon),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY table_id, canonical
                                   ORDER BY score DESC, header ASC) AS rn
      FROM scored)
    SELECT table_id, canonical, header AS matched_header, score
    FROM ranked WHERE rn = 1 AND score >= 60
    """,
)
def fuzzy_header_map(spark: SparkSession, sf_dir: str):
    headers = spark.createDataFrame(_HEADERS, ["table_id", "header"])
    return distributed_header_map(headers, spark, _CANON, threshold=60)


# -------------------------------------------------------- parse_measure
_MEASURE_RX = r"^\s*([A-Za-z]+)?\s*(<=|>=|[<>~=])?\s*(-?\d+(?:\.\d+)?)"


@register(
    "parse_measure",
    f"""
    WITH raw AS (
      SELECT l_orderkey, l_linenumber,
             CASE l_linenumber % 4
               WHEN 0 THEN '<' || CAST(CAST(l_quantity AS INT) AS VARCHAR)
               WHEN 1 THEN '>' || CAST(CAST(l_quantity AS INT) AS VARCHAR)
               WHEN 2 THEN 'HDR~' || CAST(CAST(l_quantity AS INT) AS VARCHAR) ||
                           '  LDR~' || CAST(CAST(l_quantity AS INT) // 2 AS VARCHAR)
               ELSE CAST(CAST(l_quantity AS INT) AS VARCHAR)
             END AS raw_measure
      FROM lineitem)
    SELECT l_orderkey, l_linenumber, raw_measure,
           coalesce(nullif(regexp_extract(raw_measure, '{_MEASURE_RX}', 2), ''), '=') AS op,
           CAST(nullif(regexp_extract(raw_measure, '{_MEASURE_RX}', 3), '') AS DOUBLE) AS value,
           nullif(regexp_extract(raw_measure, '{_MEASURE_RX}', 1), '') AS qualifier
    FROM raw
    """,
)
def parse_measure(spark: SparkSession, sf_dir: str):
    l = t(spark, sf_dir, "lineitem")
    qty_int = F.col("l_quantity").cast("int")
    raw = (
        F.when(F.col("l_linenumber") % 4 == 0, F.concat(F.lit("<"), qty_int.cast("string")))
        .when(F.col("l_linenumber") % 4 == 1, F.concat(F.lit(">"), qty_int.cast("string")))
        .when(
            F.col("l_linenumber") % 4 == 2,
            F.concat(
                F.lit("HDR~"), qty_int.cast("string"),
                F.lit("  LDR~"), (qty_int / 2).cast("int").cast("string"),
            ),
        )
        .otherwise(qty_int.cast("string"))
    )
    parsed = parse_measure_expr(F.col("raw_measure"))
    return (
        l.select("l_orderkey", "l_linenumber", raw.alias("raw_measure"))
        .withColumn("op", parsed["op"])
        .withColumn("value", parsed["value"])
        .withColumn("qualifier", parsed["qualifier"])
    )


# --------------------------------------------------- A5/A12 density gate
_DENS_VALS_SQL = [
    "nullif(l_returnflag, 'N')",
    "nullif(l_linestatus, 'F')",
    "nullif(CAST(l_linenumber AS VARCHAR), '1')",
    "nullif(CAST(CAST(l_quantity AS INT) % 10 AS VARCHAR), '0')",
]


@register(
    "density_row_filter",
    f"""
    WITH graded AS (
      SELECT l_orderkey, l_linenumber,
             (CAST({_DENS_VALS_SQL[0]} IS NOT NULL AS INT) +
              CAST({_DENS_VALS_SQL[1]} IS NOT NULL AS INT) +
              CAST({_DENS_VALS_SQL[2]} IS NOT NULL AS INT) +
              CAST({_DENS_VALS_SQL[3]} IS NOT NULL AS INT)) / 4.0 AS density
      FROM lineitem)
    SELECT l_orderkey, l_linenumber, density FROM graded WHERE density >= 0.5
    """,
)
def density_row_filter(spark: SparkSession, sf_dir: str):
    l = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("v0"),
        F.nullif(F.col("l_linestatus"), F.lit("F")).alias("v1"),
        F.nullif(F.col("l_linenumber").cast("string"), F.lit("1")).alias("v2"),
        F.nullif((F.col("l_quantity").cast("int") % 10).cast("string"), F.lit("0")).alias("v3"),
    )
    return (
        l.withColumn("density", row_density(["v0", "v1", "v2", "v3"]))
        .filter(F.col("density") >= 0.5)
        .select("l_orderkey", "l_linenumber", "density")
    )


# ------------------------------------------- A21 abbreviation extraction
@register(
    "abbrev_extract",
    """
    WITH cells AS (
      SELECT 'NAT' || CAST(n_nationkey AS VARCHAR) || ' = ' || n_name || chr(10) ||
             'REG' || CAST(n_regionkey AS VARCHAR) || ' = Region ' ||
             CAST(n_regionkey AS VARCHAR) || ' (see' || chr(10) || ' note)' AS cell
      FROM nation),
    recs AS (
      SELECT unnest(string_split(regexp_replace(cell, '\\(([^()]*)\\n([^()]*)\\)', '(\\1 \\2)', 'g'),
                    chr(10))) AS record
      FROM cells)
    SELECT DISTINCT trim(split_part(record, '=', 1)) AS abbreviation,
           trim(substr(record, instr(record, '=') + 1)) AS expansion
    FROM recs
    WHERE contains(record, '=')
      AND trim(split_part(record, '=', 1)) != ''
      AND trim(substr(record, instr(record, '=') + 1)) != ''
    """,
)
def abbrev_extract(spark: SparkSession, sf_dir: str):
    from ..operators.abbrev import extract_abbreviation_pairs

    n = t(spark, sf_dir, "nation")
    cell = F.concat(
        F.lit("NAT"), F.col("n_nationkey").cast("string"), F.lit(" = "), F.col("n_name"),
        F.lit("\n"),
        F.lit("REG"), F.col("n_regionkey").cast("string"), F.lit(" = Region "),
        F.col("n_regionkey").cast("string"), F.lit(" (see\n note)"),
    )
    cells = n.select(cell.alias("cell"))
    return extract_abbreviation_pairs(cells, "cell").select(
        "abbreviation", "expansion"
    ).distinct()


# ------------------------------------------- A22 abbreviation expansion
_ABBREV_DICT = [
    ("TID", "Total Ionizing Dose"),
    ("SEE", "Single Event Effects"),
    ("LET", "Linear Energy Transfer"),
    ("ELDRS", "Enhanced Low Dose Rate Sensitivity"),
]


@register(
    "abbrev_expand",
    """
    SELECT p_partkey,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             p_name || ' LET threshold, TID ok, SEE observed, ELDRS n/a',
             '\\bELDRS\\b', 'Enhanced Low Dose Rate Sensitivity', 'g'),
             '\\bTID\\b', 'Total Ionizing Dose', 'g'),
             '\\bSEE\\b', 'Single Event Effects', 'g'),
             '\\bLET\\b', 'Linear Energy Transfer', 'g') AS expanded
    FROM part
    """,
)
def abbrev_expand(spark: SparkSession, sf_dir: str):
    from ..operators.abbrev import expand_abbreviations

    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.concat(
            F.col("p_name"), F.lit(" LET threshold, TID ok, SEE observed, ELDRS n/a")
        ).alias("expanded"),
    )
    dictionary = spark.createDataFrame(_ABBREV_DICT, ["abbreviation", "expansion"])
    return expand_abbreviations(p, "expanded", dictionary)


# -------------------------------------------- A6 continuation propagation
@register(
    "continuation_propagate_titles",
    """
    WITH cells AS (
      SELECT 'doc' || CAST(o_custkey % 3 AS VARCHAR) AS doc_filename,
             CAST(o_orderkey % 7 AS INT) AS page,
             CAST(o_orderkey % 2 AS INT) AS table_idx,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL
                  WHEN o_orderkey % 5 = 1 THEN ''
                  ELSE 'Table ' || CAST(o_orderkey % 11 AS VARCHAR) END AS table_title,
             o_orderkey
      FROM orders WHERE o_orderkey % 13 = 0)
    SELECT doc_filename, page, table_idx, o_orderkey,
           last_value(nullif(trim(table_title), '') IGNORE NULLS)
             OVER (PARTITION BY doc_filename
                   ORDER BY page, table_idx, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS effective_title
    FROM cells
    """,
)
def continuation_propagate_titles(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    cells = o.select(
        F.concat(F.lit("doc"), (F.col("o_custkey") % 3).cast("string")).alias("doc_filename"),
        (F.col("o_orderkey") % 7).cast("int").alias("page"),
        (F.col("o_orderkey") % 2).cast("int").alias("table_idx"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None).cast("string"))
        .when(F.col("o_orderkey") % 5 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("Table "), (F.col("o_orderkey") % 11).cast("string")))
        .alias("table_title"),
        "o_orderkey",
    )
    w = (
        Window.partitionBy("doc_filename")
        .orderBy("page", "table_idx", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    title = F.nullif(F.trim(F.col("table_title")), F.lit(""))
    return cells.select(
        "doc_filename", "page", "table_idx", "o_orderkey",
        F.last(title, ignorenulls=True).over(w).alias("effective_title"),
    )


# ------------------------------------------------ A18 update semantics
@register(
    "update_where_segment",
    """
    SELECT CASE WHEN c_acctbal < 0 THEN 'DELINQUENT' ELSE c_mktsegment END AS segment,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS balance
    FROM customer GROUP BY 1
    """,
)
def update_where_segment(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    updated = update_where(
        c, F.col("c_acctbal") < 0, {"c_mktsegment": F.lit("DELINQUENT")}
    )
    return (
        updated.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n"), dbl(F.sum(dec("c_acctbal"))).alias("balance"))
    )


# ------------------------------------------ A19 delete-with-limit semantics
@register(
    "delete_limit_lowest",
    """
    WITH victims AS (
      SELECT c_custkey FROM customer WHERE c_acctbal < 0
      ORDER BY CAST(c_acctbal AS DECIMAL(12,2)), c_custkey LIMIT 100)
    SELECT COUNT(*) AS remaining,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS balance
    FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM victims)
    """,
)
def delete_limit_lowest(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    remaining = delete_where(
        c,
        F.col("c_acctbal") < 0,
        limit=100,
        order_by=[dec("c_acctbal").asc(), F.col("c_custkey").asc()],
    )
    return remaining.agg(
        F.count("*").alias("remaining"), dbl(F.sum(dec("c_acctbal"))).alias("balance")
    )


# ------------------------------------------------- A14/A17 merge upsert
@register(
    "merge_upsert_customers",
    """
    WITH source AS (
      SELECT c_custkey, c_name, c_nationkey,
             c_acctbal + 1000.0 AS c_acctbal, 'UPGRADED' AS c_mktsegment
      FROM customer WHERE c_custkey % 10 = 0)
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS balance
    FROM (
      SELECT * FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM source)
      UNION ALL
      SELECT * FROM source)
    GROUP BY c_mktsegment
    """,
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    source = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
        F.lit("UPGRADED").alias("c_mktsegment"),
    )
    merged = merge_upsert(c, source, ["c_custkey"])
    return merged.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), dbl(F.sum(dec("c_acctbal"))).alias("balance")
    )


# ----------------------------------------------- SCD2 dimension history
@register(
    "scd2_customer_history",
    """
    WITH source AS (
      SELECT c_custkey, c_name, c_nationkey,
             c_acctbal + 1000.0 AS c_acctbal, 'UPGRADED' AS c_mktsegment
      FROM customer WHERE c_custkey % 10 = 0)
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           TIMESTAMP '1900-01-01' AS valid_from,
           CASE WHEN c_custkey % 10 = 0 THEN TIMESTAMP '2024-06-01'
                ELSE CAST(NULL AS TIMESTAMP) END AS valid_to,
           c_custkey % 10 <> 0 AS is_current
    FROM customer
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           TIMESTAMP '2024-06-01' AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to,
           TRUE AS is_current
    FROM source
    """,
)
def scd2_customer_history(spark: SparkSession, sf_dir: str):
    """Type-2 slowly-changing dimension: the same upgrade batch as the
    merge query, but history-preserving — superseded versions close at the
    effective timestamp, new versions open, untouched rows stay current.
    The A18 update semantics with an audit trail instead of overwrite."""
    from ..operators.mutate import scd2_apply

    c = t(spark, sf_dir, "customer")
    source = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
        F.lit("UPGRADED").alias("c_mktsegment"),
    )
    return scd2_apply(c, source, ["c_custkey"], "2024-06-01")


# ------------------------------------------ A4 nearest-text title join
# Synthetic page geometry derived deterministically from documents: every
# quantity is integer arithmetic, so the Euclidean distance is the same
# double in both engines (IEEE sqrt is correctly rounded).
_GEOM_SQL = """
    tables AS (
      SELECT doc_id AS table_id, doc_id % 10 AS page,
             (doc_id * 37) % 500 AS x, (doc_id * 59) % 700 AS y
      FROM documents WHERE doc_id % 3 = 0),
    texts AS (
      SELECT doc_id AS text_id, (doc_id * 3) % 10 AS page,
             (doc_id * 17) % 500 AS tx, (doc_id * 23) % 700 AS ty,
             substr(text, 1, 10 + CAST(doc_id % 60 AS INT)) AS text
      FROM documents)
"""


@register(
    "nearest_title_join",
    f"""
    WITH {_GEOM_SQL},
    cand AS (
      SELECT table_id, text_id, text,
             round(sqrt((tx - x) * (tx - x) + (ty - y) * (ty - y)), 6) AS dist
      FROM tables JOIN texts USING (page)
      WHERE length(text) < 50),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY table_id
                                   ORDER BY dist, text, text_id) AS rn
      FROM cand WHERE dist <= 100)
    SELECT table_id, text AS title, text_id, dist FROM ranked WHERE rn = 1
    """,
)
def nearest_title_join(spark: SparkSession, sf_dir: str):
    """A4 (tables.py:19-49): per-table nearest qualifying text = top-1-by-
    distance theta join — page equi-join + window argmin, no Python."""
    from ..operators.spatial import nearest_text_title_join

    d = t(spark, sf_dir, "documents")
    tables = d.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("table_id"),
        (F.col("doc_id") % 10).alias("page"),
        ((F.col("doc_id") * 37) % 500).alias("x"),
        ((F.col("doc_id") * 59) % 700).alias("y"),
    )
    texts = d.select(
        F.col("doc_id").alias("text_id"),
        ((F.col("doc_id") * 3) % 10).alias("page"),
        ((F.col("doc_id") * 17) % 500).alias("tx"),
        ((F.col("doc_id") * 23) % 700).alias("ty"),
        F.col("text")
        .substr(F.lit(1), (F.lit(10) + F.col("doc_id") % 60).cast("int"))
        .alias("text"),
    )
    return nearest_text_title_join(tables, texts)


# -------------------------------------------- A7/A8 CSV sink + source
@register(
    "csv_roundtrip_region",
    """
    SELECT r_regionkey, r_name FROM region
    """,
)
def csv_roundtrip_region(spark: SparkSession, sf_dir: str):
    """A7/A8 (tables.py:99-115): CSV checkpoint write + reload with explicit
    schema — proves the csv sink/source round-trips values and types."""
    import tempfile

    d = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    path = tempfile.mkdtemp(prefix="csv_roundtrip_") + "/region"
    d.write.mode("overwrite").option("header", True).csv(path)
    return (
        spark.read.schema("r_regionkey INT, r_name STRING")
        .option("header", True)
        .csv(path)
    )


# ----------------------------------------------- JSON sink + source
@register(
    "json_roundtrip_orders",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def json_roundtrip_orders(spark: SparkSession, sf_dir: str):
    """JSON-lines sink + source round-trip with explicit read schema (ints
    and strings — exact under text serialization)."""
    import tempfile

    d = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    )
    path = tempfile.mkdtemp(prefix="json_roundtrip_") + "/orders"
    d.write.mode("overwrite").json(path)
    return spark.read.schema(
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, o_orderpriority STRING"
    ).json(path)


# ----------------------------------- E1 composed pipeline (main.py:83-108)
# The reference's whole ingest loop as ONE declarative plan: synthesize an
# extracted cell-grid from `documents`, classify titles (A9), drop low-
# density rows (A5/A12), normalize strings (A13), project + lineage (A11),
# and exact-dedup (A14) — per-row Python loops become five Catalyst stages.
_E1_CELLS_SQL = """
    grid AS (
      SELECT doc_id, source,
             CASE doc_id % 5
               WHEN 0 THEN 'Principal Investigators'
               WHEN 1 THEN 'Abbreviations and Acronyms'
               WHEN 2 THEN 'TID Test Results for ' || source
               WHEN 3 THEN 'SEE and dose data'
               ELSE 'Unrelated heading' END AS title,
             unnest([1, 2, 3]) AS row_idx
      FROM documents),
    cells AS (
      SELECT doc_id, source, title, row_idx,
             'P-' || CAST(doc_id AS VARCHAR) || '-' ||
               CAST(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE row_idx END AS VARCHAR)
               AS part_number,
             CASE WHEN (doc_id + row_idx) % 4 = 0 THEN NULL
                  ELSE '  Vendor ' || CAST(doc_id % 13 AS VARCHAR) || '  ' END
               AS manufacturer,
             CASE WHEN (doc_id + row_idx) % 3 = 0 THEN NULL
                  ELSE 'pass <' || CAST((doc_id * row_idx) % 90 AS VARCHAR) END
               AS results
      FROM grid)
"""


@register(
    "etl_pipeline_end_to_end",
    f"""
    WITH {_E1_CELLS_SQL},
    classified AS (
      SELECT * FROM cells
      WHERE regexp_matches(lower(title),
            '\\b(tid|see|dd|ddd|seu|let|ongoing|dose|result|results)\\b')
        AND NOT regexp_matches(lower(title), '\\b(principal|investigator|investigators)\\b')
        AND NOT regexp_matches(lower(title), '\\b(abbreviation|abbreviations|acronym|acronyms)\\b')
    ),
    dense AS (
      SELECT * FROM classified
      WHERE (CAST(part_number IS NOT NULL AS INT) +
             CAST(manufacturer IS NOT NULL AS INT) +
             CAST(results IS NOT NULL AS INT)) / 3.0 >= 0.5),
    projected AS (
      SELECT lower(trim(regexp_replace(part_number, '\\s+', ' ', 'g'))) AS part_number,
             lower(trim(regexp_replace(manufacturer, '\\s+', ' ', 'g'))) AS manufacturer,
             lower(trim(regexp_replace(results, '\\s+', ' ', 'g'))) AS results,
             title AS source_paper, source AS source_paper_filename
      FROM dense)
    SELECT DISTINCT part_number, manufacturer, results,
                    source_paper, source_paper_filename
    FROM projected
    """,
)
def etl_pipeline_end_to_end(spark: SparkSession, sf_dir: str):
    from ..operators.core import (
        classify_title,
        normalize_expr,
        project_with_lineage,
        row_density,
    )

    d = t(spark, sf_dir, "documents")
    title = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("Principal Investigators"))
        .when(F.col("doc_id") % 5 == 1, F.lit("Abbreviations and Acronyms"))
        .when(F.col("doc_id") % 5 == 2, F.concat(F.lit("TID Test Results for "), F.col("source")))
        .when(F.col("doc_id") % 5 == 3, F.lit("SEE and dose data"))
        .otherwise(F.lit("Unrelated heading"))
    )
    grid = d.select(
        "doc_id", "source", title.alias("title"),
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("row_idx"),
    )
    dup_row = F.when(F.col("doc_id") % 7 == 0, F.lit(1)).otherwise(F.col("row_idx"))
    cells = grid.select(
        "doc_id", "source", "title", "row_idx",
        F.concat(F.lit("P-"), F.col("doc_id").cast("string"), F.lit("-"),
                 dup_row.cast("string")).alias("part_number"),
        F.when((F.col("doc_id") + F.col("row_idx")) % 4 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("  Vendor "), (F.col("doc_id") % 13).cast("string"), F.lit("  "))
        ).alias("manufacturer"),
        F.when((F.col("doc_id") + F.col("row_idx")) % 3 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("pass <"), ((F.col("doc_id") * F.col("row_idx")) % 90).cast("string"))
        ).alias("results"),
    )
    classified = cells.withColumn("table_type", classify_title("title")).filter(
        F.col("table_type") == "rad"
    )
    dense = classified.filter(
        row_density(["part_number", "manufacturer", "results"]) >= 0.5
    )
    normalized = dense.select(
        "title", "source",
        normalize_expr("part_number").alias("part_number"),
        normalize_expr("manufacturer").alias("manufacturer"),
        normalize_expr("results").alias("results"),
    )
    projected = project_with_lineage(
        normalized,
        {"part_number": "part_number", "manufacturer": "manufacturer", "results": "results"},
        source_paper=F.col("title"), source_paper_filename=F.col("source"),
    )
    return projected.dropDuplicates()


# ------------------------------- A21 via Python UDTF (same oracle as above)
@register(
    "abbrev_extract_udtf",
    """
    WITH cells AS (
      SELECT 'NAT' || CAST(n_nationkey AS VARCHAR) || ' = ' || n_name || chr(10) ||
             'REG' || CAST(n_regionkey AS VARCHAR) || ' = Region ' ||
             CAST(n_regionkey AS VARCHAR) || ' (see' || chr(10) || ' note)' AS cell
      FROM nation),
    recs AS (
      SELECT unnest(string_split(regexp_replace(cell, '\\(([^()]*)\\n([^()]*)\\)', '(\\1 \\2)', 'g'),
                    chr(10))) AS record
      FROM cells)
    SELECT DISTINCT trim(split_part(record, '=', 1)) AS abbreviation,
           trim(substr(record, instr(record, '=') + 1)) AS expansion
    FROM recs
    WHERE contains(record, '=')
      AND trim(split_part(record, '=', 1)) != ''
      AND trim(substr(record, instr(record, '=') + 1)) != ''
    """,
)
def abbrev_extract_udtf(spark: SparkSession, sf_dir: str):
    """Same extraction as ``abbrev_extract`` but through a registered Python
    UDTF (lateral join in SQL) — covers the 1-row→N-rows Python fan-out
    surface (SURVEY A21: "exactly the UDTF pattern")."""
    from ..operators.abbrev import abbreviation_pairs_udtf

    spark.udtf.register("abbrev_pairs", abbreviation_pairs_udtf())
    n = t(spark, sf_dir, "nation")
    cell = F.concat(
        F.lit("NAT"), F.col("n_nationkey").cast("string"), F.lit(" = "), F.col("n_name"),
        F.lit("\n"),
        F.lit("REG"), F.col("n_regionkey").cast("string"), F.lit(" = Region "),
        F.col("n_regionkey").cast("string"), F.lit(" (see\n note)"),
    )
    n.select(cell.alias("cell")).createOrReplaceTempView("abbrev_cells_udtf")
    return spark.sql(
        "SELECT DISTINCT p.abbreviation, p.expansion "
        "FROM abbrev_cells_udtf, LATERAL abbrev_pairs(cell) p"
    )


# ----------------------------- A1/A2 via Spark 4 Python DataSource
@register(
    "pdf_datasource_stub_grid",
    """
    WITH ids AS (SELECT unnest(range(20)) AS i),
    r AS (SELECT unnest(range(2)) AS row_idx),
    c AS (SELECT unnest(range(2)) AS col_idx),
    named AS (SELECT 'doc_' || CAST(i AS VARCHAR) || '.pdf' AS doc_filename FROM ids)
    SELECT doc_filename,
           doc_filename || ':title' AS doc_title,
           1 AS page, 0 AS table_idx, 'Stub Table' AS table_title,
           CAST(row_idx AS INT) AS row_idx, CAST(col_idx AS INT) AS col_idx,
           doc_filename || ':' || CAST(row_idx AS VARCHAR) || ':'
             || CAST(col_idx AS VARCHAR) AS value
    FROM named CROSS JOIN r CROSS JOIN c
    """,
)
def pdf_datasource_stub_grid(spark: SparkSession, sf_dir: str):
    """The PDF corpus surface (A1 directory scan + A2 per-file extraction)
    through the Spark 4 Python DataSource: one InputPartition per file, the
    deterministic stub grid standing in for the absent camelot toolchain.
    The oracle reproduces the stub construction, so the partition planning
    + per-file reader path is what the hash-compare exercises."""
    import os
    import tempfile

    from ..sources.pdf_datasource import register_pdf_datasource

    d = tempfile.mkdtemp(prefix="pdf_ds_") + "/docs"
    os.makedirs(d, exist_ok=True)
    for i in range(20):
        with open(f"{d}/doc_{i}.pdf", "wb") as fh:
            fh.write(b"%PDF-1.4 synthetic")
    register_pdf_datasource(spark)
    return (
        spark.read.format("pdf")
        .option("stub", "true")
        .load(d)
        .withColumn("page", F.col("page").cast("long"))
        .withColumn("table_idx", F.col("table_idx").cast("long"))
    )


# ----------------------------------------------- text + ORC sinks/sources
@register(
    "text_roundtrip_doclines",
    """
    SELECT lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS value
    FROM documents WHERE doc_id % 10 = 0
    """,
)
def text_roundtrip_doclines(spark: SparkSession, sf_dir: str):
    """Line-oriented text sink + source: one normalized document per line
    (normalization strips the newlines that would split records)."""
    import tempfile

    from ..operators.core import normalize_expr

    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select(normalize_expr("text").alias("value"))
    )
    path = tempfile.mkdtemp(prefix="text_roundtrip_") + "/docs"
    d.write.mode("overwrite").text(path)
    return spark.read.text(path)


@register(
    "orc_roundtrip_supplier",
    """
    SELECT s_suppkey, s_name, s_nationkey,
           CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
    FROM supplier
    """,
)
def orc_roundtrip_supplier(spark: SparkSession, sf_dir: str):
    """Columnar ORC sink + source round-trip (type-preserving, unlike the
    text formats)."""
    import tempfile

    d = t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", dbl(dec("s_acctbal")).alias("acctbal")
    )
    path = tempfile.mkdtemp(prefix="orc_roundtrip_") + "/supplier"
    d.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


# ------------------------------------------------- XML sink + source
@register(
    "xml_roundtrip_nation",
    """
    SELECT n_nationkey, n_regionkey, n_name FROM nation
    """,
)
def xml_roundtrip_nation(spark: SparkSession, sf_dir: str):
    """Spark 4 native XML sink + source round-trip (rowTag records,
    explicit read schema) — extends the format matrix past
    csv/json/text/orc/parquet."""
    import tempfile

    d = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    path = tempfile.mkdtemp(prefix="xml_roundtrip_") + "/nation"
    d.write.format("xml").option("rootTag", "nations").option(
        "rowTag", "nation"
    ).mode("overwrite").save(path)
    return (
        spark.read.schema("n_nationkey INT, n_regionkey INT, n_name STRING")
        .format("xml")
        .option("rowTag", "nation")
        .load(path)
    )


# --------------------------------------- rad_id back-reference (list of ids)
@register(
    "part_rad_backref",
    """
    WITH backref AS (
      -- the reference's "list unique ids" back-reference per part
      SELECT l_partkey, list_sort(list(DISTINCT l_orderkey)) AS rad_ids
      FROM lineitem GROUP BY l_partkey),
    exploded AS (
      SELECT l_partkey, UNNEST(rad_ids) AS rad_id FROM backref)
    SELECT p.p_brand,
           COUNT(*) AS n_links,
           COUNT(DISTINCT e.l_partkey) AS n_parts,
           COUNT(DISTINCT e.rad_id) AS n_rad_entries
    FROM exploded e JOIN part p ON e.l_partkey = p.p_partkey
                    JOIN orders o ON e.rad_id = o.o_orderkey
    GROUP BY p.p_brand
    """,
)
def part_rad_backref(spark: SparkSession, sf_dir: str):
    """The reference's part→radiation back-reference: each part row carries
    a LIST of rad_table ids (`rad_id INTEGER NOT NULL`, database.py:274;
    workflow comment "back reference the radiation (list unique ids)",
    main.py:62-64). Spark-first: materialize the back-ref as an
    ArrayType(Long) column via sort_array(collect_set(...)), then consume
    it with explode + joins back to the referenced entries — the read path
    a user of the reference's list-of-ids design needs. The per-brand
    rollup keeps the output deterministic for the oracle."""
    li = t(spark, sf_dir, "lineitem")
    backref = li.groupBy("l_partkey").agg(
        F.sort_array(F.collect_set("l_orderkey")).alias("rad_ids")
    )
    exploded = backref.select(
        "l_partkey", F.explode("rad_ids").alias("rad_id")
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    o = t(spark, sf_dir, "orders").select("o_orderkey")
    return (
        exploded.join(p, exploded.l_partkey == p.p_partkey)
        .join(o, exploded.rad_id == o.o_orderkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_links"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("rad_id").alias("n_rad_entries"),
        )
    )


# ------------------------------------------------- paper_table dimension
@register(
    "paper_dim_join",
    """
    WITH paper_table AS (
      SELECT paper_name,
             ROW_NUMBER() OVER (ORDER BY paper_name) AS paper_id
      FROM (SELECT DISTINCT source AS paper_name FROM documents))
    SELECT pt.paper_id, pt.paper_name,
           COUNT(*) AS n_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
    FROM documents d JOIN paper_table pt ON d.source = pt.paper_name
    GROUP BY pt.paper_id, pt.paper_name
    """,
)
def paper_dim_join(spark: SparkSession, sf_dir: str):
    """The reference's paper registry dimension (`paper_table(id,
    paper_name)`, database.py:77-81) built and consumed in one query:
    distinct sources get a deterministic surrogate id (row_number over the
    name — the Spark form of AUTOINCREMENT for a static load), the fact
    table joins the broadcast dimension, and the rollup carries both the
    surrogate and the natural key so lineage survives."""
    d = t(spark, sf_dir, "documents")
    dim = (
        d.select(F.col("source").alias("paper_name"))
        .distinct()
        .withColumn(
            "paper_id", F.row_number().over(Window.orderBy("paper_name"))
        )
    )
    return (
        d.join(F.broadcast(dim), d.source == dim.paper_name)
        .groupBy("paper_id", "paper_name")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# ------------------------------------- SCD2 point-in-time (temporal) join
@register(
    "scd2_pointintime_join",
    """
    WITH dim AS (
      SELECT c_custkey, c_mktsegment,
             TIMESTAMP '1900-01-01' AS valid_from,
             CASE WHEN c_custkey % 10 = 0 THEN TIMESTAMP '1998-01-01'
                  ELSE CAST(NULL AS TIMESTAMP) END AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey, 'UPGRADED' AS c_mktsegment,
             TIMESTAMP '1998-01-01' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM customer WHERE c_custkey % 10 = 0)
    SELECT d.c_mktsegment AS segment_at_order_time,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders o JOIN dim d
      ON o.o_custkey = d.c_custkey
         AND o.o_orderdate >= d.valid_from
         AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
    GROUP BY 1
    """,
)
def scd2_pointintime_join(spark: SparkSession, sf_dir: str):
    """Point-in-time lookup against a type-2 dimension: each fact row joins
    the version whose [valid_from, valid_to) interval contains the event
    time — the temporal-correctness primitive that makes SCD2 history
    usable (training-data term: no leakage of future attributes into past
    examples). The equi-key carries the join; the interval predicate is a
    residual filter, so this stays a hash join on c_custkey — versions per
    key are few, making the residual cheap. Effective date 1998-01-01
    splits the order span so both version branches are exercised."""
    from ..operators.mutate import scd2_apply

    c = t(spark, sf_dir, "customer")
    source = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        F.lit("UPGRADED").alias("c_mktsegment"),
    )
    dim = scd2_apply(c, source, ["c_custkey"], "1998-01-01").select(
        "c_custkey", "c_mktsegment", "valid_from", "valid_to"
    )
    o = t(spark, sf_dir, "orders")
    return (
        o.join(
            dim,
            (o.o_custkey == dim.c_custkey)
            & (o.o_orderdate >= dim.valid_from)
            & (dim.valid_to.isNull() | (o.o_orderdate < dim.valid_to)),
        )
        .groupBy(F.col("c_mktsegment").alias("segment_at_order_time"))
        .agg(
            F.count("*").alias("n_orders"),
            dbl(F.sum(dec("o_totalprice"))).alias("total"),
        )
    )


# --------------------------------------------------- NULL semantics suite
@register(
    "null_semantics_suite",
    """
    WITH v AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN NULL
                  ELSE CAST(c_acctbal AS DECIMAL(12,2)) END AS val,
             CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      FROM customer)
    SELECT c_custkey,
           CAST(val AS DOUBLE) AS val,
           (val IS NOT DISTINCT FROM bal) AS ns_eq,
           (val IS DISTINCT FROM bal) AS ns_neq,
           CAST(nullif(bal, val) AS DOUBLE) AS nullif_same,
           CAST(COALESCE(val, -1) AS DOUBLE) AS coalesced,
           CASE WHEN val IS NULL THEN 'missing' ELSE 'present' END AS presence,
           ROW_NUMBER() OVER (ORDER BY val ASC NULLS FIRST, c_custkey)
             AS rn_nulls_first,
           ROW_NUMBER() OVER (ORDER BY val DESC NULLS LAST, c_custkey)
             AS rn_nulls_last
    FROM v
    """,
)
def null_semantics_suite(spark: SparkSession, sf_dir: str):
    """Three-valued-logic surface in one pass: null-safe equality
    (<=> / IS [NOT] DISTINCT FROM), NULLIF collapse, COALESCE defaults,
    NULL-presence classification, and both NULLS FIRST / NULLS LAST window
    orderings — the semantics every dialect pair silently disagrees on
    until pinned by a gate."""
    c = t(spark, sf_dir, "customer")
    v = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .otherwise(dec("c_acctbal"))
        .alias("val"),
        dec("c_acctbal").alias("bal"),
    )
    w_first = Window.orderBy(F.col("val").asc_nulls_first(), F.col("c_custkey"))
    w_last = Window.orderBy(F.col("val").desc_nulls_last(), F.col("c_custkey"))
    return v.select(
        "c_custkey",
        dbl(F.col("val")).alias("val"),
        F.col("val").eqNullSafe(F.col("bal")).alias("ns_eq"),
        (~F.col("val").eqNullSafe(F.col("bal"))).alias("ns_neq"),
        dbl(F.nullif(F.col("bal"), F.col("val"))).alias("nullif_same"),
        dbl(F.coalesce(F.col("val"), F.lit(-1))).alias("coalesced"),
        F.when(F.col("val").isNull(), F.lit("missing"))
        .otherwise(F.lit("present"))
        .alias("presence"),
        F.row_number().over(w_first).alias("rn_nulls_first"),
        F.row_number().over(w_last).alias("rn_nulls_last"),
    )


# ------------------------------------ schema evolution (mergeSchema)
@register(
    "schema_evolution_merge",
    """
    WITH unioned AS (
      SELECT o_orderkey,
             CAST(o_totalprice AS DECIMAL(12,2)) AS price,
             CAST(NULL AS VARCHAR) AS o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey,
             CAST(o_totalprice AS DECIMAL(12,2)) AS price,
             o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 1)
    SELECT COALESCE(o_orderpriority, '<pre-evolution>') AS priority,
           COUNT(*) AS n,
           CAST(SUM(price) AS DOUBLE) AS total_price
    FROM unioned GROUP BY 1
    """,
)
def schema_evolution_merge(spark: SparkSession, sf_dir: str):
    """Schema evolution at the source: two parquet epochs of the same
    table — the old files WITHOUT a column that later epochs added — read
    back as one DataFrame via mergeSchema, with the missing column
    correctly NULL for pre-evolution files. This is the mechanics every
    long-lived lake table relies on when a column lands mid-history
    (the alternative is rewriting 100 TB of history for one new field).

    Plan note: mergeSchema pays one footer read per file at planning —
    fine for a bounded epoch directory; at very large file counts you
    pin the merged schema explicitly and skip the inference pass."""
    import os
    import tempfile

    # per-PID dir + overwrite mode: repeated runs in ONE process replace
    # the epochs instead of accumulating mkdtemp copies, while concurrent
    # gate + bench processes can no longer corrupt each other's epochs
    # (ADVICE r3: a shared fixed path raced under parallel runs)
    base = f"{tempfile.gettempdir()}/spark_graft_schema_evo_{os.getpid()}/orders"
    o = t(spark, sf_dir, "orders")
    o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", dec("o_totalprice").alias("price")
    ).write.mode("overwrite").parquet(f"{base}/epoch=1")
    o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", dec("o_totalprice").alias("price"), "o_orderpriority"
    ).write.mode("overwrite").parquet(f"{base}/epoch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    return (
        merged.groupBy(
            F.coalesce("o_orderpriority", F.lit("<pre-evolution>")).alias(
                "priority"
            )
        )
        .agg(
            F.count("*").alias("n"),
            dbl(F.sum("price")).alias("total_price"),
        )
    )


# --------------------------- dynamic partition overwrite (A18 at scale)
@register(
    "dynamic_partition_overwrite",
    """
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                         THEN CAST(o_totalprice AS DECIMAL(12,2)) * 2
                         ELSE CAST(o_totalprice AS DECIMAL(12,2)) END)
                AS DOUBLE) AS total_price
    FROM orders GROUP BY 1
    """,
)
def dynamic_partition_overwrite(spark: SparkSession, sf_dir: str):
    """Partition-scoped mutation — the reference's UPDATE (database.py:
    35-41) done the way a partitioned lake table actually does it: write
    the table partitioned by priority, then overwrite ONLY the 1-URGENT
    partition with updated rows (partitionOverwriteMode=dynamic). The
    other partitions' files are untouched — a 100 TB table pays for the
    partitions it changes, not a full rewrite; the read-back proves the
    untouched partitions still carry their original rows alongside the
    mutated slice."""
    import os
    import tempfile

    # per-PID for the same concurrent-runs reason as schema_evolution_merge
    base = f"{tempfile.gettempdir()}/spark_graft_dyn_overwrite_{os.getpid()}/orders"
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", dec("o_totalprice").alias("price"), "o_orderpriority"
    )
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(base)
    updated = o.filter(F.col("o_orderpriority") == "1-URGENT").withColumn(
        "price", (F.col("price") * 2).cast("decimal(12,2)")
    )
    updated.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("o_orderpriority").parquet(base)
    return (
        spark.read.parquet(base)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n"),
            dbl(F.sum("price")).alias("total_price"),
        )
    )
