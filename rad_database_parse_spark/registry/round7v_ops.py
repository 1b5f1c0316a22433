"""Round-7v operators: a count-min-sketch width sweep, binary-payload
entropy screening, price-ending forensics, a brand-switching matrix,
the named-WINDOW-clause SQL surface, and a dedup threshold
sensitivity sweep.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. events_cms_width_sweep — sketch accuracy vs width
# ------------------------------------------------------------------

_CMSW_D = 4
_CMSW_WIDTHS = (32, 64, 128)
_CMSW_K = 25


def _cmsw_hash_duck(j: str, key: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({j} AS VARCHAR) || ':' ||"
        f" CAST({key} AS VARCHAR)), 1, 6)) AS BIGINT)"
    )


def _cmsw_hash_spark(j: str, key: str) -> str:
    return (
        f"CAST(conv(substr(md5(concat(CAST({j} AS STRING), ':',"
        f" CAST({key} AS STRING))), 1, 6), 16, 10) AS BIGINT)"
    )


def _cmsw_oracle() -> str:
    width_blocks = []
    for w in _CMSW_WIDTHS:
        width_blocks.append(
            f"""
      SELECT {w} AS w, j, h % {w} AS bucket,
             CAST(SUM(c) AS BIGINT) AS c
      FROM hashed GROUP BY 1, 2, 3"""
        )
    return f"""
    WITH perkey AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1),
    hashed AS (
      SELECT p.user_id, p.c, u.j,
             {_cmsw_hash_duck('u.j', 'p.user_id')} AS h
      FROM perkey p, UNNEST(range({_CMSW_D})) AS u(j)),
    cells AS ({' UNION ALL '.join(width_blocks)}),
    topk AS (
      SELECT user_id, c AS true_n FROM perkey
      ORDER BY c DESC, user_id LIMIT {_CMSW_K}),
    est AS (
      SELECT cl.w, tk.user_id, tk.true_n,
             CAST(MIN(cl.c) AS BIGINT) AS est_n
      FROM topk tk, UNNEST(range({_CMSW_D})) AS u(j)
      JOIN cells cl
        ON cl.j = u.j
        AND cl.bucket = {_cmsw_hash_duck('u.j', 'tk.user_id')} % cl.w
      GROUP BY 1, 2, 3),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM perkey)
    SELECT e.w AS width,
           CAST(SUM(e.est_n - e.true_n) * 1000000
             // SUM(e.true_n) AS BIGINT) AS mean_overest_ppm,
           CAST(MAX(e.est_n - e.true_n) AS BIGINT) AS max_overest,
           CAST((SELECT 2 * nn FROM tot) // e.w AS BIGINT)
             AS theory_bound
    FROM est e GROUP BY e.w ORDER BY e.w
    """


@register("events_cms_width_sweep", _cmsw_oracle())
def events_cms_width_sweep(spark: SparkSession, sf_dir: str):
    """Count-min-sketch accuracy as a function of width — the
    sketch-sizing table an engineer reads before provisioning (the
    heavy-hitters op fixes w={_CMSW_WIDTHS[1]}; this sweeps
    {_CMSW_WIDTHS} at depth {_CMSW_D} and reports measured mean/max
    overestimate on the top-{_CMSW_K} keys next to the 2N/w theory
    bound, showing the 1/w error decay and how far below the bound
    real skew lands). Buckets use the portable 24-bit-md5 hash (the
    events_cms_heavy_hitters parity pattern) so both engines build
    identical sketches; all three widths derive from ONE hash pass
    (bucket = h mod w). The key-grain aggregate is the only
    fact-grain work; cells are depth x width bounded rows."""
    e = t(spark, sf_dir, "events")
    perkey = e.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("c")
    )
    perkey = perkey.persist()
    js = spark.range(_CMSW_D).select(F.col("id").alias("j"))
    hashed = perkey.crossJoin(F.broadcast(js)).select(
        "user_id",
        "c",
        "j",
        F.expr(_cmsw_hash_spark("j", "user_id")).alias("h"),
    )
    cells = None
    for w in _CMSW_WIDTHS:
        blk = hashed.groupBy(
            F.lit(w).alias("w"),
            "j",
            (F.col("h") % w).alias("bucket"),
        ).agg(F.sum("c").cast("bigint").alias("c"))
        cells = blk if cells is None else cells.unionByName(blk)
    topk = (
        perkey.orderBy(F.col("c").desc(), "user_id")
        .limit(_CMSW_K)
        .select("user_id", F.col("c").alias("true_n"))
    )
    probes = topk.crossJoin(F.broadcast(js)).select(
        "user_id",
        "true_n",
        "j",
        F.expr(_cmsw_hash_spark("j", "user_id")).alias("h"),
    )
    joined = probes.join(
        F.broadcast(cells.withColumnRenamed("j", "cj")),
        F.expr("cj = j AND bucket = h % w"),
    )
    est = joined.groupBy("w", "user_id", "true_n").agg(
        F.min("c").cast("bigint").alias("est_n")
    )
    tot = perkey.agg(F.sum("c").cast("bigint").alias("nn"))
    return (
        est.crossJoin(F.broadcast(tot))
        .groupBy("w")
        .agg(
            F.expr(
                "CAST(SUM(est_n - true_n) * 1000000"
                " div SUM(true_n) AS BIGINT)"
            ).alias("mean_overest_ppm"),
            F.expr("CAST(MAX(est_n - true_n) AS BIGINT)").alias(
                "max_overest"
            ),
            F.expr(
                "CAST(2 * MAX(nn) div MAX(w) AS BIGINT)"
            ).alias("theory_bound"),
        )
        .select(
            F.col("w").alias("width"),
            "mean_overest_ppm",
            "max_overest",
            "theory_bound",
        )
        .orderBy("width")
    )


# ------------------------------------------------------------------
# 2. multimodal_payload_entropy_screen — byte-entropy triage
# ------------------------------------------------------------------

_ENT_LOW_MILLI = 3500  # nats*1e3; uniform bytes ~ 5545, text ~ 4200


@register(
    "multimodal_payload_entropy_screen",
    f"""
    WITH hx AS (
      SELECT doc_id, lang, hex(encode(text)) AS h
      FROM documents),
    bytes AS (
      SELECT doc_id, lang, u.b
      FROM (SELECT doc_id, lang, h,
                   list_transform(range(1, len(h) // 2 + 1),
                                  i -> h[2 * i - 1:2 * i]) AS bl
            FROM hx) z,
      UNNEST(z.bl) AS u(b)),
    hist AS (
      SELECT doc_id, lang, b, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS BIGINT)
               AS n
      FROM bytes GROUP BY 1, 2, 3),
    ent AS (
      SELECT doc_id, lang,
             CAST(SUM(c * CAST(round(1e6 * ln(CAST(n AS DOUBLE) / c))
               AS BIGINT)) // MAX(n) // 1000 AS BIGINT) AS ent_milli
      FROM hist GROUP BY 1, 2)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ent_milli) // COUNT(*) AS BIGINT)
             AS mean_entropy_milli,
           CAST(MIN(ent_milli) AS BIGINT) AS min_entropy_milli,
           CAST(MAX(ent_milli) AS BIGINT) AS max_entropy_milli,
           CAST(SUM(CASE WHEN ent_milli < {_ENT_LOW_MILLI}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_low_entropy
    FROM ent GROUP BY 1 ORDER BY lang
    """,
)
def multimodal_payload_entropy_screen(spark: SparkSession, sf_dir: str):
    """Byte-entropy triage of opaque binary payloads — the
    decode-free screen a multimodal ingest runs FIRST (near-zero
    entropy = padding/corruption/repetition, near-8-bits = already
    compressed or encrypted; both route away from the expensive
    decoder): payloads (the documents' utf-8 bytes via the
    attach_binary_payload testing convention, llm/multimodal.py:28)
    hex-encode and split into per-byte tokens PURELY with string
    algebra — hex() is engine-identical, so no UDF touches the
    binary path — then per-document Shannon entropy folds from the
    byte histogram with micro-quantized log terms. Per-language
    mins/means surface scripts whose byte distributions differ
    (multibyte CJK vs ASCII). One payload-size-linear explode, then
    (doc, byte<=256) bounded grain."""
    d = t(spark, sf_dir, "documents")
    hx = d.select(
        "doc_id",
        "lang",
        F.hex(F.encode(F.col("text"), "utf-8")).alias("h"),
    )
    bytes_ = hx.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, length(h) div 2),"
                " i -> substring(h, 2 * i - 1, 2))"
            )
        ).alias("b"),
    )
    hist = bytes_.groupBy("doc_id", "lang", "b").agg(
        F.count("*").cast("bigint").alias("c")
    )
    hist = hist.select(
        "doc_id",
        "lang",
        "c",
        F.sum("c")
        .over(Window.partitionBy("doc_id"))
        .cast("bigint")
        .alias("n"),
    )
    ent = hist.groupBy("doc_id", "lang").agg(
        F.expr(
            "CAST(SUM(c * CAST(round(1e6 * ln(CAST(n AS DOUBLE) / c))"
            " AS BIGINT)) div MAX(n) div 1000 AS BIGINT)"
        ).alias("ent_milli")
    )
    return (
        ent.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.expr(
                "CAST(SUM(ent_milli) div COUNT(*) AS BIGINT)"
            ).alias("mean_entropy_milli"),
            F.min("ent_milli").cast("bigint").alias(
                "min_entropy_milli"
            ),
            F.max("ent_milli").cast("bigint").alias(
                "max_entropy_milli"
            ),
            F.sum(
                F.when(
                    F.col("ent_milli") < _ENT_LOW_MILLI, 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_low_entropy"),
        )
        .orderBy("lang")
    )


# ------------------------------------------------------------------
# 3. part_price_endings_analysis — psychological pricing forensics
# ------------------------------------------------------------------

_PE_TOPK = 10


@register(
    "part_price_endings_analysis",
    f"""
    WITH endings AS (
      SELECT CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100
               AS BIGINT) % 100 AS ending,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(COUNT(*)) OVER () AS nn
      FROM part GROUP BY 1)
    SELECT ending AS cents_ending, n AS n_parts,
           CAST(n * 1000000 // nn AS BIGINT) AS share_ppm,
           CAST(n * 100 * 1000000 // nn AS BIGINT)
             AS vs_uniform_ppm
    FROM endings
    ORDER BY n DESC, ending
    LIMIT {_PE_TOPK}
    """,
)
def part_price_endings_analysis(spark: SparkSession, sf_dir: str):
    """Price-ending distribution of part retail prices — the
    psychological-pricing / data-provenance forensic (human price
    setters pile onto .99/.95/.00 endings; machine-generated or
    converted prices spread uniformly, so the concentration ratio
    vs the uniform 1% baseline identifies WHICH regime produced the
    data — the pricing-domain sibling of the Benford tests). One
    scan to the bounded 100-ending histogram; vs_uniform_ppm = 100x
    the share, so 1e6 = exactly uniform. Top-{_PE_TOPK} endings by
    mass."""
    p = t(spark, sf_dir, "part")
    endings = p.groupBy(
        ((dec("p_retailprice") * 100).cast("bigint") % 100).alias(
            "ending"
        )
    ).agg(F.count("*").cast("bigint").alias("n"))
    nn = endings.agg(F.sum("n").cast("bigint").alias("nn"))
    return (
        endings.crossJoin(F.broadcast(nn))
        .select(
            F.col("ending").alias("cents_ending"),
            F.col("n").alias("n_parts"),
            F.expr("CAST(n * 1000000 div nn AS BIGINT)").alias(
                "share_ppm"
            ),
            F.expr(
                "CAST(n * 100 * 1000000 div nn AS BIGINT)"
            ).alias("vs_uniform_ppm"),
        )
        .orderBy(F.col("n_parts").desc(), "cents_ending")
        .limit(_PE_TOPK)
    )


# ------------------------------------------------------------------
# 4. customer_brand_switching_matrix — loyalty transitions
# ------------------------------------------------------------------

_BSW_TOPK = 15


@register(
    "customer_brand_switching_matrix",
    f"""
    WITH order_brand AS (
      SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
             MIN(p.p_brand) AS brand
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2, 3),
    seq AS (
      SELECT brand AS b1,
             LEAD(brand) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS b2
      FROM order_brand),
    trans AS (
      SELECT b1, b2, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(COUNT(*)) OVER (PARTITION BY b1) AS row_tot
      FROM seq WHERE b2 IS NOT NULL GROUP BY 1, 2)
    SELECT b1 AS brand_from, b2 AS brand_to, n AS n_transitions,
           CAST(n * 1000000 // row_tot AS BIGINT) AS rate_ppm,
           CAST(CASE WHEN b1 = b2 THEN 1 ELSE 0 END AS INT) AS loyal
    FROM trans
    ORDER BY n DESC, brand_from, brand_to
    LIMIT {_BSW_TOPK}
    """,
)
def customer_brand_switching_matrix(spark: SparkSession, sf_dir: str):
    """Brand-switching matrix from consecutive orders: each order
    maps to a representative brand (deterministic MIN over its
    lines), consecutive orders per customer form transitions, and
    the row-normalized rates read as loyalty (diagonal) vs switching
    (off-diagonal) — the brand-management view of the same
    first-order-Markov machinery the event ops use, on purchase
    rather than clickstream grain. The order->brand collapse is one
    fact join+aggregate; the sequence window is PARTITIONED by
    customer; the transition matrix is brand x brand bounded (25 x
    25), with row totals from a brand-partitioned window over it.
    Top-{_BSW_TOPK} cells by volume."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    order_brand = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("o_orderkey", "o_custkey", "o_orderdate")
        .agg(F.min("p_brand").alias("brand"))
    )
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = order_brand.select(
        F.col("brand").alias("b1"),
        F.lead("brand").over(w).alias("b2"),
    ).filter(F.col("b2").isNotNull())
    trans = seq.groupBy("b1", "b2").agg(
        F.count("*").cast("bigint").alias("n")
    )
    trans = trans.select(
        "b1",
        "b2",
        "n",
        F.sum("n")
        .over(Window.partitionBy("b1"))
        .alias("row_tot"),
    )
    return (
        trans.select(
            F.col("b1").alias("brand_from"),
            F.col("b2").alias("brand_to"),
            F.col("n").alias("n_transitions"),
            F.expr("CAST(n * 1000000 div row_tot AS BIGINT)").alias(
                "rate_ppm"
            ),
            F.expr(
                "CAST(CASE WHEN b1 = b2 THEN 1 ELSE 0 END AS INT)"
            ).alias("loyal"),
        )
        .orderBy(F.col("n_transitions").desc(), "brand_from", "brand_to")
        .limit(_BSW_TOPK)
    )


# ------------------------------------------------------------------
# 5. sql_named_window_surface — WINDOW clause dialect check
# ------------------------------------------------------------------


@register(
    "sql_named_window_surface",
    """
    SELECT * FROM (
      SELECT c_nationkey AS nationkey, c_name,
             CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS bal_cents,
             ROW_NUMBER() OVER w AS rk,
             CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100
               AS BIGINT)) OVER w AS BIGINT) AS run_cents
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_name)
    ) WHERE rk <= 2
    ORDER BY nationkey, rk
    """,
)
def sql_named_window_surface(spark: SparkSession, sf_dir: str):
    """Named-WINDOW-clause SQL surface: two analytic functions share
    one window definition via `WINDOW w AS (...)` — the
    don't-repeat-yourself form analysts actually write (and the
    fourth textual-dialect check after pipe syntax, GROUP BY ALL,
    and LATERAL). Catalyst resolves both OVER w references to the
    same partitioned window (one WindowExec, rank and running sum
    computed in a single pass); the rank filter prunes map-side via
    WindowGroupLimit since the window is PARTITIONED. Both engines
    run the identical statement text over a registered view."""
    t(spark, sf_dir, "customer").createOrReplaceTempView(
        "sql_nw_customer"
    )
    return spark.sql(
        """
        SELECT * FROM (
          SELECT c_nationkey AS nationkey, c_name,
                 CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100
                   AS BIGINT) AS bal_cents,
                 ROW_NUMBER() OVER w AS rk,
                 CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100
                   AS BIGINT)) OVER w AS BIGINT) AS run_cents
          FROM sql_nw_customer
          WINDOW w AS (PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_name)
        ) WHERE rk <= 2
        ORDER BY nationkey, rk
        """
    )


# ------------------------------------------------------------------
# 6. docs_dedup_threshold_sweep — policy sensitivity table
# ------------------------------------------------------------------

_DTS_RARE_DF = 5
_DTS_THRESHOLDS = (500, 700, 900)  # jaccard in milli


@register(
    "docs_dedup_threshold_sweep",
    f"""
    WITH toks AS (
      SELECT doc_id,
             string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM documents),
    sh AS (
      SELECT DISTINCT z.doc_id,
             z.w[u.i] || ' ' || z.w[u.i + 1] || ' ' || z.w[u.i + 2]
               AS s
      FROM toks z, UNNEST(range(1, len(z.w) - 1)) AS u(i)),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
              FROM sh GROUP BY 1),
    rare AS (
      SELECT s FROM sh GROUP BY s
      HAVING COUNT(*) BETWEEN 2 AND {_DTS_RARE_DF}),
    cand AS (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      FROM sh a
      JOIN rare r ON r.s = a.s
      JOIN sh b ON b.s = a.s AND a.doc_id < b.doc_id),
    inter AS (
      SELECT c.da, c.db, CAST(COUNT(*) AS BIGINT) AS ic
      FROM cand c
      JOIN sh x ON x.doc_id = c.da
      JOIN sh y ON y.doc_id = c.db AND y.s = x.s
      GROUP BY 1, 2),
    jac AS (
      SELECT i.da, i.db,
             i.ic * 1000 // (sa.sz + sb.sz - i.ic) AS j_milli
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.da
      JOIN sizes sb ON sb.doc_id = i.db)
    SELECT t.thr AS threshold_milli,
           CAST(COUNT(CASE WHEN j.j_milli >= t.thr THEN 1 END)
             AS BIGINT) AS n_dup_pairs,
           CAST(COUNT(DISTINCT CASE WHEN j.j_milli >= t.thr
             THEN j.db END) AS BIGINT) AS n_docs_removed
    FROM jac j
    CROSS JOIN (SELECT UNNEST([{', '.join(str(x) for x in _DTS_THRESHOLDS)}])
                AS thr) t
    GROUP BY 1 ORDER BY 1
    """,
)
def docs_dedup_threshold_sweep(spark: SparkSession, sf_dir: str):
    """Dedup threshold sensitivity: exact 3-gram Jaccard on
    rare-shingle-blocked candidate pairs, evaluated at milli
    thresholds {_DTS_THRESHOLDS} — the policy table that turns 'pick
    0.7' from folklore into a measured trade (pairs flagged and docs
    removed at each cut; removal counts the higher doc_id of each
    pair, the keep-lowest-id convention of the cluster ops).
    Candidates must share a shingle with document frequency 2..{_DTS_RARE_DF}
    (rare-shingle blocking — near-dups share MANY shingles so at
    least one rare one with overwhelming probability; the recall/cost
    trade is documented, and pair volume stays far below the LSH
    family's). Exact integer Jaccard; one shingle explode, one
    blocked candidate join, one intersection count."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w"),
    )
    sh = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "IF(size(w) < 3, array(),"
                " transform(sequence(1, size(w) - 2),"
                " i -> element_at(w, i) || ' ' || element_at(w, i + 1)"
                " || ' ' || element_at(w, i + 2)))"
            )
        ).alias("s"),
    ).distinct()
    sh = sh.persist()
    sizes = sh.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("sz")
    )
    rare = (
        sh.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= _DTS_RARE_DF))
        .select("s")
    )
    ra = sh.join(rare, "s").select(
        "s", F.col("doc_id").alias("da")
    )
    rb = sh.join(rare, "s").select(
        F.col("s").alias("s2"), F.col("doc_id").alias("db")
    )
    cand = (
        ra.join(
            rb,
            (F.col("s2") == F.col("s")) & (F.col("da") < F.col("db")),
        )
        .select("da", "db")
        .distinct()
    )
    x = sh.select(F.col("doc_id").alias("da"), "s")
    y = sh.select(
        F.col("doc_id").alias("db2"), F.col("s").alias("sy")
    )
    inter = (
        cand.join(x, "da")
        .join(
            y,
            (F.col("db2") == F.col("db")) & (F.col("sy") == F.col("s")),
        )
        .groupBy("da", "db")
        .agg(F.count("*").cast("bigint").alias("ic"))
    )
    jac = (
        inter.join(
            sizes.select(F.col("doc_id").alias("da"), F.col("sz").alias("sa")),
            "da",
        )
        .join(
            sizes.select(F.col("doc_id").alias("db"), F.col("sz").alias("sb")),
            "db",
        )
        .select(
            "da",
            "db",
            F.expr("ic * 1000 div (sa + sb - ic)").alias("j_milli"),
        )
    )
    thr = spark.createDataFrame(
        [(x,) for x in _DTS_THRESHOLDS], "thr long"
    )
    return (
        jac.crossJoin(F.broadcast(thr))
        .groupBy("thr")
        .agg(
            F.count(
                F.when(F.col("j_milli") >= F.col("thr"), 1)
            )
            .cast("bigint")
            .alias("n_dup_pairs"),
            F.count_distinct(
                F.when(
                    F.col("j_milli") >= F.col("thr"), F.col("db")
                )
            )
            .cast("bigint")
            .alias("n_docs_removed"),
        )
        .select(
            F.col("thr").alias("threshold_milli"),
            "n_dup_pairs",
            "n_docs_removed",
        )
        .orderBy("threshold_milli")
    )
