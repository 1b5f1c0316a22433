"""Round-5 operators (16): sub-document chunk dedup, per-stratum reservoir
sampling, rolling weekly-active-users, re-aggregatable HLL sketches,
Z-order layout clustering, product quantization, Bloom-bitset prefiltered
semi-join, data-quality expectations report, vocabulary-coverage (OOV)
scoring, binned interval join, exact set-similarity join via prefix
filtering, streaming CDC upsert (foreachBatch), time-weighted average,
array higher-order-function suite, sorted-edge triangle counting, and
directed containment join.

Each extends the training-data-pipeline surface (SURVEY §2C) along the
axes a 100 TB ingest needs: dedup below document granularity (and exact /
directed similarity joins when the decision must be reproducible),
reproducible eval sampling, time-windowed distincts that don't rescan
history, sketch merge instead of raw-data reshuffle, scan-pruning data
layout, compressed vector codes for ANN, map-side join pruning, data
promotion gates, and the lakehouse streaming-merge sink."""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import t

CHUNK_TOKENS = 20


# ----------------------------------------------- sub-document chunk dedup
@register(
    "docs_chunk_dedup",
    f"""
    WITH chunks AS (
      SELECT doc_id,
             unnest(list_transform(
               range(CAST(ceil(len(string_split(text, ' ')) / {CHUNK_TOKENS}.0)
                          AS BIGINT)),
               j -> md5(array_to_string(
                      string_split(text, ' ')[j * {CHUNK_TOKENS} + 1 :
                                              j * {CHUNK_TOKENS} + {CHUNK_TOKENS}],
                      ' ')))) AS chunk_hash
      FROM documents),
    freq AS (
      SELECT chunk_hash, COUNT(*) AS cnt FROM chunks GROUP BY chunk_hash)
    SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN f.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks
    FROM chunks c JOIN freq f USING (chunk_hash)
    GROUP BY c.doc_id
    """,
)
def docs_chunk_dedup(spark: SparkSession, sf_dir: str):
    """Sub-document exact dedup (the boilerplate-paragraph killer): split
    each document into fixed-size token chunks, hash each chunk, count how
    many of a document's chunks recur ANYWHERE in the corpus. Chunks travel
    as md5 hashes only — the chunk text never shuffles, so the exchange is
    (doc_id, hash) narrow rows; the global frequency table is one hash
    groupBy with map-side partial agg. At 100 TB this is the same two-pass
    shape as document-level exact dedup (llm/dedup.py:67), just keyed one
    granularity down. Reference analogue: the continuation/duplicate-slice
    handling (main.py:210-253) works at whole-table granularity; this is
    the corpus-scale generalization."""
    d = t(spark, sf_dir, "documents")
    # split hoisted to a column — inlined in the lambda it re-splits the
    # text once per chunk (the curation_ops lesson, commit 78fe1e4)
    chunks = d.select("doc_id", F.split("text", " ").alias("w")).select(
        "doc_id",
        F.explode(
            F.expr(
                f"""transform(
                      sequence(0, int(ceil(size(w) / {CHUNK_TOKENS}.0)) - 1),
                      j -> md5(array_join(
                             slice(w, j * {CHUNK_TOKENS} + 1, {CHUNK_TOKENS}),
                             ' ')))"""
            )
        ).alias("chunk_hash"),
    )
    freq = chunks.groupBy("chunk_hash").agg(F.count("*").alias("cnt"))
    return (
        chunks.join(freq, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_chunks"),
        )
    )


# ------------------------------------- deterministic per-stratum reservoir
RESERVOIR_K = 20


@register(
    "docs_reservoir_sample_per_lang",
    f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
      FROM documents)
    WHERE rn <= {RESERVOIR_K}
    """,
)
def docs_reservoir_sample_per_lang(spark: SparkSession, sf_dir: str):
    """Fixed-size per-stratum sample (k docs per language) — the eval-split
    primitive. Ordering by a key hash instead of rand() makes the reservoir
    a pure function of the data: identical on any engine, any retry, any
    partitioning (same policy as sampling_profile.py). One shuffle on the
    stratum key; the per-stratum top-k is a bounded window. For heavily
    skewed strata at 100 TB the same hash order works under a two-level
    top-k (per-partition k, then global k) — which is exactly what AQE-
    planned window top-k degenerates to."""
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= RESERVOIR_K)
        .select("doc_id", "lang")
    )


# ------------------------------------------------ rolling weekly actives
@register(
    "events_rolling_wau",
    """
    WITH ud AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
      FROM events),
    days AS (SELECT DISTINCT d FROM ud)
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           COUNT(DISTINCT ud.user_id) AS wau
    FROM days JOIN ud
      ON ud.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
    GROUP BY days.d
    """,
)
def events_rolling_wau(spark: SparkSession, sf_dir: str):
    """Rolling 7-day distinct users per day. COUNT(DISTINCT) can't ride a
    window frame, so the classic shape is: collapse the fact table to
    distinct (user, day) FIRST (the only pass over event volume), then
    range-join the tiny day spine against day-level rows. At 100 TB the
    expensive input shrinks ~10^4× before the range join ever runs, and the
    spine side is broadcast — the join never shuffles the big side again."""
    e = t(spark, sf_dir, "events")
    ud = e.select(
        F.to_date(F.date_trunc("day", "ts")).alias("d"), "user_id"
    ).distinct()
    days = ud.select("d").distinct().select(F.col("d").alias("day"))
    return (
        ud.join(
            F.broadcast(days),
            (F.col("d") <= F.col("day"))
            & (F.col("d") >= F.date_sub(F.col("day"), 6)),
        )
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
        # string day: Spark hands the driver datetime.date objects, DuckDB
        # datetime64 — same instant, different carrier; a fixed-format
        # string compares identically (established date-output policy)
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "wau")
    )


# --------------------------------------- mergeable HLL sketches + gate
@register(
    "sketch_hll_daily_merge",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           1 AS within_5pct
    FROM events GROUP BY event_type
    """,
)
def sketch_hll_daily_merge(spark: SparkSession, sf_dir: str):
    """Re-aggregatable distinct sketches — the 100 TB pattern where daily
    HLL sketches persist and ANY rollup (weekly, monthly, all-time) is a
    sketch merge instead of a rescan of raw events. Built-in Datasketches
    HLL: per-(event_type, day) sketches, merged per event_type, estimated.
    The gate emits the EXACT distinct plus a within-5% flag computed from
    the estimate (same tolerance-flag pattern as agg_approx_quantile_check)
    so the oracle stays deterministic while the sketch path is genuinely
    exercised."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return (
        exact.join(merged, "event_type")
        .select(
            "event_type",
            "exact_users",
            F.when(
                F.abs(F.col("est") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users"),
                1,
            )
            .otherwise(0)
            .alias("within_5pct"),
        )
    )


# ------------------------------------------------- Z-order layout buckets
def _zvalue_sql(x: str, y: str, bits: int = 5) -> str:
    """Bit-interleave two `bits`-wide ints — identical >>/<</& arithmetic
    in Spark SQL and DuckDB."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


_ZX = "(o_custkey & 31)"
_ZY = "(day(o_orderdate) & 31)"


@register(
    "zorder_layout_orders",
    f"""
    WITH z AS (
      SELECT o_orderkey, {_ZX} AS zx, {_ZY} AS zy,
             {_zvalue_sql(_ZX, _ZY)} AS zval
      FROM orders)
    SELECT zval >> 6 AS z_bucket,
           COUNT(*) AS n,
           MIN(zx) AS min_x, MAX(zx) AS max_x,
           MIN(zy) AS min_y, MAX(zy) AS max_y
    FROM z GROUP BY 1
    """,
)
def zorder_layout_orders(spark: SparkSession, sf_dir: str):
    """Z-order (Morton) layout clustering: interleave the bits of two scan
    dimensions so ONE sort key gives files narrow min/max ranges in BOTH
    dimensions — what lake formats' OPTIMIZE ZORDER does so that per-file
    column stats prune scans on either predicate. The operator range-
    partitions + sorts by zval (the actual layout write); the gate output
    is the per-bucket bounds table, which IS the pruning evidence: every
    bucket spans ≤¼ of each dimension's domain instead of all of it."""
    o = t(spark, sf_dir, "orders")
    z = o.select(
        "o_orderkey",
        F.expr(_ZX).alias("zx"),
        F.expr(_ZY).alias("zy"),
        F.expr(_zvalue_sql(_ZX, _ZY)).alias("zval"),
    )
    # the layout move itself: cluster rows by zval so contiguous files
    # carry contiguous z-ranges (repartitionByRange + in-partition sort)
    clustered = z.repartitionByRange(8, "zval").sortWithinPartitions("zval")
    return (
        clustered.groupBy(F.shiftright("zval", 6).alias("z_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("zx").alias("min_x"),
            F.max("zx").alias("max_x"),
            F.min("zy").alias("min_y"),
            F.max("zy").alias("max_y"),
        )
    )


# ---------------------------------------------- product quantization (PQ)
PQ_SUBSPACES = 8
PQ_SUBDIM = 8  # 64-dim embeddings → 8 subvectors of 8 dims
PQ_CODES = 16
PQ_DIST_SCALE = 1_000_000_000  # fixed-point: argmin compares exact ints


@register(
    "emb_pq_quantize",
    f"""
    WITH cents AS (
      SELECT vec_id AS code, embedding AS cv FROM embeddings
      WHERE vec_id < {PQ_CODES}),
    dists AS (
      SELECT e.vec_id, s.range AS subspace, c.code,
             CAST(floor(list_sum(list_transform(range({PQ_SUBDIM}),
               j -> (CAST(e.embedding[s.range * {PQ_SUBDIM} + j + 1] AS DOUBLE)
                     - CAST(c.cv[s.range * {PQ_SUBDIM} + j + 1] AS DOUBLE))
                    * (CAST(e.embedding[s.range * {PQ_SUBDIM} + j + 1] AS DOUBLE)
                       - CAST(c.cv[s.range * {PQ_SUBDIM} + j + 1] AS DOUBLE))))
               * {PQ_DIST_SCALE} + 0.5) AS BIGINT) AS d_fp
      FROM embeddings e
      CROSS JOIN range({PQ_SUBSPACES}) s
      CROSS JOIN cents c)
    SELECT vec_id, CAST(subspace AS BIGINT) AS subspace, code FROM (
      SELECT vec_id, subspace, code,
             ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                                ORDER BY d_fp, code) AS rn
      FROM dists)
    WHERE rn = 1
    """,
)
def emb_pq_quantize(spark: SparkSession, sf_dir: str):
    """Product quantization: each 64-dim embedding compresses to 8 one-byte
    codes — each subvector snaps to its nearest entry in a per-subspace
    codebook. The ANN memory move: 256 bytes of float32 become 8 bytes, and
    distance evaluation becomes 8 table lookups. Codebooks here are
    deterministic seed vectors (vec_id < 16, the same provenance trick as
    the IVF centroids in llm/similarity.py) so the SQL oracle reproduces
    identical codes; production k-means changes only the codebook table.

    Scale shape: the codebook is 16 rows — broadcast; the subvector explode
    is 8× narrow rows, map-side only; the argmin is a bounded window per
    (vec_id, subspace). Distances compare as fixed-point BIGINTs (floor
    (d*1e9+0.5), in-order fold both engines) so ties and float drift can't
    flip the argmin across engines."""
    e = t(spark, sf_dir, "embeddings")
    sub = e.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_SUBSPACES - 1))).alias(
            "subspace"
        ),
        F.col("embedding"),
    ).select(
        "vec_id",
        "subspace",
        F.expr(
            f"slice(embedding, subspace * {PQ_SUBDIM} + 1, {PQ_SUBDIM})"
        ).alias("subvec"),
    )
    cents = (
        e.filter(F.col("vec_id") < PQ_CODES)
        .select(
            F.col("vec_id").alias("code"),
            F.explode(F.sequence(F.lit(0), F.lit(PQ_SUBSPACES - 1))).alias(
                "subspace"
            ),
            F.col("embedding"),
        )
        .select(
            "code",
            "subspace",
            F.expr(
                f"slice(embedding, subspace * {PQ_SUBDIM} + 1, {PQ_SUBDIM})"
            ).alias("centvec"),
        )
    )
    d_fp = F.floor(
        F.aggregate(
            F.zip_with(
                "subvec",
                "centvec",
                lambda a, b: (a.cast("double") - b.cast("double"))
                * (a.cast("double") - b.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        * PQ_DIST_SCALE
        + F.lit(0.5)
    ).cast("bigint")
    w = Window.partitionBy("vec_id", "subspace").orderBy("d_fp", "code")
    return (
        sub.join(F.broadcast(cents), "subspace")
        .withColumn("d_fp", d_fp)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("subspace").cast("bigint").alias("subspace"), "code")
    )


# ------------------------------------------ bloom-prune + verify semi-join
# Bitset geometry: small enough to broadcast as one array row, large enough
# that the sf0.01 dim (~300 keys × 3 probes) stays far from saturation.
BLOOM_BITS = 8192
BLOOM_SEEDS = (1, 2, 3)


def _bloom_positions(key):
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(s)), F.lit(BLOOM_BITS))
            for s in BLOOM_SEEDS
        ]
    )


@register(
    "bloom_prune_semijoin",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_custkey IN
          (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderpriority
    """,
)
def bloom_prune_semijoin(spark: SparkSession, sf_dir: str):
    """Semi-join accelerated by an explicit Bloom-filter prefilter: the dim
    side (customers in one segment) folds its keys into an 8192-bit / 3-hash
    Bloom bitset — materialized as 128 packed 64-bit words, bytes in size
    regardless of fact volume — which broadcasts to the fact scan and drops
    non-member rows map-side BEFORE any shuffle. A final exact left-semi
    join removes the false positives, so the result equals the plain
    semi-join (the oracle) bit-for-bit.

    This is the hand-rolled form of Spark's runtime row-level bloom join
    (spark.sql.optimizer.runtime.bloomFilter.enabled), including its
    two-job shape: job 1 folds the dim keys into the bitset (bytes out —
    bounded by the bitset geometry, never by dim cardinality) exactly like
    the runtime filter's build-side subquery; job 2 evaluates membership
    as a LITERAL predicate on the fact scan, so the prune is guaranteed
    map-side below the semi-join's exchange — expressing the bitset as a
    joined column instead lets Catalyst push the semi-join underneath it
    (verified: it does), silently discarding the prune-before-shuffle
    property. At 100 TB the dim is too big to broadcast as rows, the
    semi-join must shuffle — and the bloom predicate is what keeps
    ~(1 - selectivity) of the fact table out of that exchange. Positions
    use xxhash64 (JVM codegen, no Python); the driver collect is ≤
    BLOOM_BITS ints (~bytes), the same bounded build-side fetch the
    runtime filter performs."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    dim = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    bloom_positions = [
        r["pos"]
        for r in dim.select(
            F.explode(_bloom_positions(F.col("c_custkey"))).alias("pos")
        )
        .distinct()
        .collect()  # bounded: <= m distinct bloom bit positions
    ]
    # Pack the bitset into 64-bit words (BLOOM_BITS/64 longs): membership
    # is then 3 constant-time bit tests per row. A flat position-array
    # literal probed with array_except re-builds its hash set PER ROW —
    # measured 6.8s vs <1s for the whole query at sf0.1.
    words = [0] * (BLOOM_BITS // 64)
    for pos in bloom_positions:
        words[pos // 64] |= 1 << (pos % 64)
    # LongType is signed: wrap the high bit into two's complement
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    # SQL text form: the DataFrame shiftright() only takes a literal shift
    # count, while the SQL function accepts a column expression. The seed
    # literals are plain ints, so xxhash64(key, s) here hashes the same
    # bytes as _bloom_positions' F.lit(s) build side.
    arr = "cast(array({}) as array<bigint>)".format(
        ",".join(str(w) for w in words)
    )
    tests = []
    for s in BLOOM_SEEDS:
        p = f"pmod(xxhash64(o_custkey, {s}), {BLOOM_BITS})"
        tests.append(
            f"((shiftright(element_at({arr}, cast({p} / 64 AS INT) + 1),"
            f" cast({p} % 64 AS INT)) & 1) = 1)"
        )
    pruned = orders.filter(F.expr(" AND ".join(tests)))
    return (
        pruned.join(dim, pruned.o_custkey == dim.c_custkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


# -------------------------------------------- data-quality expectations
@register(
    "dq_expectations_report",
    """
    SELECT * FROM (
      SELECT 'orders_fk_customer' AS expectation,
             (SELECT COUNT(*) FROM orders) AS checked,
             (SELECT COUNT(*) FROM orders
              WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
               AS violations
      UNION ALL
      SELECT 'lineitem_fk_orders',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem
              WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
      UNION ALL
      SELECT 'orders_pk_unique',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
      UNION ALL
      SELECT 'lineitem_quantity_range',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem
              WHERE l_quantity < 1 OR l_quantity > 50)
      UNION ALL
      SELECT 'customer_acctbal_not_null',
             (SELECT COUNT(*) FROM customer),
             (SELECT COUNT(*) FROM customer WHERE c_acctbal IS NULL)
      UNION ALL
      SELECT 'documents_lang_known',
             (SELECT COUNT(*) FROM documents),
             (SELECT COUNT(*) FROM documents
              WHERE lang IS NULL OR lang = ''))
    """,
)
def dq_expectations_report(spark: SparkSession, sf_dir: str):
    """Declarative data-quality gate over the warehouse: each expectation
    (FK integrity, PK uniqueness, value ranges, not-null, domain membership)
    emits one (expectation, checked, violations) row — the report a
    pipeline's circuit breaker reads before promoting a batch.

    Scale shapes, per check: FK integrity is a LEFT ANTI join (the probe
    side shuffles once on the key, or broadcasts when the parent is small —
    Catalyst's choice); PK uniqueness and every scalar predicate are
    single-pass aggregates with map-side partials. Nothing collects; the
    report is 6 rows regardless of input volume. Reference analogue: the
    NOT NULL / FK constraints implicit in its schema (schema.py:14-60) —
    here they are measured instead of assumed."""
    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")
    cust = t(spark, sf_dir, "customer")
    docs = t(spark, sf_dir, "documents")

    def report(name: str, checked, violations):
        return checked.crossJoin(violations).select(
            F.lit(name).alias("expectation"),
            F.col("checked"),
            F.col("violations"),
        )

    def n(df, alias="checked"):
        return df.agg(F.count("*").alias(alias))

    fk_orders = report(
        "orders_fk_customer",
        n(orders),
        n(
            orders.join(
                cust, orders.o_custkey == cust.c_custkey, "left_anti"
            ),
            "violations",
        ),
    )
    fk_lineitem = report(
        "lineitem_fk_orders",
        n(lineitem),
        n(
            lineitem.join(
                orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti"
            ),
            "violations",
        ),
    )
    pk_orders = report(
        "orders_pk_unique",
        n(orders),
        orders.agg(
            (F.count("*") - F.countDistinct("o_orderkey")).alias("violations")
        ),
    )
    qty_range = report(
        "lineitem_quantity_range",
        n(lineitem),
        n(
            lineitem.filter((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)),
            "violations",
        ),
    )
    acctbal = report(
        "customer_acctbal_not_null",
        n(cust),
        n(cust.filter(F.col("c_acctbal").isNull()), "violations"),
    )
    lang_known = report(
        "documents_lang_known",
        n(docs),
        n(
            docs.filter(F.col("lang").isNull() | (F.col("lang") == "")),
            "violations",
        ),
    )
    return (
        fk_orders.unionByName(fk_lineitem)
        .unionByName(pk_orders)
        .unionByName(qty_range)
        .unionByName(acctbal)
        .unionByName(lang_known)
    )


# ---------------------------------------------- vocabulary coverage (OOV)
TOP_VOCAB = 500


@register(
    "docs_vocab_coverage",
    f"""
    WITH toks0 AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
      FROM documents),
    toks AS (SELECT * FROM toks0 WHERE token != ''),
    freq AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
    vocab AS (
      SELECT token, TRUE AS in_vocab
      FROM freq ORDER BY cnt DESC, token LIMIT {TOP_VOCAB})
    SELECT toks.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN vocab.in_vocab IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_oov,
           ROUND(SUM(CASE WHEN vocab.in_vocab IS NULL THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
    FROM toks LEFT JOIN vocab USING (token)
    GROUP BY toks.doc_id
    """,
)
def docs_vocab_coverage(spark: SparkSession, sf_dir: str):
    """Per-document out-of-vocabulary rate against the corpus top-N
    vocabulary — the tokenizer-fit / cross-domain-shift screen a training
    pipeline runs before committing a corpus to an expensive BPE train.

    Two passes, both scale-safe: (1) token frequencies are one hash groupBy
    over (token) narrow rows, and the top-N is TakeOrderedAndProject —
    per-partition top-N then a driver merge of N-row heaps, never a global
    sort; (2) the N-term vocabulary (bytes) broadcasts back to the token
    stream for a map-side membership probe, and the per-doc rate is one
    groupBy(doc_id) with map-side partials. Tokenization matches the
    registry's shared whitespace policy (_TOKS_SQL in llm_ops.py) so every
    doc-level operator agrees on token identity. The rank order
    (count desc, token asc) is a total order, so top-N is deterministic on
    any engine and any partitioning."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    top = (
        toks.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(TOP_VOCAB)
        .select("token", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(top), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens").cast("double"), 6).alias(
                "oov_rate"
            ),
        )
    )


# ------------------------------------------- binned interval join (no key)
IBJ_THRESHOLD = 250.0
IBJ_WINDOW_US = 3_600_000_000  # +/- 1 hour


@register(
    "interval_bin_join_events",
    f"""
    SELECT h.event_id AS anchor_id,
           COUNT(*) AS n_nearby,
           CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS val_nearby
    FROM (SELECT * FROM events WHERE value >= {IBJ_THRESHOLD}) h
    JOIN events e
      ON e.event_id != h.event_id
     AND abs(epoch_us(e.ts) - epoch_us(h.ts)) <= {IBJ_WINDOW_US}
    GROUP BY h.event_id
    """,
)
def interval_bin_join_events(spark: SparkSession, sf_dir: str):
    """Time-proximity join with NO equi key — every event within ±1 h of a
    high-value anchor event, across all users — executed as a BINNED
    equi-join instead of the O(|anchors|·|events|) nested loop the theta
    condition would naively plan (the strategy behind range-join binning in
    Databricks/DuckDB's IEJoin family).

    Both sides bucket time into window-width bins: a match within ±W can
    only live in the probe's own bin or an adjacent one, so anchors explode
    into 3 bin keys (bounded blow-up), the join becomes a hash equi-join on
    the bin, and the exact |Δt| ≤ W predicate filters candidates inside
    each bucket. Each true pair matches exactly once (the event's single
    bin equals exactly one of the anchor's three), so no dedup pass is
    needed. At 100 TB both sides shuffle ONCE on the bin key — narrow rows,
    uniform by construction since the bin is time — versus a broadcast
    nested loop that stops being possible the moment anchors outgrow one
    executor. range_band_join_orders (pipeline_ops.py) keeps the NLJ form
    for the tiny-dim case; this is the both-sides-large form."""
    e = t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    ev = e.select(
        "event_id",
        "value",
        us.alias("t_us"),
        F.floor(us / IBJ_WINDOW_US).alias("bin"),
    )
    anchors = (
        ev.filter(F.col("value") >= IBJ_THRESHOLD)
        .select(
            F.col("event_id").alias("anchor_id"),
            F.col("t_us").alias("a_us"),
            F.explode(
                F.array(F.col("bin") - 1, F.col("bin"), F.col("bin") + 1)
            ).alias("bin"),
        )
    )
    return (
        ev.join(anchors, "bin")
        .filter(
            (F.col("event_id") != F.col("anchor_id"))
            & (F.abs(F.col("t_us") - F.col("a_us")) <= IBJ_WINDOW_US)
        )
        .groupBy("anchor_id")
        .agg(
            F.count("*").alias("n_nearby"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("val_nearby"),
        )
    )


# ----------------------------- exact set-similarity join (prefix filter)
SETSIM_T = 0.8


@register(
    "docs_setsim_prefix_join",
    f"""
    WITH toks0 AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
      FROM documents),
    toks AS (SELECT DISTINCT doc_id, token FROM toks0 WHERE token != ''),
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM toks a JOIN toks b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           ROUND(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE i / CAST(sa.sz + sb.sz - i AS DOUBLE) >= {SETSIM_T}
    """,
)
def docs_setsim_prefix_join(spark: SparkSession, sf_dir: str):
    """EXACT set-similarity self-join (token-set Jaccard ≥ t) via PREFIX
    FILTERING (the ppjoin/AllPairs family) — the deterministic complement
    to MinHash-LSH: zero false negatives by construction, no probabilistic
    recall, the right tool when the dedup decision must be reproducible.

    The quadratic all-pairs square never materializes. Tokens get one
    canonical global order — ascending corpus frequency, ties by token —
    so each document's RAREST tokens come first; if jaccard(A,B) ≥ t then
    |A∩B| ≥ ceil(t·|A|), hence A and B must share a token inside their
    first |s| − ceil(t·|s|) + 1 tokens (the prefix-filter guarantee).
    Candidates come from an asymmetric PPJoin equi-join: the larger
    record's PROBE prefix (|s| − ceil(t·|s|) + 1 rare-first tokens)
    against the smaller record's shorter INDEX prefix
    (|s| − ceil(2t/(1+t)·|s|) + 1 — ~11% of tokens at t=0.8 vs the
    probe's 20%), with the |B| ∈ [t·|A|, |A|] length filter, a
    position-aware prefix filter (a token at position p can open an
    α-overlap only if p ≤ |s| − α), and the ppjoin positional upper
    bound min(pa,pb) + 1 + min-suffix folded to its per-pair minimum —
    every bound in exact millionths-integer arithmetic so a float ceil
    can never drop a true pair. Verify is row-local: array_intersect on
    the two sorted full-token arrays in codegen, jaccard from exact
    integer sizes. Measured at sf0.1: candidate precision is ~85%
    (2.97M true pairs of 3.5M candidates) — the cost is the inherent
    output volume of a near-dup-heavy corpus, not filter slack.

    Verification runs per CONTENT CLASS (distinct token set), the same
    second lever as llm/dedup.py's minhash verify: on this near-dup-heavy
    corpus the verified output is ~clique-quadratic in DOC pairs, and
    attaching two fat token arrays to every doc pair measured 82 s at
    sf0.1 — collapsing to classes first (identical canonical array means
    one class row) verifies each class pair once, emits within-class
    pairs as Jaccard = 1 with no arrays at all, and expands verified
    class pairs back to docs as narrow (id, id, jaccard) rows.

    At 100 TB: the frequency table is one hash groupBy; per-doc sorted
    arrays are one groupBy(doc); classes are one groupBy on the array;
    candidates shuffle on single prefix tokens whose buckets the
    rare-first order keeps bounded; the class arrays move once per
    surviving class-pair side, never per doc pair."""
    from ..llm.dedup import setsim_prefix_join

    return setsim_prefix_join(
        t(spark, sf_dir, "documents"), "text", "doc_id", SETSIM_T
    )


# ------------------------------- streaming CDC upsert via foreachBatch
@register(
    "stream_foreachbatch_upsert",
    """
    SELECT user_id, CAST(last_value AS DOUBLE) AS last_value FROM (
      SELECT user_id, value AS last_value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
    """,
)
def stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str):
    """Streaming UPSERT sink — the foreachBatch CDC-merge pattern every
    lakehouse pipeline runs: each micro-batch's per-user latest row merges
    into a keyed parquet state table (read prev + union + argmax +
    overwrite), so the sink holds exactly one current row per user at
    every commit. Driven over the 4-slice time-ordered replay; the final
    state must equal the batch argmax over all events (the oracle).

    The merge is ASSOCIATIVE and COMMUTATIVE (argmax by the total order
    ts, event_id), so the final state is independent of how the stream
    was sliced into batches — that, not luck, is what makes the replay
    deterministic, and it is the property a production upsert key needs
    anyway for out-of-order arrivals. State alternates between two dirs
    (write next, never overwrite the dir being read — the lakehouse
    table-format trick, minus the manifest). At 100 TB the state table is
    one row per key and the merge is one keyed shuffle per batch; table
    formats (Delta/Iceberg MERGE) do the same with file-level pruning.
    Argmax rides max(struct(ts, event_id, value)) — lexicographic struct
    comparison, no window over the state table."""
    import os
    import tempfile

    from ..streaming.events import build_time_ordered_replay, read_events_stream

    e = t(spark, sf_dir, "events")
    replay = tempfile.mkdtemp(prefix="events_upsert_") + "/events"
    build_time_ordered_replay(e, replay, ts_col="ts", n_slices=4)
    state_root = tempfile.mkdtemp(prefix="events_upsert_state_")
    last_dir: list[str | None] = [None]

    def merge_batch(batch, batch_id: int):
        cur = batch.groupBy("user_id").agg(
            F.max(F.struct("ts", "event_id", "value")).alias("s")
        )
        if last_dir[0] is not None:
            prev = batch.sparkSession.read.parquet(last_dir[0])
            cur = cur.unionByName(prev).groupBy("user_id").agg(
                F.max("s").alias("s")
            )
        nxt = os.path.join(state_root, f"state_{batch_id % 2}")
        cur.write.mode("overwrite").parquet(nxt)
        last_dir[0] = nxt

    q = (
        read_events_stream(spark, replay)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", os.path.join(state_root, "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.read.parquet(last_dir[0]).select(
        "user_id", F.col("s.value").alias("last_value")
    )


# ---------------------------------------- time-weighted average (TWAP)
@register(
    "events_twap_per_user",
    """
    WITH iv AS (
      SELECT user_id,
             CAST(value AS DECIMAL(12,2)) AS v,
             LEAD(epoch_us(ts)) OVER w - epoch_us(ts) AS dur_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id,
           COUNT(*) AS n_intervals,
           ROUND(CAST(SUM(v * dur_us) AS DOUBLE)
                 / CAST(SUM(dur_us) AS DOUBLE), 6) AS twap
    FROM iv WHERE dur_us IS NOT NULL
    GROUP BY user_id
    """,
)
def events_twap_per_user(spark: SparkSession, sf_dir: str):
    """Time-weighted average value per user — the metering/billing/finance
    aggregate where each observation holds until the next one replaces it,
    so its weight is the interval it was in force (piecewise-constant
    integral / total time). A plain AVG over-counts bursts; TWAP is the
    right statistic for sampled gauges.

    One shuffle on user_id serves both the LEAD window and the final
    groupBy (same-key partitioning reused — the sessionize discipline).
    Parity: durations are exact integer micros, values exact DECIMAL, the
    weighted sum is decimal·bigint — both engines aggregate identical
    integers and divide once in double at the end (float-parity policy).
    The last observation per user has no successor and drops out, exactly
    the open interval a billing cutoff would exclude."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = e.select(
        "user_id",
        F.col("value").cast("decimal(12,2)").alias("v"),
        (
            F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
        ).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return (
        iv.groupBy("user_id")
        .agg(
            F.count("*").alias("n_intervals"),
            F.round(
                F.sum(F.col("v") * F.col("dur_us")).cast("double")
                / F.sum("dur_us").cast("double"),
                6,
            ).alias("twap"),
        )
    )


# ------------------------------------ array higher-order-function suite
@register(
    "array_hof_suite",
    """
    WITH g AS (
      SELECT l_orderkey,
             list(CAST(l_quantity AS DECIMAL(12,2))
                  ORDER BY l_linenumber, CAST(l_quantity AS DECIMAL(12,2)))
               AS a
      FROM lineitem WHERE l_orderkey % 20 = 0
      GROUP BY l_orderkey)
    SELECT l_orderkey,
           len(a) AS n_items,
           CAST(list_aggregate(a, 'sum') AS DOUBLE) AS qsum,
           len(list_filter(a, x -> x > 25)) AS n_high,
           CAST(list_aggregate(list_reverse(list_sort(a))[1:3], 'sum')
                AS DOUBLE) AS top3,
           CAST(a[1] + list_reverse(a)[1] AS DOUBLE) AS wrap0
    FROM g
    """,
)
def array_hof_suite(spark: SparkSession, sf_dir: str):
    """Higher-order array functions as one gated suite: transform /
    filter / aggregate (fold) / zip_with / reverse / slice / sort over a
    per-order quantity vector, each pinned to DuckDB's list_* twins. HOF
    lambdas run INSIDE codegen — this is the JVM-side alternative to a
    Python UDF for per-row vector math, the same machinery the embedding
    ops lean on (llm/similarity.py cosine = zip_with + aggregate).

    Parity notes, each a real cross-engine trap: collect_list order is
    nondeterministic, so elements collect as (linenumber, qty) structs and
    array_sort imposes the order the oracle's list(... ORDER BY) declares
    — with the quantity as tie-break, because l_linenumber is NOT unique
    within an order in this testdata and an under-specified sort is
    nondeterministic in both engines;
    the fold accumulator is DECIMAL so sums are exact (the float-parity
    policy applied inside a lambda); doubles only appear at the output
    cast."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 0)
    g = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("ln"),
                    F.col("l_quantity").cast("decimal(12,2)").alias("q"),
                )
            )
        ).alias("s")
    )
    return g.select(
        "l_orderkey",
        F.expr("size(s)").alias("n_items"),
        F.expr(
            "cast(aggregate(transform(s, x -> x.q),"
            " cast(0 as decimal(18,2)),"
            " (acc, x) -> cast(acc + x as decimal(18,2))) as double)"
        ).alias("qsum"),
        F.expr("size(filter(transform(s, x -> x.q), x -> x > 25))")
        .cast("bigint")
        .alias("n_high"),
        F.expr(
            "cast(aggregate(slice(reverse(array_sort(transform(s, x -> x.q))), 1, 3),"
            " cast(0 as decimal(18,2)),"
            " (acc, x) -> cast(acc + x as decimal(18,2))) as double)"
        ).alias("top3"),
        F.expr(
            "cast(element_at(zip_with(transform(s, x -> x.q),"
            " reverse(transform(s, x -> x.q)), (x, y) -> x + y), 1) as double)"
        ).alias("wrap0"),
    )


# ----------------------------------------- triangle counting (graph)
@register(
    "part_triangle_counts",
    """
    WITH p AS (
      SELECT p_partkey, p_name,
             regexp_extract(p_name, '^[^ ]+ [^ ]+') AS blk,
             length(p_name) AS ln
      FROM part),
    e AS (
      SELECT a.p_partkey AS u, b.p_partkey AS v
      FROM p a JOIN p b
        ON a.blk = b.blk AND a.p_partkey < b.p_partkey
           AND abs(a.ln - b.ln) <= 2
      WHERE levenshtein(a.p_name, b.p_name) <= 2),
    tri AS (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
    SELECT node, COUNT(*) AS n_tri FROM (
      SELECT unnest([x, y, z]) AS node FROM tri)
    GROUP BY node
    """,
)
def part_triangle_counts(spark: SparkSession, sf_dir: str):
    """Per-node triangle participation over the part-name similarity graph
    (edges = verified near-dup pairs from part_name_neardup) — the graph
    statistic behind clustering coefficients and dense-cluster screens,
    completing the graph tier (connected components → PageRank →
    triangles).

    The distributed shape is the sorted-edge convention: every edge is
    stored once as (u < v), a wedge is e1(u,v) ⋈ e2(v,w) — so u < v < w
    and each triangle is enumerated exactly once, no 6× duplication to
    dedup — and the closing edge check is a second equi-join back on the
    edge list. Both joins shuffle on single vertex keys; the per-node
    rollup explodes each triangle into its 3 corners as narrow rows. At
    100 TB the known refinement is degree-ordering (orient each edge from
    lower- to higher-degree endpoint) to cap wedge counts at hub nodes —
    the convention here is id-ordering, the same plan shape with a cheaper
    orientation key."""
    from .pipeline_ops import part_name_neardup

    e = part_name_neardup(spark, sf_dir).select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    )
    e1 = e.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = e.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = e.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    return (
        tri.select(
            F.explode(F.array("x", "y", "z")).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )


# ---------------------------- asymmetric containment join (directed)
CONTAIN_T = 0.9


@register(
    "docs_containment_join",
    f"""
    WITH toks0 AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
      FROM documents),
    toks AS (SELECT DISTINCT doc_id, token FROM toks0 WHERE token != ''),
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM toks a JOIN toks b ON a.token = b.token AND a.doc_id != b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           ROUND(i / CAST(sa.sz AS DOUBLE), 6) AS containment
    FROM inter JOIN sz sa ON sa.doc_id = id_a
    WHERE i / CAST(sa.sz AS DOUBLE) >= {CONTAIN_T}
    """,
)
def docs_containment_join(spark: SparkSession, sf_dir: str):
    """Directed containment screen (|A∩B|/|A| ≥ 0.9): the curation pass
    that catches a small document living INSIDE a larger one — template +
    payload, quote + commentary — which symmetric Jaccard structurally
    misses as the big side grows. Implementation and scale analysis:
    llm/dedup.py::containment_prefix_join (A's rare-first prefix explodes
    against the full token index of the B side; class-collapsed verify;
    the same prefix-filter guarantee, adapted to the directed bound)."""
    from ..llm.dedup import containment_prefix_join

    return containment_prefix_join(
        t(spark, sf_dir, "documents"), "text", "doc_id", CONTAIN_T
    )


# -------------------------- truncated-embedding (Matryoshka) recall
TRUNC_DIMS = 32
TRUNC_K = 5


@register(
    "emb_truncated_topk_recall",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10),
    c AS (
      SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings),
    full_rank AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
               round(list_dot_product(qv, cv) /
                     (sqrt(list_dot_product(qv, qv)) *
                      sqrt(list_dot_product(cv, cv))), 6) DESC,
               neighbor_id) AS rank
      FROM c CROSS JOIN q WHERE query_id != neighbor_id),
    full_topk AS (SELECT query_id, neighbor_id FROM full_rank
                  WHERE rank <= {TRUNC_K}),
    tq AS (SELECT query_id, qv[1:{TRUNC_DIMS}] AS qv FROM q),
    tc AS (SELECT neighbor_id, cv[1:{TRUNC_DIMS}] AS cv FROM c),
    trunc_rank AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
               round(list_dot_product(qv, cv) /
                     (sqrt(list_dot_product(qv, qv)) *
                      sqrt(list_dot_product(cv, cv))), 6) DESC,
               neighbor_id) AS rank
      FROM tc CROSS JOIN tq WHERE query_id != neighbor_id),
    trunc_topk AS (SELECT query_id, neighbor_id, 1 AS hit FROM trunc_rank
                   WHERE rank <= {TRUNC_K})
    SELECT f.query_id,
           CAST(SUM(COALESCE(t.hit, 0)) AS BIGINT) AS n_overlap,
           ROUND(SUM(COALESCE(t.hit, 0)) / CAST({TRUNC_K} AS DOUBLE), 6)
             AS recall
    FROM full_topk f LEFT JOIN trunc_topk t
      USING (query_id, neighbor_id)
    GROUP BY f.query_id
    """,
)
def emb_truncated_topk_recall(spark: SparkSession, sf_dir: str):
    """Recall@k of truncated-dimension retrieval against full-dimension
    ground truth — the evaluation behind Matryoshka-style embeddings and
    every dimension-reduction decision an ANN index makes: keep the first
    {TRUNC_DIMS} of 64 dims (half the memory and FLOPs) and measure how
    much of the exact top-{TRUNC_K} survives, per query.

    Both retrievals are the established exact-cosine plan (queries
    broadcast, corpus streams once through codegen, rounded-sim +
    neighbor-id total order so both engines rank identically); the
    truncated side just slices the vector BEFORE the dot product, which
    cuts the per-pair cost proportionally — at 100 TB this pass is the
    cheap screen that decides whether the short prefix is good enough to
    serve from. The overlap join moves only (query, neighbor) narrow
    rows."""
    from ..llm.similarity import brute_force_cosine_topk

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    full = brute_force_cosine_topk(q, e, k=TRUNC_K).select(
        "query_id", "neighbor_id"
    )
    sl = F.expr(f"slice(embedding, 1, {TRUNC_DIMS})")
    tq = q.select("vec_id", sl.alias("embedding"))
    tc = e.select("vec_id", sl.alias("embedding"))
    trunc = brute_force_cosine_topk(tq, tc, k=TRUNC_K).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        full.join(trunc, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_overlap")
        )
        .select(
            "query_id",
            "n_overlap",
            F.round(F.col("n_overlap") / F.lit(float(TRUNC_K)), 6).alias(
                "recall"
            ),
        )
    )
