"""Document deduplication operators for training-data pipelines.

Four tiers, all pure DataFrame plans (no Python UDFs — everything stays in
whole-stage codegen) designed to hold at 100 TB:

- exact: md5 of normalized text → hash groupBy (one shuffle on a short key);
- n-gram Jaccard: shingle explode → self-join on shingle → pair counts;
  candidate generation only touches pairs that SHARE a shingle, so the
  join is linear in shingle-collision volume, not quadratic in documents;
- MinHash + LSH banding: k arithmetic min-hashes per doc (one groupBy),
  band buckets → bucket self-join → verify. Hash functions are
  (a_i·t + b_i) mod p over a dictionary token id, so signatures are
  deterministic and oracle-reproducible (Spark's own hash() differs from
  other engines' — a dictionary id join keeps us engine-portable);
- SimHash: bitwise majority over token-hash bits → one 32-bit signature
  per doc; duplicates collide exactly, near-duplicates within small
  Hamming distance.

The token-id dictionary (dense_rank over distinct tokens) adds one extra
shuffle; at production scale you'd persist the dictionary as a bucketed
table and reuse it across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Deterministic universal-hash parameters (public textbook construction:
# h_i(x) = (a_i x + b_i) mod p with p prime > universe).
MERSENNE_P = (1 << 31) - 1
HASH_AS = [7919, 104729, 224737, 350377, 479909, 611953, 746773, 882377,
           1020379, 1159523, 1299709, 1441331, 1583539, 1726943, 1870667, 2015177]
HASH_BS = [104659, 224711, 350353, 479879, 611921, 746747, 882343, 1020347,
           1159483, 1299673, 1441273, 1583489, 1726919, 1870607, 2015141, 7901]


def tokenize(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, token, pos) — lowercase whitespace tokens, JVM-side."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return df.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "token")
    ).filter(F.col("token") != "")


def token_ids(tokens: DataFrame) -> DataFrame:
    """Attach a deterministic dense token id (dictionary by token order).

    dense_rank over an unpartitioned window is a deliberate driver of a
    single-partition sort at test scale; production path: build the
    dictionary once with a distinct + zipWithIndex-free join and persist."""
    dict_df = (
        tokens.select("token").distinct()
        .withColumn("token_id", F.dense_rank().over(Window.orderBy("token")))
    )
    return tokens.join(F.broadcast(dict_df), "token")


def exact_dedup_by_hash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact near-free dedup: normalize, md5, keep min-id doc per hash."""
    norm = F.md5(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")))
    hashed = df.withColumn("text_hash", norm)
    keep = hashed.groupBy("text_hash").agg(F.min(id_col).alias(id_col))
    return hashed.join(keep, ["text_hash", id_col], "left_semi")


def word_shingles(tokens: DataFrame, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document via lead() windows —
    stays in codegen, no UDF."""
    w = Window.partitionBy(id_col).orderBy("pos")
    parts = [F.col("token")] + [F.lead("token", i).over(w) for i in range(1, n)]
    return (
        tokens.withColumn("shingle", F.concat_ws(" ", *parts))
        .withColumn("_last", F.lead("token", n - 1).over(w))
        .filter(F.col("_last").isNotNull())
        .select(id_col, "shingle")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Candidate duplicate pairs with exact n-gram Jaccard ≥ threshold.

    Self-join on shingle generates only co-occurring pairs; |A∪B| comes from
    per-doc shingle counts (|A|+|B|−|A∩B|), so no second pass over pairs."""
    sh = word_shingles(tokenize(df, text_col, id_col), id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 16
) -> DataFrame:
    """(id, hash_idx, minhash) — k arithmetic min-hashes over dictionary
    token ids. One explode over k (small constant) + one groupBy(id, i)."""
    toks = token_ids(tokenize(df, text_col, id_col)).select(id_col, "token_id").distinct()
    hash_params = [(i, HASH_AS[i], HASH_BS[i]) for i in range(num_hashes)]
    params = toks.sparkSession.createDataFrame(hash_params, ["hash_idx", "a", "b"])
    return (
        toks.crossJoin(F.broadcast(params))
        .withColumn(
            "hv",
            (F.col("a").cast("long") * F.col("token_id") + F.col("b"))
            % F.lit(MERSENNE_P),
        )
        .groupBy(id_col, "hash_idx")
        .agg(F.min("hv").alias("minhash"))
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    band_size: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band signatures → bucket self-join →
    verified exact Jaccard ≥ threshold. The shuffle-heavy all-pairs compare
    collapses to joins on (band, band_signature)."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes)
    bands = (
        sigs.withColumn("band", (F.col("hash_idx") / band_size).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_list(F.concat_ws(":", "hash_idx", "minhash")))
            ).alias("band_sig")
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    # Verify candidates with exact token-set Jaccard.
    toks = (
        tokenize(df, text_col, id_col).select(id_col, "token").distinct()
    )
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("sz"))
    ta = toks.select(F.col(id_col).alias("id_a"), "token")
    tb = toks.select(F.col(id_col).alias("id_b"), "token")
    inter = (
        cand.join(ta, "id_a").join(tb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, bits: int = 32
) -> DataFrame:
    """32-bit SimHash per document: for each bit j, sign of Σ_tokens
    (±1 by bit j of the token's arithmetic hash). Explode over bits is a
    ×32 row blowup on the token table — acceptable because the token table
    is already the small projection of the corpus."""
    toks = token_ids(tokenize(df, text_col, id_col)).select(id_col, "token_id")
    bit_idx = toks.sparkSession.range(bits).select(F.col("id").cast("int").alias("bit"))
    hv = (F.lit(HASH_AS[0]) * F.col("token_id") + F.lit(HASH_BS[0])) % F.lit(MERSENNE_P)
    contrib = (
        toks.withColumn("hv", hv)
        .crossJoin(F.broadcast(bit_idx))
        .withColumn(
            "delta",
            F.when(F.expr("(hv div shiftleft(1L, bit)) % 2") == 1, 1).otherwise(-1),
        )
        .groupBy(id_col, "bit")
        .agg(F.sum("delta").alias("s"))
    )
    return contrib.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, bit)")).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )
