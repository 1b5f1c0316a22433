"""LLM-training-data pipeline operators (driver north star): dedup tiers,
similarity search, text analysis, multimodal plumbing — all oracle-checked.

The SQL oracles reproduce the exact same deterministic constructions
(md5-derived token ids, arithmetic universal hashes, rounded cosines) so the
hash-compare is meaningful rather than vacuous.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ..llm.dedup import (
    HASH_AS,
    HASH_BS,
    MERSENNE_P,
    exact_dedup_by_hash,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_signatures,
    token_ids,
    tokenize,
    word_shingles,
)
from ..llm.multimodal import attach_binary_payload, payload_stats
from ..llm.similarity import brute_force_cosine_topk, lsh_bucketed_cosine_topk
from ..llm.text import (
    LANG_STOPWORDS,
    doc_fingerprint,
    language_id,
    quality_score,
    token_stats,
)
from ._util import t

# Shared oracle CTEs: tokenization identical to llm.dedup.tokenize (posexplode
# of a whitespace split, empty tokens dropped, positions preserved) and the
# md5-derived portable token id (llm.dedup.token_ids — 48 bits mod 2³¹−1).
_TOKS_SQL = """
    toks_raw AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token,
             unnest(range(len(regexp_split_to_array(trim(lower(text)), '\\s+')))) AS pos
      FROM documents),
    toks0 AS (SELECT * FROM toks_raw WHERE token != ''),
    toks AS (
      SELECT doc_id, token, pos,
             CAST(('0x' || substr(md5(token), 1, 12)) AS BIGINT) % 2147483647
               AS token_id
      FROM toks0)
"""


_NT_SQL = (
    "CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
)


# ----------------------------------------------------------- exact dedup
@register(
    "docs_exact_dedup",
    """
    WITH h AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS text_hash
      FROM documents)
    SELECT min(doc_id) AS doc_id, text_hash FROM h GROUP BY text_hash
    """,
)
def docs_exact_dedup(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    return exact_dedup_by_hash(d, "text", "doc_id").select("doc_id", "text_hash")


# ------------------------------------------------------- n-gram Jaccard
# Shared CTE chain ending in `ng_pairs` — reused by the keep-best query.
_NGRAM_PAIR_CTES = f"""
    {_TOKS_SQL},
    sh AS (
      SELECT DISTINCT doc_id,
             token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w AS shingle
      FROM toks
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(token, 2) OVER w IS NOT NULL),
    -- mirror of max_shingle_df=10000: drop boilerplate shingles before the
    -- pair join (no-op at test scale; semantics must match the Spark side)
    sh_capped AS (
      SELECT * FROM sh WHERE shingle NOT IN (
        SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > 10000)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh_capped GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM sh_capped a JOIN sh_capped b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    ng_pairs AS (
      SELECT id_a, id_b,
             inter / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
      FROM inter JOIN sizes sa ON sa.doc_id = id_a
                 JOIN sizes sb ON sb.doc_id = id_b
      WHERE inter / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5)
"""


@register(
    "docs_ngram_jaccard",
    f"""
    WITH {_NGRAM_PAIR_CTES}
    SELECT id_a, id_b, jaccard FROM ng_pairs
    """,
)
def docs_ngram_jaccard(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.5)


# ---------------------------------------- quality-aware canonical keep
@register(
    "docs_dedup_keep_best",
    f"""
    WITH RECURSIVE {_NGRAM_PAIR_CTES},
    kb_edges AS (
      SELECT id_a AS u, id_b AS v FROM ng_pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM ng_pairs),
    kb_reach(u, v) AS (
      SELECT u, v FROM kb_edges
      UNION
      SELECT r.u, e.v FROM kb_reach r JOIN kb_edges e ON r.v = e.u),
    kb_comp AS (
      SELECT u AS node, LEAST(u, MIN(v)) AS component FROM kb_reach GROUP BY u),
    kb_assign AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN kb_comp c ON c.node = d.doc_id),
    kb_m AS (
      SELECT doc_id,
             {_NT_SQL} AS n_tokens,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
             length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha
      FROM documents),
    kb_q AS (
      SELECT doc_id,
             round(0.4 * least(n_tokens / 64.0, 1.0)
                   + 0.3 * (n_alpha / CAST(greatest(n_chars, 1) AS DOUBLE))
                   + 0.2 * (1 - n_punct / CAST(greatest(n_chars, 1) AS DOUBLE))
                   + 0.1 * (CASE WHEN n_alpha / CAST(greatest(n_tokens, 1) AS DOUBLE)
                                      BETWEEN 2 AND 10
                                 THEN 1.0 ELSE 0.5 END), 6) AS quality
      FROM kb_m),
    kb_ranked AS (
      SELECT a.cluster_id, a.doc_id, q.quality,
             COUNT(*) OVER (PARTITION BY a.cluster_id) AS n_docs,
             ROW_NUMBER() OVER (PARTITION BY a.cluster_id
                                ORDER BY q.quality DESC, a.doc_id) AS rn
      FROM kb_assign a JOIN kb_q q ON q.doc_id = a.doc_id)
    SELECT cluster_id, doc_id AS kept_doc_id, quality, n_docs
    FROM kb_ranked WHERE rn = 1
    """,
)
def docs_dedup_keep_best(spark: SparkSession, sf_dir: str):
    """Quality-aware dedup: near-dup clusters (n-gram Jaccard pairs →
    connected components) keep their HIGHEST-QUALITY member instead of the
    min-id one — what a curation pipeline actually ships. Composition of
    three registry operators: pair generation, cluster resolution, quality
    scoring; ties break on doc_id (quality is 6-digit-rounded, near-dups
    often tie)."""
    from ..llm.cluster import neardup_cluster_assign

    d = t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.5)
    assign = neardup_cluster_assign(d, pairs, "doc_id").select("doc_id", "cluster_id")
    q = quality_score(d, "text", "doc_id").select("doc_id", "quality")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    wn = Window.partitionBy("cluster_id")
    return (
        assign.join(q, "doc_id")
        .withColumn("n_docs", F.count("*").over(wn))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id", F.col("doc_id").alias("kept_doc_id"), "quality", "n_docs"
        )
    )


# -------------------------------------------------------- MinHash + LSH
_HASHES_SQL = ", ".join(
    f"({i}, {HASH_AS[i]}, {HASH_BS[i]})" for i in range(16)
)


# The full MinHash-LSH pair pipeline as a reusable CTE chain ending in
# `mh_pairs` — shared by the pair query and the cluster-resolution query.
_MINHASH_PAIR_CTES = f"""
    {_TOKS_SQL},
    hashes(hash_idx, a, b) AS (VALUES {_HASHES_SQL}),
    doc_tokens AS (
      SELECT DISTINCT doc_id, token_id FROM toks),
    mh AS (
      SELECT doc_id, hash_idx,
             MIN((CAST(a AS BIGINT) * token_id + b) % {MERSENNE_P}) AS minhash
      FROM doc_tokens CROSS JOIN hashes GROUP BY doc_id, hash_idx),
    bands AS (
      SELECT doc_id, hash_idx // 4 AS band,
             string_agg(CAST(hash_idx AS VARCHAR) || ':' || CAST(minhash AS VARCHAR),
                        ',' ORDER BY CAST(hash_idx AS VARCHAR) || ':' || CAST(minhash AS VARCHAR))
               AS band_sig
      FROM mh GROUP BY doc_id, hash_idx // 4),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
    tok_sets AS (SELECT DISTINCT doc_id, token_id AS token FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok_sets GROUP BY doc_id),
    inter AS (
      SELECT id_a, id_b, COUNT(*) AS inter
      FROM cand JOIN tok_sets ta ON ta.doc_id = id_a
                JOIN tok_sets tb ON tb.doc_id = id_b AND tb.token = ta.token
      GROUP BY id_a, id_b),
    mh_pairs AS (
      SELECT id_a, id_b, inter / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
      FROM inter JOIN sizes sa ON sa.doc_id = id_a
                 JOIN sizes sb ON sb.doc_id = id_b
      WHERE inter / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5)
"""


@register(
    "docs_minhash_lsh",
    f"""
    WITH {_MINHASH_PAIR_CTES}
    SELECT id_a, id_b, jaccard FROM mh_pairs
    """,
)
def docs_minhash_lsh(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    return minhash_lsh_candidates(
        d, "text", "doc_id", num_hashes=16, band_size=4, threshold=0.5
    )


# ------------------------------------- near-dup cluster resolution (CC)
@register(
    "docs_neardup_clusters",
    f"""
    WITH RECURSIVE {_MINHASH_PAIR_CTES},
    cc_edges AS (
      SELECT id_a AS u, id_b AS v FROM mh_pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM mh_pairs),
    reach(u, v) AS (
      SELECT u, v FROM cc_edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN cc_edges e ON r.v = e.u),
    comp AS (
      SELECT u AS node, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u)
    SELECT d.doc_id,
           COALESCE(c.component, d.doc_id) AS cluster_id,
           COALESCE(c.component, d.doc_id) = d.doc_id AS is_canonical
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """,
)
def docs_neardup_clusters(spark: SparkSession, sf_dir: str):
    """The dedup pipeline's last mile: MinHash-LSH verified pairs →
    connected components (label propagation + pointer jumping, exact
    fixpoint) → per-doc cluster id and canonical-keep flag. The oracle
    resolves the same components with a recursive-CTE transitive
    closure."""
    from ..llm.cluster import neardup_cluster_assign

    d = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(
        d, "text", "doc_id", num_hashes=16, band_size=4, threshold=0.5
    )
    return neardup_cluster_assign(d, pairs, "doc_id")


# --------------------------------------------------------------- SimHash
@register(
    "docs_simhash",
    f"""
    WITH {_TOKS_SQL},
    doc_tokens AS (SELECT doc_id, token_id FROM toks),
    contrib AS (
      SELECT doc_id, bit,
             SUM(CASE WHEN ((CAST({HASH_AS[0]} AS BIGINT) * token_id + {HASH_BS[0]})
                            % {MERSENNE_P} >> bit) & 1 = 1
                      THEN 1 ELSE -1 END) AS s
      FROM doc_tokens CROSS JOIN range(32) t(bit)
      GROUP BY doc_id, bit)
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END)
                AS BIGINT) AS simhash
    FROM contrib GROUP BY doc_id
    """,
)
def docs_simhash(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    return simhash_signatures(d, "text", "doc_id", bits=32)


# ------------------------------------------------- cosine top-k (exact)
_COSINE_SQL = """
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10),
    c AS (
      SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings),
    sims AS (
      SELECT query_id, neighbor_id,
             round(list_dot_product(qv, cv) /
                   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
                   6) AS sim
      FROM c CROSS JOIN q WHERE query_id != neighbor_id{bucket_cond}),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM sims)
    SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
"""


@register("emb_cosine_topk_exact", _COSINE_SQL.format(bucket_cond=""))
def emb_cosine_topk_exact(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "embeddings")
    return brute_force_cosine_topk(
        e.filter(F.col("vec_id") < 10), e, k=5
    )


_BUCKET_DIMS = [0, 8, 16, 24, 32, 40, 48, 56]
_BUCKET_SQL = " + ".join(
    f"(CASE WHEN embedding[{d + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i, d in enumerate(_BUCKET_DIMS)
)


@register(
    "emb_cosine_topk_lsh",
    _COSINE_SQL.replace(
        "SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv",
        f"SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, {_BUCKET_SQL} AS qb",
    )
    .replace(
        "SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv",
        f"SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv, {_BUCKET_SQL} AS cb",
    )
    .format(bucket_cond=" AND qb = cb"),
)
def emb_cosine_topk_lsh(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "embeddings")
    return lsh_bucketed_cosine_topk(
        e.filter(F.col("vec_id") < 10), e, k=5, dims=_BUCKET_DIMS
    )


# ------------------------------------------------- IVF approximate top-k
_IVF_COS = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)


@register(
    "emb_cosine_topk_ivf",
    f"""
    WITH cent AS (
      SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cent_v
      FROM embeddings WHERE vec_id < 16),
    corp AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    corp_assign AS (
      SELECT vec_id AS neighbor_id, v AS cv, cent_id FROM (
        SELECT corp.vec_id, corp.v, cent.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY corp.vec_id
                 ORDER BY {_IVF_COS.format(a="v", b="cent_v")} DESC, cent_id
               ) AS rn
        FROM corp CROSS JOIN cent) WHERE rn = 1),
    q_assign AS (
      SELECT vec_id AS query_id, v AS qv, cent_id FROM (
        SELECT corp.vec_id, corp.v, cent.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY corp.vec_id
                 ORDER BY {_IVF_COS.format(a="v", b="cent_v")} DESC, cent_id
               ) AS rn
        FROM corp CROSS JOIN cent WHERE corp.vec_id < 10) WHERE rn <= 2),
    sims AS (
      SELECT query_id, neighbor_id,
             {_IVF_COS.format(a="qv", b="cv")} AS sim
      FROM corp_assign JOIN q_assign USING (cent_id)
      WHERE query_id != neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM sims)
    SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
    """,
)
def emb_cosine_topk_ivf(spark: SparkSession, sf_dir: str):
    """IVF coarse-quantizer ANN: inverted lists under deterministic seed
    centroids (vec_id < 16), queries probe their 2 nearest lists. The third
    point on the exact↔LSH↔IVF accuracy/cost curve."""
    from ..llm.similarity import ivf_cosine_topk

    e = t(spark, sf_dir, "embeddings")
    return ivf_cosine_topk(
        e.filter(F.col("vec_id") < 10),
        e,
        e.filter(F.col("vec_id") < 16),
        k=5,
        nprobe=2,
    )


# ------------------------------------------------------- language id
_STOPWORDS_SQL = ", ".join(
    f"('{lang}', '{w}')" for lang, ws in LANG_STOPWORDS.items() for w in ws
)


@register(
    "docs_language_id",
    f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
      FROM documents),
    stop(lang_cand, stopword) AS (VALUES {_STOPWORDS_SQL}),
    hits AS (
      SELECT doc_id, lang_cand, COUNT(*) AS hits
      FROM toks JOIN stop ON token = stopword AND token != ''
      GROUP BY doc_id, lang_cand),
    best AS (
      SELECT doc_id, lang_cand AS predicted_lang, hits,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY hits DESC, lang_cand) AS rn
      FROM hits)
    SELECT d.doc_id,
           coalesce(b.predicted_lang, 'und') AS predicted_lang,
           coalesce(b.hits, 0) AS hits
    FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
    """,
)
def docs_language_id(spark: SparkSession, sf_dir: str):
    return language_id(t(spark, sf_dir, "documents"), "text", "doc_id")


# ------------------------------------------------------ quality scoring


@register(
    "docs_quality_score",
    f"""
    WITH m AS (
      SELECT doc_id,
             {_NT_SQL} AS n_tokens,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
             length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha
      FROM documents),
    r AS (
      SELECT doc_id, n_tokens,
             n_punct / CAST(greatest(n_chars, 1) AS DOUBLE) AS punct_ratio,
             n_alpha / CAST(greatest(n_chars, 1) AS DOUBLE) AS alpha_ratio,
             n_alpha / CAST(greatest(n_tokens, 1) AS DOUBLE) AS mean_word_len,
             least(n_tokens / 64.0, 1.0) AS length_score
      FROM m)
    SELECT doc_id, n_tokens,
           round(punct_ratio, 6) AS punct_ratio,
           round(alpha_ratio, 6) AS alpha_ratio,
           round(0.4 * length_score + 0.3 * alpha_ratio + 0.2 * (1 - punct_ratio)
                 + 0.1 * (CASE WHEN mean_word_len >= 2 AND mean_word_len <= 10
                               THEN 1.0 ELSE 0.5 END), 6) AS quality
    FROM r
    """,
)
def docs_quality_score(spark: SparkSession, sf_dir: str):
    return quality_score(t(spark, sf_dir, "documents"), "text", "doc_id")


# -------------------------------------------------------- token stats
@register(
    "docs_token_stats",
    f"""
    SELECT doc_id,
           length(text) AS n_chars_measured,
           {_NT_SQL} AS n_tokens_ws,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_tokens_bpe,
           length(text) / CAST(greatest({_NT_SQL}, 1) AS DOUBLE) AS chars_per_token
    FROM documents
    """,
)
def docs_token_stats(spark: SparkSession, sf_dir: str):
    return token_stats(t(spark, sf_dir, "documents"), "text", "doc_id")


# ------------------------------------------------------- fingerprinting
_POW31_SQL = "[" + ", ".join(str(31**i) for i in range(8)) + "]"


@register(
    "docs_fingerprint",
    f"""
    WITH {_TOKS_SQL},
    terms AS (
      SELECT doc_id,
             ((token_id % 1048573) * ({_POW31_SQL})[CAST(pos % 8 AS INT) + 1]) % 2147483647 AS term
      FROM toks)
    SELECT doc_id, CAST(SUM(term) % 2147483647 AS BIGINT) AS fingerprint
    FROM terms GROUP BY doc_id
    """,
)
def docs_fingerprint(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    toks = token_ids(tokenize(d, "text", "doc_id"))
    return doc_fingerprint(toks, "doc_id")


# ------------------------------------------------- multimodal plumbing
@register(
    "multimodal_payload_stats",
    """
    SELECT doc_id, strlen(text) AS n_bytes, sha256(text) AS sha256
    FROM documents
    """,
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str):
    d = attach_binary_payload(t(spark, sf_dir, "documents"), "text")
    return payload_stats(d).select(
        "doc_id", "n_bytes", F.col("sha256").alias("sha256")
    )


# mapInPandas decode stage — not SQL-expressible (Arrow batch boundary);
# driver records the weaker rows-only check. The features array is projected
# through to_json so every output column is a hashable scalar (the driver's
# canonicalizer hashes row tuples and cannot digest Python lists — r2 err).
@register("multimodal_decode_features", None)
def multimodal_decode_features(spark: SparkSession, sf_dir: str):
    from ..llm.multimodal import decode_media

    d = attach_binary_payload(t(spark, sf_dir, "documents"), "text")
    decoded = decode_media(d, payload_col="payload", id_col="doc_id")
    return decoded.withColumn("features_json", F.to_json("features")).drop(
        "features"
    )


# The same decode stage, ORACLE-CHECKED: the deterministic fake decoder's
# byte statistics (payloads are ASCII text → byte == codepoint) are
# reproduced in SQL, so the Arrow mapInPandas boundary itself gets a full
# value-hash gate, not just a rows-only check. The features array is
# posexploded to scalar (feat_idx, feat_value) rows — every column hashable,
# doubles compared as doubles (no JSON float-formatting dependence).
@register(
    "multimodal_decode_oracle",
    """
    WITH chk AS (
      SELECT doc_id, length(text) AS n,
             COALESCE(SUM(ord(substr(text, CAST(gs.i AS INT) + 1, 1))), 0)
               AS checksum
      FROM documents LEFT JOIN LATERAL
           (SELECT unnest(range(least(length(text), 256))) AS i) gs ON TRUE
      GROUP BY doc_id, length(text))
    SELECT doc_id, 'fake' AS media_type,
           CAST(checksum % 64 + 1 AS INT) AS width,
           CAST(n % 64 + 1 AS INT) AS height,
           CAST(n AS INT) AS duration_ms,
           'deterministic-fake' AS codec,
           f.idx AS feat_idx, f.val AS feat_value
    FROM chk, LATERAL (VALUES
           (0, CAST(checksum % 64 + 1 AS DOUBLE)),
           (1, CAST(n % 64 + 1 AS DOUBLE)),
           (2, CAST(n % 97 AS DOUBLE)),
           (3, CAST(n % 89 AS DOUBLE))) AS f(idx, val)
    """,
)
def multimodal_decode_oracle(spark: SparkSession, sf_dir: str):
    from ..llm.multimodal import decode_media

    d = attach_binary_payload(t(spark, sf_dir, "documents"), "text")
    decoded = decode_media(d, payload_col="payload", id_col="doc_id")
    return decoded.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        "duration_ms",
        "codec",
        F.posexplode("features").alias("feat_idx", "feat_value"),
    )


# -------------------------------------- embedding-cosine near-dup pairs
@register(
    "emb_cosine_neardup",
    f"""
    WITH c AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, {_BUCKET_SQL} AS bucket
      FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                 6) AS sim
    FROM c a JOIN c b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v) /
                (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                6) >= 0.2
    """,
)
def emb_cosine_neardup(spark: SparkSession, sf_dir: str):
    """Embedding-cosine near-duplicate detection: sign-bucket LSH candidate
    self-join + row-local cosine verify (the vector analogue of MinHash-LSH
    dedup — candidates shuffle by bucket, never all-pairs)."""
    from ..llm.similarity import cosine_neardup_pairs

    e = t(spark, sf_dir, "embeddings")
    return cosine_neardup_pairs(e, threshold=0.2, dims=_BUCKET_DIMS)


# ----------------------------------------------------- TF-IDF top terms
@register(
    "docs_tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
      FROM documents),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks
      WHERE token != '' GROUP BY doc_id, token),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, token, tf, df,
             round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
      FROM tf JOIN dfreq USING (token) CROSS JOIN n),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, token) AS rk
      FROM scored)
    SELECT doc_id, token, tf, df, tfidf, rk FROM ranked WHERE rk <= 3
    """,
)
def docs_tfidf_top_terms(spark: SparkSession, sf_dir: str):
    from ..llm.text import tfidf_top_terms

    return tfidf_top_terms(t(spark, sf_dir, "documents"), "text", "doc_id", k=3)


# ---------------------------------------- approx sketches (rows-only-ish)
# HLL sketches are engine-specific — no exact oracle exists by design; the
# test suite asserts ±5% of the exact count instead, and the oracle checks
# only the exact companion columns.
@register(
    "agg_approx_vs_exact_distinct",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
    FROM events GROUP BY event_type
    """,
)
def agg_approx_vs_exact_distinct(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return exact  # approx twin exercised in tests (test_llm/test_operators)


# ------------------------------------------- array / higher-order funcs
@register(
    "docs_array_token_ops",
    """
    WITH arr AS (
      SELECT doc_id,
             list_sort(list_distinct(
               list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                           t -> t != ''))) AS toks
      FROM documents)
    SELECT doc_id,
           len(toks) AS n_distinct,
           toks[1] AS first_tok,
           toks[len(toks)] AS last_tok,
           array_to_string(toks[1:3], ',') AS first3
    FROM arr
    """,
)
def docs_array_token_ops(spark: SparkSession, sf_dir: str):
    """Array-function family over tokenized text: filter → distinct → sort →
    element access → slice → join, all JVM-side higher-order functions."""
    d = t(spark, sf_dir, "documents")
    toks = F.array_sort(
        F.array_distinct(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda x: x != "",
            )
        )
    )
    arr = d.select("doc_id", toks.alias("toks"))
    return arr.select(
        "doc_id",
        F.size("toks").alias("n_distinct"),
        F.element_at("toks", 1).alias("first_tok"),
        F.element_at("toks", F.size("toks")).alias("last_tok"),
        F.array_join(F.slice("toks", 1, 3), ",").alias("first3"),
    )


# ------------------------------------------ vector normalize (transform)
@register(
    "emb_normalize_vectors",
    """
    WITH n AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    m AS (
      SELECT vec_id, sqrt(list_dot_product(v, v)) AS nrm, v FROM n)
    SELECT vec_id,
           round(nrm, 6) AS norm,
           round(v[1] / nrm, 6) AS u0,
           round(v[2] / nrm, 6) AS u1,
           round(v[64] / nrm, 6) AS u63
    FROM m
    """,
)
def emb_normalize_vectors(spark: SparkSession, sf_dir: str):
    """L2-normalize embeddings with transform/aggregate (no UDF); projected
    to spot dimensions + rounded so the hash-compare is float-stable."""
    from ..llm.similarity import _norm

    e = t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    m = e.select("vec_id", v.alias("v")).withColumn("nrm", _norm(F.col("v")))
    return m.select(
        "vec_id",
        F.round("nrm", 6).alias("norm"),
        F.round(F.element_at("v", 1) / F.col("nrm"), 6).alias("u0"),
        F.round(F.element_at("v", 2) / F.col("nrm"), 6).alias("u1"),
        F.round(F.element_at("v", 64) / F.col("nrm"), 6).alias("u63"),
    )


# -------------------------------------- regexp_extract_all + explode
@register(
    "docs_extract_numbers",
    """
    WITH nums AS (
      SELECT doc_id,
             unnest(regexp_extract_all(source || ' len=' || CAST(n_chars AS VARCHAR)
                                       || ' id:' || CAST(doc_id AS VARCHAR),
                                       '[0-9]+')) AS num_str
      FROM documents)
    SELECT doc_id, num_str, CAST(num_str AS BIGINT) AS num_val
    FROM nums WHERE length(num_str) <= 18
    """,
)
def docs_extract_numbers(spark: SparkSession, sf_dir: str):
    """regexp_extract_all → explode → cast: pull every integer literal out
    of the text (the parametric-search precursor for stringly measures)."""
    d = t(spark, sf_dir, "documents")
    meta = F.concat(
        F.col("source"), F.lit(" len="), F.col("n_chars").cast("string"),
        F.lit(" id:"), F.col("doc_id").cast("string"),
    )
    return (
        d.select(
            "doc_id",
            F.explode(F.regexp_extract_all(meta, F.lit("[0-9]+"), 0)).alias("num_str"),
        )
        .filter(F.length("num_str") <= 18)
        .withColumn("num_val", F.col("num_str").cast("bigint"))
    )


# ------------------------------------------- benchmark decontamination
@register(
    "docs_decontaminate",
    f"""
    WITH {_TOKS_SQL},
    sh AS (
      SELECT DISTINCT doc_id,
             token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w AS shingle
      FROM toks
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(token, 2) OVER w IS NOT NULL),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 10),
    hits AS (
      SELECT s.doc_id, COUNT(DISTINCT s.shingle) AS n_shared
      FROM sh s JOIN bench b ON s.shingle = b.shingle
      WHERE s.doc_id >= 10
      GROUP BY s.doc_id)
    SELECT doc_id, n_shared, n_shared >= 5 AS contaminated
    FROM hits
    """,
)
def docs_decontaminate(spark: SparkSession, sf_dir: str):
    """Benchmark decontamination: corpus docs sharing ≥5 distinct 3-gram
    shingles with the held-out set (doc_id < 10 stands in for an eval
    benchmark) get flagged for removal — the training-data hygiene step
    that keeps eval numbers honest. The benchmark shingle set is tiny by
    construction → broadcast; the corpus never self-joins."""
    d = t(spark, sf_dir, "documents")
    toks = tokenize(d, "text", "doc_id")
    sh = word_shingles(toks, "doc_id", n=3)
    bench = (
        sh.filter(F.col("doc_id") < 10).select("shingle").distinct()
    )
    return (
        sh.filter(F.col("doc_id") >= 10)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_shared"))
        .withColumn("contaminated", F.col("n_shared") >= 5)
    )


# ------------------------------------------ per-language vocabulary top-k
@register(
    "docs_top_tokens_per_lang",
    f"""
    WITH {_TOKS_SQL},
    counts AS (
      SELECT d.lang, t.token, COUNT(*) AS n
      FROM toks t JOIN documents d ON d.doc_id = t.doc_id
      GROUP BY d.lang, t.token),
    ranked AS (
      SELECT lang, token, n,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rk
      FROM counts)
    SELECT lang, token, n, rk FROM ranked WHERE rk <= 10
    """,
)
def docs_top_tokens_per_lang(spark: SparkSession, sf_dir: str):
    """Corpus-level vocabulary: top-10 tokens per language (token counts
    shuffle on (lang, token) — short keys; per-group top-k via window with
    deterministic token tie-break). The census a tokenizer-training or
    stopword-induction step starts from."""
    d = t(spark, sf_dir, "documents")
    toks = tokenize(d, "text", "doc_id")
    counts = (
        toks.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("lang", "token", "n", "rk")
    )


# ------------------------------------- co-occurrence lift (log-free PMI)
@register(
    "docs_cooccurrence_lift",
    f"""
    WITH {_TOKS_SQL},
    doc_tok AS (SELECT DISTINCT doc_id, token FROM toks),
    tok_df AS (
      SELECT token, COUNT(*) AS df FROM doc_tok GROUP BY token),
    vocab AS (SELECT token, df FROM tok_df WHERE df >= 100),
    n_docs AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents),
    pairs AS (
      SELECT a.token AS tok_a, b.token AS tok_b, COUNT(*) AS n_ab
      FROM doc_tok a
        JOIN vocab va ON va.token = a.token
        JOIN doc_tok b ON b.doc_id = a.doc_id AND a.token < b.token
        JOIN vocab vb ON vb.token = b.token
      GROUP BY a.token, b.token)
    SELECT tok_a, tok_b, n_ab,
           CAST(n_ab AS DOUBLE) * (SELECT nd FROM n_docs)
           / (CAST(va.df AS DOUBLE) * vb.df) AS lift
    FROM pairs JOIN vocab va ON va.token = tok_a
               JOIN vocab vb ON vb.token = tok_b
    WHERE n_ab >= 50
    """,
)
def docs_cooccurrence_lift(spark: SparkSession, sf_dir: str):
    """Token co-occurrence lift — PMI without the logarithm, so the score
    is a ratio of EXACT integers (doc counts) and stays bit-identical
    cross-engine (log is libm territory, excluded by the parity policy;
    lift ranks identically since log is monotone). Vocabulary is
    df-thresholded BEFORE the pair join — the frequency cut is what keeps
    the self-join linear-ish instead of |tokens|² per doc at corpus
    scale."""
    d = t(spark, sf_dir, "documents")
    doc_tok = tokenize(d, "text", "doc_id").select("doc_id", "token").distinct()
    tok_df = doc_tok.groupBy("token").agg(F.count("*").alias("df"))
    vocab = tok_df.filter(F.col("df") >= 100)
    nd = d.agg(F.countDistinct("doc_id").alias("nd"))
    a = doc_tok.join(F.broadcast(vocab.select("token")), "token").select(
        F.col("doc_id"), F.col("token").alias("tok_a")
    )
    b = doc_tok.join(F.broadcast(vocab.select("token")), "token").select(
        F.col("doc_id"), F.col("token").alias("tok_b")
    )
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 50)
    )
    va = vocab.select(F.col("token").alias("tok_a"), F.col("df").alias("df_a"))
    vb = vocab.select(F.col("token").alias("tok_b"), F.col("df").alias("df_b"))
    return (
        pairs.join(F.broadcast(va), "tok_a")
        .join(F.broadcast(vb), "tok_b")
        .crossJoin(F.broadcast(nd))
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            (
                F.col("n_ab").cast("double")
                * F.col("nd")
                / (F.col("df_a").cast("double") * F.col("df_b"))
            ).alias("lift"),
        )
    )


# ------------------------------------ within-doc repetition filters
@register(
    "docs_repetition_filter",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
             unnest(range(len(regexp_split_to_array(trim(text), '\s+')))) AS pos
      FROM documents WHERE trim(text) <> ''),
    base AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
               AS n_tokens
      FROM documents),
    bic AS (
      SELECT a.doc_id, a.tok || ' ' || b.tok AS g, COUNT(*) AS c
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      GROUP BY 1, 2),
    bia AS (SELECT doc_id, SUM(c) AS n_bi, MAX(c) AS top_bi
            FROM bic GROUP BY doc_id),
    tric AS (
      SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c3.tok AS g,
             COUNT(*) AS c
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                  JOIN toks c3
        ON a.doc_id = c3.doc_id AND c3.pos = a.pos + 2
      GROUP BY 1, 2),
    tria AS (SELECT doc_id,
                    SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_tri,
                    SUM(c) AS n_tri
             FROM tric GROUP BY doc_id)
    SELECT b.doc_id,
           CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(COALESCE(n_bi, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(top_bi, 0) AS BIGINT) AS top_bigram_n,
           CAST(COALESCE(dup_tri, 0) AS BIGINT) AS dup_trigram_n,
           CASE WHEN 50 * COALESCE(top_bi, 0) <= 9 * COALESCE(n_bi, 0)
                THEN 1 ELSE 0 END AS pass_top_bigram,
           CASE WHEN 4 * COALESCE(dup_tri, 0) <= COALESCE(n_tri, 0)
                THEN 1 ELSE 0 END AS pass_dup_trigram
    FROM base b LEFT JOIN bia USING (doc_id) LEFT JOIN tria USING (doc_id)
    """,
)
def docs_repetition_filter(spark: SparkSession, sf_dir: str):
    """Gopher-style WITHIN-document repetition rules — the standard
    pretraining-corpus screens the cross-doc dedup tier doesn't cover: a
    doc dominated by one repeated bigram (top-bigram share > 18%) or by
    duplicated trigrams (> 25% of trigram instances non-unique) is
    boilerplate/spam even when globally unique.

    Scale shape: n-grams are built ROW-LOCALLY with zip_with over array
    slices (JVM codegen, no Python, no self-join — the oracle's pos+1
    self-join is the cross-engine mirror, not the plan); the only
    shuffles are the two (doc_id, gram) partial-agg groupBys, and the
    per-doc rollups ride the same doc_id key. All outputs and gates are
    integers (gate thresholds as cross-products: 50·top ≤ 9·n ⟺ ≤ 0.18,
    4·dup ≤ n ⟺ ≤ 0.25), so the report is bit-exact on any engine.

    Reference parity: generalizes the reference's density/validity row
    screens (tables.py:244-263) from cell-null ratios to token-stream
    repetition ratios."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != F.lit("")
    )
    base = d.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.col("toks").alias("toks"),
    )
    n = F.col("n_tokens")
    m2 = F.greatest(n - 1, F.lit(0))
    m3 = F.greatest(n - 2, F.lit(0))
    grams = base.select(
        "doc_id",
        "n_tokens",
        F.zip_with(
            F.slice("toks", F.lit(1), m2),
            F.slice("toks", F.lit(2), m2),
            lambda a, b: F.concat_ws(" ", a, b),
        ).alias("bi"),
        F.zip_with(
            F.zip_with(
                F.slice("toks", F.lit(1), m3),
                F.slice("toks", F.lit(2), m3),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
            F.slice("toks", F.lit(3), m3),
            lambda ab, c: F.concat_ws(" ", ab, c),
        ).alias("tri"),
    )
    bia = (
        grams.select("doc_id", F.explode("bi").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_bi"), F.max("c").alias("top_bi"))
    )
    tria = (
        grams.select("doc_id", F.explode("tri").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
                "dup_tri"
            ),
            F.sum("c").alias("n_tri"),
        )
    )
    z = F.lit(0).cast("bigint")
    out = (
        grams.select("doc_id", "n_tokens")
        .join(bia, "doc_id", "left")
        .join(tria, "doc_id", "left")
    )
    n_bi = F.coalesce(F.col("n_bi"), z)
    top_bi = F.coalesce(F.col("top_bi"), z)
    dup_tri = F.coalesce(F.col("dup_tri"), z)
    n_tri = F.coalesce(F.col("n_tri"), z)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        n_bi.cast("bigint").alias("n_bigrams"),
        top_bi.cast("bigint").alias("top_bigram_n"),
        dup_tri.cast("bigint").alias("dup_trigram_n"),
        F.when(50 * top_bi <= 9 * n_bi, 1).otherwise(0).alias("pass_top_bigram"),
        F.when(4 * dup_tri <= n_tri, 1).otherwise(0).alias("pass_dup_trigram"),
    )


# --------------------------- cross-doc boilerplate n-gram share
@register(
    "docs_boilerplate_share",
    f"""
    WITH {_TOKS_SQL},
    bp_sh AS (
      SELECT DISTINCT doc_id,
             token || ' ' || lead(token, 1) OVER w || ' ' ||
             lead(token, 2) OVER w AS shingle
      FROM toks
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(token, 2) OVER w IS NOT NULL),
    bp_df AS (SELECT shingle, COUNT(*) AS df FROM bp_sh GROUP BY shingle)
    SELECT s.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS shared_shingles,
           CASE WHEN 2 * SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END)
                     <= COUNT(*)
                THEN 1 ELSE 0 END AS pass_boilerplate
    FROM bp_sh s JOIN bp_df d USING (shingle)
    GROUP BY s.doc_id
    """,
)
def docs_boilerplate_share(spark: SparkSession, sf_dir: str):
    """CROSS-document repetition screen — the inter-doc complement of
    docs_repetition_filter's within-doc rules: for each document, how many
    of its distinct 3-gram shingles also occur in at least one OTHER
    document (document frequency ≥ 2 — since per-doc shingles are
    distinct, corpus df counts documents). A doc whose shingles are
    mostly corpus-shared is boilerplate (headers, templates, licence
    text) even when no single near-dup partner exists — the standard
    pretraining screen between exact/near dedup and quality gating.

    Scale shape: one shingle table (codegen lead() windows, no UDF), one
    (shingle) groupBy for corpus df with map-side partial aggregation,
    one join back on the shingle key, one (doc_id) rollup. The join
    shuffles (shingle, doc_id) narrow pairs — linear in corpus shingle
    volume, never pairwise. The pass gate is an integer cross-product
    (2·shared ≤ n ⟺ share ≤ 50%), engine-exact.

    Reference parity: generalizes the reference's idempotent-source skip
    (main.py:90-92 — skip content already ingested) from file identity to
    fractional content overlap."""
    from ..llm.dedup import tokenize, word_shingles

    d = t(spark, sf_dir, "documents")
    sh = word_shingles(tokenize(d, "text", "doc_id"), "doc_id", n=3)
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    shared = F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
    return (
        sh.join(df_counts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            shared.cast("bigint").alias("shared_shingles"),
        )
        .withColumn(
            "pass_boilerplate",
            F.when(
                2 * F.col("shared_shingles") <= F.col("n_shingles"), 1
            ).otherwise(0),
        )
    )


# ------------------------------- embedding scalar quantization (int8)
@register(
    "emb_scalar_quantize",
    """
    WITH comp AS (
      SELECT vec_id,
             unnest(CAST(embedding AS DOUBLE[])) AS val,
             unnest(range(len(embedding))) AS dim
      FROM embeddings),
    st AS (SELECT dim, MIN(val) AS mn, MAX(val) AS mx
           FROM comp GROUP BY dim)
    SELECT vec_id, comp.dim AS dim,
           CAST(CASE WHEN mx = mn THEN 0
                     ELSE floor((val - mn) * 255.0 / (mx - mn)) END
                AS INT) AS q
    FROM comp JOIN st USING (dim)
    """,
)
def emb_scalar_quantize(spark: SparkSession, sf_dir: str):
    """Per-dimension scalar quantization of the embedding corpus to int8
    codes (0..255) — the standard ANN memory-compression step (4× smaller
    than float32 before any product quantization), applied corpus-wide
    with per-dimension min/max calibration.

    Scale shape: one explode → one 64-row per-dimension aggregate →
    broadcast the 64-row stats table back onto the component stream — the
    quantization itself is a row-local affine map in codegen. At 100 TB
    the stats aggregate is a partial+final merge of 64 rows per
    partition; nothing else shuffles.

    Parity shape: float32 components widen to double exactly; both
    engines evaluate the SAME association (val - mn) * 255.0 / (mx - mn)
    on identical doubles, and floor() of an identical double is
    identical, so the codes hash-compare without a rounding policy.
    Output is posexploded (vec_id, dim, q) scalars — hashable by the
    driver canonicalizer."""
    e = t(spark, sf_dir, "embeddings")
    comp = e.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "val"
        ),
    )
    st = comp.groupBy("dim").agg(
        F.min("val").alias("mn"), F.max("val").alias("mx")
    )
    q = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.floor((F.col("val") - F.col("mn")) * 255.0 / (F.col("mx") - F.col("mn")))
    )
    return comp.join(F.broadcast(st), "dim").select(
        "vec_id", "dim", q.cast("int").alias("q")
    )


# --------------------------- incremental (ingest-time) near-dup dedup
@register(
    "docs_incremental_neardup",
    f"""
    WITH {_TOKS_SQL},
    hashes(hash_idx, a, b) AS (VALUES {_HASHES_SQL}),
    doc_tokens AS (
      SELECT DISTINCT doc_id, token_id FROM toks),
    mh AS (
      SELECT doc_id, hash_idx,
             MIN((CAST(a AS BIGINT) * token_id + b) % {MERSENNE_P}) AS minhash
      FROM doc_tokens CROSS JOIN hashes GROUP BY doc_id, hash_idx),
    bands AS (
      SELECT doc_id, hash_idx // 4 AS band,
             string_agg(CAST(hash_idx AS VARCHAR) || ':' || CAST(minhash AS VARCHAR),
                        ',' ORDER BY CAST(hash_idx AS VARCHAR) || ':' || CAST(minhash AS VARCHAR))
               AS band_sig
      FROM mh GROUP BY doc_id, hash_idx // 4),
    cand AS (
      SELECT DISTINCT a.doc_id AS inc_id, b.doc_id AS corp_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_sig = b.band_sig
      WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0),
    tok_sets AS (SELECT DISTINCT doc_id, token_id AS token FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok_sets GROUP BY doc_id),
    inter AS (
      SELECT inc_id, corp_id, COUNT(*) AS inter
      FROM cand JOIN tok_sets ta ON ta.doc_id = inc_id
                JOIN tok_sets tb ON tb.doc_id = corp_id AND tb.token = ta.token
      GROUP BY inc_id, corp_id)
    SELECT inc_id, corp_id,
           inter / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = inc_id
               JOIN sizes sb ON sb.doc_id = corp_id
    WHERE inter / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5
    """,
)
def docs_incremental_neardup(spark: SparkSession, sf_dir: str):
    """Ingest-time dedup: the 10%% of documents with doc_id % 10 = 0 play
    the NEW BATCH; the other 90%% are the EXISTING corpus. The increment
    band-joins against the corpus's LSH index — the corpus never pairs
    with itself, which is the whole point: a daily ingest at 100 TB
    re-dedups only increment×corpus, not corpus², and the corpus's
    signature/band table is the persistent dedup index (recomputed here
    per run because the gate is stateless; in production it is a bucketed
    table updated per batch). Operator: llm/dedup.py::
    minhash_lsh_incremental (broadcast increment bands, verified exact
    token-set Jaccard)."""
    from ..llm.dedup import minhash_lsh_incremental

    d = t(spark, sf_dir, "documents")
    increment = d.filter(F.col("doc_id") % 10 == 0)
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    return minhash_lsh_incremental(
        corpus, increment, "text", "doc_id",
        num_hashes=16, band_size=4, threshold=0.5,
    )


# --------------------------------------- corpus curation funnel report
@register(
    "docs_curation_funnel",
    f"""
    WITH RECURSIVE {_MINHASH_PAIR_CTES},
    cf_edges AS (
      SELECT id_a AS u, id_b AS v FROM mh_pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM mh_pairs),
    cf_reach(u, v) AS (
      SELECT u, v FROM cf_edges
      UNION
      SELECT r.u, e.v FROM cf_reach r JOIN cf_edges e ON r.v = e.u),
    cf_comp AS (
      SELECT u AS node, LEAST(u, MIN(v)) AS component
      FROM cf_reach GROUP BY u),
    cf_canon AS (
      SELECT d.doc_id,
             COALESCE(c.component, d.doc_id) = d.doc_id AS is_canonical
      FROM documents d LEFT JOIN cf_comp c ON c.node = d.doc_id),
    cf_gates AS (
      SELECT doc_id,
             CASE WHEN n_tokens BETWEEN 5 AND 100000
                   AND 5 * n_alpha >= 3 * GREATEST(n_chars, 1)
                   AND 5 * n_punct <= GREATEST(n_chars, 1)
                   AND n_alpha BETWEEN 2 * n_tokens AND 12 * n_tokens
                  THEN 1 ELSE 0 END AS pass_quality
      FROM (SELECT doc_id,
                   {_NT_SQL} AS n_tokens,
                   length(text) AS n_chars,
                   length(text)
                     - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                     AS n_punct,
                   length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                     AS n_alpha
            FROM documents))
    SELECT
      (SELECT COUNT(*) FROM documents) AS n_raw,
      (SELECT COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))
       FROM documents) AS n_exact_unique,
      CAST((SELECT SUM(CASE WHEN is_canonical THEN 1 ELSE 0 END) FROM cf_canon)
           AS BIGINT) AS n_neardup_canonical,
      CAST((SELECT SUM(pass_quality) FROM cf_gates) AS BIGINT) AS n_pass_quality,
      CAST((SELECT SUM(CASE WHEN c.is_canonical AND g.pass_quality = 1
                            THEN 1 ELSE 0 END)
            FROM cf_canon c JOIN cf_gates g USING (doc_id)) AS BIGINT)
        AS n_final_kept
    """,
)
def docs_curation_funnel(spark: SparkSession, sf_dir: str):
    """The whole curation pipeline as ONE report row — the numbers a data
    lead reads before shipping a corpus: raw docs → exact-unique texts →
    near-dup canonical survivors (MinHash-LSH pairs → connected
    components) → Gopher-gate passers → the final intersection actually
    kept. Composes four registered operator families in a single lazy
    plan; every count is an exact integer, so the report hash-compares
    against the recursive-CTE oracle bit-for-bit.

    Scale shape: the funnel adds nothing beyond its constituents — the
    dominant cost is the near-dup tier (see docs_minhash_lsh); the gate
    metrics ride the same documents scan."""
    from ..llm.cluster import neardup_cluster_assign
    from ..llm.dedup import minhash_lsh_candidates
    from ..llm.text import token_count_expr

    d = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(
        d, "text", "doc_id", num_hashes=16, band_size=4, threshold=0.5
    )
    canon = neardup_cluster_assign(d, pairs, "doc_id")

    txt = F.col("text")
    n_tokens = token_count_expr(txt)
    n_chars = F.length(txt)
    n_punct = n_chars - F.length(F.regexp_replace(txt, r"[^\w\s]", ""))
    n_alpha = F.length(F.regexp_replace(F.lower(txt), r"[^a-z]", ""))
    one = F.lit(1)
    gates = d.select(
        "doc_id",
        F.when(
            n_tokens.between(5, 100_000)
            & (5 * n_alpha >= 3 * F.greatest(n_chars, one))
            & (5 * n_punct <= F.greatest(n_chars, one))
            & n_alpha.between(2 * n_tokens, 12 * n_tokens),
            1,
        )
        .otherwise(0)
        .alias("pass_quality"),
    )
    norm_hash = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    )
    raw = d.agg(
        F.count("*").alias("n_raw"),
        F.countDistinct(norm_hash).alias("n_exact_unique"),
    )
    joined = canon.join(gates, "doc_id").agg(
        F.sum(F.when(F.col("is_canonical"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_neardup_canonical"),
        F.sum("pass_quality").cast("bigint").alias("n_pass_quality"),
        F.sum(
            F.when(F.col("is_canonical") & (F.col("pass_quality") == 1), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_final_kept"),
    )
    return raw.crossJoin(joined)


# ------------------------------- leakage-safe train/eval split
@register(
    "docs_leakage_safe_split",
    f"""
    WITH RECURSIVE {_MINHASH_PAIR_CTES},
    ls_edges AS (
      SELECT id_a AS u, id_b AS v FROM mh_pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM mh_pairs),
    ls_reach(u, v) AS (
      SELECT u, v FROM ls_edges
      UNION
      SELECT r.u, e.v FROM ls_reach r JOIN ls_edges e ON r.v = e.u),
    ls_comp AS (
      SELECT u AS node, LEAST(u, MIN(v)) AS component
      FROM ls_reach GROUP BY u),
    ls_assign AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN ls_comp c ON c.node = d.doc_id)
    SELECT doc_id, cluster_id,
           CASE WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 6))
                          AS INT) % 10 = 0
                THEN 'eval' ELSE 'train' END AS split
    FROM ls_assign
    """,
)
def docs_leakage_safe_split(spark: SparkSession, sf_dir: str):
    """Train/eval split that CANNOT leak through near-duplicates: the
    split key is the near-dup CLUSTER id, not the document id, so every
    member of a duplicate cluster lands on the same side — hashing doc
    ids directly puts one copy of a near-identical pair in train and its
    twin in eval, silently inflating every benchmark number (the failure
    decontamination screens exist to catch; this prevents it upstream).

    Composition: MinHash-LSH verified pairs → connected components →
    md5-bucket hash of cluster_id (10% eval). The hash is a pure
    function of the cluster key — deterministic across engines, task
    retries, and corpus repartitioning, same policy as the sampling
    family. Singletons are their own cluster, so unique docs split
    i.i.d. while duplicate groups move atomically."""
    from ..llm.cluster import neardup_cluster_assign
    from ..llm.dedup import minhash_lsh_candidates
    from .sampling_profile import _md5_bucket

    d = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(
        d, "text", "doc_id", num_hashes=16, band_size=4, threshold=0.5
    )
    assign = neardup_cluster_assign(d, pairs, "doc_id")
    split = F.when(
        _md5_bucket(F.col("cluster_id").cast("string"), 10) == 0, "eval"
    ).otherwise("train")
    return assign.select("doc_id", "cluster_id", split.alias("split"))


# --------------------------------- MinHash estimator-error profile (r5c)
@register(
    "docs_minhash_estimator_error",
    f"""
    WITH {_MINHASH_PAIR_CTES},
    sigmatch AS (
      SELECT p.id_a, p.id_b, p.jaccard,
             CAST(SUM(CASE WHEN ma.minhash = mb.minhash THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_match
      FROM mh_pairs p
      JOIN mh ma ON ma.doc_id = p.id_a
      JOIN mh mb ON mb.doc_id = p.id_b AND mb.hash_idx = ma.hash_idx
      GROUP BY p.id_a, p.id_b, p.jaccard)
    SELECT n_match,
           COUNT(*) AS n_pairs,
           CAST(SUM(CAST(floor(1000000 * jaccard) AS BIGINT)) AS BIGINT)
             AS sum_j_fp,
           CAST(MAX(CAST(floor(1000000 * abs(n_match / 16.0 - jaccard))
                         AS BIGINT)) AS BIGINT) AS max_err_fp
    FROM sigmatch GROUP BY n_match
    """,
)
def docs_minhash_estimator_error(spark: SparkSession, sf_dir: str):
    """MinHash estimator accuracy pinned in-gate: for every LSH-verified
    pair, compare the signature-agreement estimate (matching components /
    16 — the number the sketch would report WITHOUT reading any tokens)
    against the exact Jaccard the verifier computed, profiled per agreement
    level. Completes the sketch-vs-exact harness family (HLL 5% bound,
    approx_percentile tolerance flags, CMS est>=true): this is the evidence
    for the 100 TB design call of trusting bands to SELECT candidates while
    exact verification DECIDES — the per-level max_err_fp quantifies how
    coarse a 16-hash estimate really is. All error terms are fixed-point
    (m/16 is a power-of-two-denominator rational, exact in double; one
    floor per term), so both engines hash-match. Plan: the pair table joins
    the per-doc signature rows twice — signature rows are k=16 per doc,
    narrow, and the join keys are the pair ids the LSH stage already
    shuffled on."""
    from ..llm.dedup import minhash_lsh_candidates, minhash_signatures

    d = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(
        d, "text", "doc_id", num_hashes=16, band_size=4, threshold=0.5
    )
    sig = minhash_signatures(d, "text", "doc_id", num_hashes=16)
    ma = sig.select(
        F.col("doc_id").alias("id_a"), "hash_idx", F.col("minhash").alias("mh_a")
    )
    mb = sig.select(
        F.col("doc_id").alias("id_b"), "hash_idx", F.col("minhash").alias("mh_b")
    )
    matched = (
        pairs.join(ma, "id_a")
        .join(mb, ["id_b", "hash_idx"])
        .groupBy("id_a", "id_b", "jaccard")
        .agg(
            F.sum((F.col("mh_a") == F.col("mh_b")).cast("int"))
            .cast("bigint")
            .alias("n_match")
        )
    )
    return matched.groupBy("n_match").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.floor(F.lit(1000000) * F.col("jaccard")).cast("bigint"))
        .cast("bigint")
        .alias("sum_j_fp"),
        F.max(
            F.floor(
                F.lit(1000000)
                * F.abs(F.col("n_match") / F.lit(16.0) - F.col("jaccard"))
            ).cast("bigint")
        ).alias("max_err_fp"),
    )


# --------------------------------- IVF multi-probe recall profile (r5c)
_IVF_K = 5


@register(
    "emb_ivf_multiprobe_recall",
    f"""
    WITH cent AS (
      SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cent_v
      FROM embeddings WHERE vec_id < 16),
    corp AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    corp_assign AS (
      SELECT vec_id AS neighbor_id, v AS cv, cent_id FROM (
        SELECT corp.vec_id, corp.v, cent.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY corp.vec_id
                 ORDER BY {_IVF_COS.format(a="v", b="cent_v")} DESC, cent_id
               ) AS rn
        FROM corp CROSS JOIN cent) WHERE rn = 1),
    q_assign AS (
      SELECT vec_id AS query_id, v AS qv, cent_id, rn AS probe_rank FROM (
        SELECT corp.vec_id, corp.v, cent.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY corp.vec_id
                 ORDER BY {_IVF_COS.format(a="v", b="cent_v")} DESC, cent_id
               ) AS rn
        FROM corp CROSS JOIN cent WHERE corp.vec_id < 10) WHERE rn <= 2),
    probed AS (
      SELECT q.query_id, c.neighbor_id, q.probe_rank,
             {_IVF_COS.format(a="qv", b="cv")} AS sim
      FROM corp_assign c JOIN q_assign q USING (cent_id)
      WHERE q.query_id != c.neighbor_id),
    ivf1 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM probed WHERE probe_rank = 1) WHERE rank <= {_IVF_K}),
    ivf2 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM probed) WHERE rank <= {_IVF_K}),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 {_IVF_COS.format(a="q.v", b="c.v")} DESC, c.vec_id) AS rank
        FROM corp q CROSS JOIN corp c
        WHERE q.vec_id < 10 AND q.vec_id != c.vec_id) WHERE rank <= {_IVF_K})
    SELECT e.query_id,
           CAST(SUM(CASE WHEN i1.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit_p1,
           CAST(SUM(CASE WHEN i2.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit_p2
    FROM exact e
    LEFT JOIN ivf1 i1 USING (query_id, neighbor_id)
    LEFT JOIN ivf2 i2 USING (query_id, neighbor_id)
    GROUP BY e.query_id
    """,
)
def emb_ivf_multiprobe_recall(spark: SparkSession, sf_dir: str):
    """Recall@{_IVF_K} of IVF retrieval at nprobe=1 vs nprobe=2 against the
    exact top-{_IVF_K} — the probe-count/recall curve that tunes every IVF
    deployment (more probes = more lists scanned = higher recall, linearly
    more cost). Monotonicity is structural: the nprobe=1 candidate set is a
    subset of nprobe=2's, so n_hit_p2 >= n_hit_p1 row by row — the gate
    hash-checks the whole profile. Completes the ANN evaluation family next
    to emb_truncated_topk_recall (dimension axis) with the probe axis. At
    100 TB the exact arm is the offline ground-truth job on a sampled query
    set; the IVF arms reuse the inverted lists the serving index already
    maintains (centroid table broadcast, per-query bounded windows)."""
    from ..llm.similarity import brute_force_cosine_topk, ivf_cosine_topk

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    cents = e.filter(F.col("vec_id") < 16)
    exact = brute_force_cosine_topk(q, e, k=_IVF_K).select(
        "query_id", "neighbor_id"
    )
    ivf1 = ivf_cosine_topk(q, e, cents, k=_IVF_K, nprobe=1).select(
        "query_id", "neighbor_id", F.lit(1).alias("h1")
    )
    ivf2 = ivf_cosine_topk(q, e, cents, k=_IVF_K, nprobe=2).select(
        "query_id", "neighbor_id", F.lit(1).alias("h2")
    )
    return (
        exact.join(ivf1, ["query_id", "neighbor_id"], "left")
        .join(ivf2, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("h1").alias("n_hit_p1"),
            F.count("h2").alias("n_hit_p2"),
        )
    )


# ----------------------- lexical vs semantic dedup agreement (r5c)
@register(
    "docs_lexical_semantic_agreement",
    f"""
    WITH {_MINHASH_PAIR_CTES},
    emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, {_BUCKET_SQL} AS bucket
      FROM embeddings),
    sem_pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM emb a JOIN emb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE round(list_dot_product(a.v, b.v) /
                  (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.2),
    lex_pairs AS (SELECT id_a, id_b FROM mh_pairs),
    tagged AS (
      SELECT CASE WHEN l.id_a IS NOT NULL AND s.id_a IS NOT NULL
                    THEN 'both'
                  WHEN l.id_a IS NOT NULL THEN 'lexical_only'
                  ELSE 'semantic_only' END AS category
      FROM lex_pairs l FULL OUTER JOIN sem_pairs s
        ON l.id_a = s.id_a AND l.id_b = s.id_b)
    SELECT category, COUNT(*) AS n_pairs FROM tagged GROUP BY category
    """,
)
def docs_lexical_semantic_agreement(spark: SparkSession, sf_dir: str):
    """Cross-signal dedup agreement: how many near-dup pairs the LEXICAL
    tier (MinHash-LSH verified Jaccard >= 0.5 on documents) and the
    SEMANTIC tier (sign-LSH bucketed embedding cosine >= 0.2) each find,
    and how many they agree on — the report a curation team reads before
    deciding which dedup signals to stack (lexical catches boilerplate
    clones the embedding smooths over; embeddings catch paraphrases with
    no shingle overlap). Both tiers are the repo's existing scale-shaped
    pipelines (class-collapsed LSH banding; bucketed cosine self-join);
    the agreement itself is one FULL OUTER join on narrow (id, id) pair
    rows + a 3-row categorical count, so the comparison adds nothing to
    either tier's cost at any corpus size."""
    from ..llm.dedup import minhash_lsh_candidates
    from ..llm.similarity import cosine_neardup_pairs

    docs = t(spark, sf_dir, "documents")
    embs = t(spark, sf_dir, "embeddings")
    lex = minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=16, band_size=4, threshold=0.5
    ).select("id_a", "id_b", F.lit(1).alias("lex"))
    sem = cosine_neardup_pairs(embs, threshold=0.2).select(
        "id_a", "id_b", F.lit(1).alias("sem")
    )
    tagged = lex.join(sem, ["id_a", "id_b"], "full_outer").select(
        F.when(
            F.col("lex").isNotNull() & F.col("sem").isNotNull(), "both"
        )
        .when(F.col("lex").isNotNull(), "lexical_only")
        .otherwise("semantic_only")
        .alias("category")
    )
    return tagged.groupBy("category").agg(F.count("*").alias("n_pairs"))


# ---------------------- binary (1-bit) quantized Hamming top-k (r5c)
def _packbits_sql(lo: int, engine: str) -> str:
    """Pack 32 sign bits (dims lo..lo+31, 1-based positions) into a BIGINT.
    Same expression modulo element access: DuckDB's [] is 1-based, Spark's
    [] is 0-based so it uses element_at (1-based)."""
    ref = "embedding[{idx}]" if engine == "duckdb" else "element_at(embedding, {idx})"
    acc = " + ".join(
        f"(CASE WHEN {ref.format(idx=lo + i)} >= 0 THEN CAST({1 << i} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END)"
        for i in range(32)
    )
    return acc


@register(
    "emb_binary_hamming_topk",
    f"""
    WITH sig AS (
      SELECT vec_id,
             {_packbits_sql(1, 'duckdb')} AS h_lo,
             {_packbits_sql(33, 'duckdb')} AS h_hi
      FROM embeddings),
    q AS (SELECT vec_id AS query_id, h_lo AS q_lo, h_hi AS q_hi
          FROM sig WHERE vec_id < 10),
    d AS (
      SELECT q.query_id, s.vec_id AS neighbor_id,
             CAST(bit_count(xor(q.q_lo, s.h_lo))
                  + bit_count(xor(q.q_hi, s.h_hi)) AS INT) AS hamming
      FROM q CROSS JOIN sig s WHERE s.vec_id != q.query_id),
    r AS (SELECT query_id, neighbor_id, hamming,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY hamming, neighbor_id) AS rank
          FROM d)
    SELECT query_id, neighbor_id, hamming, rank FROM r WHERE rank <= 5
    """,
)
def emb_binary_hamming_topk(spark: SparkSession, sf_dir: str):
    """1-bit (binary sign) quantization with Hamming ranking — the fourth
    point on the repo's vector-compression spectrum (int8 scalar quantize,
    product quantization, dimension truncation, and now 64x compression to
    two packed 32-bit sign words). Retrieval is XOR + popcount per pair —
    integer-only, so both engines rank bit-identically with no float
    anywhere. At 100 TB this is the in-memory first-pass filter: 16 bytes
    per vector instead of 256, the corpus signature table rebuilds in one
    scan-local projection (no shuffle), queries broadcast against it, and
    the Hamming top-k feeds the exact re-ranker exactly as the IVF/LSH
    candidates do. Sign packing is a 32-term integer sum shared verbatim
    between the Spark and DuckDB texts."""
    e = t(spark, sf_dir, "embeddings")
    sig = e.selectExpr(
        "vec_id",
        f"({_packbits_sql(1, 'spark')}) AS h_lo",
        f"({_packbits_sql(33, 'spark')}) AS h_hi",
    )
    q = sig.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("h_lo").alias("q_lo"),
        F.col("h_hi").alias("q_hi"),
    )
    d = (
        sig.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                F.bit_count(F.expr("q_lo ^ h_lo"))
                + F.bit_count(F.expr("q_hi ^ h_hi"))
            )
            .cast("int")
            .alias("hamming"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "hamming", "rank")
    )
