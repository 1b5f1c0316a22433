"""Round-7s operators: PII detect/redact with Luhn validation, a
light stemmer collapse, language trigram similarity, Rocchio
pseudo-relevance query expansion, Burrows' Delta stylometry, and
proximity phrase ranking.

The documents corpus is a synthetic vocabulary mix with no organic
PII, so the PII op PLANTS deterministic fixtures (doc_id-derived
emails/phones/Luhn-valid card numbers) before detecting them — the
detection/redaction/validation plumbing is what is under test, and
the planted truth makes precision checkable. All regex patterns are
written WITHOUT backslash escapes (character classes only) so the
pattern text survives both engines' string-literal rules identically.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import t

# ------------------------------------------------------------------
# 1. docs_pii_detect_redact — detection, Luhn check, redaction
# ------------------------------------------------------------------

_RE_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z][a-z]+"
_RE_PHONE = "555-[0-9]{4}"
_RE_CARD = "[0-9]{16}"


@register(
    "docs_pii_detect_redact",
    f"""
    WITH planted AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 10 = 0
                THEN ' contact user' || doc_id || '@example.com' ELSE '' END
             || CASE WHEN doc_id % 17 = 0
                THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR),
                                          4, '0') ELSE '' END
             || CASE WHEN doc_id % 23 = 0
                THEN ' card ' || base15 || CAST((10 - luhn90 % 10) % 10
                                                AS VARCHAR) ELSE '' END
               AS txt
      FROM (
        SELECT doc_id, text,
               lpad(CAST(doc_id % 1000000000 AS VARCHAR), 15, '4')
                 AS base15,
               list_reduce(
                 list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
                   list_transform(range(1, 16),
                     i -> [CAST(lpad(CAST(doc_id % 1000000000 AS VARCHAR),
                                     15, '4')[16 - i:16 - i] AS BIGINT),
                           CAST(i AS BIGINT)])),
                 (acc, e) -> [acc[1]
                   + CASE WHEN e[2] % 2 = 1
                     THEN CASE WHEN e[1] * 2 > 9 THEN e[1] * 2 - 9
                          ELSE e[1] * 2 END
                     ELSE e[1] END, acc[2]])[1] AS luhn90
        FROM documents)),
    found AS (
      SELECT doc_id,
             len(regexp_extract_all(txt, '{_RE_EMAIL}')) AS n_email,
             len(regexp_extract_all(txt, '{_RE_PHONE}')) AS n_phone,
             list_sum(list_transform(
               regexp_extract_all(txt, '{_RE_CARD}'),
               c -> CASE WHEN list_reduce(
                 list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
                   list_transform(range(1, 17),
                     i -> [CAST(c[17 - i:17 - i] AS BIGINT),
                           CAST(i AS BIGINT)])),
                 (acc, e) -> [acc[1]
                   + CASE WHEN e[2] % 2 = 0
                     THEN CASE WHEN e[1] * 2 > 9 THEN e[1] * 2 - 9
                          ELSE e[1] * 2 END
                     ELSE e[1] END, acc[2]])[1] % 10 = 0
               THEN 1 ELSE 0 END)) AS n_card_valid,
             length(txt)
               - length(regexp_replace(regexp_replace(regexp_replace(
                   txt, '{_RE_EMAIL}', '[EMAIL]', 'g'),
                   '{_RE_PHONE}', '[PHONE]', 'g'),
                   '{_RE_CARD}', '[CARD]', 'g')) AS chars_redacted
      FROM planted)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_email) AS BIGINT) AS n_emails,
           CAST(SUM(n_phone) AS BIGINT) AS n_phones,
           CAST(SUM(COALESCE(n_card_valid, 0)) AS BIGINT)
             AS n_cards_luhn_valid,
           CAST(SUM(CASE WHEN n_email + n_phone
                 + COALESCE(n_card_valid, 0) > 0 THEN 1 ELSE 0 END)
             * 1000000 // COUNT(*) AS BIGINT) AS affected_docs_ppm,
           CAST(SUM(chars_redacted) AS BIGINT) AS net_chars_removed
    FROM found
    """,
)
def docs_pii_detect_redact(spark: SparkSession, sf_dir: str):
    """PII detection + redaction + checksum validation — the
    compliance pass every training-data pipeline runs before release:
    regex detectors for emails/phones/16-digit card numbers, a LUHN
    CHECKSUM implemented as an array fold (doubling every second
    digit from the right) so card hits are VALIDATED not just
    pattern-matched, and a redaction pass whose net character delta
    is reported. The corpus has no organic PII, so deterministic
    fixtures are planted from doc_id (including constructing the
    Luhn check digit with the same fold that later validates it —
    planted truth makes recall exactly checkable: every planted card
    must validate). All patterns avoid backslash escapes so the
    literal text is engine-identical. One scan; per-row work is
    regex + a 16-step fold."""
    d = t(spark, sf_dir, "documents")

    def luhn_sum_spark(strexpr: str, nd: int, odd_from_right: bool) -> str:
        # sum with Luhn doubling; digits taken right-to-left
        par = 1 if odd_from_right else 0
        return (
            f"aggregate(sequence(1, {nd}), CAST(0 AS BIGINT),"
            f" (acc, i) -> acc + (CASE WHEN i % 2 = {par}"
            f"  THEN CASE WHEN CAST(substring({strexpr},"
            f"   {nd + 1} - i, 1) AS BIGINT) * 2 > 9"
            f"   THEN CAST(substring({strexpr}, {nd + 1} - i, 1)"
            f"    AS BIGINT) * 2 - 9"
            f"   ELSE CAST(substring({strexpr}, {nd + 1} - i, 1)"
            f"    AS BIGINT) * 2 END"
            f"  ELSE CAST(substring({strexpr}, {nd + 1} - i, 1)"
            f"   AS BIGINT) END))"
        )

    base = d.select(
        "doc_id",
        "text",
        F.expr(
            "lpad(CAST(doc_id % 1000000000 AS STRING), 15, '4')"
        ).alias("base15"),
    ).withColumn(
        "luhn90", F.expr(luhn_sum_spark("base15", 15, True))
    )
    planted = base.select(
        "doc_id",
        F.expr(
            "text"
            " || CASE WHEN doc_id % 10 = 0 THEN ' contact user'"
            "    || doc_id || '@example.com' ELSE '' END"
            " || CASE WHEN doc_id % 17 = 0 THEN ' call 555-'"
            "    || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')"
            "    ELSE '' END"
            " || CASE WHEN doc_id % 23 = 0 THEN ' card ' || base15"
            "    || CAST((10 - luhn90 % 10) % 10 AS STRING)"
            "    ELSE '' END"
        ).alias("txt"),
    )
    found = planted.select(
        F.expr(
            f"size(regexp_extract_all(txt, '{_RE_EMAIL}', 0))"
        ).alias("n_email"),
        F.expr(
            f"size(regexp_extract_all(txt, '{_RE_PHONE}', 0))"
        ).alias("n_phone"),
        F.expr(
            f"aggregate(regexp_extract_all(txt, '{_RE_CARD}', 0),"
            " CAST(0 AS BIGINT), (acc, c) -> acc"
            f" + IF(({luhn_sum_spark('c', 16, False)}) % 10 = 0,"
            " 1, 0))"
        ).alias("n_card_valid"),
        F.expr(
            "length(txt) - length(regexp_replace(regexp_replace("
            f"regexp_replace(txt, '{_RE_EMAIL}', '[EMAIL]'),"
            f" '{_RE_PHONE}', '[PHONE]'),"
            f" '{_RE_CARD}', '[CARD]'))"
        ).alias("chars_redacted"),
    )
    return found.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_email").cast("bigint").alias("n_emails"),
        F.sum("n_phone").cast("bigint").alias("n_phones"),
        F.sum(F.coalesce(F.col("n_card_valid"), F.lit(0)))
        .cast("bigint")
        .alias("n_cards_luhn_valid"),
        F.expr(
            "CAST(SUM(CASE WHEN n_email + n_phone"
            " + COALESCE(n_card_valid, 0) > 0 THEN 1 ELSE 0 END)"
            " * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("affected_docs_ppm"),
        F.sum("chars_redacted").cast("bigint").alias(
            "net_chars_removed"
        ),
    )


# ------------------------------------------------------------------
# 2. docs_light_stemmer_collapse — suffix-rule stemming
# ------------------------------------------------------------------


@register(
    "docs_light_stemmer_collapse",
    """
    WITH toks AS (
      SELECT UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents),
    stemmed AS (
      SELECT w,
             CASE
               WHEN w LIKE '%sses' THEN w[1:len(w) - 2]
               WHEN w LIKE '%ies' AND len(w) > 4
                 THEN w[1:len(w) - 3] || 'y'
               WHEN w LIKE '%ing' AND len(w) > 5 THEN w[1:len(w) - 3]
               WHEN w LIKE '%ed' AND len(w) > 4 THEN w[1:len(w) - 2]
               WHEN w LIKE '%s' AND w NOT LIKE '%ss' AND len(w) > 3
                 THEN w[1:len(w) - 1]
               ELSE w END AS stem
      FROM toks WHERE w != ''),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT w) AS BIGINT) AS n_types_raw,
             CAST(COUNT(DISTINCT stem) AS BIGINT) AS n_types_stemmed,
             CAST(SUM(CASE WHEN stem != w THEN 1 ELSE 0 END)
               AS BIGINT) AS n_tokens_changed
      FROM stemmed)
    SELECT n_tokens, n_types_raw, n_types_stemmed,
           n_tokens_changed,
           CAST((n_types_raw - n_types_stemmed) * 1000000
             // n_types_raw AS BIGINT) AS vocab_reduction_ppm
    FROM agg
    """,
)
def docs_light_stemmer_collapse(spark: SparkSession, sf_dir: str):
    """Light rule-based stemming (the S-stemmer family: -sses/-ies/
    -ing/-ed/-s suffix rules with length guards) and its vocabulary
    effect — the cheap normalization pass IR systems apply before
    indexing, measured here by the type count before vs after (the
    number that decides whether stemming is worth a reindex).
    Suffix rules are pure CASE/LIKE string algebra, identical in
    both engines; no dictionaries, no UDFs. One fact-grain token
    explode, then two distinct-counts — the expensive parts are
    exactly the two shuffles a production vocabulary count needs
    anyway."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("w")
    ).filter(F.col("w") != "")
    stemmed = toks.select(
        "w",
        F.expr(
            "CASE"
            " WHEN w LIKE '%sses' THEN substring(w, 1, length(w) - 2)"
            " WHEN w LIKE '%ies' AND length(w) > 4"
            "   THEN substring(w, 1, length(w) - 3) || 'y'"
            " WHEN w LIKE '%ing' AND length(w) > 5"
            "   THEN substring(w, 1, length(w) - 3)"
            " WHEN w LIKE '%ed' AND length(w) > 4"
            "   THEN substring(w, 1, length(w) - 2)"
            " WHEN w LIKE '%s' AND w NOT LIKE '%ss' AND length(w) > 3"
            "   THEN substring(w, 1, length(w) - 1)"
            " ELSE w END"
        ).alias("stem"),
    )
    agg = stemmed.agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.count_distinct("w").cast("bigint").alias("n_types_raw"),
        F.count_distinct("stem")
        .cast("bigint")
        .alias("n_types_stemmed"),
        F.sum(F.when(F.col("stem") != F.col("w"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_tokens_changed"),
    )
    return agg.select(
        "n_tokens",
        "n_types_raw",
        "n_types_stemmed",
        "n_tokens_changed",
        F.expr(
            "CAST((n_types_raw - n_types_stemmed) * 1000000"
            " div n_types_raw AS BIGINT)"
        ).alias("vocab_reduction_ppm"),
    )


# ------------------------------------------------------------------
# 3. docs_lang_trigram_similarity — language distance matrix
# ------------------------------------------------------------------

_TRI_TOP = 50


@register(
    "docs_lang_trigram_similarity",
    f"""
    WITH grams AS (
      SELECT lang, t.g, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT lang, lower(text) AS tx FROM documents) d,
      UNNEST(list_transform(range(1, len(d.tx) - 1),
                            i -> d.tx[i:i + 2])) AS t(g)
      GROUP BY 1, 2),
    ranked AS (
      SELECT lang, g,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY c DESC, g) AS rk
      FROM grams),
    top AS (SELECT lang, g FROM ranked WHERE rk <= {_TRI_TOP}),
    pairs AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM top a JOIN top b ON b.g = a.g AND a.lang < b.lang
      GROUP BY 1, 2)
    SELECT lang_a, lang_b, n_shared,
           CAST(n_shared * 1000000 // (2 * {_TRI_TOP} - n_shared)
             AS BIGINT) AS jaccard_ppm
    FROM pairs ORDER BY lang_a, lang_b
    """,
)
def docs_lang_trigram_similarity(spark: SparkSession, sf_dir: str):
    """Language similarity matrix from character-trigram profiles:
    each language's top-{_TRI_TOP} trigrams (the Cavnar-Trenkle
    n-gram profile that docs_language_id classifies WITH) are
    compared pairwise by Jaccard — the corpus-level view that shows
    WHICH languages the classifier can confuse (high overlap = close
    scripts/vocabularies) rather than just classifying. The trigram
    explode is the only fact-grain work; profiles are 5 x {_TRI_TOP}
    bounded rows, the pair join is at most 10 language pairs, and
    the per-language rank window is PARTITIONED. Exact set algebra:
    |A intersect B| / (|A| + |B| - |A intersect B|) in ppm."""
    d = t(spark, sf_dir, "documents")
    grams = (
        d.select("lang", F.lower(F.col("text")).alias("tx"))
        .select(
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(length(tx) - 2, 1)),"
                    " i -> substring(tx, i, 3))"
                )
            ).alias("g"),
        )
        .filter(F.length("g") == 3)
        .groupBy("lang", "g")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    ranked = grams.select(
        "lang",
        "g",
        F.row_number()
        .over(
            Window.partitionBy("lang").orderBy(F.col("c").desc(), "g")
        )
        .alias("rk"),
    )
    top = ranked.filter(F.col("rk") <= _TRI_TOP).select("lang", "g")
    b = top.select(F.col("lang").alias("lang_b"), F.col("g").alias("g2"))
    pairs = (
        top.join(
            b,
            (F.col("g2") == F.col("g"))
            & (F.col("lang") < F.col("lang_b")),
        )
        .groupBy(F.col("lang").alias("lang_a"), "lang_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    return pairs.select(
        "lang_a",
        "lang_b",
        "n_shared",
        F.expr(
            f"CAST(n_shared * 1000000 div (2 * {_TRI_TOP} - n_shared)"
            " AS BIGINT)"
        ).alias("jaccard_ppm"),
    ).orderBy("lang_a", "lang_b")


# ------------------------------------------------------------------
# 4. docs_rocchio_query_expansion — pseudo-relevance feedback
# ------------------------------------------------------------------

_ROC_TERMS = ("hash", "join", "scan")
_ROC_TOPDOCS = 10
_ROC_TOPEXP = 10


@register(
    "docs_rocchio_query_expansion",
    f"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
           FROM toks WHERE w != '' GROUP BY 1),
    qscore AS (
      SELECT t.doc_id,
             CAST(SUM(CASE WHEN t.w IN
               ({', '.join(repr(x) for x in _ROC_TERMS)})
               THEN 1 ELSE 0 END) * 1000000 AS BIGINT) // MAX(d.dl)
               AS score
      FROM toks t JOIN dl d ON d.doc_id = t.doc_id
      WHERE t.w != '' GROUP BY 1),
    rel AS (
      SELECT doc_id FROM qscore
      ORDER BY score DESC, doc_id LIMIT {_ROC_TOPDOCS}),
    ndocs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    df AS (
      SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks WHERE w != '' GROUP BY 1),
    rtf AS (
      SELECT t.w, CAST(COUNT(*) AS BIGINT) AS tf_rel
      FROM toks t JOIN rel r ON r.doc_id = t.doc_id
      WHERE t.w != '' GROUP BY 1),
    wts AS (
      SELECT rtf.w,
             CAST(rtf.tf_rel * CAST(round(1e6 * ln(CAST(nd.n AS DOUBLE)
               / df.df)) AS BIGINT) // {_ROC_TOPDOCS} AS BIGINT)
               AS rocchio_micro
      FROM rtf
      JOIN df ON df.w = rtf.w
      CROSS JOIN ndocs nd
      WHERE rtf.w NOT IN ({', '.join(repr(x) for x in _ROC_TERMS)}))
    SELECT w AS term, rocchio_micro
    FROM wts
    ORDER BY rocchio_micro DESC, term
    LIMIT {_ROC_TOPEXP}
    """,
)
def docs_rocchio_query_expansion(spark: SparkSession, sf_dir: str):
    """Rocchio pseudo-relevance feedback: run the seed query
    {_ROC_TERMS}, take the top-{_ROC_TOPDOCS} documents as
    pseudo-relevant, and rank candidate EXPANSION terms by their
    tf-idf mass inside that set — the classic query-expansion loop
    (RM3's deterministic ancestor) that turns the retrieval tier
    from static scoring into a feedback system. The relevant set is
    a bounded orderBy+limit; expansion weights need one corpus df
    pass (shared shape with docs_tfidf_top_terms) and one tf pass
    over 10 documents; idf micro-quantizes before the integer
    product so both engines rank identical numbers. Seed terms are
    excluded from the expansion output."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("w"),
    ).filter(F.col("w") != "")
    dl = toks.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("dl")
    )
    terms_sql = ", ".join(repr(x) for x in _ROC_TERMS)
    qscore = (
        toks.join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.expr(
                f"CAST(SUM(CASE WHEN w IN ({terms_sql}) THEN 1"
                " ELSE 0 END) * 1000000 AS BIGINT) div MAX(dl)"
            ).alias("score")
        )
    )
    rel = (
        qscore.orderBy(F.col("score").desc(), "doc_id")
        .limit(_ROC_TOPDOCS)
        .select("doc_id")
    )
    ndocs = d.agg(F.count("*").cast("bigint").alias("n"))
    df = toks.groupBy("w").agg(
        F.count_distinct("doc_id").cast("bigint").alias("df")
    )
    rtf = (
        toks.join(F.broadcast(rel), "doc_id")
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("tf_rel"))
    )
    wts = (
        rtf.join(df, "w")
        .crossJoin(F.broadcast(ndocs))
        .filter(~F.col("w").isin(*_ROC_TERMS))
        .select(
            F.col("w").alias("term"),
            F.expr(
                "CAST(tf_rel * CAST(round(1e6 * ln(CAST(n AS DOUBLE)"
                f" / df)) AS BIGINT) div {_ROC_TOPDOCS} AS BIGINT)"
            ).alias("rocchio_micro"),
        )
    )
    return wts.orderBy(
        F.col("rocchio_micro").desc(), "term"
    ).limit(_ROC_TOPEXP)


# ------------------------------------------------------------------
# 5. docs_burrows_delta_stylometry — function-word z-score distance
# ------------------------------------------------------------------

_BD_TOPW = 20


@register(
    "docs_burrows_delta_stylometry",
    f"""
    WITH toks AS (
      SELECT lang,
             UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents),
    lt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
           FROM toks WHERE w != '' GROUP BY 1),
    topw AS (
      SELECT w FROM (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c
        FROM toks WHERE w != '' GROUP BY 1
        ORDER BY c DESC, w LIMIT {_BD_TOPW})),
    freq AS (
      SELECT l.lang, tw.w,
             CAST(COALESCE(f.c, 0) * 1000000 // l.n AS BIGINT) AS f_ppm
      FROM lt l CROSS JOIN topw tw
      LEFT JOIN (
        SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM toks WHERE w != '' GROUP BY 1, 2) f
        ON f.lang = l.lang AND f.w = tw.w),
    stats AS (
      SELECT w,
             CAST(SUM(f_ppm) // COUNT(*) AS BIGINT) AS mu,
             CAST(round(sqrt((CAST(SUM(CAST(f_ppm AS HUGEINT) * f_ppm)
               AS DOUBLE) * COUNT(*) - CAST(SUM(f_ppm) AS DOUBLE)
               * SUM(f_ppm)) / (CAST(COUNT(*) AS DOUBLE) * COUNT(*))))
               AS BIGINT) AS sigma
      FROM freq GROUP BY 1),
    zs AS (
      SELECT f.lang, f.w,
             (f.f_ppm - s.mu) * 1000 // GREATEST(s.sigma, 1) AS z_milli
      FROM freq f JOIN stats s ON s.w = f.w)
    SELECT a.lang AS lang_a, b.lang AS lang_b,
           CAST(SUM(CASE WHEN a.z_milli >= b.z_milli
               THEN a.z_milli - b.z_milli
               ELSE b.z_milli - a.z_milli END) // {_BD_TOPW} AS BIGINT)
             AS burrows_delta_milli
    FROM zs a JOIN zs b ON b.w = a.w AND a.lang < b.lang
    GROUP BY 1, 2
    ORDER BY lang_a, lang_b
    """,
)
def docs_burrows_delta_stylometry(spark: SparkSession, sf_dir: str):
    """Burrows' Delta — the standard stylometric/authorship distance:
    z-score each language's relative frequency of the corpus's top
    {_BD_TOPW} most-common words (function words carry the stylistic
    signal) and average the absolute z-differences per language
    pair. Low delta = similar usage profiles (the attribution
    complement to docs_lang_trigram_similarity's character-level
    view). The dense (language x word) grid is 5 x {_BD_TOPW}
    bounded rows built by one cross join + left join so
    absent-in-a-language words enter as true 0 frequencies; sigma
    milli-quantizes from exact integer moments before the z
    division, making the z-grid and the final fold exact in both
    engines. One fact-grain token pass."""
    d = t(spark, sf_dir, "documents")
    big = "decimal(38,0)"
    toks = d.select(
        "lang",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("w"),
    ).filter(F.col("w") != "")
    lt = toks.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n")
    )
    topw = (
        toks.groupBy("w")
        .agg(F.count("*").cast("bigint").alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(_BD_TOPW)
        .select("w")
    )
    lw = toks.groupBy("lang", "w").agg(
        F.count("*").cast("bigint").alias("c")
    )
    freq = (
        lt.crossJoin(F.broadcast(topw))
        .join(lw, ["lang", "w"], "left")
        .select(
            "lang",
            "w",
            F.expr(
                "CAST(COALESCE(c, 0) * 1000000 div n AS BIGINT)"
            ).alias("f_ppm"),
        )
    )
    stats = freq.groupBy("w").agg(
        F.expr("CAST(SUM(f_ppm) div COUNT(*) AS BIGINT)").alias("mu"),
        F.expr(
            "CAST(round(sqrt((CAST(SUM(CAST(f_ppm AS DECIMAL(38,0))"
            " * f_ppm) AS DOUBLE) * COUNT(*) - CAST(SUM(f_ppm)"
            " AS DOUBLE) * SUM(f_ppm)) / (CAST(COUNT(*) AS DOUBLE)"
            " * COUNT(*)))) AS BIGINT)"
        ).alias("sigma"),
    )
    zs = freq.join(F.broadcast(stats), "w").select(
        "lang",
        "w",
        F.expr(
            "(f_ppm - mu) * 1000 div GREATEST(sigma, 1)"
        ).alias("z_milli"),
    )
    zb = zs.select(
        F.col("lang").alias("lang_b"),
        F.col("w").alias("w2"),
        F.col("z_milli").alias("z2"),
    )
    return (
        zs.join(
            zb,
            (F.col("w2") == F.col("w"))
            & (F.col("lang") < F.col("lang_b")),
        )
        .groupBy(F.col("lang").alias("lang_a"), "lang_b")
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN z_milli >= z2"
                " THEN z_milli - z2 ELSE z2 - z_milli END)"
                f" div {_BD_TOPW} AS BIGINT)"
            ).alias("burrows_delta_milli")
        )
        .orderBy("lang_a", "lang_b")
    )


# ------------------------------------------------------------------
# 6. docs_proximity_phrase_rank — positional proximity scoring
# ------------------------------------------------------------------

_PROX_A = "hash"
_PROX_B = "join"
_PROX_K = 10


@register(
    "docs_proximity_phrase_rank",
    f"""
    WITH toks AS (
      SELECT ws.doc_id, u.i AS pos, ws.w[u.i] AS tok
      FROM (SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\\s+') AS w
            FROM documents) ws,
      UNNEST(range(1, len(ws.w) + 1)) AS u(i)),
    pa AS (SELECT doc_id, pos FROM toks WHERE tok = '{_PROX_A}'),
    pb AS (SELECT doc_id, pos FROM toks WHERE tok = '{_PROX_B}'),
    md AS (
      SELECT a.doc_id,
             CAST(MIN(CASE WHEN a.pos >= b.pos THEN a.pos - b.pos
                  ELSE b.pos - a.pos END) AS BIGINT) AS min_dist,
             CAST(COUNT(DISTINCT a.pos) AS BIGINT) AS n_a,
             CAST(COUNT(DISTINCT b.pos) AS BIGINT) AS n_b
      FROM pa a JOIN pb b ON b.doc_id = a.doc_id
      GROUP BY 1)
    SELECT doc_id, n_a, n_b, min_dist,
           CAST(1000000 // (1 + min_dist) AS BIGINT)
             AS proximity_score_ppm
    FROM md
    ORDER BY min_dist, doc_id
    LIMIT {_PROX_K}
    """,
)
def docs_proximity_phrase_rank(spark: SparkSession, sf_dir: str):
    """Proximity-aware phrase ranking: documents containing both
    '{_PROX_A}' and '{_PROX_B}' score by the MINIMUM token distance
    between any occurrence pair — the positional-index capability
    (phrase and near-queries) that bag-of-words scorers like BM25/QL
    cannot express, built on an explicit positional posting list
    (token, position) per document. The position explode is one
    fact-grain pass; the pair join is per-document and bounded by
    per-doc term frequency (a few occurrences each), grouped
    map-side. Exact integers; score = 1e6/(1 + mindist); adjacent
    terms (mindist 1) read as the phrase match. Top-{_PROX_K} via
    orderBy+limit."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("pos0", "tok"),
    ).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "tok"
    )
    pa = toks.filter(F.col("tok") == _PROX_A).select(
        "doc_id", F.col("pos").alias("pos_a")
    )
    pb = toks.filter(F.col("tok") == _PROX_B).select(
        F.col("doc_id").alias("doc_id_b"), F.col("pos").alias("pos_b")
    )
    md = (
        pa.join(pb, F.col("doc_id_b") == F.col("doc_id"))
        .groupBy("doc_id")
        .agg(
            F.min(
                F.expr(
                    "CASE WHEN pos_a >= pos_b THEN pos_a - pos_b"
                    " ELSE pos_b - pos_a END"
                )
            )
            .cast("bigint")
            .alias("min_dist"),
            F.count_distinct("pos_a").cast("bigint").alias("n_a"),
            F.count_distinct("pos_b").cast("bigint").alias("n_b"),
        )
    )
    return (
        md.select(
            "doc_id",
            "n_a",
            "n_b",
            "min_dist",
            F.expr(
                "CAST(1000000 div (1 + min_dist) AS BIGINT)"
            ).alias("proximity_score_ppm"),
        )
        .orderBy("min_dist", "doc_id")
        .limit(_PROX_K)
    )
