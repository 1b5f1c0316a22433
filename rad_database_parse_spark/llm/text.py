"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (regexp + aggregates) so they run in
whole-stage codegen over arbitrarily large corpora:

- ``language_id``: stopword-hit scoring against small per-language
  dictionaries (broadcast), argmax language per document;
- ``quality_score``: length / punctuation-ratio / stopword-ratio /
  mean-word-length heuristics combined into one score;
- ``token_stats``: whitespace and BPE-ish regex token counts;
- ``doc_fingerprint``: positional polynomial rolling hash over tokens
  (deterministic, engine-portable — integer arithmetic only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny public stopword seeds per language (enough for a ratio heuristic).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"],
    "de": ["der", "die", "das", "und", "zu", "in", "ein", "eine", "ist", "von"],
    "zh": ["的", "了", "是", "在", "我", "有", "和", "就", "不", "人"],
}

BPE_ISH_TOKEN_RX = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def token_count_expr(text: Column, pattern: str = r"\s+") -> Column:
    """Whitespace token count without exploding: size of split array."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", 0).otherwise(F.size(F.split(trimmed, pattern)))


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish sub-word tokens (letter runs / digit runs / single
    punctuation) via regexp_extract_all."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_ISH_TOKEN_RX), F.lit(0)))


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars_measured"),
        token_count_expr(t).alias("n_tokens_ws"),
        bpe_ish_token_count(t).alias("n_tokens_bpe"),
        (F.length(t) / F.greatest(token_count_expr(t), F.lit(1))).alias("chars_per_token"),
    )


def _stopword_dict_df(spark):
    rows = [
        (lang, word) for lang, words in LANG_STOPWORDS.items() for word in words
    ]
    return spark.createDataFrame(rows, ["lang_cand", "stopword"])


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, predicted_lang, hits): tokens join a broadcast stopword dict,
    hit counts per (doc, lang), argmax per doc (ties → lexicographic lang).
    Documents with zero stopword hits get predicted_lang = 'und'."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    dict_df = _stopword_dict_df(df.sparkSession)
    hits = (
        toks.join(F.broadcast(dict_df), toks.token == dict_df.stopword)
        .groupBy(id_col, "lang_cand")
        .agg(F.count("*").alias("hits"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("hits").desc(), F.col("lang_cand").asc())
    best = (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("lang_cand").alias("predicted_lang"), "hits")
    )
    return (
        df.select(id_col)
        .join(best, id_col, "left")
        .select(
            id_col,
            F.coalesce("predicted_lang", F.lit("und")).alias("predicted_lang"),
            F.coalesce("hits", F.lit(0)).alias("hits"),
        )
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic quality score in [0,1]: favors moderate length, low
    punctuation density, high alpha ratio, sane word lengths. Deterministic
    closed-form expression — identical in any engine."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count_expr(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_alpha = F.length(F.regexp_replace(F.lower(t), r"[^a-z]", ""))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    alpha_ratio = n_alpha / F.greatest(n_chars, F.lit(1))
    mean_word_len = n_alpha / F.greatest(n_tokens, F.lit(1))
    length_score = F.least(n_tokens / F.lit(64.0), F.lit(1.0))
    word_len_score = F.when((mean_word_len >= 2) & (mean_word_len <= 10), 1.0).otherwise(0.5)
    score = F.round(
        0.4 * length_score + 0.3 * alpha_ratio + 0.2 * (1 - punct_ratio) + 0.1 * word_len_score,
        6,
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        score.alias("quality"),
    )


# 31^(pos mod 8) weights for the positional fingerprint. token ids are first
# reduced mod a 2^20 prime so id·31^7 (≤ 2^20·2.8e10 ≈ 2.9e16) and the
# per-document term sum stay far below 2^63 in BOTH engines' BIGINT
# arithmetic (DuckDB errors on overflow rather than wrapping).
_POW31 = [31**i for i in range(8)]
FINGERPRINT_P = (1 << 31) - 1
FINGERPRINT_ID_P = 1048573  # prime < 2^20


def doc_fingerprint(tokens_with_ids: DataFrame, id_col: str) -> DataFrame:
    """Order-sensitive document fingerprint:
    Σ (token_id mod p₂₀)·31^(pos mod 8) mod p₃₁.
    Input needs (id, pos, token_id) — see llm.dedup.token_ids."""
    weight = F.element_at(
        F.array(*[F.lit(w) for w in _POW31]), (F.col("pos") % 8 + 1).cast("int")
    )
    return (
        tokens_with_ids.withColumn(
            "term",
            ((F.col("token_id") % F.lit(FINGERPRINT_ID_P)) * weight)
            % F.lit(FINGERPRINT_P),
        )
        .groupBy(id_col)
        .agg((F.sum("term") % F.lit(FINGERPRINT_P)).alias("fingerprint"))
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str, id_col: str, k: int = 3, round_digits: int = 6
) -> DataFrame:
    """Per-document top-k terms by TF-IDF: tf(d,t)·ln(N/df(t)).

    Three aggregations, each a single shuffle: term counts per (doc, term),
    document frequency per term, corpus size. The df table is tiny relative
    to the corpus (vocabulary-sized) → broadcast back onto term counts. The
    score is rounded before ranking so the ordering (and with it row
    identity) is stable across engines' libm ln() implementations; ties
    break lexicographically on the token."""
    from .dedup import tokenize

    toks = tokenize(df, text_col, id_col).select(id_col, "token")
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    # corpus size as a broadcast 1-row frame — stays one job, no driver action
    n_docs = df.agg(F.count_distinct(id_col).cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), round_digits),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "token", "tf", "df", "tfidf", "rk")
    )
