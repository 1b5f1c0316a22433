"""A10 — fuzzy schema mapping (header resolution).

The reference (tables.py:167-203) scores every source header against 10
canonical column names with fuzzywuzzy partial_ratio and takes the per-
canonical argmax with a ≥75 gate. Two Spark-first forms:

1. ``resolve_header_mapping`` — the production path. Headers are tiny
   (tens of strings), so resolution happens ON THE DRIVER and emits a
   projection mapping consumed by ``project_with_lineage``; the expensive
   part (projecting millions of rows) is then a pure Catalyst select.
   This is planning work, not data work — the reference does it per table
   too, we just keep it off the executors.

2. ``distributed_header_map`` — the same semantics as a DataFrame plan
   (crossJoin headers × canon, Levenshtein-ratio score, top-1 window),
   for when header sets themselves are large (e.g., millions of extracted
   tables) and for oracle-checkable testing. The canonical side is a
   handful of rows → broadcast; the shuffle is only the per-canonical
   top-1, which AQE coalesces.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog.schemas import CANONICAL_RAD_COLUMNS

# Extra alias the reference special-cases (tables.py:181-183):
# exactly "deg level", nothing else.
EXTRA_ALIASES = {"degradation_level": ["deg level"]}

DEFAULT_THRESHOLD = 75


def _norm(s: str) -> str:
    # The reference's header normalization (tables.py:178) DELETES
    # newlines (no space inserted) and does not collapse other
    # whitespace: str(elem).strip().replace("\n","").lower().
    return s.strip().replace("\n", "").lower()


def _partial_ratio(needle: str, hay: str) -> int:
    """fuzzywuzzy's partial_ratio (the reference's scorer, tables.py:
    183-186), re-implemented from the published algorithm: difflib
    matching blocks align the shorter string against same-length
    substrings of the longer, and the best SequenceMatcher.ratio()
    over those alignments (scaled, round-half-away like fuzzywuzzy's
    utils.intr) is the score. Returns 0..100."""
    import difflib

    shorter, longer = (
        (needle, hay) if len(needle) <= len(hay) else (hay, needle)
    )
    if not shorter:
        # DELIBERATE divergence from fuzzywuzzy (ADVICE r8): its
        # partial_ratio returns 100 for an empty needle (the matching-
        # blocks dummy yields ratio('','') == 1.0), so in the reference
        # an empty header cell scored 100 against every category and an
        # early empty cell could win the argmax. We return 0 here and
        # resolve_header_mapping additionally skips empty normalized
        # headers — blank cells never claim a canonical column. On the
        # golden corpus this is unobservable (all per-file counts and
        # 259/266 byte-exact fields reproduce); a future corpus with
        # blank header cells would map differently than the reference,
        # by choice.
        return 0
    blocks = difflib.SequenceMatcher(None, shorter, longer).get_matching_blocks()
    best = 0.0
    for i, j, _size in blocks:
        start = max(j - i, 0)
        window = longer[start : start + len(shorter)]
        r = difflib.SequenceMatcher(None, shorter, window).ratio()
        if r > 0.995:
            return 100
        best = max(best, r)
    # fuzzywuzzy utils.intr is int(round(n)) — Python banker's rounding,
    # NOT half-up; at a .5 boundary next to the 75 gate the two differ
    return int(round(best * 100))


def resolve_header_mapping(
    headers: Sequence[str],
    canonical: Sequence[str] = CANONICAL_RAD_COLUMNS,
    threshold: int = DEFAULT_THRESHOLD,
) -> dict[str, int]:
    """Driver-side resolution: {canonical_name: source_header_index} for every
    canonical column whose best source-header score ≥ threshold."""
    normed = [_norm(h or "") for h in headers]
    mapping: dict[str, int] = {}
    for canon in canonical:
        targets = [canon.replace("_", " ")] + EXTRA_ALIASES.get(canon, [])
        best_score, best_idx = -1, None
        for idx, h in enumerate(normed):
            if not h:
                continue
            score = max(_partial_ratio(t, h) for t in targets)
            if score > best_score:
                best_score, best_idx = score, idx
        if best_idx is not None and best_score >= threshold:
            mapping[canon] = best_idx
    return mapping


def distributed_header_map(
    headers: DataFrame,
    spark: SparkSession,
    canonical: Sequence[str] = CANONICAL_RAD_COLUMNS,
    threshold: int = DEFAULT_THRESHOLD,
    header_col: str = "header",
    group_col: str | None = "table_id",
) -> DataFrame:
    """Distributed variant: per (table, canonical) argmax of a Levenshtein
    ratio (1 - lev/maxlen, scaled to 0..100 — DuckDB-mirrorable, unlike
    partial_ratio), gated at `threshold`.

    Plan shape: broadcast the canonical list (≤ tens of rows) against the
    header set, score JVM-side with the built-in levenshtein(), then one
    window top-1 per (group, canonical). No Python boundary.
    """
    canon_df = spark.createDataFrame(
        [(c, c.replace("_", " ")) for c in canonical], ["canonical", "canon_text"]
    )
    h = F.lower(F.trim(F.regexp_replace(F.col(header_col), r"\s+", " ")))
    scored = (
        headers.withColumn("_h", h)
        .crossJoin(F.broadcast(canon_df))
        .withColumn(
            "score",
            F.round(
                100.0
                * (
                    1.0
                    - F.levenshtein(F.col("_h"), F.col("canon_text"))
                    / F.greatest(F.length("_h"), F.length("canon_text"))
                ),
                4,
            ),
        )
    )
    keys = ([group_col] if group_col else []) + ["canonical"]
    w = Window.partitionBy(*keys).orderBy(
        F.col("score").desc(), F.col(header_col).asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("score") >= threshold))
        .select(*keys, F.col(header_col).alias("matched_header"), "score")
    )
