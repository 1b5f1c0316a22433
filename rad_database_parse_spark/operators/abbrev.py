"""A21/A22 — abbreviation-pair extraction and dictionary expansion.

The reference parses '='-separated abbreviation cells with a per-character
state machine (main.py:18-43) and then (intends to) replace abbreviations
across all cells (main.py:45-50 — a no-op bug there; we implement the
intent). Spark-first:

- extraction is the UDTF pattern: one cell → N (abbrev, expansion) rows via
  split + explode, all JVM-side;
- expansion is a broadcast-dictionary application: either a chained
  regexp_replace built from a collected (small) dict, or an explode/join/
  re-aggregate for dictionaries too big to broadcast into one expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def extract_abbreviation_pairs(
    df: DataFrame, cell_col: str, keep_cols: list[str] | None = None
) -> DataFrame:
    """Explode cells of the form ``'TID = Total Ionizing Dose\\nSEE = ...'``
    into (abbreviation, expansion) rows. Newlines inside parentheses do not
    break records (reference main.py:26-35): we mask them before splitting.
    """
    keep = [F.col(c) for c in (keep_cols or [])]
    # Mask newlines that sit inside (...) spans so they don't break records
    # (lookahead: a ')' follows with no intervening parentheses), then split
    # records on the remaining newlines and pairs on the first '='.
    masked = F.regexp_replace(F.col(cell_col), r"\n(?=[^()]*\))", " ")
    record = F.explode(F.split(masked, r"\n")).alias("record")
    out = df.select(*keep, record).filter(F.col("record").contains("="))
    abbrev = F.trim(F.substring_index("record", "=", 1))
    expansion = F.trim(
        F.expr("substring(record, instr(record, '=') + 1, length(record))")
    )
    return (
        out.withColumn("abbreviation", abbrev)
        .withColumn("expansion", expansion)
        .filter((F.col("abbreviation") != "") & (F.col("expansion") != ""))
        .drop("record")
    )


MAX_DICT_SIZE = 10_000  # chained-regexp codegen stays well-behaved below this


def expand_abbreviations(
    df: DataFrame, text_col: str, dictionary: DataFrame,
    out_col: str | None = None, max_dict_size: int = MAX_DICT_SIZE,
) -> DataFrame:
    """Replace every whole-word abbreviation occurrence in `text_col` with its
    expansion. The dictionary is collected (it is a small dimension — the
    reference's is tens of rows) and compiled into one chained
    regexp_replace expression evaluated JVM-side; longer abbreviations are
    applied first so substrings don't pre-empt.

    The collect is bounded: an unbounded dictionary compiled into one
    expression is a driver/codegen bomb, so collect limit+1 rows and fail
    fast past ``max_dict_size`` (a huge dictionary wants the explode/join
    form instead, see module docstring)."""
    rows = (
        dictionary.select("abbreviation", "expansion")
        .limit(max_dict_size + 1)
        .collect()  # bounded: dict capped at max_dict_size+1
    )
    if len(rows) > max_dict_size:
        raise ValueError(
            f"abbreviation dictionary exceeds {max_dict_size} entries; "
            "use a join-based expansion for large dictionaries"
        )
    pairs = [(r.abbreviation, r.expansion) for r in rows]
    pairs.sort(key=lambda p: -len(p[0]))
    col: Column = F.col(text_col)
    for abbrev, expansion in pairs:
        escaped = "".join("\\" + ch if not ch.isalnum() else ch for ch in abbrev)
        col = F.regexp_replace(col, rf"\b{escaped}\b", expansion)
    return df.withColumn(out_col or text_col, col)


def abbreviation_pairs_udtf():
    """A21 as a real Python UDTF (Spark 3.5+/4.x ``@udtf``): one abbreviation
    cell row in → N (abbreviation, expansion) rows out, with the same
    parenthesis-masked record splitting as the reference's state machine
    (main.py:18-43) but running Arrow-batched on executors.

    The JVM-side ``extract_abbreviation_pairs`` is the hot-path form; this
    UDTF exists for parity of API surface (per-row Python logic that must
    fan out) and is registered for SQL use as ``abbrev_pairs(cell)``.
    """
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="abbreviation string, expansion string")
    class AbbrevPairs:
        def eval(self, cell: str):
            if not cell:
                return
            masked = re.sub(r"\n(?=[^()]*\))", " ", cell)
            for record in masked.split("\n"):
                if "=" not in record:
                    continue
                abbrev, _, expansion = record.partition("=")
                abbrev, expansion = abbrev.strip(), expansion.strip()
                if abbrev and expansion:
                    yield abbrev, expansion

    return AbbrevPairs
