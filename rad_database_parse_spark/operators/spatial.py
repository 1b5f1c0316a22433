"""A4 — spatial nearest-text title join.

The reference (tables.py:19-49) assigns each extracted PDF table a title by
scanning every horizontal text object on the page and keeping the one whose
bottom-mid point is nearest (Euclidean) to the table's top-mid point,
starting from a 100pt search radius and ignoring texts ≥ 50 chars.

That per-table argmin loop is a top-1-by-distance theta join. Spark form:
equi-join on page (the selective key) with the distance predicate as a
post-join filter, then one window top-1 per table. The page join keeps the
candidate set to same-page pairs — on a 100 TB corpus the join key
(doc, page) distributes evenly, and the window partitions by table_id so
no single task sees more than one table's candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_DISTANCE = 100.0  # tables.py:29 min_distance start
MAX_TEXT_LEN = 50  # tables.py:37 title-candidate length gate


def nearest_text_title_join(
    tables: DataFrame,
    texts: DataFrame,
    max_distance: float = MAX_DISTANCE,
    max_text_len: int = MAX_TEXT_LEN,
) -> DataFrame:
    """Top-1-by-distance join.

    ``tables``: (table_id, page, x, y) with (x, y) the table's top-mid point.
    ``texts``:  (text_id, page, tx, ty, text) with (tx, ty) the text's
    bottom-mid point. Returns (table_id, title, text_id, dist) — the nearest
    qualifying text per table, ties broken on (text, text_id).
    """
    cand = tables.join(texts, "page").filter(F.length("text") < max_text_len)
    dist = F.sqrt(
        (F.col("tx") - F.col("x")) * (F.col("tx") - F.col("x"))
        + (F.col("ty") - F.col("y")) * (F.col("ty") - F.col("y"))
    )
    w = Window.partitionBy("table_id").orderBy(
        F.col("dist").asc(), F.col("text").asc(), F.col("text_id").asc()
    )
    return (
        cand.withColumn("dist", F.round(dist, 6))
        .filter(F.col("dist") <= max_distance)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("table_id", F.col("text").alias("title"), "text_id", "dist")
    )
