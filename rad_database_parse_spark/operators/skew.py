"""Skew mitigation operators: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; salting is the explicit, plan-level tool for when a single key is
hot enough that even split partitions overwhelm one task — the classic
100 TB failure mode (one user/session/null key holding 1% of the fact
table).

- ``salted_equi_join``: the big (skewed) side gets a per-row deterministic
  salt in [0, n); the small side is exploded ×n so every (key, salt) pair
  exists. The join key becomes (key, salt) — the hot key's rows spread over
  n tasks instead of one. Row-multiplication happens on the SMALL side only.
- ``salted_groupby_count``: two-phase aggregation — partial count per
  (key, salt), then final sum per key. Spark's hash aggregate already does
  map-side partials, so this matters when the DISTINCT key set itself is
  small but hot (the partial-agg hash table stays tiny either way; the
  shuffle spreads).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, salt_source: str | None, n_salts: int) -> Column:
    """Deterministic per-row salt — xxhash64 spreads a hot join key's rows
    uniformly; determinism keeps reruns reproducible.

    With no ``salt_source`` the salt hashes ALL columns: salting on the join
    key alone would give every row of a hot key the same salt — zero
    spreading for exactly the case salting exists for."""
    cols = [F.col(salt_source)] if salt_source else [F.col(c) for c in df.columns]
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts))


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated ×n.

    ``salt_source``: a column of ``big`` that varies per row; by default the
    salt hashes every column of ``big`` so a hot key genuinely spreads over
    ``n_salts`` tasks."""
    b = big.withColumn("_salt", _row_salt(big, salt_source, n_salts))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")


def salted_groupby_count(
    df: DataFrame, key: str, n_salts: int = 8, salt_source: str | None = None
) -> DataFrame:
    """Two-phase count: partial per (key, salt) → final per key."""
    partial = (
        df.withColumn("_salt", _row_salt(df, salt_source, n_salts))
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").cast("long").alias("n"))
