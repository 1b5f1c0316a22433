"""Query registry — every operator exposed through __spark_entry__.py.

Each entry pairs a Spark query builder ``(spark, sf_dir) -> DataFrame`` with
an equivalent DuckDB oracle SQL string (or None for non-SQL-expressible
operators, which the driver checks rows-only).

Float-parity policy (what makes hash-compare possible across engines):
- money-like 2-decimal columns are cast to DECIMAL before +/* aggregation —
  decimal arithmetic is exact, so both engines produce bit-identical sums;
- divisions happen in double AFTER exact aggregation (IEEE ops on identical
  operands are deterministic);
- genuinely-float quantities (cosines) are rounded before ranking and ties
  break on ids.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over the pre-registered views, or None


_REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        _REGISTRY[name] = QueryDef(fn=fn, oracle=oracle)
        return fn

    return deco


# Family order of the returned dict. The driver's correctness gate checks the
# FIRST 50 queries per round, so families rotate to the front until each has
# driver-green rows. Round 1 covered core_relational + tpch_deep (+2 scalar);
# round 2 puts llm_ops (25) + events_ops (25) in the window; pipeline/etl/
# sampling lead the next rotation. The order is imposed EXPLICITLY here (not
# via import side-effect order) so an earlier direct import of any registry
# module — e.g. __spark_entry__.entry() touching core_relational before
# queries() is called — cannot shuffle the window.
_FAMILY_ORDER = [
    "llm_ops",
    "events_ops",
    "pipeline_ops",
    "etl_ops",
    "sampling_profile",
    "scalar_functions",
    "core_relational",
    "tpch_deep",
]


def all_queries() -> dict[str, QueryDef]:
    # Import registers everything on first use (order here is irrelevant —
    # see _FAMILY_ORDER).
    from . import core_relational  # noqa: F401
    from . import tpch_deep  # noqa: F401
    from . import scalar_functions  # noqa: F401
    from . import sampling_profile  # noqa: F401
    from . import etl_ops  # noqa: F401
    from . import events_ops  # noqa: F401
    from . import llm_ops  # noqa: F401
    from . import pipeline_ops  # noqa: F401

    rank = {m: i for i, m in enumerate(_FAMILY_ORDER)}
    module_of = {
        name: qd.fn.__module__.rsplit(".", 1)[-1] for name, qd in _REGISTRY.items()
    }
    ordered = sorted(
        _REGISTRY.items(),
        key=lambda kv: rank.get(module_of[kv[0]], len(_FAMILY_ORDER)),
    )
    return dict(ordered)
