"""Mechanical driver-side-collect guard (VERDICT r6 item 7).

Every ``.collect()`` in the engine package must be a BOUNDED-grain
collect — preceded by an aggregation/limit that makes the collected row
count independent of corpus size — and must SAY SO: a justification
keyword ('bounded', 'scalar', 'tiny', 'grain', 'driver-side', or
'limit 1') within the eight lines above the call (the repo's annotation
convention). A new ``.collect()`` without a written bound fails this
test, which is the point: the bound must be argued at the call site,
not rediscovered in review.
"""

import os
import re

PKG = os.path.join(os.path.dirname(__file__), "..", "rad_database_parse_spark")
KEYWORDS = re.compile(
    r"bounded|scalar|tiny|\bgrain\b|driver-side|limit 1|limit\(1\)", re.I
)


def _collect_sites():
    for dirpath, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            lines = open(path).read().splitlines()
            for i, line in enumerate(lines):
                if ".collect()" in line and not line.lstrip().startswith("#"):
                    ctx = "\n".join(lines[max(0, i - 8) : i + 2])
                    yield os.path.relpath(path, PKG), i + 1, ctx


def test_every_collect_is_annotated_bounded():
    missing = [
        f"{rel}:{ln}"
        for rel, ln, ctx in _collect_sites()
        if not KEYWORDS.search(ctx)
    ]
    assert not missing, (
        "collect() without a bounded-grain justification within 8 lines: "
        + ", ".join(missing)
        + " — aggregate to bounded grain first and write the bound at the"
        " call site (e.g. '# bounded: one row per <fixed thing>')"
    )


def test_guard_sees_the_known_sites():
    # sanity: the walker actually finds the collect population (31 sites
    # as of round 7; grows with new driver-side iterates)
    assert sum(1 for _ in _collect_sites()) >= 25
