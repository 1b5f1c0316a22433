"""Driver-window canary: CORRECTNESS_r11.json landed fully green — 50/50
rows+schema+hash on the round-11 window (_WINDOW_R10 tail +
_WINDOW_R11[:45]) — so the round-12 rotation has no errors to re-pin. It
leads with the 5 displaced _WINDOW_R11 tail queries (never
driver-checked), then _WINDOW_R12 (whose own 5-query tail displaces into
r13 by the same overflow rule). An import reorder or a family
re-registration must not be able to silently re-run an already-green
window (VERDICT r2 item 7). New registrations queue in _WINDOW_R13 (the
live window) until it closes at 50.
"""

from rad_database_parse_spark.registry import (
    _REPIN_R8,
    _REPIN_R10,
    _WINDOW_R3,
    _WINDOW_R4,
    _WINDOW_R5,
    _WINDOW_R6,
    _WINDOW_R7,
    _WINDOW_R8,
    _WINDOW_R9,
    _WINDOW_R10,
    _WINDOW_R11,
    _WINDOW_R12,
    _WINDOW_R13,
    all_queries,
)


def _expected_order():
    seen = set()
    return [
        n
        for n in _WINDOW_R11[45:]
        + _WINDOW_R12
        + _WINDOW_R13
        + _WINDOW_R11
        + _WINDOW_R10
        + _WINDOW_R9
        + _WINDOW_R8
        + _WINDOW_R7
        + _WINDOW_R6
        + _WINDOW_R5
        + _WINDOW_R3
        + _WINDOW_R4
        if not (n in seen or seen.add(n))
    ]


def test_r12_window_leads():
    names = list(all_queries())
    # positions 1-5: the _WINDOW_R11 tail displaced by the r11 rotation
    # (their first-ever driver rows); positions 6-50: the first 45
    # _WINDOW_R12 entries. Together they are exactly the driver's
    # 50-query correctness window for round 12.
    assert names[:5] == _WINDOW_R11[45:]
    assert names[5:50] == _WINDOW_R12[:45]
    # the closed windows are pinned full at exactly 50
    assert len(_WINDOW_R6) == 50
    assert len(_WINDOW_R7) == 50
    assert len(_WINDOW_R8) == 50
    assert len(_WINDOW_R9) == 50
    assert len(_WINDOW_R10) == 50
    assert len(_WINDOW_R11) == 50
    assert len(_WINDOW_R12) == 50
    # the live window must not silently grow past the driver's 50-query
    # gate (ADVICE r6): overflow into a future _WINDOW_R14 is an explicit
    # decision, not an accident
    assert len(_WINDOW_R13) <= 50


def test_full_pinned_order_holds():
    names = list(all_queries())
    expected = _expected_order()
    assert names[: len(expected)] == expected


def test_window_is_immune_to_direct_module_imports():
    # Simulate __spark_entry__.entry() touching a registry module before
    # queries() is called — the pinned order must not change.
    import rad_database_parse_spark.registry.core_relational  # noqa: F401
    import rad_database_parse_spark.registry.llm_ops  # noqa: F401

    assert list(all_queries())[:5] == _WINDOW_R11[45:]
    assert list(all_queries())[5:50] == _WINDOW_R12[:45]


def test_every_window_name_unique_and_registered():
    for window in (
        _REPIN_R8,
        _REPIN_R10,
        _WINDOW_R3,
        _WINDOW_R4,
        _WINDOW_R5,
        _WINDOW_R6,
        _WINDOW_R7,
        _WINDOW_R8,
        _WINDOW_R9,
        _WINDOW_R10,
        _WINDOW_R11,
        _WINDOW_R12,
        _WINDOW_R13,
    ):
        assert len(set(window)) == len(window)
    registered = set(all_queries())
    assert (
        set(
            _REPIN_R8
            + _REPIN_R10
            + _WINDOW_R3
            + _WINDOW_R4
            + _WINDOW_R5
            + _WINDOW_R6
            + _WINDOW_R7
            + _WINDOW_R8
            + _WINDOW_R9
            + _WINDOW_R10
            + _WINDOW_R11
            + _WINDOW_R12
            + _WINDOW_R13
        )
        <= registered
    )


def test_r12_tail_and_r13_queue_directly_after_window():
    # the displaced _WINDOW_R12 tail (5 entries) then _WINDOW_R13 must
    # sit at positions 51+ so the rotation provably advances one full
    # window per driver round
    names = list(all_queries())
    for i, q in enumerate(_WINDOW_R12[45:]):
        assert names[50 + i] == q
    seen = set(_WINDOW_R11) | set(_WINDOW_R12)
    r13_dedup = [q for q in _WINDOW_R13 if q not in seen]
    for i, q in enumerate(r13_dedup):
        assert names[55 + i] == q
