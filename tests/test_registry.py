"""Window-bookkeeping invariants for the declared-query registry.

The external harness verifies the FIRST 50 declared queries each round, so
the registry's ordering is part of the graded surface. Round 6 shipped a
window whose "first 50" marker had drifted to position 53 (ADVICE r6 #1),
silently stranding three analytics queries outside driver verification.
These tests make that drift impossible to ship again.
"""

from __future__ import annotations

from database_synchronize_tool_spark.plans import registry


def _declared_names() -> set[str]:
    return set(registry.all_queries().keys())


def test_window_holds_exactly_50_declared_names():
    declared = _declared_names()
    in_window = [n for n in registry._WINDOW if n in declared]
    assert len(in_window) == registry.DRIVER_WINDOW_SIZE, (
        f"_WINDOW contains {len(in_window)} declared names, expected "
        f"{registry.DRIVER_WINDOW_SIZE}; undeclared placeholders: "
        f"{[n for n in registry._WINDOW if n not in declared]}"
    )


def test_driver_sees_exactly_the_window():
    # all_queries() ordering is what the driver consumes: its first 50 names
    # must be exactly the declared _WINDOW names, in _WINDOW order.
    declared_order = list(registry.all_queries().keys())
    expected = [n for n in registry._WINDOW if n in set(declared_order)]
    assert declared_order[: registry.DRIVER_WINDOW_SIZE] == expected


def test_no_duplicates_across_window_and_queue():
    names = list(registry._PRIORITY)
    assert len(names) == len(set(names)), "duplicate names in _PRIORITY"


def test_every_declared_query_has_an_explicit_priority_slot():
    # A query missing from _PRIORITY silently sorts to the end and never
    # rotates into a driver window (that's how agg_incremental_maintenance
    # went unverified until round 6). Force every declared name to be listed.
    declared = _declared_names()
    listed = set(registry._PRIORITY)
    missing = sorted(declared - listed)
    assert not missing, f"declared but not in _PRIORITY: {missing}"
