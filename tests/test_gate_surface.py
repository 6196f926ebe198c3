"""Pin the driver-gate surface: every operator claimed done has BOTH a
queries() entry and an oracle_sql() entry, and the expected count is
pinned so a silently-dropped gate row fails CI instead of silently
shrinking the correctness artifact (round-5 verdict: media_features
passed the gate but was missing from CORRECTNESS_r05.json because
nothing pinned the count)."""

from __future__ import annotations

import __spark_entry__ as e

EXPECTED_QUERIES = 56  # r6: 53; r7 adds spatial_hole_evenodd, spatial_split_count, spatial_split_sum


def test_gate_surface_is_pinned():
    qs = e.queries()
    osql = e.oracle_sql()
    assert len(qs) == EXPECTED_QUERIES, (
        f"queries() has {len(qs)} entries, expected {EXPECTED_QUERIES} — "
        "update EXPECTED_QUERIES deliberately when adding/removing gates"
    )
    # every oracle refers to a real query; every query is oracle-gated
    # (operators that genuinely can't be SQL-expressed would be allowed
    # to omit the oracle, but currently none do — keep it that way)
    assert set(osql) == set(qs)


def test_oracle_sql_strings_are_wellformed():
    for name, sql in e.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
        assert "\\" not in sql, f"{name}: backslash breaks DuckDB regex parity"
