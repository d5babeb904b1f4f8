"""Static gate on the driver contract (__spark_entry__.py).

The driver's correctness sweep is only as good as the wiring: a query
registered without its oracle silently downgrades to a rows-only check,
and an oracle with a typo fails at driver time, not test time. This
module catches both without spinning up Spark:

- every ``oracle_sql()`` key names a registered query, and every query
  either has an oracle or sits in the documented rows-only allowlist;
- every oracle SQL string parses and plans in DuckDB against views over
  the real sf0.001 parquet tables (schema-accurate, zero Spark cost —
  EXPLAIN binds columns and functions without executing).
"""

from __future__ import annotations

import pathlib
import sys

import duckdb
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry  # noqa: E402

SF_DIR = pathlib.Path("/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# queries whose results are not SQL-reproducible (docstring on each
# explains why); the driver records a weaker rows-only check for these
ROWS_ONLY: set[str] = set()  # every registered query is hash-gated (r3)


def test_every_oracle_has_a_query():
    q, o = set(entry.queries()), set(entry.oracle_sql())
    assert o <= q, f"oracles without queries: {sorted(o - q)}"


def test_registry_cost_canary():
    """Driver-budget canary (VERDICT r3 #7): every registered query has a
    measured cost, the registry total stays inside the documented sweep
    budget, and the ordering is coarse cheapest-first — so a future
    insertion that pushes a never-gated subsystem past the driver's
    budget cut fails HERE, not silently in the next round's
    CORRECTNESS file."""
    q = list(entry.queries())
    costs = entry.QUERY_COSTS
    missing = [n for n in q if n not in costs]
    stale = [n for n in costs if n not in q]
    assert not missing, f"queries without a measured cost: {missing}"
    assert not stale, f"costs for unregistered queries: {stale}"
    total = sum(costs.values())
    assert total <= entry.DRIVER_SWEEP_BUDGET_S, (
        f"registry sweep total {total:.0f}s exceeds the documented "
        f"budget {entry.DRIVER_SWEEP_BUDGET_S:.0f}s — re-measure with "
        "scripts/verify_queries.py and either cheapen the new entry or "
        "raise the documented budget deliberately"
    )
    # coarse cheapest-first: nothing >3x-median-expensive may sit in the
    # first half (cache-dependency placements make strict sort wrong)
    half = q[: len(q) // 2]
    med = sorted(costs.values())[len(costs) // 2]
    early_heavy = [n for n in half if costs[n] > max(10.0, 3 * med)]
    assert not early_heavy, (
        f"expensive queries placed in the first half: {early_heavy}"
    )


def test_every_query_has_an_oracle_or_is_allowlisted():
    q, o = set(entry.queries()), set(entry.oracle_sql())
    missing = q - o - ROWS_ONLY
    assert not missing, f"queries without oracles: {sorted(missing)}"
    stale = ROWS_ONLY & o
    assert not stale, f"allowlisted but has an oracle now: {sorted(stale)}"


@pytest.mark.skipif(not SF_DIR.is_dir(), reason="testdata not present")
def test_oracle_sql_parses_and_binds():
    # partially-populated testdata would otherwise surface as a wall of
    # DuckDB binder errors blamed on the SQL — diagnose it up front
    absent = [t for t in TABLES if not (SF_DIR / f"{t}.parquet").exists()]
    if absent:
        pytest.skip(f"missing table parquet under {SF_DIR}: {absent}")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR / f'{t}.parquet'}')"
        )
    bad = []
    for name, sql in entry.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001 — collect every failure
            bad.append(f"{name}: {exc}")
    assert not bad, "\n".join(bad)
