"""DuckDB two-phase twin ≡ numpy oracle (multi-phase Louvain step chain).

``oracle/louvain_sql.louvain_two_phase_sql`` is the hard DuckDB gate behind
the ``louvain_two_phase`` driver query: phase-1 sweeps -> first-occurrence
renumber -> community-aggregation coarsen -> phase-2 sweeps on the coarse
graph -> renumber -> C_orig[v] = C2[C1[v]] projection — exactly the
``louvain`` driver's per-phase chain (``runMultiPhaseBasic.cpp:66-204``,
``buildNextPhase.cpp:48-79,145-236``) with both sweep budgets pinned.

This test closes the chain without Spark: the SQL twin must reproduce the
same composition of ``louvain_phase_np`` / ``renumber_np`` / ``coarsen_np``
(each proven equal to the compiled reference binary in
test_golden_parity.py and to the engine in test_louvain.py) per-vertex
exactly, for several (k1, k2) budgets, on every fixture including
singleton-swap, isolated-vertex, and disconnected cases.
"""

import duckdb
import pandas as pd
import pytest

from grappolo_spark import fixtures as fx
from grappolo_spark.oracle.louvain_sql import louvain_two_phase_sql
from grappolo_spark.oracle.numpy_oracle import (
    coarsen_np,
    louvain_phase_np,
    renumber_np,
)

CASES = {
    "karate": fx.karate,
    "two_cliques_bridge": fx.two_cliques_bridge,
    "weighted_two_triangles": fx.weighted_two_triangles,
    "disconnected": fx.disconnected,
    "star_hub": lambda: fx.star_hub(50),
    "grid3d": lambda: fx.grid3d(3),
    "er_200_50": lambda: fx.erdos_renyi(200, 50, 12345),
}


def two_phase_np(sym, nv, k1, k2):
    """The numpy composition the SQL twin mirrors, restricted (like the
    twin and the driver query) to vertices with at least one edge row."""
    edge_verts = sorted({s for s, _, _ in sym})
    c1_full, _, _, _, _ = louvain_phase_np(sym, nv, max_inner=k1)
    # first-occurrence renumber over edge vertices only (ascending vid ==
    # communities ordered by min member vid, exactly renumber_np's scan)
    seen = {}
    c1 = {}
    for v in edge_verts:
        c = c1_full[v]
        if c not in seen:
            seen[c] = len(seen)
        c1[v] = seen[c]
    ncomm = len(seen)
    coarse, _ = coarsen_np(sym, [c1.get(v, -1) for v in range(nv)], ncomm)
    c2_full, _, _, _, _ = louvain_phase_np(coarse, ncomm, max_inner=k2)
    c2r, _ = renumber_np(c2_full)
    return {v: c2r[c1[v]] for v in edge_verts}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("k1,k2", [(1, 1), (2, 2), (3, 3), (5, 2)])
def test_two_phase_sql_twin_matches_numpy_oracle(name, k1, k2):
    und, nv = CASES[name]()
    sym = fx.symmetric_rows(und)
    expected = two_phase_np(sym, nv, k1, k2)

    con = duckdb.connect()
    con.register("edges_raw", pd.DataFrame(sym, columns=["src", "dst", "weight"]))
    ctes, final = louvain_two_phase_sql(k1, k2)
    got = {
        int(v): int(c)
        for v, c in con.execute(
            f"WITH edges AS (SELECT * FROM edges_raw),{ctes} "
            f"SELECT vid, comm FROM {final}"
        ).fetchall()
    }
    assert got == expected, name
