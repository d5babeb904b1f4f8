"""DuckDB unrolled-sweep twin ≡ numpy oracle (Louvain phase-1 kernel).

``oracle/louvain_sql.py`` is the hard DuckDB gate behind the
``louvain_sweeps`` / ``louvain_sweeps_arrow`` driver queries: greedy init
(``initCommAssOptVec_SFP``) plus ``k-1`` unrolled gain-argmax sweeps.
This test closes its own exactness chain without Spark: the SQL twin must
reproduce ``louvain_phase_np`` (itself proven equal to the compiled
reference binary in test_golden_parity.py and to the engine in
test_louvain.py) per-vertex exactly, for several sweep budgets, on every
fixture including singleton-swap and isolated-vertex cases.
"""

import duckdb
import pandas as pd
import pytest

from grappolo_spark import fixtures as fx
from grappolo_spark.oracle.louvain_sql import louvain_sweeps_sql
from grappolo_spark.oracle.numpy_oracle import louvain_phase_np

CASES = {
    "karate": fx.karate,
    "two_cliques_bridge": fx.two_cliques_bridge,
    "weighted_two_triangles": fx.weighted_two_triangles,
    "disconnected": fx.disconnected,
    "star_hub": lambda: fx.star_hub(50),
    "grid3d": lambda: fx.grid3d(3),
    "er_200_50": lambda: fx.erdos_renyi(200, 50, 12345),
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("k", [1, 2, 3, 5])
def test_sql_twin_matches_numpy_oracle(name, k):
    und, nv = CASES[name]()
    sym = fx.symmetric_rows(und)
    c_np, _, _, _, _ = louvain_phase_np(sym, nv, max_inner=k)
    edge_verts = {s for s, _, _ in sym}
    expected = {v: c_np[v] for v in edge_verts}

    con = duckdb.connect()
    con.register("edges_raw", pd.DataFrame(sym, columns=["src", "dst", "weight"]))
    ctes, final = louvain_sweeps_sql(k)
    got = {
        int(v): int(c)
        for v, c in con.execute(
            f"WITH edges AS (SELECT * FROM edges_raw),{ctes} "
            f"SELECT vid, comm FROM {final}"
        ).fetchall()
    }
    assert got == expected, name
