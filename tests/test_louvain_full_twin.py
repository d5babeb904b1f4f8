"""DuckDB full-convergence twin ≡ numpy oracle (entire multi-phase run).

``oracle/louvain_sql.louvain_multiphase_sql`` is the hard DuckDB gate
behind the ``louvain_communities`` / ``louvain_arrow`` driver queries: the
ENTIRE ``louvain()`` convergence run (``runMultiPhaseBasic.cpp:66-204``)
unrolled — phase sweeps -> isolated fill -> first-occurrence renumber ->
C_orig projection -> coarsen, chained for every executed phase — with the
per-phase sweep counts taken from ``louvain_schedule_np`` (the exact same
driver loop; counts are unroll depths only, every value is recomputed by
DuckDB).

``louvain_multiphase_np`` is proven bit-equal to the compiled reference
binary (test_golden_parity.py) and to the Spark engine (test_louvain.py),
so SQL ≡ numpy here closes the chain SQL ≡ engine ≡ reference.
"""

import duckdb
import pandas as pd
import pytest

from grappolo_spark import fixtures as fx
from grappolo_spark.oracle.louvain_sql import louvain_multiphase_sql
from grappolo_spark.oracle.numpy_oracle import (
    louvain_multiphase_np,
    louvain_schedule_np,
)

CASES = {
    "karate": fx.karate,
    "two_cliques_bridge": fx.two_cliques_bridge,
    "weighted_two_triangles": fx.weighted_two_triangles,
    "disconnected": fx.disconnected,
    "star_hub": lambda: fx.star_hub(50),
    "grid3d": lambda: fx.grid3d(3),
    "grid3d4": lambda: fx.grid3d(4),
    "er_200_50": lambda: fx.erdos_renyi(200, 50, 12345),
    "er_300_120": lambda: fx.erdos_renyi(300, 120, 777),
}


def run_twin(sym, nv, schedule):
    con = duckdb.connect()
    con.register("edges_raw", pd.DataFrame(sym, columns=["src", "dst", "weight"]))
    con.register("allv_raw", pd.DataFrame({"vid": range(nv)}))
    ctes, final = louvain_multiphase_sql(schedule)
    return {
        int(v): int(c)
        for v, c in con.execute(
            f"WITH edges AS (SELECT * FROM edges_raw),"
            f"allv AS (SELECT CAST(vid AS BIGINT) AS vid FROM allv_raw),{ctes} "
            f"SELECT vid, comm FROM {final}"
        ).fetchall()
    }


@pytest.mark.parametrize("name", sorted(CASES))
def test_full_twin_matches_numpy_multiphase(name):
    und, nv = CASES[name]()
    sym = fx.symmetric_rows(und)
    schedule = louvain_schedule_np(sym, nv)
    expected = dict(enumerate(louvain_multiphase_np(sym, nv)["C"]))
    got = run_twin(sym, nv, schedule)
    assert got == expected, (name, schedule)


def test_full_twin_single_sweep_phase_keeps_isolated_own_id():
    """max_inner=1 forces every phase to return its INIT state, where
    isolated vertices still carry their own vid (engine iso_fill branch,
    operators/louvain.py:702-712)."""
    und, nv = fx.disconnected()
    sym = fx.symmetric_rows(und)
    schedule = louvain_schedule_np(sym, nv, max_inner=1)
    assert schedule[0] == 1
    res = louvain_multiphase_np(sym, nv, max_inner=1)
    got = run_twin(sym, nv, schedule)
    assert got == dict(enumerate(res["C"]))


def test_over_unrolling_is_identity():
    """Padding the final phase's sweep budget beyond the observed count
    must not change the output (the no-move sweep target is its input) —
    the property that makes observed counts a safe unroll depth."""
    und, nv = CASES["karate"]()
    sym = fx.symmetric_rows(und)
    schedule = louvain_schedule_np(sym, nv)
    base = run_twin(sym, nv, schedule)
    padded = list(schedule)
    padded[-1] += 2
    assert run_twin(sym, nv, padded) == base
