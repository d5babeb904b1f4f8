"""DuckDB full-convergence twins ≡ numpy oracle for the base-path variants.

``oracle/louvain_sql.base_phase_full_sql`` (ref C8 — full directed Louvain
run, ``parallelDirectedLouvainMethod.cpp:47-280``) and
``resistance_multiphase_sql`` (ref C9 — the ENTIRE FastTrackResistance
driver, ``runMultiPhaseBasicFastTrackResistance.cpp:60-160``) are the hard
DuckDB gates behind the ``directed_louvain`` / ``louvain_resistance``
driver queries. The observed sweep/phase counts parameterize only the
unroll depth; every value is recomputed by DuckDB.

``base_phase_np`` / ``fasttrack_resistance_np`` are proven equal to the
Spark engine (test_variants.py), so SQL ≡ numpy here closes the chain
SQL ≡ engine.
"""

import duckdb
import pandas as pd
import pytest

from grappolo_spark import fixtures as fx
from grappolo_spark.oracle.louvain_sql import (
    base_phase_full_sql,
    resistance_multiphase_sql,
)
from grappolo_spark.oracle.numpy_oracle import (
    directed_louvain_np,
    fasttrack_resistance_np,
)

CASES = {
    "karate": fx.karate,
    "two_cliques_bridge": fx.two_cliques_bridge,
    "weighted_two_triangles": fx.weighted_two_triangles,
    "disconnected": fx.disconnected,
    "star_hub": lambda: fx.star_hub(50),
    "grid3d": lambda: fx.grid3d(3),
    "er_200_50": lambda: fx.erdos_renyi(200, 50, 12345),
    "er_300_120": lambda: fx.erdos_renyi(300, 120, 777),
}


def _run(rows, nv, ctes, final):
    con = duckdb.connect()
    con.register("e_raw", pd.DataFrame(rows, columns=["src", "dst", "weight"]))
    con.register("v_raw", pd.DataFrame({"vid": range(nv)}))
    return {
        int(v): int(c)
        for v, c in con.execute(
            f"WITH dedges AS (SELECT * FROM e_raw),"
            f"edges AS (SELECT * FROM e_raw),"
            f"dverts AS (SELECT CAST(vid AS BIGINT) AS vid FROM v_raw),"
            f"allv AS (SELECT CAST(vid AS BIGINT) AS vid FROM v_raw),{ctes} "
            f"SELECT vid, comm FROM {final}"
        ).fetchall()
    }


@pytest.mark.parametrize("name", sorted(CASES))
def test_directed_full_twin_matches_numpy(name):
    """Directed rows (high->low orientation: sinks exercise the -1 fill
    and community-slot bookkeeping) — full run to the threshold stop."""
    und, nv = CASES[name]()
    rows = [(s, d, w) for s, d, w in fx.symmetric_rows(und) if s > d]
    res = directed_louvain_np(rows, nv)
    ctes, fin = base_phase_full_sql(res["num_iters"], 2.0)
    assert _run(rows, nv, ctes, fin) == dict(enumerate(res["C"])), (
        name, res["num_iters"])


@pytest.mark.parametrize("name", sorted(CASES))
def test_resistance_full_twin_matches_numpy(name):
    und, nv = CASES[name]()
    sym = fx.symmetric_rows(und)
    res = fasttrack_resistance_np(sym, nv)
    ctes, fin = resistance_multiphase_sql(res["schedule"])
    assert _run(sym, nv, ctes, fin) == dict(enumerate(res["C"])), (
        name, res["schedule"])


def test_directed_early_stop_returns_init():
    """A run observed to stop on sweep 1 or 2 returns the singleton init
    (pastCommAss was never swapped) — the applied = max(k-2, 0) clamp."""
    und, nv = fx.disconnected()
    rows = [(s, d, w) for s, d, w in fx.symmetric_rows(und) if s > d]
    for k in (1, 2):
        ctes, fin = base_phase_full_sql(k, 2.0)
        assert _run(rows, nv, ctes, fin) == {i: i for i in range(nv)}


def test_resistance_isolated_vertices_stay_minus_one():
    """Isolated vertices get -1 from the base-path fill once a swept state
    is returned, and the -1 passes through renumber and every projection."""
    und, nv = fx.disconnected()
    sym = fx.symmetric_rows(und)
    res = fasttrack_resistance_np(sym, nv)
    ctes, fin = resistance_multiphase_sql(res["schedule"])
    got = _run(sym, nv, ctes, fin)
    iso = {i for i in range(nv) if not any(s == i for s, _, _ in sym)}
    if res["schedule"][0] > 2:
        assert all(got[i] == -1 for i in iso)
    assert got == dict(enumerate(res["C"]))
