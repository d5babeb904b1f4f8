"""DuckDB full twin ≡ numpy oracle for the ENTIRE coloring driver (C12).

``oracle/louvain_sql.louvain_coloring_full_sql`` unrolls the whole
``louvain_coloring()`` run — per colored phase a JP coloring (the proven
``distance1_cte`` twin) + the Gauss-Seidel colored phase + -1 fill +
renumber + projection + coarsen, then the basic-driver tail — with
(num_iters, n_colors) / tail sweep counts replayed from
``coloring_np.louvain_coloring_schedule_np`` (the identical loop; depths
only, every value recomputed by DuckDB).

``louvain_coloring_np`` is proven equal to the Spark engine
(test_coloring.py), so SQL ≡ numpy here closes the chain SQL ≡ engine.
"""

import duckdb
import pandas as pd
import pytest

from grappolo_spark import fixtures as fx
from grappolo_spark.oracle.coloring_np import (
    louvain_coloring_np,
    louvain_coloring_schedule_np,
)
from grappolo_spark.oracle.louvain_sql import louvain_coloring_full_sql

CASES = {
    "karate": fx.karate,
    "two_cliques_bridge": fx.two_cliques_bridge,
    "weighted_two_triangles": fx.weighted_two_triangles,
    "disconnected": fx.disconnected,
    "star_hub": lambda: fx.star_hub(50),
    "grid3d": lambda: fx.grid3d(3),
    # er_300_120 (covered by the other twin tests) is omitted here: its
    # colored unroll alone costs minutes of DuckDB time per run
    "er_200_50": lambda: fx.erdos_renyi(200, 50, 12345),
}


def _run_twin(sym, nv, sched):
    con = duckdb.connect()
    con.register("e_raw", pd.DataFrame(sym, columns=["src", "dst", "weight"]))
    con.register("v_raw", pd.DataFrame({"vid": range(nv)}))
    ctes, fin = louvain_coloring_full_sql(
        sched["colored"], sched["tail"], tail_on_input=sched["tail_on_input"]
    )
    return {
        int(v): int(c)
        for v, c in con.execute(
            f"WITH RECURSIVE edges AS (SELECT * FROM e_raw),"
            f"allv AS (SELECT CAST(vid AS BIGINT) AS vid FROM v_raw),{ctes} "
            f"SELECT vid, comm FROM {fin}"
        ).fetchall()
    }


@pytest.mark.parametrize("mgs", [1, 10])
@pytest.mark.parametrize("name", sorted(CASES))
def test_coloring_full_twin_matches_numpy(name, mgs):
    """min_graph_size=1 exercises multiple colored phases (and usually the
    no-move break, i.e. the tail-on-input path); 10 hands mid-size coarse
    graphs to the basic tail via the while-condition exit."""
    und, nv = CASES[name]()
    sym = fx.symmetric_rows(und)
    sched = louvain_coloring_schedule_np(sym, nv, min_graph_size=mgs)
    expected = dict(enumerate(
        louvain_coloring_np(sym, nv, min_graph_size=mgs)["C"]))
    got = _run_twin(sym, nv, sched)
    assert got == expected, (name, mgs, sched)


def test_schedule_covers_both_tail_modes():
    """The fixture set must exercise both the coarse-tail and the
    tail-on-input break, or the parametrized test proves less than it
    claims."""
    modes = set()
    for name in CASES:
        und, nv = CASES[name]()
        sym = fx.symmetric_rows(und)
        for mgs in (1, 10):
            modes.add(louvain_coloring_schedule_np(
                sym, nv, min_graph_size=mgs)["tail_on_input"])
    assert modes == {True, False}
