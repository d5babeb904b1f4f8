"""DuckDB twin of the FastTrackResistance per-sweep bookkeeping ≡ numpy
oracle.

``oracle/louvain_sql.resistance_stats_sql`` is the hard DuckDB gate behind
the ``louvain_resistance_sweeps`` driver query: per sweep of an undirected
base-path phase with the phase>1 Granell-Arenas bookkeeping active
(``parallelLouvainMethodFastTrackResistance.cpp:192-218``), the scalars
(Σ n_s² over community SLOTS, modularity, r_min, Q_AFG). This test closes
the chain without Spark: the SQL twin must reproduce
``base_phase_np(..., resistance_phase=2)``'s per-sweep ``res_traj``
(proven equal to the engine in test_variants.py and, through
``fasttrack_resistance_np``, to the reference binary in
test_golden_parity.py) on fixtures including isolated vertices — whose
permanent singleton slots feed the Σ n_s² term the resistance rule reads.
"""

import duckdb
import pandas as pd
import pytest

from grappolo_spark import fixtures as fx
from grappolo_spark.oracle.louvain_sql import resistance_stats_sql
from grappolo_spark.oracle.numpy_oracle import base_phase_np


def _sym_case(fixture, pad_isolated=0):
    und, nv = fixture()
    return fx.symmetric_rows(und), nv + pad_isolated


CASES = {
    "karate": lambda: _sym_case(fx.karate),
    "two_cliques": lambda: _sym_case(fx.two_cliques_bridge),
    "weighted_two_triangles": lambda: _sym_case(fx.weighted_two_triangles),
    # trailing isolated vertices: their untouched singleton slots must keep
    # contributing +1 each to sum_size_sq in EVERY sweep
    "karate_isolated": lambda: _sym_case(fx.karate, pad_isolated=3),
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("k", [1, 2, 3, 5])
def test_resistance_sql_twin_matches_numpy_oracle(name, k):
    rows, nv = CASES[name]()
    exp = base_phase_np(
        rows, nv, const_factor=1.0, thresh=-1e18, max_inner=k,
        resistance_phase=2, force_sweeps=True,
    )["res_traj"]
    assert len(exp) == k

    con = duckdb.connect()
    con.register("dedges_raw", pd.DataFrame(rows, columns=["src", "dst", "weight"]))
    con.register("dverts_raw", pd.DataFrame({"vid": range(nv)}))
    ctes, final = resistance_stats_sql(k)
    got = con.execute(
        "WITH dedges AS (SELECT * FROM dedges_raw),"
        f"dverts AS (SELECT * FROM dverts_raw),{ctes} "
        f"SELECT it, sum_size_sq, curr_mod, r_min, q_afg FROM {final} "
        "ORDER BY it"
    ).fetchall()

    assert len(got) == k, (name, k)
    for row, e in zip(got, exp):
        it, sum_size_sq, curr_mod, r_min, q_afg = row
        assert int(it) == e["it"]
        assert int(sum_size_sq) == e["sum_size_sq"], (name, k, it)
        # both sides evaluate the same IEEE expression on exact
        # integer-valued aggregates — bit equality expected
        assert curr_mod == e["curr_mod"], (name, k, it)
        assert r_min == e["r_min"], (name, k, it)
        assert q_afg == e["q_afg"], (name, k, it)
