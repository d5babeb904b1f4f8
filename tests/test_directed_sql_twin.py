"""DuckDB unrolled twin of the base-path (directed) Louvain sweep chain
≡ numpy oracle.

``oracle/louvain_sql.directed_sweeps_sql`` is the hard DuckDB gate behind
the ``directed_louvain_sweeps`` driver query: singleton init plus
``max_inner - 2`` applied gain-argmax sweeps under the reference's
community-SLOT bookkeeping (a -1 vertex keeps occupying its own singleton
slot) and pastCommAss return semantics. This test closes the chain without
Spark: the SQL twin must reproduce ``base_phase_np``/``directed_louvain_np``
(proven equal to the engine in test_variants.py) per-vertex exactly for
several sweep budgets, on fixtures including sinks, a sink-anchored
community at the singleton-swap boundary (directed_sink_magnet), and
vertices with no out-rows from sweep 2 on.
"""

import duckdb
import pandas as pd
import pytest

from grappolo_spark import fixtures as fx
from grappolo_spark.oracle import directed_louvain_np
from grappolo_spark.oracle.louvain_sql import directed_sweeps_sql

from tests.test_variants import (
    directed_reply_chain,
    directed_sink_magnet,
    directed_two_cycles,
)


def oriented_karate():
    """Karate with each undirected edge kept in its high->low direction —
    a DAG whose local minima are sinks."""
    und, nv = fx.karate()
    rows = [(max(s, d), min(s, d), w) for s, d, w in und if s != d]
    return rows, nv


CASES = {
    "directed_two_cycles": directed_two_cycles,
    "directed_reply_chain": directed_reply_chain,
    "directed_sink_magnet": directed_sink_magnet,
    "oriented_karate": oriented_karate,
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("k", [2, 3, 4, 6])
def test_directed_sql_twin_matches_numpy_oracle(name, k):
    rows, nv = CASES[name]()
    expected = directed_louvain_np(rows, nv, thresh=-1e9, max_inner=k)["C"]

    con = duckdb.connect()
    con.register("dedges_raw", pd.DataFrame(rows, columns=["src", "dst", "weight"]))
    con.register("dverts_raw", pd.DataFrame({"vid": range(nv)}))
    ctes, final = directed_sweeps_sql(k)
    got = dict(
        con.execute(
            "WITH dedges AS (SELECT * FROM dedges_raw),"
            f"dverts AS (SELECT * FROM dverts_raw),{ctes} "
            f"SELECT vid, comm FROM {final}"
        ).fetchall()
    )
    assert [int(got[v]) for v in range(nv)] == expected, (name, k)
