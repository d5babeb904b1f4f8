"""File-format sources/sinks: round-trips + parity with the reference's
own karate.graph fixture file."""

import os

import pytest
from pyspark.sql import functions as F

from grappolo_spark import fixtures as fx
from grappolo_spark.graph import build_old2new_map, validate_symmetric
from grappolo_spark.sources import (
    append_results_csv,
    read_edge_list,
    read_dimacs9,
    read_matrix_market,
    read_metis,
    read_pajek,
    read_snap,
    write_edge_list,
    write_matrix_market,
    write_metis,
    write_pajek,
)

REF_KARATE = "/root/reference/karate.graph"


def _rows(df):
    return sorted((r["src"], r["dst"], r["weight"]) for r in df.collect())


def test_metis_roundtrip_and_reference_file(spark, tmp_path):
    edges, nv = fx.karate()
    df = fx.to_spark_edges(spark, edges)
    path = str(tmp_path / "karate.graph")
    write_metis(df, nv, path)
    back, nv2 = read_metis(spark, path)
    assert nv2 == nv
    assert _rows(back) == _rows(df)
    if os.path.exists(REF_KARATE):
        ref_df, ref_nv = read_metis(spark, REF_KARATE)
        assert ref_nv == nv
        assert _rows(ref_df) == _rows(df)  # fixture == reference's own file


def test_edge_list_roundtrip(spark, tmp_path):
    edges, nv = fx.weighted_two_triangles()
    df = fx.to_spark_edges(spark, edges)
    path = str(tmp_path / "edges.txt")
    write_edge_list(df, path)
    back, nv2 = read_edge_list(spark, path, weighted=True)
    assert nv2 == nv
    assert _rows(back) == _rows(df)
    validate_symmetric(back)


def test_edge_list_unweighted_one_based(spark, tmp_path):
    path = str(tmp_path / "el.txt")
    with open(path, "w") as f:
        f.write("# comment\n1 2\n2 3\n3 1\n")
    back, nv = read_edge_list(spark, path, one_based=True)
    assert nv == 3
    assert _rows(back) == _rows(
        fx.to_spark_edges(spark, [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)])
    )


def test_snap_renumber_dedup(spark, tmp_path):
    path = str(tmp_path / "g.snap")
    with open(path, "w") as f:
        f.write("# Nodes: 4 Edges: 4\n")
        f.write("100\t200\n200\t100\n200\t4000\n100\t7\n7\t100\n")
    edges, id_map, nv = read_snap(spark, path)
    assert nv == 4
    ids = {r["ext_id"]: r["vid"] for r in id_map.collect()}
    assert ids == {7: 0, 100: 1, 200: 2, 4000: 3}  # dense by ext-id order
    validate_symmetric(edges)
    # duplicate directions collapse to one undirected edge
    assert edges.count() == 6  # 3 undirected edges x 2 directions


def test_matrix_market_roundtrip_and_permutation(spark, tmp_path):
    edges, nv = fx.two_cliques_bridge()
    df = fx.to_spark_edges(spark, edges)
    path = str(tmp_path / "g.mtx")
    write_matrix_market(df, nv, path)
    back, nv2 = read_matrix_market(spark, path)
    assert nv2 == nv
    assert _rows(back) == _rows(df)

    # pack-by-community permutation (W3): a valid bijection, community-sorted
    c = spark.createDataFrame(
        [(i, i // 5) for i in range(nv)], "vid long, comm long"
    )
    perm = build_old2new_map(c)
    new_ids = sorted(r["new_vid"] for r in perm.collect())
    assert new_ids == list(range(nv))
    path2 = str(tmp_path / "g_perm.mtx")
    write_matrix_market(df, nv, path2, permutation=perm)
    back2, _ = read_matrix_market(spark, path2)
    assert back2.count() == df.count()  # permutation preserves edge count


def test_pajek_and_results_csv(spark, tmp_path):
    edges, nv = fx.path_n(4)
    df = fx.to_spark_edges(spark, edges)
    c = spark.createDataFrame([(i, 0) for i in range(nv)], "vid long, comm long")
    pj = tmp_path / "g.net"
    write_pajek(df, nv, str(pj), communities=c)
    text = pj.read_text()
    assert "*Vertices 4" in text and "*Edges" in text

    csv = tmp_path / "results.csv"
    append_results_csv(str(csv), "path_4", "spark", 32, 2, 5, 3, 0.2654,
                       1.0, 0.2, 1.2, 1e-6)
    append_results_csv(str(csv), "path_4", "spark", 8, 2, 5, 3, 0.2654,
                       2.0, 0.4, 2.4, 1e-6)
    lines = csv.read_text().strip().splitlines()
    assert lines[0].startswith("GraphName,Version,Threads")
    assert len(lines) == 3


def test_writer_guard_raises_before_collect(spark, tmp_path, monkeypatch):
    """Driver-side interchange writers must refuse oversized tables instead
    of OOMing the driver."""
    from grappolo_spark.sources import writers as W

    edges, nv = fx.path_n(10)
    df = fx.to_spark_edges(spark, edges)
    monkeypatch.setattr(W, "MAX_DRIVER_ROWS", 5)
    with pytest.raises(ValueError, match="ceiling"):
        W.write_edge_list(df, str(tmp_path / "too_big.txt"))
    with pytest.raises(ValueError, match="ceiling"):
        W.write_metis(df, nv, str(tmp_path / "too_big.graph"))
    # raising the ceiling lets the same write proceed
    monkeypatch.setattr(W, "MAX_DRIVER_ROWS", 10_000)
    W.write_edge_list(df, str(tmp_path / "ok.txt"))
    assert (tmp_path / "ok.txt").read_text().strip()


def test_pajek_roundtrip(spark, tmp_path):
    edges, nv = fx.weighted_two_triangles()
    df = fx.to_spark_edges(spark, edges)
    path = str(tmp_path / "g.net")
    write_pajek(df, nv, path)
    back, nv2 = read_pajek(spark, path)
    assert nv2 == nv
    # reference Pajek semantics force weight 1.0 on every edge (:87)
    expect = sorted((s, d, 1.0) for s, d, _w in _rows(df) if s != d)
    assert _rows(back) == expect


def test_pajek_skips_vertex_lines_self_loops(spark, tmp_path):
    path = str(tmp_path / "labels.net")
    with open(path, "w") as f:
        f.write("*Vertices 3\n")
        f.write('1 "alpha"\n2 "beta"\n3 "gamma"\n')
        f.write("*Edges\n1 2 5.0\n2 2 9.0\n2 3\n")
    back, nv = read_pajek(spark, path)
    assert nv == 3
    # self-loop 2-2 dropped, weights forced to 1.0, symmetrized
    assert _rows(back) == [(0, 1, 1.0), (1, 0, 1.0), (1, 2, 1.0), (2, 1, 1.0)]


def test_dimacs9_parse(spark, tmp_path):
    path = str(tmp_path / "g.gr")
    with open(path, "w") as f:
        f.write("c comment line\nc another\n")
        f.write("p sp 4 4\n")
        f.write("a 1 2 3\na 2 3 -2\na 3 4 1\na 1 2 1\n")
    back, nv = read_dimacs9(spark, path)
    assert nv == 4
    # weights abs'd; the duplicate 1->2 arc sums (CSR multigraph kept as
    # additive weight); stored undirected
    assert _rows(back) == [
        (0, 1, 4.0), (1, 0, 4.0), (1, 2, 2.0), (2, 1, 2.0),
        (2, 3, 1.0), (3, 2, 1.0),
    ]
    validate_symmetric(back)
