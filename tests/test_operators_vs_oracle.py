"""Spark operators vs numpy oracle on every fixture (exact / allclose)."""

import numpy as np
import pytest

from grappolo_spark import fixtures as fx
from grappolo_spark.operators.pagerank import pagerank
from grappolo_spark.operators.components import connected_components
from grappolo_spark.operators.labelprop import label_propagation
from grappolo_spark.operators.triangles import triangles
from grappolo_spark.oracle import (
    pagerank_np,
    connected_components_np,
    label_propagation_np,
    triangle_counts_np,
)

FIXTURES = sorted(fx.ALL_FIXTURES)


@pytest.mark.parametrize("name", FIXTURES)
def test_pagerank_allclose(spark, name):
    edges, nv = fx.ALL_FIXTURES[name]()
    rows = fx.symmetric_rows(edges)
    df = fx.to_spark_edges(spark, edges)
    expected, _ = pagerank_np(rows, nv)
    got_df, iters = pagerank(spark, df, nv)
    got = np.zeros(nv)
    for r in got_df.collect():
        got[r["vid"]] = r["rank"]
    assert np.allclose(got, expected, atol=1e-6), name
    assert abs(got.sum() - 1.0) < 1e-9


@pytest.mark.parametrize("name", FIXTURES)
def test_connected_components_exact(spark, name):
    edges, nv = fx.ALL_FIXTURES[name]()
    rows = fx.symmetric_rows(edges)
    df = fx.to_spark_edges(spark, edges)
    expected = connected_components_np(rows, nv)
    got_df, rounds = connected_components(spark, df, nv)
    got = {r["vid"]: r["component"] for r in got_df.collect()}
    assert [got[i] for i in range(nv)] == expected, name


@pytest.mark.parametrize("name", FIXTURES)
def test_label_propagation_exact(spark, name):
    edges, nv = fx.ALL_FIXTURES[name]()
    rows = fx.symmetric_rows(edges)
    df = fx.to_spark_edges(spark, edges)
    expected, _ = label_propagation_np(rows, nv)
    got_df, rounds = label_propagation(spark, df, nv)
    got = {r["vid"]: r["label"] for r in got_df.collect()}
    assert [got[i] for i in range(nv)] == expected, name


@pytest.mark.parametrize("name", FIXTURES)
def test_triangles_exact(spark, name):
    edges, nv = fx.ALL_FIXTURES[name]()
    rows = fx.symmetric_rows(edges)
    df = fx.to_spark_edges(spark, edges)
    expected_per, expected_total = triangle_counts_np(rows, nv)
    got_df, total = triangles(spark, df, nv)
    got = {r["vid"]: r["triangles"] for r in got_df.collect()}
    assert total == expected_total, name
    assert [got[i] for i in range(nv)] == expected_per, name


def test_pagerank_path_closed_form(spark):
    # 2-vertex path: symmetric, rank must be 0.5/0.5
    df = fx.to_spark_edges(spark, [(0, 1, 1.0)])
    got, _ = pagerank(spark, df, 2)
    ranks = [r["rank"] for r in got.orderBy("vid").collect()]
    assert np.allclose(ranks, [0.5, 0.5], atol=1e-9)


@pytest.mark.parametrize("name", ["karate", "two_cliques_bridge"])
def test_pagerank_chained_batches_bit_identical(spark, name):
    # cut_every>1 chains supersteps lazily into one job per batch; the
    # chained plan runs the identical per-iteration float64 expressions,
    # so fixed-iteration results must be BIT-identical, including a batch
    # size that does not divide max_iter (7 = 3+3+1)
    edges, nv = fx.ALL_FIXTURES[name]()
    df = fx.to_spark_edges(spark, edges)
    base, _ = pagerank(spark, df, nv, tol=0.0, max_iter=7, cut_every=1)
    want = {r["vid"]: r["rank"] for r in base.collect()}
    for ce in (3, 7, 100):
        got_df, iters = pagerank(spark, df, nv, tol=0.0, max_iter=7, cut_every=ce)
        got = {r["vid"]: r["rank"] for r in got_df.collect()}
        assert iters == 7
        assert got == want, (name, ce)


def test_cc_log_rounds(spark):
    # path of 64 vertices must converge in O(log n) rounds, not O(n)
    edges, nv = fx.path_n(64)
    df = fx.to_spark_edges(spark, edges)
    _, rounds = connected_components(spark, df, nv)
    assert rounds <= 10
