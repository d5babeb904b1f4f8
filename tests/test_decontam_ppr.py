"""Round-2 additions: repetition stats, benchmark decontamination, and
personalized PageRank — invariant gates beyond the driver's DuckDB hash
gate (which runs the same ops via __spark_entry__)."""

import numpy as np
from pyspark.sql import functions as F

from grappolo_spark.functions import text as TX
from grappolo_spark.operators.pagerank import (
    pagerank_prepare,
    personalized_pagerank,
)


def test_repetition_stats_counts(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c a b c a b c"),       # grams: 7 total, 3 distinct
            (1, "x y z w"),                 # 2 total, 2 distinct
            (2, "p q"),                     # short text -> 1 whole-text gram
            (3, ""),                        # empty -> the single "" gram
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in TX.repetition_stats(docs).collect()}
    assert (rows[0].n_grams, rows[0].n_distinct) == (7, 3)
    assert abs(rows[0].rep_ratio - (1 - 3 / 7)) < 1e-12
    assert (rows[1].n_grams, rows[1].n_distinct, rows[1].rep_ratio) == (2, 2, 0.0)
    assert (rows[2].n_grams, rows[2].n_distinct) == (1, 1)
    assert (rows[3].n_grams, rows[3].rep_ratio) == (1, 0.0)


def test_contamination_hits_and_decontaminate(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),   # shares "alpha beta gamma" with eval 100
            (2, "foo bar baz qux"),          # clean
            (3, "alpha beta gamma"),         # shares with eval 100
            (4, "one two three four five"),  # shares "two three four" with eval 101
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [
            (100, "alpha beta gamma zeta"),
            (101, "zzz two three four"),
        ],
        "doc_id long, text string",
    )
    hits = {r.doc_id: r for r in TX.contamination_hits(train, ev).collect()}
    assert set(hits) == {1, 3, 4}
    assert hits[1].n_eval_docs == 1 and hits[1].n_shingles == 1
    assert hits[3].n_eval_docs == 1 and hits[3].n_shingles == 1
    assert hits[4].n_eval_docs == 1 and hits[4].n_shingles == 1
    clean = sorted(r.doc_id for r in TX.decontaminate(train, ev).collect())
    assert clean == [2]
    # partition invariance (hash gates elsewhere check engine-vs-DuckDB)
    hits7 = {r.doc_id: (r.n_eval_docs, r.n_shingles)
             for r in TX.contamination_hits(train.repartition(7), ev).collect()}
    assert hits7 == {d: (r.n_eval_docs, r.n_shingles) for d, r in hits.items()}


def _ppr_numpy(edges_rows, nv, seeds, iters, alpha=0.85):
    """Dense numpy twin: r' = (1-a)p + a M^T r over live vertices."""
    wdeg = np.zeros(nv)
    for s, d, w in edges_rows:
        wdeg[s] += w
    live = wdeg > 0
    p = np.zeros(nv)
    live_seeds = [v for v in seeds if live[v]]
    for v in live_seeds:
        p[v] = 1.0 / len(live_seeds)
    r = p.copy()
    for _ in range(iters):
        nxt = np.zeros(nv)
        for s, d, w in edges_rows:
            nxt[d] += (w / wdeg[s]) * r[s]
        r = (1 - alpha) * p + alpha * nxt
        r[~live] = 0.0
    return r


def test_personalized_pagerank_vs_numpy(spark):
    # two triangles bridged by one edge + an isolated vertex (vid 7)
    und = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3), (0, 6)]
    rows = [(s, d, 1.0) for s, d in und] + [(d, s, 1.0) for s, d in und]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    nv = 8
    seeds = spark.createDataFrame([(0,), (7,)], "vid long")  # 7 is isolated
    ranks, iters = personalized_pagerank(spark, edges, nv, seeds, max_iter=12,
                                         cut_every=5)
    got = np.zeros(nv)
    for r in ranks.collect():
        got[r.vid] = r.rank
    want = _ppr_numpy(rows, nv, [0, 7], 12)
    assert iters == 12
    assert np.allclose(got, want, atol=1e-12)
    assert got[7] == 0.0  # isolated seed is not live -> exactly 0
    # mass concentrates near the seed side of the bridge
    assert got[1] > got[4]


def test_personalized_pagerank_chained_equals_unchained(spark):
    rows = [(s, d, 1.0) for s, d in [(0, 1), (1, 2), (2, 0), (2, 3)]]
    rows += [(d, s, w) for s, d, w in rows]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    seeds = spark.createDataFrame([(0,)], "vid long")
    prep = pagerank_prepare(edges)
    a, _ = personalized_pagerank(spark, edges, 4, seeds, max_iter=7,
                                 cut_every=1, prepared=prep)
    b, _ = personalized_pagerank(spark, edges, 4, seeds, max_iter=7,
                                 cut_every=7, prepared=prep)
    av = {r.vid: r.rank for r in a.collect()}
    bv = {r.vid: r.rank for r in b.collect()}
    assert av == bv  # bit-identical across chaining boundaries
