"""Embedding similarity / near-dup operators (functions/vectors.py).

The driver's DuckDB twins gate bit-level agreement (embed_cosine_topk,
ann_lsh_topk, embed_near_dup_pairs); these tests gate the *semantics*
on planted data: recall of planted near-duplicates, exactness of the
cosine verify, and the bounded-candidate property of the LSH path.
"""

import pytest
from pyspark.sql import functions as F

from grappolo_spark import tables as T
from grappolo_spark.functions import vectors as VX

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vecs(spark):
    base = T.table(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    return base.localCheckpoint(eager=True)


def _planted(vecs, n_twins=25):
    mult = F.array(*[F.lit(1.0 + ((i % 7) - 3) * 0.01) for i in range(64)])
    twins = vecs.filter(F.col("vec_id") < n_twins).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.zip_with("embedding", mult, lambda x, m: x * m).alias("embedding"),
    )
    return vecs.unionByName(twins)


def test_near_dup_pairs_recovers_planted_twins(vecs):
    n_twins = 25
    out = VX.near_dup_pairs(_planted(vecs, n_twins), threshold=0.99)
    rows = out.collect()
    got = {(r.id_a, r.id_b) for r in rows}
    want = {(i, i + 100000) for i in range(n_twins)}
    # every planted twin is within Hamming<=1 of its original on this
    # corpus (verified against the all-pairs exact answer below); nothing
    # else in the corpus is near-duplicate at 0.99
    assert got == want
    assert all(r.cosine >= 0.99 for r in rows)
    assert all(r.id_a < r.id_b for r in rows)


def test_near_dup_matches_exact_allpairs(vecs):
    """LSH+verify == brute-force all-pairs at this threshold (recall 1.0
    here; in general LSH bounds candidates, the exact check bounds
    precision to 1.0 always)."""
    planted = _planted(vecs, 10).filter(
        (F.col("vec_id") < 60) | (F.col("vec_id") >= 100000)
    ).localCheckpoint(eager=True)
    lsh = {
        (r.id_a, r.id_b, round(r.cosine, 9))
        for r in VX.near_dup_pairs(planted, threshold=0.99).collect()
    }
    a = VX.with_norm(planted).select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("ea"),
        F.col("_norm").alias("na"),
    )
    b = VX.with_norm(planted).select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("eb"),
        F.col("_norm").alias("nb"),
    )
    exact = {
        (r.id_a, r.id_b, round(r.cosine, 9))
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (VX._dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= 0.99)
        .collect()
    }
    assert lsh == exact and len(exact) == 10


def test_ivf_full_probe_equals_exact(vecs):
    """n_probe == n_cells degenerates IVF to the exact answer: every cell
    is probed, so the candidate set is the whole corpus."""
    exact = {
        (r.query_id, r.neighbor_id, r.rank, round(r.cosine, 9))
        for r in VX.cosine_topk(vecs, n_queries=20, k=5).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id, r.rank, round(r.cosine, 9))
        for r in VX.ivf_ann_topk(
            vecs, n_queries=20, k=5, n_cells=8, n_probe=8
        ).collect()
    }
    assert ivf == exact and len(exact) == 20 * 5


def test_ivf_partial_probe_is_exact_on_probed_lists(vecs):
    """With n_probe < n_cells every returned (query, neighbor, cosine) is
    one of the query's exact scores, ranks are contiguous from 1, and at
    most k rows come back per query."""
    rows = VX.ivf_ann_topk(vecs, n_queries=10, k=5, n_cells=8, n_probe=2).collect()
    exact = {
        (r.query_id, r.neighbor_id): round(r.cosine, 9)
        for r in VX.cosine_topk(vecs, n_queries=10, k=10**9).collect()
    }
    per_q = {}
    for r in rows:
        assert exact[(r.query_id, r.neighbor_id)] == round(r.cosine, 9)
        per_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_near_dup_no_pairs_on_raw_corpus(vecs):
    # the synthetic embeddings are mutually far apart (max pair cosine
    # ~0.5): without planted twins the result is empty — no false positives
    assert VX.near_dup_pairs(vecs, threshold=0.99).count() == 0
