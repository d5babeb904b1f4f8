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


def test_near_dup_no_pairs_on_raw_corpus(vecs):
    # the synthetic embeddings are mutually far apart (max pair cosine
    # ~0.5): without planted twins the result is empty — no false positives
    assert VX.near_dup_pairs(vecs, threshold=0.99).count() == 0
