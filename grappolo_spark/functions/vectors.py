"""Similarity search over an embedding column (vec_id, embedding:array<float>).

* ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set against the full vector table. The dot product is a sequential
  ``F.aggregate`` fold over ``F.zip_with`` — left-to-right like DuckDB's
  ``list_dot_product`` on DOUBLE[], so Spark and the SQL oracle produce
  bit-identical doubles (both sides cast float32 → double first).
* ``lsh_ann_topk`` — the scale path: sign-random-projection LSH. Hyperplane
  signs are derived from md5 bits (deterministic, partition-invariant);
  vectors sharing a bucket are candidates; exact cosine re-ranks inside the
  bucket. Probing all single-bit-flip neighbor buckets bounds the recall
  loss. The candidate join is keyed on the bucket id — bounded fan-out,
  no all-pairs join, which is what survives 10^10 vectors.
* ``ivf_ann_topk`` — the other scale path: IVF cell partitioning. Every
  vector joins one inverted list (nearest of n_cells coarse centroids);
  a query scans only its n_probe nearest lists. n_probe == n_cells
  degenerates to the exact answer — the recall gate.
* ``near_dup_pairs`` — dedup-by-embedding: LSH buckets + Hamming≤1
  multiprobe candidates, exact-cosine verify at a threshold.
* ``label_centroids`` — per-label mean vector via posexplode (one shuffle
  keyed (label, dim)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    """Sequential left-to-right dot product fold (order-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_norm(vecs: DataFrame, emb_col: str = "embedding") -> DataFrame:
    emb = _as_double(F.col(emb_col))
    return vecs.select(
        "*", F.sqrt(_dot(emb, emb)).alias("_norm")
    )


def cosine_topk(
    vecs: DataFrame,
    n_queries: int = 50,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` ids.

    Returns (query_id, neighbor_id, rank, cosine). Deterministic ranking:
    (cosine desc, neighbor_id asc).
    """
    base = with_norm(vecs, emb_col).select(
        F.col(id_col).alias("nid"),
        _as_double(F.col(emb_col)).alias("nemb"),
        F.col("_norm").alias("nnorm"),
    )
    queries = (
        base.filter(F.col("nid") < n_queries)
        .select(
            F.col("nid").alias("qid"),
            F.col("nemb").alias("qemb"),
            F.col("nnorm").alias("qnorm"),
        )
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("nid") != F.col("qid"))
        .select(
            "qid",
            "nid",
            (_dot(F.col("qemb"), F.col("nemb")) / (F.col("qnorm") * F.col("nnorm"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.col("rank").cast("long").alias("rank"),
            "cosine",
        )
    )


def _plane_sign(emb_col, plane: int, dim: int):
    """±1 pseudo-random hyperplane component from md5 bits: component i of
    plane p = +1 if bit (i%60) of md5_long('p:i') is even parity... —
    concretely: sign = 1 if hex nibble of md5('p:i') first char >= 8."""
    # per-component deterministic sign: first hex char of md5("p:i")
    signs = [
        1.0
        if int(__import__("hashlib").md5(f"{plane}:{i}".encode()).hexdigest()[0], 16) >= 8
        else -1.0
        for i in range(dim)
    ]
    arr = F.array(*[F.lit(s) for s in signs])
    return _dot(emb_col, arr)


def lsh_ann_topk(
    vecs: DataFrame,
    n_queries: int = 50,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k via sign-random-projection buckets + 1-bit probing.

    Plane signs are a pure function of (plane, component) — computed on the
    driver once (n_planes × dim literals), evaluated JVM-side per row.
    """
    base = with_norm(vecs, emb_col).select(
        F.col(id_col).alias("nid"),
        _as_double(F.col(emb_col)).alias("nemb"),
        F.col("_norm").alias("nnorm"),
    )
    sig_bits = [
        F.when(_plane_sign(F.col("nemb"), p, dim) >= 0, F.lit(1)).otherwise(F.lit(0))
        for p in range(n_planes)
    ]
    bucket = sig_bits[0] * 0
    for i, b in enumerate(sig_bits):
        bucket = bucket + F.shiftleft(b.cast("long"), n_planes - 1 - i)
    hashed = base.withColumn("bucket", bucket).localCheckpoint(eager=True)

    queries = hashed.filter(F.col("nid") < n_queries).select(
        F.col("nid").alias("qid"),
        F.col("nemb").alias("qemb"),
        F.col("nnorm").alias("qnorm"),
        F.col("bucket").alias("qbucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("qbucket"),
            *[
                F.col("qbucket").bitwiseXOR(F.lit(1 << i)).cast("long")
                for i in range(n_planes)
            ],
        )
        queries = queries.select(
            "qid", "qemb", "qnorm", F.explode(probes).alias("bucket")
        )
    else:
        queries = queries.withColumnRenamed("qbucket", "bucket")

    scored = (
        hashed.join(F.broadcast(queries), "bucket")
        .filter(F.col("nid") != F.col("qid"))
        .select(
            "qid",
            "nid",
            (_dot(F.col("qemb"), F.col("nemb")) / (F.col("qnorm") * F.col("nnorm"))).alias(
                "cosine"
            ),
        )
        .dropDuplicates(["qid", "nid"])
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.col("rank").cast("long").alias("rank"),
            "cosine",
        )
    )


def near_dup_pairs(
    vecs: DataFrame,
    threshold: float = 0.99,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup-by-embedding mode).

    Scale path: sign-random-projection buckets (same md5-derived planes as
    ``lsh_ann_topk``); a pair is a candidate iff the two bucket signatures
    are within Hamming distance 1 (own bucket + every 1-bit-flip probe).
    Candidates verify with the exact cosine and survive at ``>= threshold``.
    The candidate join is keyed on the bucket id — per-vector fan-out is
    bounded by (n_planes+1) x bucket occupancy, never all-pairs, which is
    what survives 10^10 vectors. Returns (id_a, id_b, cosine), id_a < id_b.
    """
    base = with_norm(vecs, emb_col).select(
        F.col(id_col).alias("nid"),
        _as_double(F.col(emb_col)).alias("nemb"),
        F.col("_norm").alias("nnorm"),
    )
    sig_bits = [
        F.when(_plane_sign(F.col("nemb"), p, dim) >= 0, F.lit(1)).otherwise(F.lit(0))
        for p in range(n_planes)
    ]
    bucket = sig_bits[0] * 0
    for i, b in enumerate(sig_bits):
        bucket = bucket + F.shiftleft(b.cast("long"), n_planes - 1 - i)
    hashed = base.withColumn("bucket", bucket).localCheckpoint(eager=True)

    probes = hashed.select(
        F.col("nid").alias("aid"),
        F.col("nemb").alias("aemb"),
        F.col("nnorm").alias("anorm"),
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << i)).cast("long")
                    for i in range(n_planes)
                ],
            )
        ).alias("bucket"),
    )
    cand = (
        probes.join(hashed, "bucket")
        .filter(F.col("aid") < F.col("nid"))
        .select(
            "aid",
            "nid",
            (_dot(F.col("aemb"), F.col("nemb")) / (F.col("anorm") * F.col("nnorm"))).alias(
                "cosine"
            ),
        )
        .dropDuplicates(["aid", "nid"])
    )
    return cand.filter(F.col("cosine") >= threshold).select(
        F.col("aid").alias("id_a"), F.col("nid").alias("id_b"), "cosine"
    )


def ivf_ann_topk(
    vecs: DataFrame,
    n_queries: int = 50,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) cell partitioning.

    The coarse quantizer is the ``n_cells`` vectors with the smallest ids
    (centroid *training* — k-means over a sample — is an offline concern in
    real IVF deployments; the index structure, which is what scales, is
    identical). Every vector joins exactly one inverted list: the centroid
    with the highest cosine (tie → lowest cell id). A query scores only the
    ``n_probe`` nearest cells' lists and re-ranks candidates by exact
    cosine. The candidate join is keyed on the cell id — per-query work is
    n_probe/n_cells of the corpus in expectation, never a full scan, and
    the inverted lists shard by cell across executors: the 10^10-vector
    layout. With ``n_probe == n_cells`` the result equals ``cosine_topk``
    exactly (the recall gate in tests/test_vectors.py).

    Returns (query_id, neighbor_id, rank, cosine); ranking is
    (cosine desc, neighbor_id asc) like the exact path.
    """
    base = with_norm(vecs, emb_col).select(
        F.col(id_col).alias("nid"),
        _as_double(F.col(emb_col)).alias("nemb"),
        F.col("_norm").alias("nnorm"),
    )
    cents = base.filter(F.col("nid") < n_cells).select(
        F.col("nid").alias("cid"),
        F.col("nemb").alias("cemb"),
        F.col("nnorm").alias("cnorm"),
    )
    scored_cells = base.crossJoin(F.broadcast(cents)).select(
        "nid",
        "nemb",
        "nnorm",
        "cid",
        (_dot(F.col("nemb"), F.col("cemb")) / (F.col("nnorm") * F.col("cnorm"))).alias(
            "ccos"
        ),
    )
    wc = Window.partitionBy("nid").orderBy(F.desc("ccos"), F.asc("cid"))
    ranked = scored_cells.withColumn("crank", F.row_number().over(wc))
    inverted = (
        ranked.filter(F.col("crank") == 1)
        .select("nid", "nemb", "nnorm", "cid")
        .localCheckpoint(eager=True)
    )
    probes = (
        ranked.filter((F.col("nid") < n_queries) & (F.col("crank") <= n_probe))
        .select(
            F.col("nid").alias("qid"),
            F.col("nemb").alias("qemb"),
            F.col("nnorm").alias("qnorm"),
            "cid",
        )
    )
    scored = (
        inverted.join(F.broadcast(probes), "cid")
        .filter(F.col("nid") != F.col("qid"))
        .select(
            "qid",
            "nid",
            (_dot(F.col("qemb"), F.col("nemb")) / (F.col("qnorm") * F.col("nnorm"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.col("rank").cast("long").alias("rank"),
            "cosine",
        )
    )


def label_centroids(vecs: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """(label, dim, centroid) — mean embedding component per label."""
    ex = vecs.select(
        "label", F.posexplode(_as_double(F.col(emb_col))).alias("dim", "v")
    )
    return (
        ex.groupBy("label", "dim")
        .agg(F.avg("v").alias("centroid"))
        .select(F.col("label").cast("long").alias("label"), F.col("dim").cast("long").alias("dim"), "centroid")
    )
