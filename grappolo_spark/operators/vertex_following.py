"""Vertex following preprocessing (ref P1/C17).

``vertexFollowing`` (``Utility/vertexFollowing.cpp:46-86``): single pass —
isolated vertices get C=-1; a degree-1 vertex collapses onto its sole
neighbour iff that neighbour has degree > 1 OR the vertex id is larger
(so a 2-vertex pair collapses the higher id onto the lower). No
transitive chasing: chains collapse one layer per application, exactly
like the reference's one parallel sweep.

``build_new_graph_vf`` (``buildNewGraphVF``, ``vertexFollowing.cpp:93+``)
coarsens WITHOUT self-loops (intra-community weight dropped).

Degree = number of adjacency rows (self-loops count one row), matching
the CSR pointer arithmetic ``vtxPtr[i+1]-vtxPtr[i]``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .louvain import coarsen, renumber


def vertex_following(
    spark: SparkSession, edges: DataFrame, nv: int
) -> tuple[DataFrame, int]:
    """Returns ((vid, comm) with -1 for isolated, collapsed degree-1), and
    the number of vertices marked for removal (ref return value)."""
    degs = edges.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("n"), F.max("dst").alias("only_dst")
    )
    tail_deg = degs.select(
        F.col("vid").alias("only_dst"), F.col("n").alias("tail_n")
    )
    all_v = spark.range(nv).select(F.col("id").alias("vid"))
    c = (
        all_v.join(degs, "vid", "left")
        .join(tail_deg, "only_dst", "left")
        .select(
            "vid",
            F.when(F.col("n").isNull(), F.lit(-1))
            .when(
                (F.col("n") == 1)
                & (F.col("only_dst") != F.col("vid"))
                & ((F.col("tail_n") > 1) | (F.col("vid") > F.col("only_dst"))),
                F.col("only_dst"),
            )
            .otherwise(F.col("vid"))
            .alias("comm"),
        )
    )
    moved = c.filter(
        (F.col("comm") != F.col("vid")) | (F.col("comm") == -1)
    ).count()
    return c, moved


def build_new_graph_vf(edges: DataFrame, c: DataFrame) -> DataFrame:
    """Coarsen under the VF assignment, dropping self-loops (ref
    ``buildNewGraphVF`` — 'This will not add any self-loops')."""
    return coarsen(edges, c).filter(F.col("src") != F.col("dst"))


def vertex_following_pipeline(
    spark: SparkSession, edges: DataFrame, nv: int
) -> tuple[DataFrame, DataFrame, int]:
    """VF → contiguous renumber → VF-coarsened graph (driver steps
    ``driverForGraphClustering.cpp:111-131``). Returns (mapping with
    renumbered comms, new_edges, new_nv)."""
    c, _ = vertex_following(spark, edges, nv)
    c2, n_clusters = renumber(c)
    new_edges = build_new_graph_vf(edges, c2)
    return c2, new_edges, n_clusters
