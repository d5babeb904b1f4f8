"""Triangle counting via degree-oriented self-join (SURVEY §2.12, C19).

Reference seed: the per-edge common-neighbor intersection in
``utilitySparsificationFunctions.cpp:165-224`` — there a sorted-list merge
per edge; here the classic two-join formulation over edges oriented from
the (degree, id)-smaller endpoint to the larger. Orientation bounds the
out-degree of every vertex by O(sqrt(m)), which is exactly the skew
control a 10^12-edge graph needs: hub vertices never fan out.

Returns per-vertex counts and the global total (each triangle counted
once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lineage import cut_lineage


def _oriented(edges: DataFrame) -> DataFrame:
    """Orient each undirected edge from lower (nbr_count, id) to higher."""
    deg = edges.filter(F.col("src") != F.col("dst")).groupBy("src").agg(
        F.count("*").alias("d")
    )
    canon = (
        edges.filter(F.col("src") < F.col("dst")).select("src", "dst")
    )
    d1 = deg.select(F.col("src").alias("u"), F.col("d").alias("du"))
    d2 = deg.select(F.col("src").alias("v"), F.col("d").alias("dv"))
    j = canon.join(d1, canon.src == d1.u).join(d2, canon.dst == d2.v)
    keep = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("src") < F.col("dst"))
    )
    return j.select(
        F.when(keep, F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(keep, F.col("dst")).otherwise(F.col("src")).alias("b"),
    )


def triangles(
    spark: SparkSession, edges: DataFrame, nv: int
) -> tuple[DataFrame, int]:
    """Returns ((vid, triangles) DataFrame over all nv vertices, total)."""
    o = _oriented(edges).transform(cut_lineage)
    e1 = o.select(F.col("a").alias("u"), F.col("b").alias("v"))
    e2 = o.select(F.col("a").alias("v"), F.col("b").alias("w"))
    wedges = e1.join(e2, "v").select("u", "v", "w")
    closed = wedges.join(
        o, (wedges.u == o.a) & (wedges.w == o.b)
    ).select("u", "v", "w")
    closed = closed.transform(cut_lineage)

    total = closed.count()
    per_vertex = (
        closed.select(F.col("u").alias("vid"))
        .unionAll(closed.select(F.col("v").alias("vid")))
        .unionAll(closed.select(F.col("w").alias("vid")))
        .groupBy("vid")
        .agg(F.count("*").alias("triangles"))
    )
    all_v = spark.range(nv).select(F.col("id").alias("vid"))
    per_vertex = all_v.join(per_vertex, "vid", "left").select(
        "vid", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )
    return per_vertex, total
