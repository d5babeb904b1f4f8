"""Clustering metrics (SURVEY §2.4 A6/A9/A11, §2.11 C18).

* ``modularity`` — Q = e_in/2m − Σ(a_c/2m)² for a given assignment
  (``parallelLouvainMethod.cpp:192-203`` recompute-from-edges form).
* ``cluster_compare`` — precision/recall/F-score between two clusterings
  via a contingency table (``utilityClusterComparisonMetrics.cpp:196-297``);
  the pair-counting algebra avoids the O(n²) vertex-pair join:
      TP   = Σ_cells n_ij(n_ij−1)/2
      TP+FP = Σ_i n_i·(n_i·−1)/2      (pairs together in clustering 1)
      TP+FN = Σ_j n_·j(n_·j−1)/2      (pairs together in clustering 2)
* ``gini_coefficient`` — inequality of community sizes
  (``utilityClusterComparisonMetrics.cpp:309-336``): sort sizes ascending,
  G = Σ(2i−n−1)·x_i / (n·Σx). The window cumsum runs over the
  |communities|-row table, not |V|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def modularity(edges: DataFrame, c: DataFrame) -> float:
    """Q for assignment ``c`` (vid, comm); comm < 0 rows excluded."""
    deg = edges.groupBy(F.col("src").alias("vid")).agg(F.sum("weight").alias("degree"))
    two_m = edges.agg(F.sum("weight")).collect()[0][0] or 0.0
    if two_m == 0:
        return 0.0
    cpos = c.filter(F.col("comm") >= 0)
    cs = cpos.select(F.col("vid").alias("src"), F.col("comm").alias("c_src"))
    cd = cpos.select(F.col("vid").alias("dst"), F.col("comm").alias("c_dst"))
    e_in = (
        edges.join(cs, "src").join(cd, "dst")
        .filter(F.col("c_src") == F.col("c_dst"))
        .agg(F.sum("weight"))
        .collect()[0][0]
        or 0.0
    )
    a2 = (
        cpos.join(deg, "vid", "left")
        .groupBy("comm")
        .agg(F.sum(F.coalesce("degree", F.lit(0.0))).alias("a"))
        .agg(F.sum(F.col("a") * F.col("a")))
        .collect()[0][0]
        or 0.0
    )
    return e_in / two_m - a2 / (two_m * two_m)


def cluster_compare(c1: DataFrame, c2: DataFrame) -> dict:
    """Precision/recall/F between (vid, comm) assignments c1 (output) and
    c2 (ground truth), pair-counting semantics of the reference C18."""
    joined = (
        c1.select("vid", F.col("comm").alias("a"))
        .join(c2.select("vid", F.col("comm").alias("b")), "vid")
    )
    cells = joined.groupBy("a", "b").count().cache()
    pairs = F.sum(F.col("count") * (F.col("count") - 1) / 2)
    tp = cells.agg(pairs).collect()[0][0] or 0.0
    tp_fp = (
        cells.groupBy("a").agg(F.sum("count").alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2)).collect()[0][0] or 0.0
    )
    tp_fn = (
        cells.groupBy("b").agg(F.sum("count").alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2)).collect()[0][0] or 0.0
    )
    cells.unpersist()
    precision = tp / tp_fp if tp_fp else 0.0
    recall = tp / tp_fn if tp_fn else 0.0
    f = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"precision": precision, "recall": recall, "fscore": f,
            "tp": tp, "tp_fp": tp_fp, "tp_fn": tp_fn}


def community_sizes(c: DataFrame) -> DataFrame:
    return c.filter(F.col("comm") >= 0).groupBy("comm").agg(
        F.count("*").alias("size")
    )


def gini_coefficient(c: DataFrame) -> float:
    """Gini over community sizes (ref A9). Runs on the community-level
    table; the single-partition window is over |communities| rows only."""
    sizes = community_sizes(c)
    n = sizes.count()
    if n == 0:
        return 0.0
    w = Window.orderBy("size", "comm")
    row = (
        sizes.withColumn("i", F.row_number().over(w))
        .agg(
            F.sum((F.lit(2.0) * F.col("i") - n - 1) * F.col("size")).alias("num"),
            F.sum("size").alias("tot"),
        )
        .collect()[0]
    )
    return (row["num"] / (n * row["tot"])) if row["tot"] else 0.0
