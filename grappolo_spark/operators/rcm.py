"""Reverse Cuthill-McKee ordering as batched BFS supersteps (ref W4/C21).

Reference seed: ``algoReverseCuthillMcKee(Strict)``
(``reverseCuthillMcKee.cpp:40-508``), used by
``driverForMatrixReorderingRcm.cpp`` to produce a bandwidth-reducing
old->new permutation (``pOrder[R[i]] = NV-1-i``, ``:227-230``).

The reference's within-level order is scheduling-dependent — the plain
variant places vertices by atomic fetch-add race (``:151-157``), the
Strict variant feeds an unstable binary heap in racy discovery order and
reads a freed degree array (``:289-331`` frees ``degree`` then uses it at
``:400``) — so, like the coloring operators (C14/C16), the engine keeps
the CONTRACT with clean deterministic total orders:

* isolated vertices enter R first, in vid order (ref ``:84-89``);
* each component's source is its min-(degree, vid) vertex, and components
  are visited in (source degree, source vid) order — the reference's
  next-unvisited-min-degree heap pop (``:178-205``);
* BFS levels are ordered (degree asc, vid asc) — classic RCM;
* the final permutation reverses R.

Scale: instead of one sequential BFS per component, ALL components run
their BFS simultaneously (the frontier carries a component key), and the
final rank is one scalable dense-rank over the composite key
``(source_degree, source_vid, level, degree, vid)`` — no per-component
driver loop, no single-partition window (``graph.assign_dense_ids``).
Rounds = max component diameter, each round one join + one anti-join.

Oracle twin: ``oracle.numpy_oracle.rcm_ordering_np``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import assign_dense_ids
from ..lineage import cut_lineage, release
from .components import connected_components


def rcm_ordering(
    spark: SparkSession,
    edges: DataFrame,
    nv: int,
    max_rounds: int = 10000,
) -> tuple[DataFrame, int]:
    """Returns ((vid, new_id) old->new permutation over all nv, n_components).

    ``edges`` is the symmetric edge table; degree = stored-row count per
    src (the reference's CSR row length, self-loops included).
    """
    deg = (
        edges.groupBy(F.col("src").alias("vid"))
        .agg(F.count("*").alias("degree"))
        .transform(cut_lineage)
    )
    nbr = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .transform(cut_lineage)
    )

    # vertices whose only rows are self-loops have no BFS reachability but
    # are NOT isolated in the reference's sense (degree > 0): they become
    # their own component source at level 0. Truly isolated = no rows.
    all_v = spark.range(nv).select(F.col("id").alias("vid"))
    iso = all_v.join(deg, "vid", "left_anti")
    n_iso = iso.count()

    labels, _ = connected_components(spark, edges, nv)
    comp = (
        labels.withColumnRenamed("component", "comp")
        .join(deg, "vid")
        .select("vid", "comp", "degree")
    )

    sources = (
        comp.groupBy("comp")
        .agg(F.min(F.struct("degree", "vid")).alias("s"))
        .select("comp", F.col("s.degree").alias("src_deg"), F.col("s.vid").alias("src_vid"))
        .transform(cut_lineage)
    )
    n_cc = sources.count()

    # batched BFS: every component's frontier advances in the same round
    frontier = (
        sources.select(F.col("src_vid").alias("vid"), "comp")
        .withColumn("level", F.lit(0))
        .transform(cut_lineage)
    )
    visited = frontier.select("vid", "comp", "level").transform(cut_lineage)
    rounds = 0
    while rounds < max_rounds:
        if frontier.limit(1).count() == 0:
            break
        rounds += 1
        nxt = (
            nbr.join(frontier.select(F.col("vid").alias("src"), "comp"), "src")
            .select(F.col("dst").alias("vid"), "comp")
            .distinct()
            .join(visited.select("vid"), "vid", "left_anti")
            .withColumn("level", F.lit(rounds))
            .transform(cut_lineage)
        )
        old_visited = visited
        visited = visited.unionByName(nxt).transform(cut_lineage)
        release(old_visited)
        release(frontier)
        frontier = nxt

    ranked = (
        visited.join(deg, "vid")
        .join(F.broadcast(sources.select("comp", "src_deg", "src_vid")), "comp")
    )
    ordered = assign_dense_ids(
        ranked.select("src_deg", "src_vid", "level", "degree", "vid"),
        ["src_deg", "src_vid", "level", "degree", "vid"],
        "pos",
        start=n_iso,
    ).select("vid", "pos")
    iso_ordered = assign_dense_ids(iso.select("vid"), ["vid"], "pos", start=0)

    p_order = (
        iso_ordered.unionByName(ordered)
        .select("vid", (F.lit(nv - 1) - F.col("pos")).alias("new_id"))
    )
    return p_order.transform(cut_lineage), int(n_cc)
