"""Connected components: min-label propagation with pointer jumping.

Reference seed: the BFS ``Visit`` labeling (``buildNextPhase.cpp:570-669``,
SURVEY C20) — inherently sequential, so the engine uses the map-reduce
formulation instead (cf. "Finding connected components in map-reduce in
logarithmic rounds", ICDE 2013, listed in PAPERS.md): each round every
vertex takes the min label over itself and its neighbors, then labels are
path-compressed by one pointer-jump (label <- label of label). The jump
gives the logarithmic round count that plain frontier propagation lacks
(a path graph converges in O(log n) rounds, not O(n)).

Output: (vid, component) with component = min vertex id in the component,
matching the oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lineage import cut_lineage, release
from ..session import scaled_shuffle_partitions


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    nv: int,
    max_iter: int = 50,
    checkpoint=None,
    vertices: DataFrame | None = None,
) -> tuple[DataFrame, int]:
    """Returns ((vid, component) DataFrame, rounds run).

    ``vertices``: optional one-column DataFrame of vertex ids for
    non-dense id spaces (e.g. document ids in the near-dup cluster
    graph); when given it replaces the dense ``range(nv)`` seed and
    ``nv`` is ignored."""
    e = edges.filter(F.col("src") != F.col("dst")).select("src", "dst").transform(cut_lineage)
    # stage granularity clamped to the graph for the round loop (small
    # graphs: full-width stages are scheduling overhead, results are
    # partition-invariant — session.scaled_shuffle_partitions)
    with scaled_shuffle_partitions(spark, e.count()):
        return _cc_impl(spark, e, nv, max_iter, checkpoint, vertices)


def _cc_impl(spark, e, nv, max_iter, checkpoint, vertices):
    if vertices is not None:
        vid0 = F.col(vertices.columns[0]).alias("vid")
        labels = vertices.select(vid0).distinct().select(
            "vid", F.col("vid").alias("comp")
        )
    else:
        labels = spark.range(nv).select(F.col("id").alias("vid"), F.col("id").alias("comp"))

    start_iter = 0
    if checkpoint is not None:
        state = checkpoint.load_latest("components")
        if state is not None:
            labels = state.dataframes["labels"]
            start_iter = state.meta["iteration"]
    labels = labels.transform(cut_lineage)
    state_ck = labels  # checkpoint backing the current state (for release)

    rounds = start_iter
    for it in range(start_iter, max_iter):
        rounds = it + 1
        nbr_min = (
            e.join(labels.select("vid", "comp"), e.dst == labels.vid)
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
            .withColumnRenamed("src", "vid")
        )
        stepped = (
            labels.join(nbr_min, "vid", "left")
            .select(
                "vid",
                F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias("comp"),
                F.col("comp").alias("prev"),
            )
        )
        # pointer jump: comp <- comp(comp); labels is keyed by every vid so
        # the lookup always hits. The previous label rides along so the
        # convergence check reads the materialized state — no second
        # shuffle join per round.
        jump = stepped.select(F.col("vid").alias("jvid"), F.col("comp").alias("jcomp"))
        new_state = (
            stepped.join(jump, stepped.comp == jump.jvid)
            .select("vid", F.col("jcomp").alias("comp"), "prev")
            .transform(cut_lineage)
        )
        changed = new_state.filter(F.col("comp") != F.col("prev")).count()
        release(state_ck)
        state_ck = new_state
        labels = new_state.select("vid", "comp")
        if checkpoint is not None:
            checkpoint.save(
                "components",
                meta={"iteration": it + 1, "changed": int(changed)},
                dataframes={"labels": labels},
            )
        if changed == 0:
            break
    return labels.select("vid", F.col("comp").alias("component")), rounds
