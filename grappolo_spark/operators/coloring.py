"""Distance-1 vertex coloring as deterministic DataFrame supersteps.

Reference seed: ``algoDistanceOneVertexColoringOpt``
(``coloringDistanceOne.cpp:50-233``) — speculative first-fit + conflict
re-queue, where conflict losers are picked by a random value. That scheme
is scheduling-dependent; the engine instead runs the classic
Jones–Plassmann priority rule (public algorithm; the reference's own
conflict resolution, ``coloringUtils.cpp:70-97``, is the same "random
value decides" idea applied after the fact):

* priority(v) = (xxhash64(v, seed), v) — partition-invariant, total order;
* each round, every uncolored vertex that is a local priority maximum
  among its UNCOLORED neighbours takes the smallest color absent from its
  colored neighbourhood (first-fit, like the reference's ``:137-150``);
* expected O(log NV) rounds; result is deterministic for a given seed —
  the property the reference gets only per-run, we get always.

The self-verification step of the reference (``:206-226``) is
``validate_coloring`` here (also used in tests).

Scale: each round is one join (uncolored frontier ⋈ edges ⋈ state) + two
aggregations, all hash-partitioned on vid; the frontier shrinks
geometrically. The min-free-color search builds ``sequence(0, |used|)``
per vertex — bounded by the colored-neighbour count, and only for
local-max vertices, so hub rows stay bounded by their degree exactly like
the reference's per-vertex ``Mark`` array (``coloringDistanceOne.cpp:110``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lineage import cut_lineage


def _prio(col):
    """Deterministic priority; LONG cast per the xxh64 oracle contract."""
    return F.xxhash64(col.cast("long"))


def distance1_coloring(
    spark: SparkSession,
    edges: DataFrame,
    nv: int,
    max_rounds: int = 200,
) -> tuple[DataFrame, int, int]:
    """Color all nv vertices; returns ((vid, color), num_colors, rounds).

    Vertices with no incident edges get color 0.
    """
    nbr = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .transform(cut_lineage)
    )
    verts = nbr.select(F.col("src").alias("vid")).distinct()
    state = verts.select(
        "vid", F.lit(None).cast("int").alias("color"), _prio(F.col("vid")).alias("prio")
    ).transform(cut_lineage)

    rounds = 0
    while True:
        remaining = state.filter(F.col("color").isNull()).count()
        if remaining == 0 or rounds >= max_rounds:
            break
        rounds += 1

        unc = state.filter(F.col("color").isNull()).select(
            F.col("vid").alias("src"), F.col("prio").alias("p_src")
        )
        nb = (
            nbr.join(unc, "src")
            .join(
                state.select(
                    F.col("vid").alias("dst"),
                    F.col("color").alias("nb_color"),
                    F.col("prio").alias("p_dst"),
                ),
                "dst",
            )
        )
        per_v = nb.groupBy("src", "p_src").agg(
            F.max(
                F.when(
                    F.col("nb_color").isNull(),
                    F.struct(F.col("p_dst").alias("p"), F.col("dst").alias("v")),
                )
            ).alias("max_unc"),
            F.collect_set(F.col("nb_color")).alias("used"),
        )
        winners = per_v.filter(
            F.col("max_unc").isNull()
            | (F.struct(F.col("p_src").alias("p"), F.col("src").alias("v"))
               > F.col("max_unc"))
        )
        # smallest free color: min free <= |used|, so sequence(0,|used|) covers it
        assigned = winners.select(
            F.col("src").alias("vid"),
            F.element_at(
                F.array_except(
                    F.sequence(F.lit(0), F.size("used")), F.col("used")
                ),
                1,
            ).alias("new_color"),
        )
        state = (
            state.join(assigned, "vid", "left")
            .select(
                "vid",
                F.coalesce("color", "new_color").alias("color"),
                "prio",
            )
            .transform(cut_lineage)
        )

    all_v = spark.range(nv).select(F.col("id").alias("vid"))
    colors = all_v.join(state.select("vid", "color"), "vid", "left").select(
        "vid", F.coalesce("color", F.lit(0)).alias("color")
    )
    n_colors = colors.agg(F.max("color")).collect()[0][0] + 1
    return colors.transform(cut_lineage), int(n_colors), rounds


def validate_coloring(edges: DataFrame, colors: DataFrame) -> int:
    """Conflict count (must be 0) — ref self-verification
    ``coloringDistanceOne.cpp:206-226``."""
    cs = colors.select(F.col("vid").alias("src"), F.col("color").alias("c_src"))
    cd = colors.select(F.col("vid").alias("dst"), F.col("color").alias("c_dst"))
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .join(cs, "src")
        .join(cd, "dst")
        .filter(F.col("c_src") == F.col("c_dst"))
        .count()
    )


def color_stats(colors: DataFrame) -> DataFrame:
    """Color-class histogram + variance (ref A12, ``coloringUtils.cpp:14-42``,
    ``equitableColoringDistanceOne.cpp:48-88``)."""
    sizes = colors.groupBy("color").agg(F.count("*").alias("class_size"))
    return sizes.agg(
        F.count("*").alias("n_colors"),
        F.max("class_size").alias("max_class"),
        F.avg("class_size").alias("avg_class"),
        F.var_pop("class_size").alias("var_class"),
    )
