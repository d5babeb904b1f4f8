"""PageRank as an iterative DataFrame superstep (SURVEY §2.12).

Weighted PageRank over the symmetric edge table with uniform
dangling-mass redistribution, float64 throughout (gate: allclose 1e-6 vs
the numpy oracle):

    r_{k+1}(v) = (1-a)/NV + a * (sum_u r_k(u) * w(u,v)/wdeg(u) + D_k/NV)

Scale notes: the one unavoidable shuffle per iteration is the
``groupBy(dst)`` contribution sum. Edges are cached with the
rank-distribution factor ``w/wdeg(src)`` precomputed (reference seed: the
degree normalization A1/A2, ``utilityClusteringFunctions.cpp:115-180``).

Dangling vertices (no rows in a symmetric edge table) receive no
contributions, so they all carry one identical rank — tracked as a driver
scalar instead of DataFrame rows. That removes a join + a collect per
iteration and shrinks the working set to the non-dangling vertices; the
dangling rows are materialized once at the end. D_k = n_dangling * r_d(k)
with r_d(k+1) = (1-a)/NV + a*D_k/NV — exactly the uniform-redistribution
semantics of the numpy oracle.

Lineage is cut with ``localCheckpoint`` every ``cut_every`` iterations so
long runs keep constant-size plans. In fixed-iteration mode (tol=0) the
iterations BETWEEN cuts chain lazily into one Spark job: iteration k+1's
state side arrives already hash-partitioned on vid from iteration k's
contribution groupBy, so the chained job runs exactly one shuffle per
superstep and skips k-1 of every k state materializations (|V|-row block
writes) — same shuffles, less memory traffic, fewer driver round-trips.
Convergence mode (tol>0) needs the per-iteration delta action, so it cuts
every iteration regardless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lineage import cut_lineage, pin_partitioned, release
from ..session import scaled_shuffle_partitions


def pagerank_prepare(edges: DataFrame) -> tuple[DataFrame, DataFrame, int]:
    """One-time static-side preparation: (trans, vertices, n_live).

    ``trans`` is the rank-distribution table (src, dst, factor=w/wdeg(src))
    hash-pre-partitioned on the per-iteration join key; ``vertices`` the
    pinned live-vertex table. At 10^12-edge scale this is the expensive
    step (one full shuffle + sort of the edge table) and it is RANK-
    INDEPENDENT — prepare once, then run any number of pagerank() calls /
    supersteps against it (the reference amortizes the analogous CSR build
    over its whole run, ``driverForGraphClustering.cpp:76-98``).
    """
    deg = edges.groupBy("src").agg(F.sum("weight").alias("wdeg"))
    trans = (
        edges.join(deg, "src")
        .select("src", "dst", (F.col("weight") / F.col("wdeg")).alias("factor"))
        .transform(lambda d: pin_partitioned(d, "src"))
    )
    vertices = deg.select(F.col("src").alias("vid")).transform(
        lambda d: pin_partitioned(d, "vid")
    )
    return trans, vertices, vertices.count()


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    nv: int,
    alpha: float = 0.85,
    tol: float = 1e-10,
    max_iter: int = 100,
    checkpoint_every: int = 5,
    checkpoint=None,
    prepared: tuple[DataFrame, DataFrame, int] | None = None,
    cut_every: int = 1,
) -> tuple[DataFrame, int]:
    """Returns ((vid, rank) DataFrame over all nv vertices, iterations run).

    ``nv`` is the dense vertex-space size (isolated vertices included —
    they are dangling and receive only redistribution mass).
    ``checkpoint`` is an optional CheckpointManager for resumable runs.
    ``prepared`` is an optional ``pagerank_prepare(edges)`` result — pass
    it when running repeated/iterative workloads so the rank-independent
    static sides (one full edge shuffle) are built once, not per call.
    ``cut_every`` (fixed-iteration mode only): chain this many supersteps
    lazily per lineage cut — one Spark job per batch instead of one per
    iteration, bit-identical results (the chained plan runs the identical
    per-iteration shuffles). Durable-checkpoint boundaries force a cut.
    """
    # the transition factor is rank-independent: precomputed, hash-pre-
    # partitioned on the per-iteration join key so EVERY superstep reuses
    # this partitioning and only the rank state shuffles (at 10^12-edge
    # scale, not re-shuffling the static edge side each iteration is the
    # dominant saving); vertices pinned on vid so in fixed-iteration mode
    # the new state is (static vertices) ⋈ (contrib already partitioned by
    # vid from its groupBy) — zero state-side shuffle per superstep
    if prepared is None:
        # size stage granularity to THIS graph for the whole run (incl.
        # the prepare shuffle so the pinned partitioning matches); a
        # caller-supplied `prepared` carries its own partitioning and is
        # authoritative (session.scaled_shuffle_partitions is a no-op on
        # large graphs)
        with scaled_shuffle_partitions(spark, edges.count()):
            return pagerank(
                spark, edges, nv, alpha=alpha, tol=tol, max_iter=max_iter,
                checkpoint_every=checkpoint_every, checkpoint=checkpoint,
                prepared=pagerank_prepare(edges), cut_every=cut_every,
            )
    trans, vertices, n_live = prepared
    n_dangling = nv - n_live

    start_iter = 0
    ranks = None
    r_d = 1.0 / nv
    if checkpoint is not None:
        state = checkpoint.load_latest("pagerank")
        if state is not None:
            ranks = state.dataframes["ranks"]
            start_iter = state.meta["iteration"]
            r_d = state.meta["dangling_rank"]
    if ranks is None:
        ranks = vertices.select("vid", F.lit(1.0 / nv).alias("rank"))
    ranks = ranks.transform(cut_lineage)
    state_ck = ranks  # checkpoint backing the current state (for release)

    iters = start_iter
    for it in range(start_iter, max_iter):
        iters = it + 1
        dmass = n_dangling * r_d
        contrib = (
            trans.join(ranks.select("vid", "rank"), trans.src == ranks.vid)
            .select(F.col("dst").alias("vid"), (F.col("factor") * F.col("rank")).alias("c"))
            .groupBy("vid")
            .agg(F.sum("c").alias("contrib"))
        )
        rank_expr = (
            F.lit((1.0 - alpha) / nv)
            + F.lit(alpha)
            * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dmass / nv))
        ).alias("rank")
        if tol > 0.0:
            # join contributions back onto the CURRENT ranks (same vid set
            # as `vertices`) and carry the old rank through the checkpoint:
            # the convergence delta then reads the already-materialized
            # data — no second shuffle join per iteration
            boundary = True
            new_state = (
                ranks.select("vid", F.col("rank").alias("prev"))
                .join(contrib, "vid", "left")
                .select("vid", rank_expr, "prev")
                .transform(cut_lineage)
            )
        else:
            # fixed-iteration mode: the new rank depends on the old state
            # only through contrib, so join onto the PINNED static vertex
            # table — contrib comes out of its groupBy already hash-
            # partitioned on vid, the pinned side never moves, and the
            # superstep's only state shuffle is the rank distribution join.
            # Between cut boundaries the plan chains lazily: the un-cut
            # state keeps its HashPartitioning(vid), so the next
            # iteration's trans(src)⋈state(vid) join needs NO state-side
            # exchange at all — the batch job is one shuffle per superstep.
            boundary = (
                (it + 1 - start_iter) % max(1, cut_every) == 0
                or it + 1 == max_iter
                or (checkpoint is not None and (it + 1) % checkpoint_every == 0)
            )
            new_state = vertices.join(contrib, "vid", "left").select("vid", rank_expr)
            if boundary:
                new_state = new_state.transform(cut_lineage)
        new_r_d = (1.0 - alpha) / nv + alpha * (dmass / nv)

        if tol > 0.0:
            delta = (
                new_state.agg(F.max(F.abs(F.col("rank") - F.col("prev")))).collect()[0][0]
                or 0.0
            )
            delta = max(delta, abs(new_r_d - r_d))
        else:
            # fixed-iteration mode: no convergence action per superstep —
            # the only actions are the cut_every-boundary materializations,
            # so the loop runs one job per cut_every supersteps
            delta = float("inf")
        # the old state is dead once new_state is materialized and delta
        # collected — free its checkpoint blocks NOW instead of waiting on
        # the GC-driven ContextCleaner (which falls behind and OOMs long
        # iterative runs). Between chained-batch boundaries new_state is a
        # lazy plan still reading state_ck's blocks, so only swap/release
        # at a cut.
        if tol > 0.0 or boundary:
            release(state_ck)
            state_ck = new_state
        ranks = new_state.select("vid", "rank")
        r_d = new_r_d
        if checkpoint is not None and (it + 1) % checkpoint_every == 0:
            checkpoint.save(
                "pagerank",
                meta={"iteration": it + 1, "delta": float(delta),
                      "dangling_rank": float(r_d)},
                dataframes={"ranks": ranks},
            )
        if delta < tol:
            break

    if n_dangling > 0:
        all_v = spark.range(nv).select(F.col("id").alias("vid"))
        ranks = all_v.join(ranks, "vid", "left").select(
            "vid", F.coalesce("rank", F.lit(r_d)).alias("rank")
        )
    return ranks, iters


def personalized_pagerank(
    spark: SparkSession,
    edges: DataFrame,
    nv: int,
    seeds: DataFrame,
    alpha: float = 0.85,
    max_iter: int = 20,
    prepared: tuple[DataFrame, DataFrame, int] | None = None,
    cut_every: int = 1,
    broadcast_seeds: bool = True,
) -> tuple[DataFrame, int]:
    """Personalized PageRank: the reset vector is uniform over ``seeds``
    instead of uniform over all vertices (seed-relative relevance /
    TrustRank over the link graph).

    r₀ = p;  r' = (1−α)·p + α·Mᵀr  with p_v = 1/|S∩live| for live seeds,
    0 otherwise. Defined on the engine's symmetric edge tables, where
    every vertex with any edge has out-edges — so no dangling mass term
    exists: vertices outside the live set receive nothing and hold rank
    exactly 0 (they are returned as 0.0 rows).

    Scale design mirrors ``pagerank``'s fixed-iteration path: the
    personalization column p rides the PINNED static vertex table (one
    broadcast seed join at setup — PPR seed sets are small by
    construction; pass ``broadcast_seeds=False`` otherwise), contrib
    comes out of its groupBy already hash-partitioned on vid, and
    ``cut_every`` chains that many supersteps into one job per lineage
    cut — the per-superstep shuffle is the rank-distribution join alone.
    """
    trans, vertices, _n_live = prepared or pagerank_prepare(edges)
    seed_ids = seeds.select("vid").distinct()
    if broadcast_seeds:
        seed_ids = F.broadcast(seed_ids)
    n_seeds = vertices.join(seed_ids, "vid", "left_semi").count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: no live seed vertices")
    verts_p = (
        vertices.join(seed_ids.withColumn("_s", F.lit(1)), "vid", "left")
        .select(
            "vid",
            F.when(F.col("_s").isNotNull(), F.lit(1.0 / n_seeds))
            .otherwise(F.lit(0.0))
            .alias("p"),
        )
        .transform(cut_lineage)
    )

    ranks = verts_p.select("vid", F.col("p").alias("rank"))
    state_ck = None
    iters = 0
    for it in range(max_iter):
        iters = it + 1
        contrib = (
            trans.join(ranks.select("vid", "rank"), trans.src == ranks.vid)
            .select(F.col("dst").alias("vid"), (F.col("factor") * F.col("rank")).alias("c"))
            .groupBy("vid")
            .agg(F.sum("c").alias("contrib"))
        )
        new_state = verts_p.join(contrib, "vid", "left").select(
            "vid",
            (
                F.lit(1.0 - alpha) * F.col("p")
                + F.lit(alpha) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("rank"),
        )
        boundary = (it + 1) % max(1, cut_every) == 0 or it + 1 == max_iter
        if boundary:
            new_state = new_state.transform(cut_lineage)
            release(state_ck)
            state_ck = new_state
        ranks = new_state
    all_v = spark.range(nv).select(F.col("id").alias("vid"))
    ranks = all_v.join(ranks, "vid", "left").select(
        "vid", F.coalesce("rank", F.lit(0.0)).alias("rank")
    )
    return ranks, iters
