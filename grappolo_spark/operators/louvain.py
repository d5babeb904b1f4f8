"""Multi-phase Louvain as deterministic DataFrame supersteps (SURVEY §2.11).

Re-expresses the reference's default dispatch path — ``runMultiPhaseBasic``
(``runMultiPhaseBasic.cpp:66-204``) over ``parallelLouvianMethod_SFP``
(``vectorizedLouvainMethod.cpp:48-371``) — as Spark jobs:

* one local-move sweep  = J1 (edges ⋈ C on dst) → A3 (groupBy(src, comm)
  weight sum) → J2 (⋈ commInfo) → A5 (gain argmax, min-cid tie-break,
  singleton swap protection) — all inside whole-stage codegen, zero Python
  in the hot path;
* Jacobi snapshot semantics (``parallelLouvainMethod.cpp:146-236``) are the
  *default* with immutable DataFrames: every sweep reads the iteration-start
  ``C``/``commInfo`` and moves are applied after the sweep;
* gain formula + tie-breaks copied from ``utilityClusteringFunctions.cpp:
  729-762`` (gain ``2*(eiy-eix) - 2*deg_i*(ay-ax)/2m``, ties to the smaller
  community id, singleton-swap protection ``:757-759``);
* phase returns the assignment the final sweep READ and the modularity of
  the iteration before the last (``vectorizedLouvainMethod.cpp:305-347``);
* renumbering = min-vid dense rank ≡ the reference's serial first-occurrence
  renumber (``buildNextPhase.cpp:48-79``) because first-occurrence order is
  exactly the order of each community's minimum vertex id;
* coarsening = edges ⋈ C(src) ⋈ C(dst) → groupBy — one shuffle
  (``buildNextPhase.cpp:145-236``; intra weight lands doubled on the
  self-loop pair automatically because every symmetric row is accumulated);
* caps 25 inner iterations / 200 phases / 100k total iterations
  (``parallelLouvainMethod.cpp:217``, ``runMultiPhaseBasic.cpp:128``).

Exactness: community info is recomputed fresh from ``C`` each iteration
(instead of the reference's atomic delta accumulation, ``cUpdate``) — with
integer-valued edge weights both are exact in float64, and the gain
expression is written with the reference's association order so Spark and
the numpy oracle produce bit-identical doubles.

Scale: the two shuffles per sweep (candidate aggregation, commInfo
recompute) are the per-superstep cost — proportional to |E| like the
reference's edge visits. ``commInfo`` shrinks with every phase and is
broadcast by AQE on coarse graphs. Lineage is cut every iteration via
``localCheckpoint``; with a CheckpointManager the sweep state also lands in
Parquet + manifest so runs resume mid-phase.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def comm_info(c: DataFrame, deg: DataFrame) -> DataFrame:
    """(comm, c_size, c_degree) from an assignment — ref Comm{size,degree}
    (``defs.h:85-89``); vertices with comm < 0 (isolated) excluded."""
    return (
        c.filter(F.col("comm") >= 0)
        .join(deg, "vid", "left")
        .groupBy("comm")
        .agg(
            F.count("*").alias("c_size"),
            F.sum(F.coalesce("degree", F.lit(0.0))).alias("c_degree"),
        )
    )


def renumber(c: DataFrame) -> tuple[DataFrame, int]:
    """Dense contiguous renumber, first-occurrence order (ref W1).

    ``buildNextPhase.cpp:48-79`` assigns the next integer to each community
    in order of its first (= minimum) vertex id; min-vid dense_rank is the
    distributed equivalent. -1 (isolated) rows pass through unchanged.
    """
    pos = c.filter(F.col("comm") >= 0)
    firsts = pos.groupBy("comm").agg(F.min("vid").alias("first_vid"))
    w = Window.orderBy("first_vid")
    # the mapping table is |communities| rows — tiny relative to |V|; the
    # global window runs on it, not on the vertex table, then broadcasts
    mapping = firsts.select(
        "comm", (F.dense_rank().over(w) - 1).alias("new_comm")
    )
    num_clusters = mapping.count()
    out = (
        c.join(F.broadcast(mapping), "comm", "left")
        .select("vid", F.coalesce("new_comm", F.col("comm")).alias("comm"))
    )
    return out, num_clusters


def coarsen(edges: DataFrame, c: DataFrame) -> DataFrame:
    """Community-aggregation coarsening (ref C11, ``buildNextPhase.cpp:145-236``).

    Accumulates every symmetric row into (C[src], C[dst]): inter-community
    weight appears once per direction, intra weight lands doubled on the
    (c, c) self-loop — exactly the reference's convention.
    """
    cs = c.select(F.col("vid").alias("src"), F.col("comm").alias("c_src"))
    cd = c.select(F.col("vid").alias("dst"), F.col("comm").alias("c_dst"))
    return (
        edges.join(cs, "src")
        .join(cd, "dst")
        .groupBy("c_src", "c_dst")
        .agg(F.sum("weight").alias("weight"))
        .select(F.col("c_src").alias("src"), F.col("c_dst").alias("dst"), "weight")
    )


def _gain(eiy, eix, deg_i, ay, ax, const):
    """Reference gain, association order preserved for bit-exactness:
    ``2*(eiy-eix) - 2*deg_i*(ay-ax)*const`` (``utilityClusteringFunctions.cpp:746``).
    """
    return (F.lit(2.0) * (eiy - eix)) - (F.lit(2.0) * deg_i * (ay - ax) * const)


# ---------------------------------------------------------------------------
# phase
# ---------------------------------------------------------------------------

@dataclass
class PhaseResult:
    c: DataFrame            # (vid, comm) — assignment the final sweep read
    modularity: float       # modularity of the iteration before the last
    num_iters: int
    change: bool
    trajectory: list = field(default_factory=list)


def louvain_init(edges: DataFrame, deg: DataFrame, const: float) -> DataFrame:
    """Greedy init from singletons (``initCommAssOptVec_SFP`` semantics,
    called at ``vectorizedLouvainMethod.cpp:194``): each vertex targets its
    best-gain neighbour treated as a singleton community; swap protection
    (all sizes are 1) only permits moves to a SMALLER vertex id.
    Returns (vid, comm) for every vertex that has at least one edge row.
    """
    dd = deg.select(F.col("vid").alias("dst"), F.col("degree").alias("deg_dst"))
    cand = (
        edges.filter(F.col("src") != F.col("dst"))
        .join(dd, "dst")
        .join(deg.select(F.col("vid").alias("src"), F.col("degree").alias("deg_src")), "src")
        .select(
            "src",
            "dst",
            _gain(
                F.col("weight"), F.lit(0.0), F.col("deg_src"), F.col("deg_dst"),
                F.lit(0.0), F.lit(const),
            ).alias("gain"),
        )
    )
    best = (
        cand.filter(F.col("gain") > 0)
        .groupBy("src")
        .agg(F.max_by("dst", F.struct(F.col("gain"), -F.col("dst"))).alias("best"))
    )
    verts = edges.select(F.col("src").alias("vid")).distinct()
    return (
        verts.join(best.withColumnRenamed("src", "vid"), "vid", "left")
        .select(
            "vid",
            F.when(
                F.col("best").isNotNull() & (F.col("best") < F.col("vid")),
                F.col("best"),
            )
            .otherwise(F.col("vid"))
            .alias("comm"),
        )
    )


def louvain_phase(
    spark: SparkSession,
    edges: DataFrame,
    nv: int,
    lower: float = -1.0,
    max_inner: int = 25,
    checkpoint=None,
    phase_tag: str = "phase",
) -> PhaseResult:
    """One Louvain phase with exact reference SFP-path semantics."""
    edges = edges.localCheckpoint(eager=True)
    deg = (
        edges.groupBy(F.col("src").alias("vid"))
        .agg(F.sum("weight").alias("degree"))
        .localCheckpoint(eager=True)
    )
    two_m = deg.agg(F.sum("degree")).collect()[0][0] or 0.0
    const = 1.0 / two_m if two_m > 0 else 0.0
    # self-loop weight per vertex is static across iterations
    selfw = edges.filter(F.col("src") == F.col("dst")).select(
        F.col("src").alias("vid"), F.col("weight").alias("self_w")
    ).localCheckpoint(eager=True)

    start_iter = 0
    curr = None
    if checkpoint is not None:
        state = checkpoint.load_latest(phase_tag)
        if state is not None:
            curr = state.dataframes["c"]
            start_iter = state.meta["iteration"]
    if curr is None:
        curr = louvain_init(edges, deg, const)
    curr = curr.localCheckpoint(eager=True)

    prev_mod = -1.0
    change = False
    num_iters = start_iter
    trajectory = []

    while True:
        num_iters += 1
        info = comm_info(curr, deg).cache()

        # J1+A3: weight from each vertex to each neighbouring community
        # (self-loops included — they land in the own-community bucket)
        cdst = curr.select(F.col("vid").alias("dst"), F.col("comm").alias("comm_dst"))
        cand = (
            edges.join(cdst, "dst")
            .groupBy("src", "comm_dst")
            .agg(F.sum("weight").alias("eiy"))
            .cache()
        )

        # own-community weight (counter[sc], self-loop included) per vertex
        own = (
            curr.withColumnRenamed("comm", "sc")
            .join(
                cand.select(
                    F.col("src").alias("vid"),
                    F.col("comm_dst").alias("sc"),
                    F.col("eiy").alias("own_w"),
                ),
                ["vid", "sc"],
                "left",
            )
            .select("vid", "sc", F.coalesce("own_w", F.lit(0.0)).alias("own_w"))
        )

        # modularity from the iteration-start snapshot (ref :281-295);
        # both global sums in ONE job via crossJoin of 1-row aggregates
        mrow = (
            own.agg(F.sum("own_w").alias("e_xx"))
            .crossJoin(info.agg(F.sum(F.col("c_degree") * F.col("c_degree")).alias("a2_x")))
            .collect()[0]
        )
        e_xx = mrow["e_xx"] or 0.0
        a2_x = mrow["a2_x"] or 0.0
        curr_mod = e_xx * const - a2_x * const * const
        trajectory.append(curr_mod)

        # J2+A5: gain per candidate community, argmax with min-cid ties
        base = (
            own.join(deg, "vid")
            .join(
                info.select(F.col("comm").alias("sc"), F.col("c_degree").alias("ax_full"),
                            F.col("c_size").alias("size_sc")),
                "sc",
            )
            .join(selfw, "vid", "left")
            .select(
                "vid", "sc", "degree", "size_sc",
                (F.col("own_w") - F.coalesce("self_w", F.lit(0.0))).alias("eix"),
                (F.col("ax_full") - F.col("degree")).alias("ax"),
            )
        )
        scored = (
            cand.withColumnRenamed("src", "vid")
            .join(base, "vid")
            .filter(F.col("comm_dst") != F.col("sc"))
            .join(
                info.select(F.col("comm").alias("comm_dst"),
                            F.col("c_degree").alias("ay"),
                            F.col("c_size").alias("size_y")),
                "comm_dst",
            )
            .select(
                "vid", "sc", "comm_dst", "size_sc", "size_y",
                _gain(F.col("eiy"), F.col("eix"), F.col("degree"),
                      F.col("ay"), F.col("ax"), F.lit(const)).alias("gain"),
            )
        )
        best = (
            scored.filter(F.col("gain") > 0)
            .groupBy("vid")
            .agg(
                F.max_by(
                    F.struct("comm_dst", "size_y"),
                    F.struct(F.col("gain"), -F.col("comm_dst")),
                ).alias("b")
            )
            .select("vid", F.col("b.comm_dst").alias("cand_comm"),
                    F.col("b.size_y").alias("cand_size"))
        )
        target = (
            base.join(best, "vid", "left")
            .select(
                "vid",
                F.when(F.col("cand_comm").isNull(), F.col("sc"))
                .when(  # singleton swap protection (ref :757-759)
                    (F.col("cand_size") == 1)
                    & (F.col("size_sc") == 1)
                    & (F.col("cand_comm") > F.col("sc")),
                    F.col("sc"),
                )
                .otherwise(F.col("cand_comm"))
                .alias("comm"),
                F.col("sc"),
            )
            .localCheckpoint(eager=True)
        )

        moved = target.filter(F.col("comm") != F.col("sc")).count()
        info.unpersist()
        cand.unpersist()
        if moved > 0:
            change = True
        if moved == 0 or num_iters >= max_inner:
            # phase returns the assignment the final sweep READ
            break

        prev_mod = max(curr_mod, lower)
        new_curr = target.select("vid", "comm").localCheckpoint(eager=True)
        curr.unpersist()
        curr = new_curr
        if checkpoint is not None:
            checkpoint.save(
                phase_tag,
                meta={"iteration": num_iters, "modularity": float(curr_mod),
                      "moved": int(moved)},
                dataframes={"c": curr},
            )

    # isolated vertices (no edge rows at all): the sweep writes -1 for them
    # (guard ``parallelLouvainMethod.cpp:156-167``), so they are -1 whenever
    # the returned assignment is a sweep target (num_iters >= 2); if the
    # phase stopped on its very first sweep the returned assignment is the
    # init one, where isolated vertices still carry their own id.
    all_v = spark.range(nv).select(F.col("id").alias("vid"))
    iso_fill = F.lit(-1) if num_iters >= 2 else F.col("vid")
    c_full = (
        all_v.join(curr, "vid", "left")
        .select("vid", F.coalesce("comm", iso_fill).alias("comm"))
    )
    return PhaseResult(c_full, prev_mod, num_iters, change, trajectory)


# ---------------------------------------------------------------------------
# multi-phase driver
# ---------------------------------------------------------------------------

@dataclass
class LouvainResult:
    c: DataFrame            # (vid, comm) over the ORIGINAL vertex space
    modularity: float
    phases: int
    total_iters: int
    num_clusters: int
    trajectory: list = field(default_factory=list)


def louvain(
    spark: SparkSession,
    edges: DataFrame,
    nv: int,
    threshold: float = 1e-6,
    max_phases: int = 200,
    max_total_iters: int = 100000,
    max_inner: int = 25,
    checkpoint=None,
) -> LouvainResult:
    """Multi-phase Louvain (``runMultiPhaseBasic.cpp:66-204`` semantics).

    Same extra guard as the oracle: when a phase leaves every vertex in its
    own community the coarse graph is a fixpoint, so the loop exits with
    output identical to the reference's 200-phase spin.
    """
    g_edges, g_nv = edges, nv
    c_orig = None
    prev_mod = -1.0
    curr_mod = -1.0
    phase = 1
    tot_iters = 0
    num_clusters = 0
    phase_mods = []

    while True:
        prev_mod = curr_mod
        res = louvain_phase(
            spark, g_edges, g_nv, lower=curr_mod, max_inner=max_inner,
            checkpoint=checkpoint, phase_tag=f"louvain_phase_{phase}",
        )
        curr_mod = res.modularity
        tot_iters += res.num_iters
        c, num_clusters = renumber(res.c)
        c = c.localCheckpoint(eager=True)
        phase_mods.append(curr_mod)

        if phase == 1:
            c_orig = c
        else:
            # project: C_orig[i] = C_phase[C_orig[i]] (ref J3,
            # ``runMultiPhaseBasic.cpp:112-124``); -1 rows pass through
            proj = c.select(F.col("vid").alias("comm_prev"), F.col("comm").alias("comm_new"))
            c_orig = (
                c_orig.withColumnRenamed("comm", "comm_prev")
                .join(proj, "comm_prev", "left")
                .select("vid", F.coalesce("comm_new", F.col("comm_prev")).alias("comm"))
                .localCheckpoint(eager=True)
            )

        if phase > max_phases or tot_iters > max_total_iters:
            break
        if num_clusters == g_nv:
            break  # coarsening fixpoint
        if res.change:
            g_edges = coarsen(g_edges, c).localCheckpoint(eager=True)
            g_nv = num_clusters
            phase += 1
        else:
            break

    return LouvainResult(
        c=c_orig,
        modularity=prev_mod,
        phases=phase,
        total_iters=tot_iters,
        num_clusters=num_clusters,
        trajectory=phase_mods,
    )
