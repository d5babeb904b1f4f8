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

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from ..graph import assign_dense_ids_with_count
from ..lineage import cut_lineage, pin_partitioned, release
from ..session import scaled_shuffle_partitions


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
    # first_vid is unique per community (a vid belongs to exactly one comm),
    # so the scalable two-pass range-partitioned rank over first_vid equals
    # the dense_rank of the old global window — same total order, no
    # single-partition Exchange even when |communities| ~ |V| after phase 1
    ids, num_clusters = assign_dense_ids_with_count(
        firsts, ["first_vid"], id_col="new_comm"
    )
    mapping = firsts.join(ids, "first_vid").select("comm", "new_comm")
    # broadcast the mapping only while it genuinely fits executor + driver
    # memory: 4M (comm, new_comm) rows ≈ 64 MB on the driver — past that,
    # fall back to a shuffled join (AQE may still promote it at runtime).
    # The old 20M ceiling meant ~300 MB collected on the driver and
    # replicated per executor, an OOM risk on mid-size clusters (r3 ADVICE).
    if num_clusters <= 4_000_000:
        mapping = F.broadcast(mapping)
    out = (
        c.join(mapping, "comm", "left")
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


def _apply_sampling(target, sample_pct, it):
    """Approx-variant mask (ref C5): unsampled vertices keep sc this sweep.
    pmod ≡ Python %, and both xxhash args are LONG (xxh64 oracle contract).
    """
    if sample_pct is None:
        return target
    mask = (
        F.pmod(
            F.xxhash64(F.col("vid").cast("long"), F.lit(int(it)).cast("long")),
            F.lit(100),
        )
        < F.lit(sample_pct)
    )
    extra = [c for c in ("own_w", "degree", "self_w", "_a2t") if c in target.columns]
    return target.select(
        "vid",
        F.when(mask, F.col("comm")).otherwise(F.col("sc")).alias("comm"),
        "sc",
        *extra,
    )


# ---------------------------------------------------------------------------
# Arrow/CSR-block sweep kernel (the reference's vectorized path, SURVEY §2.10)
# ---------------------------------------------------------------------------

def _kernel_reduce_raw(cand):
    """In-kernel (src, comm_dst) reduction of RAW message rows: numpy
    lexsort + add.reduceat replaces the JVM hash aggregation. Sums are
    in-order float64 over integer-valued weights — exact, so downstream
    gains are bit-identical to the JVM-agg path.
    """
    import numpy as np
    import pandas as pd

    vid = cand["src"].to_numpy(np.int64)
    cd = cand["comm_dst"].to_numpy(np.int64)
    w = cand["weight"].to_numpy(np.float64)
    ay = cand["ay"].to_numpy(np.float64)
    sy = cand["size_y"].to_numpy(np.int64)
    o = np.lexsort((cd, vid))
    vid, cd, w, ay, sy = vid[o], cd[o], w[o], ay[o], sy[o]
    starts = np.ones(len(vid), bool)
    starts[1:] = (vid[1:] != vid[:-1]) | (cd[1:] != cd[:-1])
    idx = np.flatnonzero(starts)
    return pd.DataFrame({
        "src": vid[idx], "comm_dst": cd[idx],
        "eiy": np.add.reduceat(w, idx),
        "ay": ay[idx], "size_y": sy[idx],
    })


def _arrow_cogroup_kernel(const: float, raw: bool = False):
    """Cogrouped numpy sweep: per block, the candidate rows — whose target
    community's ``(ay, size_y)`` already rode the message — meet the
    per-vertex state rows; merge, gain, argmax, tie-break and swap
    protection all run vectorized in numpy with zero per-row Python and
    NO JVM candidate-by-state join. This is the engine twin of the
    reference's AVX-512 gain argmax (``utilityClusteringFunctions.cpp:
    869-950``), bit-identical to the DataFrame path: the gain expression
    keeps the reference's association order and the (-gain, cid) lexsort
    reproduces the max-gain/min-cid tie-break (``:746-759``).
    """
    import numpy as np
    import pandas as pd

    empty = {
        "vid": "int64", "comm": "int64", "sc": "int64",
        "own_w": "float64", "degree": "float64", "self_w": "float64",
        "_a2t": "float64",
    }

    def sweep(cand: "pd.DataFrame", st: "pd.DataFrame") -> "pd.DataFrame":
        if len(st) == 0:
            return pd.DataFrame({k: pd.Series(dtype=t) for k, t in empty.items()})
        if raw and len(cand):
            cand = _kernel_reduce_raw(cand)
        o = np.argsort(st["vid"].to_numpy(np.int64))  # vids are unique
        svid = st["vid"].to_numpy(np.int64)[o]
        ssc = st["sc"].to_numpy(np.int64)[o]
        sdeg = st["degree"].to_numpy(np.float64)[o]
        sselfw = st["self_w"].to_numpy(np.float64)[o]
        saxf = st["ax_full"].to_numpy(np.float64)[o]
        ssz = st["size_sc"].to_numpy(np.int64)[o]

        own = np.zeros(len(svid), np.float64)
        u_target = ssc.copy()
        if len(cand):
            vid = cand["src"].to_numpy(np.int64)
            cd = cand["comm_dst"].to_numpy(np.int64)
            eiy = cand["eiy"].to_numpy(np.float64)
            ay = cand["ay"].to_numpy(np.float64)
            sy = cand["size_y"].to_numpy(np.int64)

            pos = np.searchsorted(svid, vid)  # every cand src has a state row
            row_sc = ssc[pos]
            own_mask = cd == row_sc
            # per-vertex own-community weight (counter[sc]; 0 if no row)
            own[pos[own_mask]] = eiy[own_mask]

            deg = sdeg[pos]
            eix = own[pos] - sselfw[pos]
            ax = saxf[pos] - deg
            # reference gain, association order preserved (:746)
            gain = (2.0 * (eiy - eix)) - (2.0 * deg * (ay - ax) * const)

            mask = (~own_mask) & (gain > 0.0)
            v2, g2, c2 = vid[mask], gain[mask], cd[mask]
            sy2 = sy[mask]
            ssc2 = ssz[pos][mask]
            sc2 = row_sc[mask]
            if len(v2):
                order = np.lexsort((c2, -g2, v2))
                v2o = v2[order]
                first = np.ones(len(v2o), bool)
                first[1:] = v2o[1:] != v2o[:-1]
                wi = order[first]
                wv, wc = v2[wi], c2[wi]
                # singleton swap protection (ref :757-759)
                swap = (sy2[wi] == 1) & (ssc2[wi] == 1) & (wc > sc2[wi])
                final_c = np.where(swap, sc2[wi], wc)
                u_target[np.searchsorted(svid, wv)] = final_c

        # _a2t = degree·ax_full of the CURRENT community: summed over the
        # target rows it is Σ_c c_degree² — integer-valued in float64, so
        # the partial-sum order is irrelevant and the modularity
        # bookkeeping can ride the target job (no separate state stats)
        return pd.DataFrame(
            {"vid": svid, "comm": u_target, "sc": ssc, "own_w": own,
             "degree": sdeg, "self_w": sselfw, "_a2t": sdeg * saxf}
        )

    return sweep


def _sweep_arrow_cogrouped(cand, state, const, nblocks, raw=False):
    """Build the target assignment with the cogrouped Arrow kernel: one
    shuffle of each side by vid-block replaces the scored-best-target join
    chain of the DataFrame path AND the candidate-level info/state joins.

    ``raw=True``: ``cand`` is the raw message stream (src, weight,
    comm_dst, ay, size_y) and the (src, comm_dst) reduction happens inside
    the kernel — ONE block exchange of |E| rows instead of the JVM
    hash-agg exchange (≈|E| in the early-sweep regime where most
    neighbours are in distinct communities) plus a candidate exchange.
    Best for bounded-sweep workloads; for long convergence runs the
    JVM agg's map-side combine wins once communities have collapsed
    (candidates << |E|).
    """
    c = cand.withColumn("block", F.col("src") % F.lit(nblocks))
    s = state.withColumn("block", F.col("vid") % F.lit(nblocks))
    return c.groupBy("block").cogroup(s.groupBy("block")).applyInPandas(
        _arrow_cogroup_kernel(const, raw=raw),
        "vid long, comm long, sc long, own_w double, degree double,"
        " self_w double, _a2t double",
    )


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


def louvain_prepare(edges: DataFrame) -> tuple[DataFrame, DataFrame, float, DataFrame]:
    """One-time static-side preparation for a Louvain phase:
    (edges_pinned, deg, two_m, selfw).

    The edge table is hash-pre-partitioned + pre-sorted on the per-sweep
    join key (dst) so every J1 join reuses both and only the community
    state shuffles — the big static side never moves again. Degree and
    self-loop weight are assignment-independent. Prepare once per graph,
    then run any number of phases/sweeps against it (the reference's
    analogous CSR build is likewise amortized over the whole run).
    """
    edges = pin_partitioned(edges, "dst")
    deg = (
        edges.groupBy(F.col("src").alias("vid"))
        .agg(F.sum("weight").alias("degree"))
        .transform(cut_lineage)
    )
    two_m = deg.agg(F.sum("degree")).collect()[0][0] or 0.0
    selfw = edges.filter(F.col("src") == F.col("dst")).select(
        F.col("src").alias("vid"), F.col("weight").alias("self_w")
    ).transform(cut_lineage)
    return edges, deg, two_m, selfw


def louvain_phase(
    spark: SparkSession,
    edges: DataFrame,
    nv: int,
    lower: float = -1.0,
    max_inner: int = 25,
    checkpoint=None,
    phase_tag: str = "phase",
    method: str = "dataframe",
    sample_pct: float | None = None,
    hub_salt: int | None = None,
    prepared: tuple[DataFrame, DataFrame, float, DataFrame] | None = None,
    kernel_agg: bool = False,
    fuse_state: bool = False,
    chain_sweeps: int = 1,
    active_prune: float | None = None,
) -> PhaseResult:
    """One Louvain phase with exact reference SFP-path semantics.

    ``method``: "dataframe" = pure whole-stage-codegen join/agg sweep;
    "arrow" = Arrow-batched numpy argmax kernel (the reference's own
    vectorized-path split, ``vectorizedLouvainMethod.cpp``) — bit-identical
    results, fewer stages per superstep.

    ``sample_pct``: Approx variant (ref C5, ``parallelLouvainMethodApprox.
    cpp:139-155``): only vertices with pmod(xxhash64(vid, iter), 100) <
    pct evaluate moves this iteration (deterministic, partition-invariant;
    the reference's rand()%NV draw is scheduler-dependent — documented
    deviation, engine ≡ oracle by shared spec).

    ``prepared``: optional ``louvain_prepare(edges)`` result — pass it for
    repeated phases over the same graph so the static sides (one full edge
    shuffle + sort) are built once, not per call.

    ``kernel_agg`` (arrow path only): move the (src, comm_dst) message
    reduction inside the Arrow kernel — one E-scale block exchange per
    sweep instead of the JVM hash-agg exchange plus the candidate
    exchange. Bit-identical (in-order float64 sums over integer-valued
    weights); wins in the early-sweep regime (candidates ≈ |E|), loses
    map-side combine so prefer the default for long convergence runs.

    ``fuse_state`` (arrow path only): leave the per-sweep state table lazy
    instead of materializing it between its two consumers (the message
    join and the cogroup). Measured and REJECTED as the default at 61M
    edge rows / local[32]: AQE already runs every exchange as its own
    stage-job, so fusing saves no driver round-trips, while column
    pruning specializes the two state instances differently and defeats
    ReuseExchange — the |V|-scale state subtree computes twice
    (interleaved A/B: 0.38-0.99x pairwise). Kept as an option for
    storage-constrained clusters where a |V|-row checkpoint write per
    sweep is the scarcer resource. Bit-identical either way (pytest).

    ``chain_sweeps`` (arrow path, no durable checkpoint): run the sweeps
    in lazily-chained batches of this size — one Spark action per batch
    instead of two eager materializations per sweep, with every per-sweep
    intermediate ``persist()``-ed (the PageRank ``cut_every`` pattern
    applied to Louvain). Per-sweep stats still ride Observations; stop
    conditions are evaluated post-batch, and the returned PhaseResult
    (assignment, num_iters, trajectory) is truncated to the exact sweep
    the unchained loop would have stopped at — a sweep at a fixed point
    is a no-op, so overshoot cannot change the assignment (pytest-gated
    bit-equality: tests/test_louvain.py). Measured and REJECTED as the
    default at BOTH scales: unlike PageRank's linear superstep plan, the
    Louvain sweep consumes its state twice (message join + cogroup), so
    chaining k sweeps builds a 2^k-path plan tree — Catalyst analysis
    alone goes pathological past k≈4 (clamped), and under AQE every
    exchange already runs as its own stage-job so no driver round-trips
    are actually saved: karate 17s→59s (chain 1→2), 61M-row bench corpus
    166s→182s. Kept as the documented experiment closing round-2 item #4;
    the honest residual is the per-superstep constant, decomposed in
    BENCH.md.

    ``active_prune`` (arrow path, exact): per-sweep ACTIVE-VERTEX pruning
    of the Jacobi evaluation. A vertex whose own community AND every
    neighbour's community were untouched by the previous sweep's moves
    sees bit-identical argmax inputs (eiy per candidate is unchanged —
    no neighbour regrouped; ay/size_y and ax_full/size_sc are unchanged
    — no touched community among its candidates or its own), so its
    decision equals the previous sweep's decision: STAY (had it wanted
    to move, it would have moved then and its community would be
    touched). Such vertices bypass the kernel entirely and pass their
    previous row through (own_w carried from the previous target,
    _a2t = degree·ax_full recomputed from the CURRENT state — equal by
    the same argument). The value is the threshold moved-fraction below
    which pruning engages (the early sweeps move half the graph — there
    the active set ≈ V and the pruning joins are pure overhead); two
    more guards fall back to a full sweep when the touched communities
    hold more than the threshold fraction of vertices (one move into a
    giant community invalidates every member) or the computed active set
    exceeds half of nv. Bit-exact by construction and pytest-gated
    against the unpruned path (tests/test_louvain.py).

    ``hub_salt``: explicit skew handling for hub vertices (the engine twin
    of the reference GPU port's degree-binned execution,
    ``binWiseGaussSeidel.cu:104-128``): the J1+A3 candidate aggregation
    becomes two-stage — partial ``groupBy(src, comm_dst, salt)`` with
    salt = pmod(xxhash64(dst), hub_salt) spreading one hub's rows over
    ``hub_salt`` reducers, then a final re-agg on (src, comm_dst). Sum
    values are identical for integer-valued weights (float64-exact); AQE's
    skew-join handling covers the join side either way.
    """
    if method == "arrow" and chain_sweeps > 1 and checkpoint is None:
        return _louvain_phase_arrow_chained(
            spark, edges, nv, lower=lower, max_inner=max_inner,
            sample_pct=sample_pct, hub_salt=hub_salt, prepared=prepared,
            kernel_agg=kernel_agg, chain_sweeps=chain_sweeps,
        )
    if prepared is None:
        # size stage granularity to THIS graph for the whole phase (incl.
        # the prepare shuffle, so the pinned partitioning matches): on
        # coarsened/small graphs full-width stages are pure scheduling
        # overhead across the sweep loop. When the caller hands in a
        # pre-pinned `prepared`, its partitioning is authoritative —
        # resizing here would force the static side to reshuffle.
        with scaled_shuffle_partitions(spark, edges.count()):
            return louvain_phase(
                spark, edges, nv, lower=lower, max_inner=max_inner,
                checkpoint=checkpoint, phase_tag=phase_tag, method=method,
                sample_pct=sample_pct, hub_salt=hub_salt,
                prepared=louvain_prepare(edges), kernel_agg=kernel_agg,
                fuse_state=fuse_state, chain_sweeps=chain_sweeps,
                active_prune=active_prune,
            )
    edges, deg, two_m, selfw = prepared
    const = 1.0 / two_m if two_m > 0 else 0.0

    start_iter = 0
    curr = None
    if checkpoint is not None:
        state = checkpoint.load_latest(phase_tag)
        if state is not None:
            curr = state.dataframes["c"]
            start_iter = state.meta["iteration"]
    if curr is None:
        curr = louvain_init(edges, deg, const)
    curr = curr.transform(cut_lineage)
    curr_backing = curr  # checkpoint behind the current assignment

    curr2 = None
    if method == "arrow":
        # static vertex attrs (degree, self-loop weight) ride the state —
        # joined ONCE per phase and carried through every sweep checkpoint,
        # so the per-sweep plan contains no deg/selfw join at all
        vattr = deg.join(selfw, "vid", "left").select(
            "vid", "degree", F.coalesce("self_w", F.lit(0.0)).alias("self_w")
        )
        init_ck = curr
        curr2 = cut_lineage(curr.join(vattr, "vid"))
        curr = curr2.select("vid", "comm")
        curr_backing = curr2
        release(init_ck)

    prev_mod = -1.0
    change = False
    num_iters = start_iter
    trajectory = []
    # active-vertex pruning state: the previous sweep's full target (which
    # carries own_w) and its applied-move count; both None until one full
    # in-session arrow sweep has run
    prev_target = None
    prev_moved = None
    # SPARK_GRAFT_SWEEP_TRACE=1: per-sweep wall/moved/mode diagnostics
    # (arrow path) — measurement-only, no plan change; feeds BENCH.md's
    # active-prune attribution
    trace = os.environ.get("SPARK_GRAFT_SWEEP_TRACE") == "1"

    while True:
        num_iters += 1
        t_sweep = time.time()

        if method == "arrow":
            # v2 sweep: the candidate community's (c_degree, c_size) ride
            # the MESSAGE — every dst state row already knows its own
            # community's info, which IS the (ay, size_y) the gain needs —
            # so no candidate-level info join exists; the per-vertex state
            # merge happens inside the cogrouped Arrow kernel instead of a
            # JVM candidate×state join.
            info = (
                curr2.filter(F.col("comm") >= 0)
                .groupBy("comm")
                .agg(F.count("*").alias("c_size"),
                     F.sum("degree").alias("c_degree"))
            )
            # a2_x = Σ_c c_degree² (≡ Σ_v degree·ax_full, exact for the
            # integer-valued weights the engine guarantees) rides the
            # TARGET job via the kernel's _a2t column, so the state table
            # needs no observation of its own; the state materialization
            # exists purely so its two consumers (the message join and
            # the cogroup) share one computation (see fuse_state above).
            state = curr2.join(info, "comm").select(
                "vid", F.col("comm").alias("sc"), "degree", "self_w",
                F.col("c_degree").alias("ax_full"),
                F.col("c_size").alias("size_sc"),
            )
            if not fuse_state:
                state = cut_lineage(state)
            cdst2 = state.select(
                F.col("vid").alias("dst"), F.col("sc").alias("comm_dst"),
                F.col("ax_full").alias("ay"), F.col("size_sc").alias("size_y"),
            )
            # active-vertex pruning (see the docstring's exactness
            # argument): engage only when the previous sweep moved few
            # vertices AND the touched communities are small AND the
            # computed active set stays under half of nv
            active = None
            n_active = None
            if (
                active_prune is not None and sample_pct is None
                and prev_target is not None and prev_moved is not None
                and 0 < prev_moved <= active_prune * nv
            ):
                movers = prev_target.filter(F.col("comm") != F.col("sc"))
                tcomms = (
                    movers.select(F.col("comm").alias("tc"))
                    .union(movers.select(F.col("sc").alias("tc")))
                    .distinct()
                )
                tsz = (
                    info.join(F.broadcast(tcomms),
                              F.col("comm") == F.col("tc"))
                    .agg(F.sum("c_size")).collect()[0][0]
                )
                if tsz is not None and tsz <= active_prune * nv:
                    base_t = state.join(
                        F.broadcast(tcomms), F.col("sc") == F.col("tc")
                    ).select("vid")
                    nbr_t = edges.join(
                        F.broadcast(base_t.withColumnRenamed("vid", "dst")),
                        "dst",
                    ).select(F.col("src").alias("vid"))
                    cand_active = cut_lineage(base_t.union(nbr_t).distinct())
                    # cap = max(0.5, threshold): thresholds <= 0.5 fall
                    # back to a full sweep when the active set exceeds
                    # half the graph; threshold 1.0 means "always prune"
                    # (the pytest bit-equality setting)
                    n_active = cand_active.count()
                    if n_active <= max(0.5, active_prune) * nv:
                        active = cand_active
                    else:
                        release(cand_active)
            st_eval = state
            if active is not None:
                st_eval = state.join(F.broadcast(active), "vid")
                msg = edges.join(
                    F.broadcast(active.withColumnRenamed("vid", "src")),
                    "src",
                ).join(cdst2, "dst")
            else:
                msg = edges.join(cdst2, "dst")
            if kernel_agg and not hub_salt:
                # raw message stream straight into the kernel: the
                # (src, comm_dst) reduction happens Arrow-side (see
                # _sweep_arrow_cogrouped raw=True) — one E-scale exchange
                # per sweep instead of two in the early-sweep regime
                cand = msg.select("src", "weight", "comm_dst", "ay", "size_y")
            elif hub_salt:
                # two-stage salted aggregation: spread hub keys over
                # hub_salt reducers before the final combine
                salt = F.pmod(F.xxhash64(F.col("dst").cast("long")), F.lit(hub_salt))
                cand = (
                    msg.groupBy("src", "comm_dst", salt.alias("_salt"))
                    .agg(F.sum("weight").alias("eiy"),
                         F.first("ay").alias("ay"),
                         F.first("size_y").alias("size_y"))
                    .groupBy("src", "comm_dst")
                    .agg(F.sum("eiy").alias("eiy"),
                         F.first("ay").alias("ay"),
                         F.first("size_y").alias("size_y"))
                )
            else:
                cand = (
                    msg.groupBy("src", "comm_dst")
                    .agg(F.sum("weight").alias("eiy"),
                         F.first("ay").alias("ay"),
                         F.first("size_y").alias("size_y"))
                )
            # ALL per-sweep bookkeeping (e_xx, moved, a2_x) rides the
            # target-materialization job as observed metrics — zero stats
            # jobs; _a2t is projected off before the checkpoint stores the
            # state
            obs_target = Observation()
            sweep_out = _apply_sampling(
                _sweep_arrow_cogrouped(
                    cand, st_eval, const, spark.sparkContext.defaultParallelism,
                    raw=kernel_agg and not hub_salt,
                ),
                sample_pct, num_iters,
            )
            if active is not None:
                # provably-fixed vertices bypass the kernel: same comm,
                # own_w carried from the previous target, _a2t recomputed
                # from the CURRENT state (equal by the exactness argument)
                passthrough = (
                    state.join(F.broadcast(active), "vid", "left_anti")
                    .join(prev_target.select(
                        "vid", F.col("own_w").alias("_pw")), "vid")
                    .select(
                        "vid", F.col("sc").alias("comm"), "sc",
                        F.col("_pw").alias("own_w"), "degree", "self_w",
                        (F.col("degree") * F.col("ax_full")).alias("_a2t"),
                    )
                )
                sweep_out = sweep_out.unionByName(passthrough)
            target = cut_lineage(
                sweep_out.observe(
                    obs_target,
                    F.sum("own_w").alias("e_xx"),
                    F.sum(
                        F.when(F.col("comm") != F.col("sc"), 1).otherwise(0)
                    ).alias("moved"),
                    F.sum("_a2t").alias("a2_x"),
                ).select("vid", "comm", "sc", "own_w", "degree", "self_w")
            )
            e_xx = obs_target.get["e_xx"] or 0.0
            a2_x = obs_target.get["a2_x"] or 0.0
            curr_mod = e_xx * const - a2_x * const * const
            trajectory.append(curr_mod)
            moved = obs_target.get["moved"] or 0
            release(state)
            if active is not None:
                release(active)
            if trace:
                print(
                    f"[sweep {phase_tag or 'p'}#{num_iters}] "
                    f"{time.time() - t_sweep:.1f}s moved={moved} "
                    f"mode={'pruned' if active is not None else 'full'} "
                    f"active={n_active}",
                    flush=True,
                )
            if moved > 0:
                change = True
            if moved == 0 or num_iters >= max_inner:
                break
            prev_mod = max(curr_mod, lower)
            # target is already a checkpointed LogicalRDD — the projection
            # is free; re-checkpointing it would copy |V| rows per sweep.
            # The superseded assignment's checkpoint blocks are freed
            # eagerly (waiting on the GC-driven cleaner OOMs long runs).
            release(curr_backing)
            curr_backing = target
            prev_target = target
            prev_moved = int(moved)
            curr2 = target.select("vid", "comm", "degree", "self_w")
            curr = target.select("vid", "comm")
            if checkpoint is not None:
                checkpoint.save(
                    phase_tag,
                    meta={"iteration": num_iters, "modularity": float(curr_mod),
                          "moved": int(moved)},
                    dataframes={"c": curr},
                )
            continue

        info = comm_info(curr, deg).cache()

        # J1+A3: weight from each vertex to each neighbouring community
        # (self-loops included — they land in the own-community bucket)
        cdst = curr.select(F.col("vid").alias("dst"), F.col("comm").alias("comm_dst"))
        joined = edges.join(cdst, "dst")
        if hub_salt:
            # two-stage salted aggregation: spread hub keys over hub_salt
            # reducers before the final combine (GPU degree-bin playbook)
            salt = F.pmod(F.xxhash64(F.col("dst").cast("long")), F.lit(hub_salt))
            cand = (
                joined.groupBy("src", "comm_dst", salt.alias("_salt"))
                .agg(F.sum("weight").alias("eiy"))
                .groupBy("src", "comm_dst")
                .agg(F.sum("eiy").alias("eiy"))
                .cache()
            )
        else:
            cand = (
                joined.groupBy("src", "comm_dst")
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
                "vid", "sc", "degree", "size_sc", "own_w",
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
        # all per-sweep bookkeeping rides the target-materialization job as
        # observed metrics (no separate stats job): e_xx = Σ own_w, moved,
        # and a2_x = Σ_v degree·ax_full ≡ Σ_c c_degree² (exact for the
        # integer-valued weights the engine guarantees; ax_full = ax+degree
        # is carried as a throwaway term and projected off before the
        # checkpoint stores the state)
        obs_target = Observation()
        target = cut_lineage(
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
                F.col("own_w"),
                (F.col("degree") * (F.col("ax") + F.col("degree"))).alias("_a2t"),
            )
            .transform(lambda t: _apply_sampling(t, sample_pct, num_iters))
            .observe(
                obs_target,
                F.sum("own_w").alias("e_xx"),
                F.sum(
                    F.when(F.col("comm") != F.col("sc"), 1).otherwise(0)
                ).alias("moved"),
                F.sum("_a2t").alias("a2_x"),
            )
            .select("vid", "comm", "sc", "own_w")
        )

        stats = obs_target.get
        curr_mod = (stats["e_xx"] or 0.0) * const - (stats["a2_x"] or 0.0) * const * const
        trajectory.append(curr_mod)
        moved = stats["moved"] or 0
        info.unpersist()
        cand.unpersist()
        if moved > 0:
            change = True
        if moved == 0 or num_iters >= max_inner:
            # phase returns the assignment the final sweep READ
            break

        prev_mod = max(curr_mod, lower)
        release(curr_backing)
        curr_backing = target
        curr = target.select("vid", "comm")
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


def _louvain_phase_arrow_chained(
    spark: SparkSession,
    edges: DataFrame,
    nv: int,
    lower: float = -1.0,
    max_inner: int = 25,
    sample_pct: float | None = None,
    hub_salt: int | None = None,
    prepared=None,
    kernel_agg: bool = False,
    chain_sweeps: int = 5,
) -> PhaseResult:
    """Chained-batch twin of the arrow path of ``louvain_phase``: see the
    ``chain_sweeps`` paragraph of its docstring. The plan per sweep is the
    SAME construction (info → state → message join → candidate agg →
    cogrouped kernel → observe), but state/target are lazy ``persist()``
    nodes instead of eager checkpoints and one action per batch
    materializes the whole chain. The per-batch boundary cuts lineage so
    chained stats cannot compound across batches.
    """
    from ..lineage import _ckpt_level

    # each lazily-chained sweep references its predecessor TWICE (the info/
    # state join side and the cogroup side), so Catalyst's tree-walking
    # analysis visits 2^k paths for a k-deep chain: k=4 (16 paths) is
    # measured fine, k=8 (256 paths) pathological (minutes of driver-side
    # planning on a 6-vertex fixture). Clamp rather than trust the caller.
    chain_sweeps = min(int(chain_sweeps), 4)

    if prepared is not None:
        edges, deg, two_m, selfw = prepared
    else:
        edges, deg, two_m, selfw = louvain_prepare(edges)
    const = 1.0 / two_m if two_m > 0 else 0.0
    level = _ckpt_level()
    nblocks = spark.sparkContext.defaultParallelism

    curr = cut_lineage(louvain_init(edges, deg, const))
    vattr = deg.join(selfw, "vid", "left").select(
        "vid", "degree", F.coalesce("self_w", F.lit(0.0)).alias("self_w")
    )
    init_ck = curr
    curr2 = cut_lineage(curr.join(vattr, "vid"))
    release(init_ck)
    backing = curr2          # materialized assignment BEFORE the open batch
    prev_final = curr2       # assignment the next sweep will read

    prev_mod = -1.0
    change = False
    num_iters = 0
    trajectory = []
    stopped = False
    final_read = curr2

    while not stopped:
        batch = []       # (obs, target) per sweep of this batch
        persisted = []
        while True:
            num_iters += 1
            info = (
                curr2.filter(F.col("comm") >= 0)
                .groupBy("comm")
                .agg(F.count("*").alias("c_size"),
                     F.sum("degree").alias("c_degree"))
            )
            state = curr2.join(info, "comm").select(
                "vid", F.col("comm").alias("sc"), "degree", "self_w",
                F.col("c_degree").alias("ax_full"),
                F.col("c_size").alias("size_sc"),
            ).persist(level)
            cdst2 = state.select(
                F.col("vid").alias("dst"), F.col("sc").alias("comm_dst"),
                F.col("ax_full").alias("ay"), F.col("size_sc").alias("size_y"),
            )
            msg = edges.join(cdst2, "dst")
            if kernel_agg and not hub_salt:
                cand = msg.select("src", "weight", "comm_dst", "ay", "size_y")
            elif hub_salt:
                salt = F.pmod(F.xxhash64(F.col("dst").cast("long")), F.lit(hub_salt))
                cand = (
                    msg.groupBy("src", "comm_dst", salt.alias("_salt"))
                    .agg(F.sum("weight").alias("eiy"),
                         F.first("ay").alias("ay"),
                         F.first("size_y").alias("size_y"))
                    .groupBy("src", "comm_dst")
                    .agg(F.sum("eiy").alias("eiy"),
                         F.first("ay").alias("ay"),
                         F.first("size_y").alias("size_y"))
                )
            else:
                cand = (
                    msg.groupBy("src", "comm_dst")
                    .agg(F.sum("weight").alias("eiy"),
                         F.first("ay").alias("ay"),
                         F.first("size_y").alias("size_y"))
                )
            obs = Observation()
            target = (
                _apply_sampling(
                    _sweep_arrow_cogrouped(
                        cand, state, const, nblocks,
                        raw=kernel_agg and not hub_salt,
                    ),
                    sample_pct, num_iters,
                )
                .observe(
                    obs,
                    F.sum("own_w").alias("e_xx"),
                    F.sum(
                        F.when(F.col("comm") != F.col("sc"), 1).otherwise(0)
                    ).alias("moved"),
                    F.sum("_a2t").alias("a2_x"),
                )
                .select("vid", "comm", "sc", "own_w", "degree", "self_w")
                .persist(level)
            )
            batch.append((obs, target))
            persisted += [state, target]
            curr2 = target.select("vid", "comm", "degree", "self_w")
            if num_iters % max(1, chain_sweeps) == 0 or num_iters >= max_inner:
                break

        # ONE action runs the whole batch; every persist above caches
        batch[-1][1].count()
        base_iter = num_iters - len(batch)
        for j, (obs, target) in enumerate(batch):
            stats = obs.get
            curr_mod = (
                (stats["e_xx"] or 0.0) * const
                - (stats["a2_x"] or 0.0) * const * const
            )
            trajectory.append(curr_mod)
            moved = stats["moved"] or 0
            gi = base_iter + j + 1
            if moved > 0:
                change = True
            if moved == 0 or gi >= max_inner:
                # unchained loop returns the assignment the FINAL sweep
                # READ (it breaks before curr = target); on moved == 0
                # that equals the final target anyway
                num_iters = gi
                trajectory = trajectory[:gi]
                final_read = prev_final if j == 0 else batch[j - 1][1]
                stopped = True
                break
            prev_mod = max(curr_mod, lower)
        if not stopped:
            # batch boundary: truncate lineage so stats/plan depth cannot
            # compound, then free the batch's cached blocks
            new_backing = cut_lineage(curr2)
            release(backing)
            for p in persisted:
                p.unpersist()
            backing = new_backing
            prev_final = new_backing
            curr2 = new_backing

    all_v = spark.range(nv).select(F.col("id").alias("vid"))
    iso_fill = F.lit(-1) if num_iters >= 2 else F.col("vid")
    c_full = cut_lineage(
        all_v.join(final_read.select("vid", "comm"), "vid", "left")
        .select("vid", F.coalesce("comm", iso_fill).alias("comm"))
    )
    for p in persisted:
        p.unpersist()
    release(backing)
    return PhaseResult(c_full, prev_mod, num_iters, change, trajectory)


# ---------------------------------------------------------------------------
# multi-phase driver
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# color-staged (Gauss-Seidel) phase — ref C6
# ---------------------------------------------------------------------------

def louvain_phase_colored(
    spark: SparkSession,
    edges: DataFrame,
    nv: int,
    colors: DataFrame,
    thresh: float = 1e-2,
    max_inner: int = 25,
) -> PhaseResult:
    """One color-staged Louvain phase (``parallelLouvainWithColoring.cpp:
    158-262`` semantics, deterministic thanks to the deterministic JP
    coloring): singleton init; within an iteration the color classes are
    processed in ascending order, each class's moves applied in place and
    community info refreshed before the next class (Gauss-Seidel); the
    modularity is computed after the full sweep; stop when
    (currMod − prevMod) < thresh, when nothing moved, or at max_inner.

    Returns the post-sweep assignment (unlike the Jacobi basic phase, which
    returns the pre-sweep one) — matching the in-place reference variant.
    Oracle twin: ``oracle.coloring_np.louvain_phase_colored_np``.

    Stage granularity is clamped to the graph for the whole phase (the
    class loop runs n_colors x iters stages; on the small graphs the
    colored driver gates to, full-width stages are pure scheduling
    overhead — see ``session.scaled_shuffle_partitions``).
    """
    edges = edges.transform(cut_lineage)
    with scaled_shuffle_partitions(spark, edges.count()):
        return _louvain_phase_colored_impl(
            spark, edges, nv, colors, thresh=thresh, max_inner=max_inner)


def _louvain_phase_colored_impl(
    spark: SparkSession,
    edges: DataFrame,
    nv: int,
    colors: DataFrame,
    thresh: float = 1e-2,
    max_inner: int = 25,
) -> PhaseResult:
    deg = (
        edges.groupBy(F.col("src").alias("vid"))
        .agg(F.sum("weight").alias("degree"))
        .transform(cut_lineage)
    )
    two_m = deg.agg(F.sum("degree")).collect()[0][0] or 0.0
    const = 1.0 / two_m if two_m > 0 else 0.0
    selfw = edges.filter(F.col("src") == F.col("dst")).select(
        F.col("src").alias("vid"), F.col("weight").alias("self_w")
    ).transform(cut_lineage)

    verts = deg.select("vid")
    # edges pre-tagged with the source's color class: the per-class filter
    # prunes the candidate join to the class frontier only
    e_col = edges.join(
        colors.select(F.col("vid").alias("src"), F.col("color").alias("k_src")), "src"
    ).transform(cut_lineage)
    n_colors = colors.join(verts, "vid").agg(F.max("color")).collect()[0][0]
    n_colors = int(n_colors) + 1 if n_colors is not None else 0

    curr = verts.select(
        "vid", F.col("vid").alias("comm"), F.lit(False).alias("moved")
    ).transform(cut_lineage)
    prev_mod = -1.0
    change = False
    num_iters = 0
    trajectory = []

    # non-empty color classes, ascending — one driver collect up front
    # instead of touching empty classes inside the sweep
    live_colors = sorted(
        int(r["color"])
        for r in colors.join(verts, "vid").select("color").distinct().collect()
    )

    while True:
        num_iters += 1
        if not live_colors:  # empty graph: nothing can move
            trajectory.append(0.0)
            break
        # reset the per-sweep moved flag; the flag rides the class-loop
        # checkpoints so the sweep needs NO extra count action per class —
        # moved_total is read once from the final class's materialized state
        curr = curr.select("vid", "comm", F.lit(False).alias("moved"))
        obs_sweep = None
        for k in live_colors:
            info = comm_info(curr, deg)
            cdst = curr.select(F.col("vid").alias("dst"), F.col("comm").alias("comm_dst"))
            cand = (
                e_col.filter(F.col("k_src") == k)
                .join(cdst, "dst")
                .groupBy("src", "comm_dst")
                .agg(F.sum("weight").alias("eiy"))
            )
            own = (
                curr.join(colors, "vid").filter(F.col("color") == k)
                .select("vid", F.col("comm").alias("sc"))
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
            base = (
                own.join(deg, "vid")
                .join(
                    info.select(F.col("comm").alias("sc"),
                                F.col("c_degree").alias("ax_full"),
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
            moves = (
                base.join(best, "vid")
                .filter(
                    ~(
                        (F.col("cand_size") == 1)
                        & (F.col("size_sc") == 1)
                        & (F.col("cand_comm") > F.col("sc"))
                    )
                )
                .select("vid", F.col("cand_comm").alias("new_comm"))
            )
            new_curr = curr.join(moves, "vid", "left").select(
                "vid",
                F.coalesce("new_comm", F.col("comm")).alias("comm"),
                (F.col("moved") | F.col("new_comm").isNotNull()).alias("moved"),
            )
            if k == live_colors[-1]:
                # fold the post-sweep modularity into the final class's
                # materialization: e_xx = Σ_v own_w (each undirected intra
                # edge counted once per direction, self-loops once — same
                # total as the intra-edge filter-sum), a2_x = Σ_v degree ·
                # c_degree(comm(v)) ≡ Σ_c c_degree², and the moved count
                # all ride the checkpoint job as observed metrics — the
                # sweep runs exactly one action per color class, zero
                # stats jobs (mirrors the basic path, see :648-676)
                nc_src = new_curr.select(
                    F.col("vid").alias("src"), F.col("comm").alias("comm_src"))
                nc_dst = new_curr.select(
                    F.col("vid").alias("dst"), F.col("comm").alias("comm_dst"))
                own_new = (
                    edges.join(nc_src, "src").join(nc_dst, "dst")
                    .filter(F.col("comm_src") == F.col("comm_dst"))
                    .groupBy(F.col("src").alias("vid"))
                    .agg(F.sum("weight").alias("own_w"))
                )
                info_new = (
                    new_curr.join(deg, "vid")
                    .groupBy("comm")
                    .agg(F.sum("degree").alias("ax_full"))
                )
                obs_sweep = Observation()
                new_curr = (
                    new_curr.join(own_new, "vid", "left")
                    .join(deg, "vid")
                    .join(info_new, "comm")
                    .observe(
                        obs_sweep,
                        F.sum(F.coalesce("own_w", F.lit(0.0))).alias("e_xx"),
                        F.sum(F.col("degree") * F.col("ax_full")).alias("a2_x"),
                        F.sum(F.col("moved").cast("long")).alias("n_moved"),
                    )
                    .select("vid", "comm", "moved")
                )
            new_curr = new_curr.transform(cut_lineage)
            curr.unpersist()
            curr = new_curr

        mrow = obs_sweep.get
        curr_mod = (mrow["e_xx"] or 0.0) * const - (mrow["a2_x"] or 0.0) * const * const
        moved_total = int(mrow["n_moved"] or 0)
        trajectory.append(curr_mod)
        if moved_total:
            change = True
        if moved_total == 0 or (curr_mod - prev_mod) < thresh or num_iters >= max_inner:
            break
        prev_mod = curr_mod

    all_v = spark.range(nv).select(F.col("id").alias("vid"))
    c_full = (
        all_v.join(curr, "vid", "left")
        .select("vid", F.coalesce("comm", F.lit(-1)).alias("comm"))
    )
    return PhaseResult(c_full, prev_mod, num_iters, change, trajectory)


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
    driver_tail_nv: int = 262_144,
    driver_tail_edges: int = 2_000_000,
    method: str = "dataframe",
    hub_salt: int | None = None,
    kernel_agg: bool = False,
    active_prune: float | None = None,
) -> LouvainResult:
    """Multi-phase Louvain (``runMultiPhaseBasic.cpp:66-204`` semantics).

    Same extra guard as the oracle: when a phase leaves every vertex in its
    own community the coarse graph is a fixpoint, so the loop exits with
    output identical to the reference's 200-phase spin.

    **Driver-tail fallback**: coarsening shrinks the graph geometrically;
    after a phase or two the coarse graph is thousands of vertices —
    running distributed supersteps on it is pure scheduling overhead. When
    the coarse graph fits ``driver_tail_nv`` / ``driver_tail_edges`` the
    remaining phases run single-node via the numpy oracle, which implements
    the *identical* contract (proven exact vs the compiled reference binary
    in tests/golden). Same small-graph gate the reference applies with
    ``minGraphSize`` (``runMultiPhaseColoring.cpp:174``); results are
    bit-identical either way (tests/test_louvain.py covers the seam).
    Set ``driver_tail_nv=0`` to force fully-distributed phases.

    Driver memory bound: the tail collects at most ``driver_tail_edges``
    (src, dst, weight) tuples — ~150 B/row boxed (tuple + two ints +
    float) ≈ 300 MB at the 2M default, roughly doubled transiently by the
    ``collect()``-time Row objects — plus the numpy CSR the oracle builds
    (~50 MB). The EDGE ceiling is the binding memory bound; the nv
    ceiling (a few numpy int64 arrays — ~2 MB at the 262k default) only
    guards pathological edgeless graphs, so it is set well above typical
    phase-2 cluster counts: on the 61M-row anchor corpus the old 16k nv
    cap pushed three coarse phases (≈40k vertices, <1M edges) through
    ~50 distributed sweeps of pure scheduling overhead (VERDICT r3 #2).
    Both ceilings are caller-tunable; a driver sized for Spark's own
    default (1 GiB) holds the defaults with ~2-3x headroom, so size the
    ceiling down before sizing the driver up.
    """
    from grappolo_spark.oracle.numpy_oracle import louvain_multiphase_np
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
            method=method, hub_salt=hub_salt, kernel_agg=kernel_agg,
            active_prune=active_prune,
        )
        curr_mod = res.modularity
        tot_iters += res.num_iters
        c, num_clusters = renumber(res.c)
        c = c.transform(cut_lineage)
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
                .transform(cut_lineage)
            )

        if phase > max_phases or tot_iters > max_total_iters:
            break
        if num_clusters == g_nv:
            break  # coarsening fixpoint
        if res.change:
            g_edges = coarsen(g_edges, c).transform(cut_lineage)
            g_nv = num_clusters
            phase += 1
            if g_nv <= driver_tail_nv and g_edges.count() <= driver_tail_edges:
                rows = [(r["src"], r["dst"], r["weight"]) for r in g_edges.collect()]
                tail = louvain_multiphase_np(
                    rows, g_nv, threshold=threshold,
                    max_phases=max_phases - phase + 1,
                    max_inner=max_inner, init_mod=curr_mod,
                )
                proj = spark.createDataFrame(
                    list(enumerate(tail["C"])), "comm_prev long, comm_new long"
                )
                c_orig = (
                    c_orig.withColumnRenamed("comm", "comm_prev")
                    .join(F.broadcast(proj), "comm_prev", "left")
                    .select("vid", F.coalesce("comm_new", F.col("comm_prev")).alias("comm"))
                    .transform(cut_lineage)
                )
                return LouvainResult(
                    c=c_orig,
                    modularity=tail["modularity"],
                    phases=phase - 1 + tail["phases"],
                    total_iters=tot_iters + tail["total_iters"],
                    num_clusters=tail["num_clusters"],
                    trajectory=phase_mods + tail["trajectory"],
                )
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


def louvain_coloring(
    spark: SparkSession,
    edges: DataFrame,
    nv: int,
    c_thresh: float = 1e-2,
    threshold: float = 1e-6,
    min_graph_size: int = 100000,
    max_phases: int = 200,
    max_inner: int = 25,
) -> LouvainResult:
    """Multi-phase coloring driver (ref C12, ``runMultiPhaseColoring.cpp:
    51-239``): while the graph is larger than ``min_graph_size``, run
    color-staged phases at the cheap ``c_thresh`` (recoloring every coarse
    graph, ``:174-199``); then hand the coarse graph to the basic driver at
    the fine ``threshold`` (``:200-207``). The coloring stages exist to cut
    superstep count on the huge first phases — exactly the regime of a
    10^12-turn graph where the first phase dominates cost.

    Oracle twin: ``oracle.coloring_np.louvain_coloring_np``.
    """
    from .coloring import distance1_coloring

    g_edges, g_nv = edges, nv
    c_orig = None
    phases = 0
    tot_iters = 0
    trajectory = []

    while g_nv > min_graph_size and phases < max_phases:
        colors, _, _ = distance1_coloring(spark, g_edges, g_nv)
        res = louvain_phase_colored(spark, g_edges, g_nv, colors,
                                    thresh=c_thresh, max_inner=max_inner)
        phases += 1
        tot_iters += res.num_iters
        c, n_clusters = renumber(res.c)
        c = c.transform(cut_lineage)
        trajectory.append(res.modularity)
        if c_orig is None:
            c_orig = c
        else:
            proj = c.select(F.col("vid").alias("comm_prev"), F.col("comm").alias("comm_new"))
            c_orig = (
                c_orig.withColumnRenamed("comm", "comm_prev")
                .join(proj, "comm_prev", "left")
                .select("vid", F.coalesce("comm_new", F.col("comm_prev")).alias("comm"))
                .transform(cut_lineage)
            )
        if not res.change or n_clusters == g_nv:
            break
        g_edges = coarsen(g_edges, c).transform(cut_lineage)
        g_nv = n_clusters

    fine = louvain(spark, g_edges, g_nv, threshold=threshold,
                   max_phases=max_phases, max_inner=max_inner)
    phases += fine.phases
    tot_iters += fine.total_iters
    trajectory.extend(fine.trajectory)
    if c_orig is None:
        c_orig = fine.c
    else:
        proj = fine.c.select(F.col("vid").alias("comm_prev"), F.col("comm").alias("comm_new"))
        c_orig = (
            c_orig.withColumnRenamed("comm", "comm_prev")
            .join(proj, "comm_prev", "left")
            .select("vid", F.coalesce("comm_new", F.col("comm_prev")).alias("comm"))
        )
    final_c, n_clusters = renumber(c_orig)
    return LouvainResult(
        c=final_c.transform(cut_lineage),
        modularity=fine.modularity,
        phases=phases,
        total_iters=tot_iters,
        num_clusters=n_clusters,
        trajectory=trajectory,
    )
