"""Transcripts → link-graph ETL (the engine's source, SURVEY §2.1 note).

Input: transcript table ``(conv_id, turn_idx, role, text, tool, ts)``
(Iceberg/Parquet). Vertices are turns ``(conv_id, turn_idx)`` and tool
names; edges are

* reply edges  (conv_id, k) — (conv_id, k-1), built with a
  ``lag`` window partitioned by conv_id (narrow per-conversation work;
  conv_id is the natural partition key at 10^12-turn scale), and
* tool-interaction edges  turn — tool vertex (``tool`` non-null).

Weights are interaction counts. The output is symmetrized/deduped per the
graph-core invariants. Only (conv_id, turn_idx, tool) are read — Catalyst
prunes ``text`` out of the scan entirely.

The per-turn text invariant ("per-turn text equality under stable turn
ordering") is checked by joining the vertex map back to the source table —
see tests/test_etl.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .graph import assign_dense_ids, symmetrize


def turn_vertices(transcripts: DataFrame) -> DataFrame:
    """Dense ids for turn vertices, ordered by (conv_id, turn_idx).

    Returns (conv_id, turn_idx, vid).
    """
    return assign_dense_ids(
        transcripts.select("conv_id", "turn_idx"), ["conv_id", "turn_idx"], "vid"
    )


def tool_vertices(transcripts: DataFrame, start: int) -> DataFrame:
    """Dense ids for tool vertices, numbered after the turn vertices."""
    tools = transcripts.filter(F.col("tool").isNotNull()).select("tool")
    return assign_dense_ids(tools, ["tool"], "vid", start=start)


def _directed_edges(transcripts: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(directed weighted edges, turn map, tool map) — shared core."""
    turns = turn_vertices(transcripts).cache()
    n_turns = turns.count()
    tools = tool_vertices(transcripts, start=n_turns).cache()

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    reply_pairs = (
        transcripts.select("conv_id", "turn_idx")
        .distinct()
        .withColumn("prev_idx", F.lag("turn_idx").over(w))
        .filter(F.col("prev_idx").isNotNull())
    )
    # Both join sides are O(corpus): force sort-merge. Catalyst's size
    # estimate for the pairs side flows through range->distinct->lag and
    # comes out near-zero, so without the hint the planner statically
    # emits a BroadcastHashJoin whose build side GROWS WITH THE CORPUS —
    # at 400k synthetic conversations the exploded pair table is ~16 GiB,
    # over Spark's hard 8 GiB broadcast cap (and a driver OOM long before
    # that at 10^12-turn scale). Sort-merge co-partitions on the conv key
    # — the plan that survives the 100 TB regime.
    reply_edges = (
        reply_pairs.hint("merge").join(turns, ["conv_id", "turn_idx"])
        .withColumnRenamed("vid", "src")
        .join(
            turns.select(
                F.col("conv_id").alias("conv_id2"),
                F.col("turn_idx").alias("prev_idx2"),
                F.col("vid").alias("dst"),
            ).hint("merge"),
            (F.col("conv_id") == F.col("conv_id2"))
            & (F.col("prev_idx") == F.col("prev_idx2")),
        )
        .select("src", "dst")
    )

    tool_edges = (
        transcripts.filter(F.col("tool").isNotNull())
        .select("conv_id", "turn_idx", "tool")
        # hint("merge"): corpus-sized probe side, near-zero static
        # estimate (see the pair-join note above) — keep it off the
        # broadcast path; only the genuinely tiny tool map broadcasts.
        .hint("merge")
        .join(turns, ["conv_id", "turn_idx"])
        .withColumnRenamed("vid", "src")
        .join(F.broadcast(tools.withColumnRenamed("vid", "dst")), "tool")
        .select("src", "dst")
    )

    directed = (
        reply_edges.unionByName(tool_edges)
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    return directed, turns, tools


def build_edges(transcripts: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the symmetrized edge table from a transcript table.

    Returns (edges, turn_vertex_map, tool_vertex_map); edges is
    ``(src:long, dst:long, weight:double)`` symmetric, deduped, no
    self-loops (a turn never links to itself).
    """
    directed, turns, tools = _directed_edges(transcripts)
    edges = symmetrize(directed)
    return edges, turns, tools


def build_edges_directed(transcripts: DataFrame) -> tuple[DataFrame, int]:
    """DIRECTED edge table (reply: turn→previous turn; tool: turn→tool)
    with count weights — the input shape for the directed Louvain variant
    (ref C8). Returns (edges, nv)."""
    directed, turns, tools = _directed_edges(transcripts)
    nv = turns.count() + tools.count()
    return directed, nv


def build_context_edges(
    transcripts: DataFrame,
    window: int = 8,
    include_tools: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Conversational-context edge table: each turn links to the turns at
    ``turn_idx - k`` for k = 1..window in the SAME conversation (an
    attention-window link graph over the transcript; window=1 reproduces
    the reply graph on dense turn indices). Returns
    ``(edges, turn_vertex_map, tool_vertex_map)``; edges symmetric,
    deduped, weights are interaction counts.

    Scale design: the offset pairs come from one explode (bounded fan-out
    = window) followed by ONE equi-join on (conv_id, turn_idx) — conv_id
    co-partitions both sides, per-conversation work is bounded by
    max_turns x window, and no per-conversation window sort exists at all
    (unlike the lag-based reply builder). The denser graph (avg degree
    ~2*window) amortizes per-vertex superstep costs, which is why the
    throughput bench runs on this shape.
    """
    turns = turn_vertices(transcripts).cache()
    n_turns = turns.count()
    tools = tool_vertices(transcripts, start=n_turns).cache()

    idx = transcripts.select("conv_id", "turn_idx").distinct()
    pairs = (
        idx.select(
            "conv_id",
            "turn_idx",
            F.explode(F.sequence(F.lit(1), F.lit(int(window)))).alias("k"),
        )
        .select("conv_id", "turn_idx", (F.col("turn_idx") - F.col("k")).alias("prev_idx"))
        .filter(F.col("prev_idx") >= 0)
    )
    # hint("merge"): the exploded pair table is O(corpus x window) rows
    # but Catalyst's estimate through range->distinct->explode is
    # near-zero, so the planner statically picks a BroadcastHashJoin
    # whose build side grows with the corpus — measured: 7.9 GiB at 200k
    # synthetic conversations (just under Spark's hard 8 GiB broadcast
    # cap) and a fatal 15.8 GiB at 400k. Sort-merge co-partitions both
    # sides on the conv key instead; same rows, scale-safe.
    ctx_edges = (
        pairs.hint("merge").join(turns, ["conv_id", "turn_idx"])
        .withColumnRenamed("vid", "src")
        .join(
            turns.select(
                F.col("conv_id").alias("conv_id"),
                F.col("turn_idx").alias("prev_idx"),
                F.col("vid").alias("dst"),
            ).hint("merge"),
            ["conv_id", "prev_idx"],
        )
        .select("src", "dst")
    )
    if include_tools:
        tool_edges = (
            transcripts.filter(F.col("tool").isNotNull())
            .select("conv_id", "turn_idx", "tool")
            .hint("merge")  # corpus-sized side — never broadcast (see above)
            .join(turns, ["conv_id", "turn_idx"])
            .withColumnRenamed("vid", "src")
            .join(F.broadcast(tools.withColumnRenamed("vid", "dst")), "tool")
            .select("src", "dst")
        )
        ctx_edges = ctx_edges.unionByName(tool_edges)
    directed = ctx_edges.groupBy("src", "dst").agg(
        F.count("*").cast("double").alias("weight")
    )
    return symmetrize(directed), turns, tools
