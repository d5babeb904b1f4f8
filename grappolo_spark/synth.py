"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Schema (BASELINE.json input_hint): ``conv_id:string, turn_idx:int32,
role:string, text:string, tool:string, ts:timestamp``.

Everything is a pure function of (seed, n_convs, max_turns): every column
derives from ``xxhash64`` of (conv, turn, seed, salt), so the corpus is
identical at any parallelism/partitioning — generated distributed via
``spark.range`` (no driver-side materialization; scales to 10^12 turns by
raising n_convs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VOCAB = [
    "graph", "vertex", "edge", "community", "modularity", "rank", "cluster",
    "spark", "shuffle", "partition", "join", "degree", "weight", "phase",
    "iteration", "gain", "color", "frontier", "triangle", "component",
    "label", "propagate", "coarsen", "superstep", "arrow", "batch", "hash",
    "skew", "hub", "salt", "broadcast", "checkpoint",
]

_TOOLS = ["search", "python", "browser", "calculator", "files", "sql"]

_ROLES = ["user", "assistant", "tool"]


def _h(salt: int, *cols):
    """Deterministic partition-invariant hash column (non-negative)."""
    return F.abs(F.xxhash64(F.lit(salt), *cols))


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 100,
    max_turns: int = 20,
    seed: int = 42,
    n_partitions: int | None = None,
) -> DataFrame:
    """Generate the deterministic transcript table.

    Turn counts vary per conversation (4..max_turns); roles alternate
    user/assistant with deterministic tool-call turns; ``tool`` is null on
    non-tool turns; ``ts`` is monotone within a conversation.
    """
    convs = spark.range(0, n_convs, 1, n_partitions or spark.sparkContext.defaultParallelism)
    convs = convs.select(F.col("id").alias("conv"))
    n_turns = (_h(seed, F.col("conv")) % (max_turns - 3) + 4).alias("n_turns")
    turns = (
        convs.select("conv", n_turns)
        .select("conv", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"))
    )

    h_role = _h(seed + 1, F.col("conv"), F.col("turn_idx"))
    # role schedule: even turns user, odd turns assistant, except ~1/5 of
    # odd turns are tool turns (deterministic per (conv, turn)).
    role = (
        F.when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .when(h_role % 5 == 0, F.lit("tool"))
        .otherwise(F.lit("assistant"))
    )

    tool = F.when(
        role == "tool",
        F.element_at(F.array(*[F.lit(t) for t in _TOOLS]), (h_role % len(_TOOLS) + 1).cast("int")),
    )

    # deterministic pseudo-text: 6-18 vocab words drawn by hash
    n_words = (_h(seed + 2, F.col("conv"), F.col("turn_idx")) % 13 + 6).cast("int")
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            vocab,
            (_h(seed + 3, F.col("conv"), F.col("turn_idx"), i) % len(_VOCAB) + 1).cast("int"),
        ),
    )
    text = F.concat_ws(" ", words)

    ts = F.to_timestamp(F.lit("2025-01-01 00:00:00")) + F.make_interval(
        secs=(F.col("conv") * 86400 + F.col("turn_idx") * 60 + (h_role % 59)).cast("double")
    )

    return turns.select(
        F.concat(F.lit("conv_"), F.col("conv")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
