"""Weighted label propagation as a deterministic DataFrame superstep.

The reference's Louvain local-move sweep (C1) IS weighted LPA with a
modularity objective; this operator keeps the same superstep skeleton and
the same determinism rule — tie-break to the SMALLER label
(``utilityClusteringFunctions.cpp:746-749``) — but the objective is the
plain max neighbor-label weight. Synchronous (Jacobi) updates from the
round-start snapshot, exactly like the reference's sweep schedule.

Each round: join labels onto edge dst -> groupBy (src, label) weight sum
-> per-vertex argmax via max_by over a (weight, -label) ordering key.
Self-loops carry no label information and are excluded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lineage import cut_lineage, release
from ..session import scaled_shuffle_partitions


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    nv: int,
    max_iter: int = 20,
    checkpoint=None,
) -> tuple[DataFrame, int]:
    """Returns ((vid, label) DataFrame, rounds run)."""
    e = edges.filter(F.col("src") != F.col("dst")).transform(cut_lineage)
    # stage granularity clamped to the graph for the round loop
    # (session.scaled_shuffle_partitions; results partition-invariant)
    with scaled_shuffle_partitions(spark, e.count()):
        return _lpa_impl(spark, e, nv, max_iter, checkpoint)


def _lpa_impl(spark, e, nv, max_iter, checkpoint):
    labels = spark.range(nv).select(F.col("id").alias("vid"), F.col("id").alias("label"))

    start_iter = 0
    if checkpoint is not None:
        state = checkpoint.load_latest("labelprop")
        if state is not None:
            labels = state.dataframes["labels"]
            start_iter = state.meta["iteration"]
    labels = labels.transform(cut_lineage)
    state_ck = labels  # checkpoint backing the current state (for release)

    rounds = start_iter
    for it in range(start_iter, max_iter):
        rounds = it + 1
        votes = (
            e.join(labels.select("vid", "label"), e.dst == labels.vid)
            .groupBy("src", "label")
            .agg(F.sum("weight").alias("w"))
        )
        # argmax weight, ties to the smaller label: max_by over a struct
        # ordered by (w, -label) — deterministic and partition-invariant
        best = (
            votes.groupBy("src")
            .agg(F.max_by("label", F.struct(F.col("w"), -F.col("label"))).alias("new_label"))
            .withColumnRenamed("src", "vid")
        )
        # previous label rides through the checkpoint: convergence check
        # reads materialized data instead of a second shuffle join
        new_state = (
            labels.join(best, "vid", "left")
            .select(
                "vid",
                F.coalesce("new_label", "label").alias("label"),
                F.col("label").alias("prev"),
            )
            .transform(cut_lineage)
        )
        changed = new_state.filter(F.col("label") != F.col("prev")).count()
        release(state_ck)
        state_ck = new_state
        labels = new_state.select("vid", "label")
        if checkpoint is not None:
            checkpoint.save(
                "labelprop",
                meta={"iteration": it + 1, "changed": int(changed)},
                dataframes={"labels": labels},
            )
        if changed == 0:
            break
    return labels, rounds
