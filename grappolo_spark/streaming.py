"""Structured Streaming surface: incremental transcript→edge ETL and
watermarked event rollups.

The reference engine is batch-only (its sources are static edge-list
files, ``driverForGraphClustering.cpp:76-98``); this module is the
engine-brief addition that makes the same link-graph ETL incremental.

Design for 10^12-turn scale:

* **Stateless edge derivation.** A context/reply/tool edge is a pure
  function of ONE transcript row: turn ``(conv, k)`` links to
  ``(conv, k-1) .. (conv, k-window)`` and to its tool vertex by
  construction, so the streaming path needs no cross-batch join and no
  keyed state at all — ``edge_increments`` is a narrow explode+project
  that runs identically on a batch or a streaming DataFrame (the batch
  twin IS the same function; parity is tested, not assumed).
* **Stable hashed vertex keys.** Streaming cannot globally dense-rank
  vertices (rank depends on data not yet seen), so vertices are keyed by
  ``xxhash64`` of their natural key — partition-invariant, collision
  probability ~n²/2⁶⁵ (≈5e-8 at 10^9 vertices). Batch jobs that need
  dense 0..NV-1 ids renumber once at read time (``graph.assign_dense_ids``).
* **Idempotent delta store + compaction.** Edge weights are interaction
  counts — associative — so each micro-batch writes its own partial
  counts to ``store/delta_batch=<id>`` (overwrite by batchId = exactly
  once under retries) and ``compact_edge_store`` folds all deltas with
  one groupBy-sum. This is the standard append-only streaming sink for
  commutative aggregates: no read-modify-write on the hot path, and the
  compaction is itself an ordinary batch job that can run on any cadence.
* **Watermarks bound state.** The rollup aggregation carries
  ``withWatermark`` so on an unbounded stream Spark drops window state
  older than the lateness bound; the stateful session tracker keeps one
  tiny row per conversation.

Input shape is the north-rule transcript table
``(conv_id, turn_idx, role, text, tool, ts)``; only
(conv_id, turn_idx, tool, ts) are ever read — text is pruned at the scan.
"""

from __future__ import annotations

import itertools
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

_SINK_SEQ = itertools.count()


def _sink_name(prefix: str) -> str:
    return f"{prefix}_{os.getpid()}_{next(_SINK_SEQ)}"


# ---------------------------------------------------------------------------
# stable vertex keys (streaming twin of graph.assign_dense_ids)
# ---------------------------------------------------------------------------

def turn_key(conv_id, turn_idx):
    """Stable 64-bit vertex key for a turn vertex."""
    return F.xxhash64(F.lit(0), conv_id, turn_idx.cast("long"))


def tool_key(tool):
    """Stable 64-bit vertex key for a tool vertex (disjoint hash lane)."""
    return F.xxhash64(F.lit(1), tool)


# ---------------------------------------------------------------------------
# stateless edge derivation — works on batch AND streaming DataFrames
# ---------------------------------------------------------------------------

def edge_increments(
    transcripts: DataFrame,
    window: int = 8,
    include_tools: bool = True,
) -> DataFrame:
    """Directed edge increments (src, dst) — one row per interaction.

    Pure narrow ops (explode bounded by ``window``, no join, no state):
    each turn row independently emits its edges to the ``window``
    preceding turns of its conversation plus its tool edge. Assumes each
    ``(conv_id, turn_idx)`` appears once in the stream (the transcript
    table's key); duplicates upstream should be dropped at the source.
    """
    base = transcripts.select("conv_id", "turn_idx", "tool")
    ctx = (
        base.select(
            "conv_id",
            "turn_idx",
            F.explode(F.sequence(F.lit(1), F.lit(int(window)))).alias("k"),
        )
        .filter(F.col("turn_idx") - F.col("k") >= 0)
        .select(
            turn_key(F.col("conv_id"), F.col("turn_idx")).alias("src"),
            turn_key(F.col("conv_id"), F.col("turn_idx") - F.col("k")).alias("dst"),
        )
    )
    if include_tools:
        tool_edges = base.filter(F.col("tool").isNotNull()).select(
            turn_key(F.col("conv_id"), F.col("turn_idx")).alias("src"),
            tool_key(F.col("tool")).alias("dst"),
        )
        ctx = ctx.unionByName(tool_edges)
    return ctx


def context_edges_hashed(
    transcripts: DataFrame, window: int = 8, include_tools: bool = True
) -> DataFrame:
    """Batch twin of the incremental store: the full symmetric weighted
    edge table over hashed vertex keys, computed in one batch pass from
    the SAME ``edge_increments`` transform (parity by construction, and
    by ``tests/test_streaming.py``)."""
    from .graph import symmetrize

    directed = (
        edge_increments(transcripts, window, include_tools)
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    return symmetrize(directed)


# ---------------------------------------------------------------------------
# incremental ETL: stream → idempotent delta store → compaction
# ---------------------------------------------------------------------------

def read_transcript_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of transcript parquet files."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return reader.parquet(path)


def run_incremental_edge_etl(
    spark: SparkSession,
    transcripts_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    window: int = 8,
    include_tools: bool = True,
):
    """Fold a transcript stream into the delta store with availableNow
    semantics (process everything pending, then stop). Returns after the
    stream terminates.

    Each micro-batch writes its partial (src, dst, weight) counts to
    ``store_dir/delta_batch=<id>`` with overwrite — re-processing the
    same batch after a failure rewrites the same directory, so the store
    is exactly-once without any transactional sink.
    """
    inc = edge_increments(transcripts_stream, window, include_tools)

    def _write_delta(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("src", "dst")
            .agg(F.count("*").cast("double").alias("weight"))
            .write.mode("overwrite")
            .parquet(f"{store_dir}/delta_batch={batch_id}")
        )

    q = (
        inc.writeStream.foreachBatch(_write_delta)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def compact_edge_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """Fold every delta into the symmetric weighted edge table.

    One groupBy-sum over the union of deltas (count weights are
    associative, so any number of deltas folds exactly), then the
    graph-core symmetrize — output satisfies the same invariants as the
    batch ETL and feeds every downstream operator unchanged.
    """
    from .graph import symmetrize

    directed = (
        spark.read.parquet(f"{store_dir}/delta_batch=*")
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )
    return symmetrize(directed)


# ---------------------------------------------------------------------------
# watermarked event rollup (streaming groupBy-window aggregation)
# ---------------------------------------------------------------------------

def stream_event_rollup(
    spark: SparkSession,
    events_path: str,
    bucket: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-(time-bucket, event_type) rollup of the events table computed
    THROUGH the streaming engine (file source → watermarked window
    aggregation → availableNow), returned as a static DataFrame.

    The watermark bounds aggregation state on an unbounded stream; the
    complete output mode makes the availableNow run emit every window, so
    the result equals the batch GROUP BY exactly (DuckDB oracle:
    ``stream_event_rollup`` in ``__spark_entry__.oracle_sql``).
    """
    schema: StructType = spark.read.parquet(events_path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isfile(events_path):
        # the file stream source wants a directory; stream the parent
        # with a glob pinned to this one table file
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        events_path = os.path.dirname(events_path)
    src = reader.parquet(events_path)
    # parquet NTZ timestamps carry no zone; event-time watermarks require
    # an instant — reinterpret as UTC (the session zone)
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", bucket).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    name = _sink_name("event_rollup")
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# ---------------------------------------------------------------------------
# custom stateful operator: per-conversation session tracking
# ---------------------------------------------------------------------------

SESSION_OUTPUT = "conv_id string, n_turns long, last_turn_idx int, last_ts timestamp"
SESSION_STATE = "n_turns long, last_turn_idx int, last_ts timestamp"


def stream_conversation_sessions(
    spark: SparkSession,
    transcripts_stream: DataFrame,
) -> tuple[DataFrame, object]:
    """Running per-conversation session state via the engine's custom
    stateful operator path (``applyInPandasWithState`` — Arrow-batched,
    no per-row Python): for every conversation the state is (turn count,
    max turn index, max ts), updated per micro-batch and emitted in
    update mode.

    Returns ``(updates_table, query)`` where ``updates_table`` is the
    in-memory sink (one row per conversation per batch that touched it;
    the latest row per conv_id is the current state) and ``query`` is the
    terminated availableNow StreamingQuery.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def _update(key, pdf_iter, state):
        n, last_idx, last_ts = (
            state.get if state.exists else (0, -1, None)
        )
        for pdf in pdf_iter:
            n += len(pdf)
            bi = int(pdf["turn_idx"].max())
            if bi > last_idx:
                last_idx = bi
            bt = pdf["ts"].max()
            if last_ts is None or bt > last_ts:
                last_ts = bt
        state.update((n, last_idx, last_ts))
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "n_turns": [n],
                "last_turn_idx": [last_idx],
                "last_ts": [last_ts],
            }
        )

    updates = (
        transcripts_stream.select("conv_id", "turn_idx", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update,
            SESSION_OUTPUT,
            SESSION_STATE,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    name = _sink_name("conv_sessions")
    q = (
        updates.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name), q
