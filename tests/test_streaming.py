"""Structured Streaming surface: incremental ETL == batch ETL, rollup ==
batch GROUP BY, stateful session tracker == batch aggregate.

Every test drives the REAL streaming engine (file source, availableNow
trigger, checkpointed foreachBatch / memory sinks) over multi-file input
so several micro-batches actually run, then compares exactly against the
batch computation on the same rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grappolo_spark import streaming as S
from grappolo_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    """Deterministic transcripts written as 3 parquet files in one dir —
    with maxFilesPerTrigger=1 the stream processes 3 micro-batches."""
    base = tmp_path_factory.mktemp("stream_corpus")
    tr = synth_transcripts(spark, n_convs=120, max_turns=12)
    # 3 deterministic chunks by conv hash — repartition each to 1 file
    bucket = F.abs(F.xxhash64("conv_id")) % 3
    for i in range(3):
        (
            tr.filter(bucket == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(base / f"chunk_{i}"))
        )
    # flatten: the file source watches one directory
    import shutil

    flat = base / "flat"
    flat.mkdir()
    n = 0
    for i in range(3):
        for p in sorted((base / f"chunk_{i}").glob("*.parquet")):
            shutil.copy(p, flat / f"part_{i}_{n}.parquet")
            n += 1
    return str(flat), tr


def test_incremental_edge_etl_matches_batch(spark, corpus, tmp_path):
    flat, tr = corpus
    stream = S.read_transcript_stream(spark, flat, max_files_per_trigger=1)
    S.run_incremental_edge_etl(
        spark,
        stream,
        store_dir=str(tmp_path / "store"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        window=4,
    )
    got = S.compact_edge_store(spark, str(tmp_path / "store"))
    want = S.context_edges_hashed(
        spark.read.parquet(flat), window=4
    )
    g = {(r["src"], r["dst"]): r["weight"] for r in got.collect()}
    w = {(r["src"], r["dst"]): r["weight"] for r in want.collect()}
    assert g == w and len(g) > 0


def test_incremental_etl_is_idempotent_per_batch(spark, corpus, tmp_path):
    """Re-running the stream over the same input with a FRESH checkpoint
    (worst-case full replay) leaves the store byte-identical: every delta
    directory is keyed by batch id and overwritten atomically."""
    flat, _ = corpus
    store = str(tmp_path / "store")
    for attempt in range(2):
        stream = S.read_transcript_stream(spark, flat, max_files_per_trigger=1)
        S.run_incremental_edge_etl(
            spark, stream, store_dir=store,
            checkpoint_dir=str(tmp_path / f"ckpt_{attempt}"), window=4,
        )
    got = S.compact_edge_store(spark, store)
    want = S.context_edges_hashed(spark.read.parquet(flat), window=4)
    assert got.count() == want.count()
    assert (
        got.join(want, ["src", "dst", "weight"]).count() == want.count()
    )


def test_edge_increments_prunes_text_column(spark, corpus):
    """Scan hygiene: the ETL must never read the (huge) text column."""
    flat, _ = corpus
    plan = S.edge_increments(
        spark.read.parquet(flat), window=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan


def test_stream_event_rollup_matches_batch(spark):
    path = "/root/testdata/sf0.001/events.parquet"
    got = S.stream_event_rollup(spark, path).toPandas()
    want = (
        spark.read.parquet(path)
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .toPandas()
    )
    key = ["bucket_start", "event_type"]
    got = got.sort_values(key, ignore_index=True)
    want = want.sort_values(key, ignore_index=True)
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert got[key].values.tolist() == want[key].values.tolist()
    assert (got["sum_value"] - want["sum_value"]).abs().max() < 1e-6


def test_conversation_sessions_match_batch(spark, corpus):
    flat, _ = corpus
    stream = S.read_transcript_stream(spark, flat, max_files_per_trigger=1)
    updates, _q = S.stream_conversation_sessions(spark, stream)
    # latest update per conversation = the max n_turns row (monotone state)
    final = (
        updates.groupBy("conv_id")
        .agg(
            F.max_by(
                F.struct("n_turns", "last_turn_idx", "last_ts"), "n_turns"
            ).alias("s")
        )
        .select("conv_id", "s.n_turns", "s.last_turn_idx", "s.last_ts")
    )
    want = (
        spark.read.parquet(flat)
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.max("turn_idx").alias("last_turn_idx"),
            F.max("ts").alias("last_ts"),
        )
    )
    g = {r["conv_id"]: (r["n_turns"], r["last_turn_idx"], r["last_ts"])
         for r in final.collect()}
    w = {r["conv_id"]: (r["n_turns"], r["last_turn_idx"], r["last_ts"])
         for r in want.collect()}
    assert g == w and len(g) == 120
