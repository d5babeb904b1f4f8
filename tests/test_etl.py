"""Transcript ETL: north-rule input shape, invariants, determinism, resume.

Covers the BASELINE.json input_hint contract: transcripts
``(conv_id, turn_idx, role, text, tool, ts)`` → symmetrized edge table,
with per-turn text equality under stable turn ordering, plus
partitioning-invariance of the synthesizer and dense-id assignment, and
checkpoint/resume equality for the iterative operators.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from grappolo_spark.checkpoint import CheckpointManager
from grappolo_spark.etl import build_edges, turn_vertices
from grappolo_spark.graph import assign_dense_ids, validate_symmetric
from grappolo_spark.operators.louvain import louvain
from grappolo_spark.operators.pagerank import pagerank
from grappolo_spark.oracle import pagerank_np
from grappolo_spark.synth import synth_transcripts

EXPECTED_SCHEMA = (
    "struct<conv_id:string,turn_idx:int,role:string,text:string,"
    "tool:string,ts:timestamp>"
)


def test_synth_schema_and_determinism(spark):
    tr1 = synth_transcripts(spark, n_convs=50, max_turns=12, n_partitions=2)
    tr8 = synth_transcripts(spark, n_convs=50, max_turns=12, n_partitions=8)
    assert tr1.schema.simpleString() == EXPECTED_SCHEMA
    rows1 = sorted(map(tuple, tr1.collect()))
    rows8 = sorted(map(tuple, tr8.collect()))
    assert rows1 == rows8  # partition-invariant corpus
    # stable turn ordering: exactly one row per (conv_id, turn_idx), dense
    dup = tr1.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
    assert dup == 0
    per_conv = tr1.groupBy("conv_id").agg(
        F.count("*").alias("n"), F.max("turn_idx").alias("mx")
    )
    assert per_conv.filter(F.col("mx") != F.col("n") - 1).count() == 0


def test_assign_dense_ids_bijection_and_order(spark):
    tr = synth_transcripts(spark, n_convs=40, max_turns=10)
    ids2 = assign_dense_ids(tr.select("conv_id", "turn_idx"),
                            ["conv_id", "turn_idx"], "vid", num_partitions=2)
    ids7 = assign_dense_ids(tr.select("conv_id", "turn_idx"),
                            ["conv_id", "turn_idx"], "vid", num_partitions=7)
    rows2 = sorted(map(tuple, ids2.collect()))
    rows7 = sorted(map(tuple, ids7.collect()))
    assert rows2 == rows7  # ids invariant to partition count
    n = len(rows2)
    vids = sorted(v for *_k, v in rows2)
    assert vids == list(range(n))  # bijection onto 0..N-1
    # ids follow the total order of the key
    ordered = sorted(rows2, key=lambda r: (r[0], r[1]))
    assert [r[2] for r in ordered] == list(range(n))


def test_build_edges_invariants_and_text_equality(spark):
    tr = synth_transcripts(spark, n_convs=60, max_turns=15)
    edges, turns, tools = build_edges(tr)
    validate_symmetric(edges)
    # no self-loops in the transcript graph
    assert edges.filter(F.col("src") == F.col("dst")).count() == 0
    # vertex spaces are disjoint and dense
    n_turns, n_tools = turns.count(), tools.count()
    tool_ids = sorted(r["vid"] for r in tools.collect())
    assert tool_ids == list(range(n_turns, n_turns + n_tools))
    # per-turn text equality under stable turn ordering: joining the vertex
    # map back to the source yields exactly one text per turn vertex
    joined = tr.join(turns, ["conv_id", "turn_idx"])
    bad = (
        joined.groupBy("vid")
        .agg(F.countDistinct("text").alias("nt"), F.count("*").alias("nr"))
        .filter((F.col("nt") != 1) | (F.col("nr") != 1))
        .count()
    )
    assert bad == 0
    assert joined.count() == tr.count()  # every turn mapped, none dropped
    # reply edges: every conversation of n turns contributes n-1 undirected
    # reply edges; tool edges add the rest
    n_reply = (
        tr.select("conv_id", "turn_idx").distinct()
        .groupBy("conv_id").count()
        .agg(F.sum(F.col("count") - 1)).collect()[0][0]
    )
    n_tool_pairs = (
        tr.filter(F.col("tool").isNotNull())
        .join(turns, ["conv_id", "turn_idx"])
        .select("vid", "tool").distinct().count()
    )
    n_undirected = edges.count() / 2
    assert n_undirected == n_reply + n_tool_pairs


def test_transcript_pagerank_matches_oracle(spark):
    tr = synth_transcripts(spark, n_convs=30, max_turns=10)
    edges, turns, tools = build_edges(tr)
    nv = turns.count() + tools.count()
    rows = [(r["src"], r["dst"], r["weight"]) for r in edges.collect()]
    expected, _ = pagerank_np(rows, nv)
    got_df, _ = pagerank(spark, edges, nv)
    got = np.zeros(nv)
    for r in got_df.collect():
        got[r["vid"]] = r["rank"]
    assert np.allclose(got, expected, atol=1e-6)


def test_pagerank_checkpoint_resume(spark, tmp_path):
    tr = synth_transcripts(spark, n_convs=20, max_turns=8)
    edges, turns, tools = build_edges(tr)
    nv = turns.count() + tools.count()

    full, iters_full = pagerank(spark, edges, nv, tol=0.0, max_iter=12)
    want = {r["vid"]: r["rank"] for r in full.collect()}

    # run 1: killed after 6 iterations (checkpoint every 3)
    cp = CheckpointManager(spark, str(tmp_path / "pr"))
    pagerank(spark, edges, nv, tol=0.0, max_iter=6, checkpoint_every=3,
             checkpoint=cp)
    # run 2: fresh manager over the same dir resumes from step 6
    cp2 = CheckpointManager(spark, str(tmp_path / "pr"))
    resumed, iters = pagerank(spark, edges, nv, tol=0.0, max_iter=12,
                              checkpoint_every=3, checkpoint=cp2)
    got = {r["vid"]: r["rank"] for r in resumed.collect()}
    assert iters == iters_full
    assert set(got) == set(want)
    # resume must reproduce the uninterrupted run; 1e-12 (not bit-equal)
    # because the parquet round-trip changes aggregation sum order
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12


def test_louvain_checkpoint_resume(spark, tmp_path):
    from grappolo_spark import fixtures as fx

    edges_l, nv = fx.karate()
    df = fx.to_spark_edges(spark, edges_l)
    base = louvain(spark, df, nv)
    want = {r["vid"]: r["comm"] for r in base.c.collect()}

    # interrupt phase 1 after 2 inner iterations, then resume to completion
    cp = CheckpointManager(spark, str(tmp_path / "lv"))
    from grappolo_spark.operators.louvain import louvain_phase
    louvain_phase(spark, df, nv, max_inner=2, checkpoint=cp,
                  phase_tag="louvain_phase_1")
    cp2 = CheckpointManager(spark, str(tmp_path / "lv"))
    resumed = louvain(spark, df, nv, checkpoint=cp2)
    got = {r["vid"]: r["comm"] for r in resumed.c.collect()}
    assert got == want
    assert resumed.modularity == base.modularity


def test_context_edges_window1_equals_reply_graph(spark):
    """On dense per-conversation turn indices (the documented table shape)
    the W=1 context graph IS the reply graph."""
    from grappolo_spark.etl import build_context_edges

    tr = synth_transcripts(spark, n_convs=40, max_turns=12)
    reply, _t1, _t2 = build_edges(tr)
    ctx, _t3, _t4 = build_context_edges(tr, window=1)
    a = sorted((r["src"], r["dst"], r["weight"]) for r in reply.collect())
    b = sorted((r["src"], r["dst"], r["weight"]) for r in ctx.collect())
    assert a == b


def test_context_edges_window_semantics(spark):
    """Every (turn, turn-k) pair for k<=W and nothing else; symmetric."""
    from grappolo_spark.etl import build_context_edges, turn_vertices

    tr = synth_transcripts(spark, n_convs=25, max_turns=15)
    W = 4
    ctx, turns, tools = build_context_edges(tr, window=W)
    validate_symmetric(ctx)
    tmap = {(r["conv_id"], r["turn_idx"]): r["vid"] for r in turns.collect()}
    n_tools = tools.count()
    expected = set()
    by_conv = {}
    for (cid, idx) in tmap:
        by_conv.setdefault(cid, set()).add(idx)
    for cid, idxs in by_conv.items():
        for i in idxs:
            for k in range(1, W + 1):
                if i - k in idxs:
                    expected.add((tmap[(cid, i)], tmap[(cid, i - k)]))
    got = {
        (r["src"], r["dst"])
        for r in ctx.collect()
        # tool vertices are numbered after the turns
        if r["src"] < len(tmap) and r["dst"] < len(tmap)
    }
    sym_expected = expected | {(b, a) for a, b in expected}
    assert got == sym_expected
    assert n_tools > 0  # tool edges present too (include_tools default)


def test_etl_joins_never_broadcast_a_corpus_sized_side(spark):
    """Plan-shape guard for the 8-GiB broadcast failure (window-9 scaling
    run): Catalyst's size estimate for the exploded pair table flows
    through range->distinct->explode/lag and comes out near-zero, so
    without the merge hints in etl.py the planner statically emits a
    BroadcastHashJoin whose build side grows with the corpus (7.9 GiB at
    200k synthetic conversations, fatal 15.8 GiB at 400k — Spark's hard
    broadcast cap is 8 GiB). The ONLY broadcast allowed in either edge
    builder is the explicitly-hinted tool vertex map, whose size is the
    number of distinct tool NAMES (O(10), corpus-independent)."""
    from grappolo_spark.etl import build_context_edges

    tr = synth_transcripts(spark, n_convs=30, max_turns=10)

    def corpus_broadcasts(df):
        """BroadcastHashJoin lines keyed on the conversation/turn keys —
        the corpus-sized joins. Broadcasts on `_pid` (the O(n_partitions)
        dense-id offset map) and on `tool` (O(distinct tool names)) are
        size-bounded and allowed."""
        plan = df._jdf.queryExecution().executedPlan().toString()
        return [
            ln for ln in plan.splitlines()
            if "BroadcastHashJoin" in ln
            and ("conv_id" in ln or "turn_idx" in ln or "prev_idx" in ln)
        ]

    reply, _t, _tt = build_edges(tr)
    assert corpus_broadcasts(reply) == []

    ctx, _t2, _tt2 = build_context_edges(tr, window=4)
    assert corpus_broadcasts(ctx) == []

    ctx_nt, _t3, _tt3 = build_context_edges(tr, window=4, include_tools=False)
    assert corpus_broadcasts(ctx_nt) == []
