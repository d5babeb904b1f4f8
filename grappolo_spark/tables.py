"""Derived graph tables over the sf test corpus (TESTDATA.md).

These builders derive deterministic link graphs from the relational test
tables so every graph operator has a DuckDB-checkable input:

* ``copurchase_edges`` — the working unipartite graph: parts are vertices,
  an edge connects two parts that co-occur in at least one order, weight =
  number of co-occurring orders. Skewed, triangle-rich, dense ids
  (p_partkey is 0..NP-1). This plays the role the transcript reply graph
  plays in production (see ``etl.py``) while staying SQL-expressible.
* ``event_transition_edges`` — the ETL shape: consecutive event_types per
  user ordered by (ts, event_id) via a lag window — the same
  Window.partitionBy().orderBy()+lag plan as the transcript reply-edge
  builder (SURVEY §2.1 engine source).

Scale notes: the co-purchase self-join is bounded per order (orders have
few parts); at 100 TB the same plan holds because the join key l_orderkey
is the shuffle key and AQE handles skewed orders. The symmetrize union is
shuffle-free (union + one groupBy already keyed by the join output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# sweep-local memoization
#
# The correctness driver runs all ~73 registry queries sequentially in ONE
# SparkSession; ~30 of them start from the same derived graph (co-purchase
# edges or the transcript reply/tool graph). Rebuilding that graph from
# parquet per query re-pays the self-join + symmetrize every time (~2-4 s
# each at sf0.01 — a material slice of the driver's sweep budget).  The
# cache materializes each derived table once per (session, sf_dir) via
# ``localCheckpoint`` and hands every later query the same in-memory
# blocks.  Determinism is unaffected (the builders are deterministic), and
# at 100 TB the equivalent is writing the derived edge table once and
# reading it from Parquet — the cache IS the local stand-in for that.
# ---------------------------------------------------------------------------

_DERIVED_CACHE: dict = {}


def _cached(spark: SparkSession, sf_dir: str, kind: str, build):
    # keyed on applicationId, a session-lifetime identifier: id(spark) can
    # be REUSED by a new session after the old one is stopped and
    # collected, which would hand out stale localCheckpointed DataFrames
    # bound to a dead context. A new application also invalidates every
    # older entry (getOrCreate keeps one live session per process) — drop
    # them so the cache cannot grow unboundedly across sessions/sf_dirs.
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir, kind)
    hit = _DERIVED_CACHE.get(key)
    if hit is None:
        stale = [k for k in _DERIVED_CACHE if k[0] != app_id]
        for k in stale:
            del _DERIVED_CACHE[k]
        hit = build()
        _DERIVED_CACHE[key] = hit
    return hit


def cached_copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-once copurchase edge table (localCheckpoint)."""
    return _cached(
        spark, sf_dir, "copurchase",
        lambda: copurchase_edges(spark, sf_dir).localCheckpoint(eager=True),
    )


def cached_copurchase_nv(spark: SparkSession, sf_dir: str) -> int:
    return _cached(spark, sf_dir, "copurchase_nv",
                   lambda: copurchase_nv(spark, sf_dir))


def cached_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-once transcript view of the events table."""
    return _cached(
        spark, sf_dir, "transcripts",
        lambda: transcripts_from_events(spark, sf_dir).localCheckpoint(eager=True),
    )


def cached_transcript_graph(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, int]:
    """Materialized-once SYMMETRIZED transcript reply/tool graph + nv
    (the north-rule input graph; DuckDB twin: the ``tredges`` CTE)."""
    def build():
        from .etl import build_edges_directed
        from .graph import symmetrize

        directed, nv = build_edges_directed(cached_transcripts(spark, sf_dir))
        return symmetrize(directed).localCheckpoint(eager=True), nv

    return _cached(spark, sf_dir, "tr_graph", build)


def cached_transcript_graph_directed(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, int]:
    """Materialized-once DIRECTED transcript reply/tool graph + nv
    (DuckDB twin: the ``directed`` CTE)."""
    def build():
        from .etl import build_edges_directed

        directed, nv = build_edges_directed(cached_transcripts(spark, sf_dir))
        return directed.localCheckpoint(eager=True), nv

    return _cached(spark, sf_dir, "tr_graph_directed", build)


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric (src, dst, weight) co-purchase graph over parts."""
    op = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    fwd = pairs.select(F.col("u").alias("src"), F.col("v").alias("dst"), "weight")
    rev = pairs.select(F.col("v").alias("src"), F.col("u").alias("dst"), "weight")
    return fwd.unionByName(rev)


def copurchase_nv(spark: SparkSession, sf_dir: str) -> int:
    """Dense vertex-space size = number of parts (p_partkey is 0..NP-1)."""
    return table(spark, sf_dir, "part").count()


def brand_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vid, comm) assignment: parts grouped by brand, communities densely
    renumbered by min member vid (≡ reference first-occurrence renumber)."""
    parts = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("vid"), F.col("p_brand").alias("grp")
    )
    firsts = parts.groupBy("grp").agg(F.min("vid").alias("first_vid"))
    w = Window.orderBy("first_vid")
    mapping = firsts.select("grp", (F.dense_rank().over(w) - 1).cast("long").alias("comm"))
    return parts.join(F.broadcast(mapping), "grp").select("vid", "comm")


def type_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same but grouped by p_type (the 'ground truth' for C18 compares)."""
    parts = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("vid"), F.col("p_type").alias("grp")
    )
    firsts = parts.groupBy("grp").agg(F.min("vid").alias("first_vid"))
    w = Window.orderBy("first_vid")
    mapping = firsts.select("grp", (F.dense_rank().over(w) - 1).cast("long").alias("comm"))
    return parts.join(F.broadcast(mapping), "grp").select("vid", "comm")


def event_transition_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed (prev event_type → event_type) transition counts per user,
    ordered by (ts, event_id) — the lag-window ETL shape."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n_transitions"))
    )


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcript-shaped view of the events table.

    Produces EXACTLY the north-rule input schema (BASELINE.json input_hint):
    ``conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
    ts:timestamp``. Conversations are per-user event sequences ordered by
    (ts, event_id); roles alternate user/(assistant|tool); tool turns carry
    the event_type as the tool name. Pure column expressions — checkable
    row-for-row against the DuckDB twin (TRANSCRIPTS_SQL_CTE).
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    turn_idx = (F.row_number().over(w) - 1).cast("int")
    base = ev.select(
        F.concat(F.lit("conv_"), F.col("user_id")).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.col("event_type"),
        F.col("props"),
        F.col("ts"),
    )
    role = (
        F.when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .when(F.col("event_type").isin("error", "purchase"), F.lit("tool"))
        .otherwise(F.lit("assistant"))
    )
    return base.select(
        "conv_id",
        "turn_idx",
        role.alias("role"),
        F.concat_ws(" ", F.col("event_type"), F.col("props")).alias("text"),
        F.when(role == "tool", F.col("event_type")).alias("tool"),
        "ts",
    )


# DuckDB twin of transcripts_from_events (same column rules, same ordering).
TRANSCRIPTS_SQL_CTE = """
tr0 AS (
    SELECT 'conv_' || user_id AS conv_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
           event_type, props, ts
    FROM events
),
tr AS (
    SELECT conv_id, turn_idx,
           CASE WHEN turn_idx % 2 = 0 THEN 'user'
                WHEN event_type IN ('error', 'purchase') THEN 'tool'
                ELSE 'assistant' END AS role,
           event_type || ' ' || props AS text,
           CASE WHEN turn_idx % 2 <> 0 AND event_type IN ('error', 'purchase')
                THEN event_type END AS tool,
           ts
    FROM tr0
)
"""


# The shared DuckDB CTE that mirrors copurchase_edges exactly; oracle SQL
# strings in __spark_entry__ are built on top of this prefix.
COPURCHASE_SQL_CTE = """
op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
    SELECT a.l_partkey AS u, b.l_partkey AS v,
           CAST(COUNT(*) AS DOUBLE) AS weight
    FROM op a JOIN op b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
),
edges AS (
    SELECT u AS src, v AS dst, weight FROM pairs
    UNION ALL
    SELECT v AS src, u AS dst, weight FROM pairs
)
"""
