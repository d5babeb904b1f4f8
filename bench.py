#!/usr/bin/env python
"""Headline benchmark — one JSON line on stdout.

Runs the engine's flagship operators at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints

    {"metric": "edges_per_sec_louvain_pagerank_superstep", "value": N,
     "unit": "edges/sec", "queries": {...}, "sf": ...}

The headline value matches BASELINE.json's metric: edge rows processed per
second per Louvain+PageRank superstep = (|E_rows| * supersteps) / wall time
summed over the two iterative runs. Per-query wall times (seconds) land in
``queries`` so regressions are attributable.

Scaling evidence (north rule, N vs 4N): run twice —
    SPARK_GRAFT_CPUS=8 python bench.py
    SPARK_GRAFT_CPUS=32 python bench.py
and compare headline values (see scripts/scaling_bench.py, BENCH.md).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from grappolo_spark.session import get_spark
    from grappolo_spark import tables as T
    from grappolo_spark.etl import build_edges
    from grappolo_spark.operators.pagerank import pagerank
    from grappolo_spark.operators.louvain import louvain
    from grappolo_spark.operators.components import connected_components
    from grappolo_spark.operators.labelprop import label_propagation
    from grappolo_spark.operators.triangles import triangles
    from grappolo_spark.synth import synth_transcripts

    spark = get_spark("grappolo-bench",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # --- graph build (co-purchase link graph over the sf corpus) ----------
    def build():
        e = T.copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
        return e, e.count()

    edges, n_edge_rows = timed("graph_build", build)
    nv = T.copurchase_nv(spark, sf_dir)

    # --- iterative operators (the headline pair) --------------------------
    pr_iters = lv_iters = 0

    def run_pr():
        nonlocal pr_iters
        ranks, pr_iters = pagerank(spark, edges, nv, tol=1e-9, max_iter=60)
        ranks.count()

    def run_lv():
        nonlocal lv_iters
        res = louvain(spark, edges, nv)
        res.c.count()
        return res

    timed("pagerank", run_pr)
    lv = timed("louvain", run_lv)

    # --- the rest of the flagship set -------------------------------------
    timed("connected_components",
          lambda: connected_components(spark, edges, nv)[0].count())
    timed("label_propagation",
          lambda: label_propagation(spark, edges, nv, max_iter=10)[0].count())
    timed("triangles", lambda: triangles(spark, edges, nv)[0].count())

    # transcript ETL at a matching scale (synththesized, deterministic)
    def run_etl():
        tr = synth_transcripts(spark, n_convs=20000, max_turns=20)
        e, turns, tools = build_edges(tr)
        return e.count()

    timed("transcript_etl", run_etl)

    supersteps = pr_iters + lv.total_iters
    iter_secs = timings["pagerank"] + timings["louvain"]
    edges_per_sec = (n_edge_rows * supersteps) / iter_secs if iter_secs else 0.0

    print(json.dumps({
        "metric": "edges_per_sec_louvain_pagerank_superstep",
        "value": round(edges_per_sec, 1),
        "unit": "edges/sec",
        "queries": timings,
        "sf": sf_dir,
        "detail": {
            "edge_rows": n_edge_rows,
            "nv": nv,
            "pagerank_iters": pr_iters,
            "louvain_supersteps": lv.total_iters,
            "louvain_phases": lv.phases,
            "louvain_modularity": round(lv.modularity, 6),
            "louvain_clusters": lv.num_clusters,
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
