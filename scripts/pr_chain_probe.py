#!/usr/bin/env python
"""A/B probe: PageRank fixed-iteration superstep throughput, cut_every=1
(one job per superstep) vs cut_every=5 (one chained job per 5 supersteps)
on the cached 61M-edge bench corpus. Prints one JSON line.

Usage: SPARK_GRAFT_CPUS=32 python scripts/pr_chain_probe.py [n_convs] [repeats]
"""
from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import build_bench_corpus  # noqa: E402


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    iters = 5

    from grappolo_spark.operators.pagerank import pagerank, pagerank_prepare
    from grappolo_spark.session import get_spark

    spark = get_spark("pr-chain-probe",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    edges, n_rows, nv = build_bench_corpus(spark, n_convs)
    prep = pagerank_prepare(edges)
    # warm-up
    pagerank(spark, edges, nv, tol=0.0, max_iter=1, prepared=prep)

    out = {"cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
           "edge_rows": n_rows, "nv": nv, "iters": iters}
    for ce in (1, iters):
        times = []
        for _ in range(repeats):
            t0 = time.time()
            pagerank(spark, edges, nv, tol=0.0, max_iter=iters,
                     prepared=prep, cut_every=ce)
            times.append(round(time.time() - t0, 2))
        out[f"cut_every_{ce}"] = {
            "secs": times,
            "edges_per_sec": [round(n_rows * iters / t, 0) for t in times],
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
