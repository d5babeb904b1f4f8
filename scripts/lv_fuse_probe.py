#!/usr/bin/env python
"""A/B probe: Arrow-path Louvain sweep throughput, fuse_state=True (one
job + one checkpoint per sweep) vs False (two of each) on the cached
bench corpus. Prints one JSON line.

Usage: SPARK_GRAFT_CPUS=32 python scripts/lv_fuse_probe.py [n_convs] [repeats]
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
    sweeps = 5

    from grappolo_spark.operators.louvain import louvain_phase, louvain_prepare
    from grappolo_spark.session import get_spark

    spark = get_spark("lv-fuse-probe",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    edges, n_rows, nv = build_bench_corpus(spark, n_convs)
    prep = louvain_prepare(edges)
    louvain_phase(spark, edges, nv, max_inner=1, method="arrow", prepared=prep)

    out = {"cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
           "edge_rows": n_rows, "nv": nv, "sweeps": sweeps}
    # interleave the A/B legs so each pair shares the same host-load
    # window (the box is a noisy co-tenant VM)
    times = {True: [], False: []}
    for _ in range(repeats):
        for fuse in (True, False):
            t0 = time.time()
            res = louvain_phase(spark, edges, nv, max_inner=sweeps,
                                method="arrow", prepared=prep, fuse_state=fuse)
            res.c.count()
            times[fuse].append(round(time.time() - t0, 2))
    for fuse in (True, False):
        out[f"fuse_{fuse}"] = {
            "secs": times[fuse],
            "edges_per_sec": [round(n_rows * sweeps / t, 0) for t in times[fuse]],
        }
    out["paired_speedup_fused"] = [
        round(b / a, 3) for a, b in zip(times[True], times[False])
    ]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
