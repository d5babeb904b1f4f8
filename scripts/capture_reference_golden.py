#!/usr/bin/env python
"""Capture golden outputs from the compiled reference binary.

The reference (C++/OpenMP) is compiled out-of-tree (e.g. /tmp/refbuild —
``cp -r /root/reference /tmp/refbuild``, switch the Makefile to g++ and
``-march=skylake-avx512``, ``make driverForGraphClustering``) and run on
each fixture written as a Metis file. Its per-vertex communities +
summary metrics are stored under tests/golden/ so pytest can assert
oracle == reference without the binary being present.

Usage: python scripts/capture_reference_golden.py [path-to-binary]
"""

from __future__ import annotations

import json
import pathlib
import re
import subprocess
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from grappolo_spark import fixtures as fx

GOLDEN_DIR = pathlib.Path(__file__).resolve().parents[1] / "tests" / "golden"


def write_metis(path, undirected_edges, nv, weighted=False):
    """Write a Metis/DIMACS#10 adjacency file (1-based)."""
    adj = [[] for _ in range(nv)]
    ne = 0
    for u, v, w in undirected_edges:
        if u == v:
            continue  # metis writer: fixtures here have no self-loops
        adj[int(u)].append((int(v), w))
        adj[int(v)].append((int(u), w))
        ne += 1
    with open(path, "w") as f:
        fmt = " 1" if weighted else ""
        f.write(f"{nv} {ne}{fmt}\n")
        for i in range(nv):
            if weighted:
                f.write(" ".join(f"{j + 1} {int(w)}" for j, w in sorted(adj[i])) + "\n")
            else:
                f.write(" ".join(str(j + 1) for j, w in sorted(adj[i])) + "\n")


def run_reference(binary, metis_path):
    out = subprocess.run(
        [binary, "-f", "5", "-o", str(metis_path)],
        capture_output=True, text=True, timeout=600, cwd=str(metis_path.parent),
    )
    log = out.stdout + out.stderr
    summary = {}
    for pat, key, conv in [
        (r"Total number of phases\s*:\s*(\d+)", "phases", int),
        (r"Total number of iterations\s*:\s*(\d+)", "total_iters", int),
        (r"Final number of clusters\s*:\s*(\d+)", "num_clusters", int),
        (r"Final modularity\s*:\s*([-\d.]+)", "modularity", float),
    ]:
        m = re.search(pat, log)
        summary[key] = conv(m.group(1)) if m else None
    clust_file = pathlib.Path(str(metis_path) + "_clustInfo")
    # reference prints comm_type -1 (isolated vertices) as unsigned 2^32-1
    communities = [
        -1 if int(x) == 4294967295 else int(x) for x in clust_file.read_text().split()
    ]
    return summary, communities


# shared with tests/test_golden_parity.py so capture and compare agree
CASES = fx.GOLDEN_CASES


def main():
    binary = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refbuild/driverForGraphClustering"
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        for name, builder in CASES.items():
            edges, nv = builder()
            metis = pathlib.Path(td) / f"{name}.graph"
            write_metis(metis, edges, nv)
            summary, communities = run_reference(binary, metis)
            golden = {"fixture": name, "nv": nv, **summary, "communities": communities}
            (GOLDEN_DIR / f"{name}.json").write_text(json.dumps(golden))
            print(name, summary)


if __name__ == "__main__":
    main()
